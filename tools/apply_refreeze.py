#!/usr/bin/env python3
"""Rewrite Bench.scala's frozen rows in place from a measurement log.

Reads a scale_run.sh log (refreeze.sh / freeze_new_r10.sh output),
computes each query's median, and replaces the existing
'"name" -> value' occurrence inside Bench.scala's frozenSf01 map.
Queries with no existing row are printed for manual addition (new
entries get their own provenance comment block).

The canary (markov_stationary) is never rewritten — it is the frozen
table's historical reference point.

Usage: tools/apply_refreeze.py <logFile> [--apply]
  default: dry-run diff to stdout
"""
import re
import statistics
import sys

BENCH = "src/main/scala/graft/Bench.scala"
CANARY = "markov_stationary"

def medians(path):
    runs = {}
    for line in open(path):
        parts = line.split()
        if len(parts) == 2 and not line.startswith("#"):
            q, v = parts
            try:
                runs.setdefault(q, []).append(float(v))
            except ValueError:
                pass
    return {q: statistics.median(vs) for q, vs in runs.items()}

def main():
    log = sys.argv[1]
    apply = "--apply" in sys.argv[2:]
    med = medians(log)
    src = open(BENCH).read()
    missing, changed = [], []
    for q, m in sorted(med.items()):
        if q == CANARY:
            continue
        pat = re.compile(r'("%s" -> )([0-9][0-9.]*)' % re.escape(q))
        hits = pat.findall(src)
        if not hits:
            missing.append((q, m))
            continue
        if len(hits) > 1:
            print(f"!! {q}: {len(hits)} occurrences, skipping")
            continue
        old = float(hits[0][1])
        new = f"{m:.3f}"
        if f"{old:.3f}" != new:
            changed.append((q, old, m))
        src = pat.sub(lambda g: g.group(1) + new, src)
    for q, old, m in changed:
        print(f"{q:34s} {old:8.3f} -> {m:8.3f}  ({m/old:5.2f}x)")
    if missing:
        print("\n# no existing frozen row (add manually):")
        for q, m in missing:
            print(f'    "{q}" -> {m:.3f},')
    if apply:
        open(BENCH, "w").write(src)
        print(f"\napplied {len(changed)} row updates to {BENCH}")

if __name__ == "__main__":
    main()
