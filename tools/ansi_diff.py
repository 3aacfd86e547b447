#!/usr/bin/env python3
"""ANSI-mode parity sweep (round 9).

Usage: python3 tools/ansi_diff.py <defaultModeDir> <ansiModeDir>

Compares two graft.Verify dumps query by query — the default-mode run
vs the SPARK_GRAFT_ANSI=true run — with the same canonicalization the
oracle gate uses (columns sorted by name, rows sorted by all columns,
timestamps normalized). Any query whose results depend on non-ANSI
coincidences (silent overflow, lenient casts, divide-by-zero-as-NULL)
shows up as VAL/ROWS/COLS here; a query that CRASHED under ANSI shows
up as MISSING (Verify logs the failure and writes no parquet).
"""
import sys, glob, os
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon, compare


def load(out_dir, name):
    return pd.concat(
        [pd.read_parquet(p) for p in sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))],
        ignore_index=True)


def main():
    base_dir, ansi_dir = sys.argv[1], sys.argv[2]
    base_names = sorted(d for d in os.listdir(base_dir) if os.path.isdir(os.path.join(base_dir, d)))
    ansi_names = {d for d in os.listdir(ansi_dir) if os.path.isdir(os.path.join(ansi_dir, d))}
    failed = 0
    for name in base_names:
        if name not in ansi_names:
            print(f"{name:28s} MISSING-UNDER-ANSI (query failed with ansi.enabled=true)")
            failed += 1
            continue
        try:
            res = compare(name, load(base_dir, name), load(ansi_dir, name))
        except Exception as e:
            print(f"{name:28s} READ-FAIL {e}")
            failed += 1
            continue
        if not res.startswith("OK"):
            print(f"{name:28s} {res}")
            failed += 1
    extra = ansi_names - set(base_names)
    for name in sorted(extra):
        print(f"{name:28s} ONLY-IN-ANSI-DUMP")
    print(f"\n{'DIVERGED ' + str(failed) if failed else 'ANSI-PARITY OK'} / {len(base_names)}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
