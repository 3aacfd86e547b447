#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>'s
tables, and compares: column names (sorted), dtypes (loosely), row
count, and values (rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to naive UTC for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS  spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS  spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                return f"VAL   col={c} row={i} spark={av[i]!r} duck={bv[i]!r} ({int(neq.sum())} diffs)"
        else:
            if not av.equals(bv):
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    return f"VAL   col={c} row={i} spark={av[i]!r} duck={bv[i]!r} ({int(neq.sum())} diffs) dtypes {av.dtype}/{bv.dtype}"
                # values equal, dtypes differ (e.g. int32 vs int64) —
                # falls through to the dtype-notes path below
    # dtype note (not a failure, but flag int32 vs int64 etc.)
    notes = [f"{c}:{a[c].dtype}!={b[c].dtype}" for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
    return "OK" + (f"  [dtype notes: {', '.join(notes)}]" if notes else "")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))])
    failed = 0
    for name in names:
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))],
                ignore_index=True)
        except Exception as e:
            print(f"{name:24s} SPARK-READ-FAIL {e}"); failed += 1; continue
        if name not in oracles:
            print(f"{name:24s} rows-only rows={len(spark_df)}" + (" FAIL(empty)" if len(spark_df) == 0 else ""))
            failed += int(len(spark_df) == 0)
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} DUCK-FAIL {e}"); failed += 1; continue
        res = compare(name, spark_df, duck_df)
        print(f"{name:24s} {res}")
        failed += int(not res.startswith("OK"))
    print(f"\n{'FAILED ' + str(failed) if failed else 'ALL OK'} / {len(names)}")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
