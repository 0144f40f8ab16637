#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's output
against the DuckDB oracle (oracle_sql.json) and compare values.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]
"""
import duckdb, json, os, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # canonical unit so ns-vs-us frames render alike
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.convert_dtypes()
    s = df.astype(str)
    if len(s.columns):
        s = s.sort_values(by=list(s.columns), kind="mergesort")
    return s.reset_index(drop=True)

def norm_raw(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-strict stringify: NO convert_dtypes. The driver's hasher
    stringifies RAW frames, so an oracle column that DuckDB widens (window
    sum(BIGINT) -> HUGEINT -> pandas float64) renders "0.0" and
    hash-mismatches a Spark BIGINT "0" even when every value is identical
    ("the HUGEINT rule": CAST window-sum-derived integer columns back to
    BIGINT in the oracle). convert_dtypes() in norm() hides exactly that,
    so the strict pass runs separately after the value pass is green."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    s = df.astype(str)
    if len(s.columns):
        s = s.sort_values(by=list(s.columns), kind="mergesort")
    return s.reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"{name:32s} ORACLE-ERROR {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"{name:32s} SPARK-MISSING {e}")
            n_bad += 1
            continue
        a, b = norm(exp), norm(got)
        if list(a.columns) != list(b.columns):
            print(f"{name:32s} COLUMN-MISMATCH oracle={list(a.columns)} spark={list(b.columns)}")
            n_bad += 1
        elif len(a) != len(b):
            print(f"{name:32s} ROWCOUNT oracle={len(a)} spark={len(b)}")
            n_bad += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            print(f"{name:32s} VALUE-MISMATCH {int(diff.sum())}/{len(a)} rows; first at {i}:")
            print("  oracle:", dict(a.loc[i]))
            print("  spark :", dict(b.loc[i]))
            n_bad += 1
        else:
            ra, rb = norm_raw(exp), norm_raw(got)
            if not ra.equals(rb):
                diff = (ra != rb).any(axis=1)
                i = diff.idxmax()
                print(f"{name:32s} RENDER-MISMATCH (driver hash would "
                      f"differ; values equal after convert_dtypes)")
                print("  oracle:", dict(ra.loc[i]))
                print("  spark :", dict(rb.loc[i]))
                n_bad += 1
            else:
                print(f"{name:32s} OK ({len(a)} rows)")
                n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
