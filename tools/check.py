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

def compare(sfdir, outdir, only=None, log=print):
    """Run the DuckDB compare for every oracle entry in `outdir` (or the
    `only` subset) against `sfdir`'s tables. Returns {name: status} where
    status is "ok" or the failure kind (reused by check_multi.py)."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    statuses = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            log(f"{name:32s} ORACLE-ERROR {e}")
            statuses[name] = "oracle-error"
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            log(f"{name:32s} SPARK-MISSING {e}")
            statuses[name] = "spark-missing"
            continue
        a, b = norm(exp), norm(got)
        if list(a.columns) != list(b.columns):
            log(f"{name:32s} COLUMN-MISMATCH oracle={list(a.columns)} spark={list(b.columns)}")
            statuses[name] = "column-mismatch"
        elif len(a) != len(b):
            log(f"{name:32s} ROWCOUNT oracle={len(a)} spark={len(b)}")
            statuses[name] = "rowcount"
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            log(f"{name:32s} VALUE-MISMATCH {int(diff.sum())}/{len(a)} rows; first at {i}:")
            log(f"  oracle: {dict(a.loc[i])}")
            log(f"  spark : {dict(b.loc[i])}")
            statuses[name] = "value-mismatch"
        else:
            ra, rb = norm_raw(exp), norm_raw(got)
            if not ra.equals(rb):
                diff = (ra != rb).any(axis=1)
                i = diff.idxmax()
                log(f"{name:32s} RENDER-MISMATCH (driver hash would "
                    f"differ; values equal after convert_dtypes)")
                log(f"  oracle: {dict(ra.loc[i])}")
                log(f"  spark : {dict(rb.loc[i])}")
                statuses[name] = "render-mismatch"
            else:
                log(f"{name:32s} OK ({len(a)} rows)")
                statuses[name] = "ok"
    return statuses

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    statuses = compare(sfdir, outdir, only)
    n_ok = sum(1 for s in statuses.values() if s == "ok")
    n_bad = len(statuses) - n_ok
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
