#!/usr/bin/env python3
"""Local pre-flight replica of the driver's correctness gate.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir>

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` already ran.
Registers each parquet table as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, and compares against the Spark
result parquet: column names (sorted), row count, and exact values
after sorting columns by name and rows by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize timestamp precisions to us
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # subset runs (runMain graft.Verify <sf> <out> <name>...) dump only
    # the named queries; compare just those instead of FAILing the rest
    import os
    present = {n for n in oracle if os.path.isdir(f"{out_dir}/{n}")}
    if present and len(present) < len(oracle):
        print(f"(subset dump: comparing {len(present)}/{len(oracle)} entries)")
        oracle = {n: s for n, s in oracle.items() if n in present}
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            # HUGEINT/DECIMAL output columns convert to pandas
            # differently across DuckDB versions (r9 lesson: all five
            # driver hash FAILs were exactly the oracles with a
            # HUGEINT output column) — ban them outright.
            rel = con.sql(sql)
            sus = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if str(t) == "HUGEINT" or str(t).startswith("DECIMAL")]
            if sus:
                print(f"FAIL {name}: version-sensitive oracle output "
                      f"types {sus} — CAST to BIGINT/DOUBLE")
                n_bad += 1
                continue
            mine = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            ora = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(mine.columns) != list(ora.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ora.columns)}")
            n_bad += 1
            continue
        if len(mine) != len(ora):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ora)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, ora, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name}: {len(mine)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            mism = (mine != ora) & ~(mine.isna() & ora.isna())
            bad_cols = [c for c in mine.columns if mism[c].any()]
            for c in bad_cols[:3]:
                idx = mism[c].idxmax()
                print(f"  col {c} row {idx}: mine={mine[c][idx]!r} oracle={ora[c][idx]!r}")
            n_bad += 1
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
