#!/usr/bin/env python3
"""Bit-exact replica of a hash-based compare: after canonicalizing
(columns sorted by name, rows sorted by all columns), compare the BYTE
representation of every value. Catches -0.0 vs 0.0 and last-ulp float
diffs that pandas' check_exact equality (==) treats as equal.

Usage: python3 scripts/bitcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import struct
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def cell_bytes(v):
    if isinstance(v, float):
        return struct.pack("<d", v).hex()
    return repr(v)


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        mine = canon(con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        ora = canon(con.execute(sql).df())
        if list(mine.columns) != list(ora.columns) or len(mine) != len(ora):
            print(f"FAIL {name}: shape/cols")
            n_bad += 1
            continue
        bad = []
        for c in mine.columns:
            a, b = mine[c].to_numpy(), ora[c].to_numpy()
            if a.dtype == np.float64 and b.dtype == np.float64:
                ab, bb = a.view(np.uint64), b.view(np.uint64)
                # NaN == NaN ok (canonical NaN assumed); compare raw bits
                neq = ab != bb
            else:
                neq = np.array([repr(x) != repr(y) for x, y in zip(a, b)])
            if neq.any():
                idxs = np.nonzero(neq)[0][:3]
                for i in idxs:
                    bad.append((c, int(i), cell_bytes(a[i]), cell_bytes(b[i]),
                                a[i], b[i]))
        if bad:
            print(f"BITFAIL {name}: {len(bad)}+ differing cells")
            for c, i, ha, hb, va, vb in bad[:6]:
                print(f"  col={c} row={i} mine={va!r}({ha}) oracle={vb!r}({hb})")
            n_bad += 1
        else:
            print(f"BITOK  {name}: {len(mine)} rows")
    print(f"\n{'FAIL' if n_bad else 'PASS'}: {n_bad} queries bit-differ")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
