#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (spark parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf dir, and compares:
row count, column names, and values (sorted by all columns, exact match;
floats compared bitwise after float64 cast to mirror a hash-based check).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes → hex for stable compare
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def eq_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: the driver hashes, tolerance is not available
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        want = norm(con.sql(oracle[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # FULL dtype must match: DuckDB SUM(BIGINT) -> HUGEINT -> float64 in
        # pandas while Spark sum(long) -> int64 (round-1 q21/q39/q62), and
        # int32-vs-int64 / float32-vs-float64 width skew fails the driver's
        # dtyped hash just the same. norm() already canonicalizes datetimes.
        kind_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                    if str(got[c].dtype) != str(want[c].dtype)]
        if kind_bad:
            c, g, w = kind_bad[0]
            print(f"FAIL {name}: dtype col={c} spark={g} duckdb={w}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not eq_cell(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
