#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare the
graft.Verify parquet dumps against DuckDB running oracle_sql.json.

Usage: python3 tools/verify_local.py [sf_dir] [out_dir]
"""
import json
import math
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # driver hashes exact values; demand bit equality
    return a == b


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = norm(pd.read_parquet(f"{OUT}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        # The driver hashes str() of exact cell values, so an int column on
        # one side vs float on the other (DuckDB HUGEINT -> pandas float64)
        # hash-mismatches even when the numbers compare equal. Reject the
        # dtype-kind mismatch outright so this gate predicts the driver's.
        kind_bad = None
        for col in spark_df.columns:
            sk = spark_df[col].dtype.kind  # i/u int, f float, O object, ...
            dk = duck_df[col].dtype.kind
            int_kinds = {"i", "u"}
            if (sk in int_kinds) != (dk in int_kinds) and {sk, dk} <= int_kinds | {"f"}:
                kind_bad = (col, spark_df[col].dtype, duck_df[col].dtype)
                break
        if kind_bad:
            col, sd, dd = kind_bad
            print(f"FAIL {name}: dtype mismatch col={col}: spark={sd} duck={dd}"
                  " (int vs float — likely an uncast HUGEINT in the oracle)")
            n_fail += 1
            continue
        bad = None
        for col in spark_df.columns:
            sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: first diff col={col} row={i}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
