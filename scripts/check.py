#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py [sfDir] [verifyOutDir]
Reads verifyOutDir/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB against the sfDir parquet tables, and exact-compares with the
parquet results Verify wrote (columns sorted by name, rows sorted).
This is a dev-side tool only — the shipped library is pure Scala/Spark.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

    def fresh_con():
        # fresh connection per query: a fatal DuckDB error on one oracle
        # must not cascade into the rest
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        return c

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = fresh_con().execute(sql).fetchdf()
            got = duckdb.connect().execute(
                f"SELECT * FROM '{outdir}/{name}.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        cols = list(exp.columns)
        exp = exp.sort_values(by=cols, ignore_index=True)
        got = got.sort_values(by=cols, ignore_index=True)
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n  {str(e)[:500]}")
            n_fail += 1
    print(f"\n{len(oracle) - n_fail}/{len(oracle)} oracle queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
