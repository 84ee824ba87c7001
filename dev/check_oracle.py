#!/usr/bin/env python3
"""Dev-only pre-check of SparkEntry queries against their DuckDB oracles.

Emulates the driver's CORRECTNESS gate locally: run `graft.Verify` first
(writes <out>/<name>.parquet + <out>/oracle_sql.json), then this script
compares each result with its oracle run in DuckDB over the same sf tables.
Comparison is strict (column names sorted, exact value equality) to mirror
the driver's hash compare. NOT part of the shipped library — python/duckdb
are driver-side tools only.

Usage: python3 dev/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        wrows = [tuple(norm_cell(v) for v in r)
                 for r in want.itertuples(index=False)]
        grows = [tuple(norm_cell(v) for v in r)
                 for r in got.itertuples(index=False)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(wrows, grows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} differing rows; first at {i}:\n"
                  f"  oracle={a}\n  spark ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
