#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query: load the Spark parquet result, run the oracle SQL in DuckDB
against the same tables, sort columns by name + rows by all columns, and
compare values exactly. Prints per-query PASS/FAIL with a diff preview.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            if g.equals(w):
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
            else:
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())} differing rows")
                print("  spark:", g[bad].head(3).to_dict("records"))
                print("  oracle:", w[bad].head(3).to_dict("records"))
                # dtype drift report
                for c in g.columns:
                    if str(g[c].dtype) != str(w[c].dtype):
                        print(f"  dtype {c}: spark={g[c].dtype} oracle={w[c].dtype}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
