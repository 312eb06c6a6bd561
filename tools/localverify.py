#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle check (dev tool only —
not part of the shipped Scala library).

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each parquet table from sfDir as a DuckDB view
  3. runs each oracle_sql.json query, compares to outDir/<name> parquet
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v

def rows_of(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    return cols, [tuple(canon(v) for v in row) for row in zip(*(tbl.column(c).to_pylist() for c in cols))]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_t = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
            exp_t = con.sql(sql).arrow()
            gc, got = rows_of(got_t)
            ec, exp = rows_of(exp_t)
            if gc != ec:
                print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
                n_fail += 1
                continue
            if len(got) != len(exp):
                print(f"FAIL {name}: rowcount spark={len(got)} duck={len(exp)}")
                n_fail += 1
                continue
            bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
            if bad:
                i, g, e = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; first @%d\n  cols =%s\n  spark={g}\n  duck ={e}" % (i, gc))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
        except Exception as exn:
            print(f"FAIL {name}: exception {exn}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
