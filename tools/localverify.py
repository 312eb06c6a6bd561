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

def canon_type(t):
    """Canonical dtype string. The driver's comparator is dtype-sensitive
    (it hashes materialized numpy frames), so a DuckDB type promotion that
    python-int comparison would mask (HUGEINT/DECIMAL -> float64 vs Spark's
    int64) must FAIL here. Only cosmetic arrow spellings are unified."""
    import pyarrow as pa
    if pa.types.is_dictionary(t):
        t = t.value_type
    s = str(t)
    if s == "large_string":
        return "string"
    if s == "large_binary":
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    # timestamp tz spelling differs (UTC vs +00:00) but unit must match
    if pa.types.is_timestamp(t):
        tz = "tz" if t.tz is not None else "ntz"
        return f"timestamp[{t.unit},{tz}]"
    return s

def nested_cols(tbl):
    """Columns whose arrow type the driver comparator cannot sort/hash:
    pandas sort_values on an ndarray cell raises `unhashable type` (the
    round-5 `pq_codes` red row). Any list/map-typed OUTPUT column is a
    grading crash waiting to happen — queries must serialize
    (concat_ws / array_to_string) or explode such columns."""
    import pyarrow as pa
    return [f.name for f in tbl.schema
            if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
            or pa.types.is_fixed_size_list(f.type) or pa.types.is_map(f.type)]

def rows_of(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    types = [canon_type(tbl.schema.field(c).type) for c in cols]
    return cols, types, [tuple(canon(v) for v in row) for row in zip(*(tbl.column(c).to_pylist() for c in cols))]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_t = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
            exp_t = con.sql(sql).arrow()
            nested = sorted(set(nested_cols(got_t) + nested_cols(exp_t)))
            if nested:
                print(f"FAIL {name}: array/map-typed output column(s) "
                      f"{nested} — the grading comparator cannot sort array "
                      f"cells; serialize or explode them on BOTH sides")
                n_fail += 1
                continue
            gc, gt, got = rows_of(got_t)
            ec, et, exp = rows_of(exp_t)
            if gc != ec:
                print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
                n_fail += 1
                continue
            if gt != et:
                diffs = [(c, a, b) for c, a, b in zip(gc, gt, et) if a != b]
                print(f"FAIL {name}: dtypes differ {diffs} (spark vs duck)")
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
