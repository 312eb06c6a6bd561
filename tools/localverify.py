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

# Above this many result rows, the compare runs INSIDE DuckDB (multiset
# EXCEPT ALL both ways) instead of materializing python tuples — the
# round-9 salted_join flake was a one-off comparator-side failure on a
# 6.1M-row python materialization. The driver's own comparator sorts
# before hashing, so the multiset semantics match what is being graded.
def parse_order_keys(sql):
    """The trailing ORDER BY of an oracle query as [(column_or_ordinal,
    is_desc)], or None when any item is an expression (function call,
    arithmetic) — callers must then stay strict, because the
    tie-permutation acceptance cannot verify an order it cannot parse."""
    import re
    m = re.search(r"ORDER\s+BY\s+(.+?)(?:\s+LIMIT\s+\d+\s*)?;?\s*$",
                  sql, re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    keys = []
    for item in m.group(1).split(","):
        m2 = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*|\d+)\s*(ASC|DESC)?",
                          item.strip(), re.IGNORECASE)
        if not m2:
            return None
        keys.append((m2.group(1),
                     bool(m2.group(2)) and m2.group(2).upper() == "DESC"))
    return keys


BIG_ROWS = 200_000


def compare_small(con, name, sql, out_dir):
    got_t = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
    exp_t = con.sql(sql).arrow()
    nested = sorted(set(nested_cols(got_t) + nested_cols(exp_t)))
    if nested:
        return (False, f"array/map-typed output column(s) {nested} — the "
                "grading comparator cannot sort array cells; serialize or "
                "explode them on BOTH sides")
    gc, gt, got = rows_of(got_t)
    ec, et, exp = rows_of(exp_t)
    if gc != ec:
        return False, f"columns differ spark={gc} duck={ec}"
    if gt != et:
        diffs = [(c, a, b) for c, a, b in zip(gc, gt, et) if a != b]
        return False, f"dtypes differ {diffs} (spark vs duck)"
    if len(got) != len(exp):
        return False, f"rowcount spark={len(got)} duck={len(exp)}"
    bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    if bad:
        i, g, e = bad[0]
        return (False, f"{len(bad)}/{len(got)} rows differ; first @{i}\n"
                f"  cols ={gc}\n  spark={g}\n  duck ={e}")
    return True, f"{len(got)} rows"


def compare_big(con, name, sql, out_dir, n_rows):
    """DuckDB-side compare: schema from metadata, values via EXCEPT ALL in
    both directions — nothing row-shaped ever crosses into Python."""
    got_schema = ds.dataset(f"{out_dir}/{name}", format="parquet").schema
    con.execute(f"CREATE OR REPLACE TEMP TABLE exp AS ({sql})")
    con.execute("CREATE OR REPLACE TEMP VIEW got AS SELECT * FROM "
                f"read_parquet('{out_dir}/{name}/*.parquet')")
    try:
        gc = sorted(got_schema.names)
        exp0 = con.sql("SELECT * FROM exp LIMIT 0").arrow()
        ec = sorted(exp0.column_names)
        if gc != ec:
            return False, f"columns differ spark={gc} duck={ec}"
        gt = [canon_type(got_schema.field(c).type) for c in gc]
        et = [canon_type(exp0.schema.field(c).type) for c in ec]
        if gt != et:
            diffs = [(c, a, b) for c, a, b in zip(gc, gt, et) if a != b]
            return False, f"dtypes differ {diffs} (spark vs duck)"
        n_exp = con.execute("SELECT count(*) FROM exp").fetchone()[0]
        if n_rows != n_exp:
            return False, f"rowcount spark={n_rows} duck={n_exp}"
        collist = ", ".join(f'"{c}"' for c in gc)
        n_diff = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT {collist} FROM exp EXCEPT ALL SELECT {collist} FROM got)"
            f" UNION ALL "
            f"(SELECT {collist} FROM got EXCEPT ALL SELECT {collist} FROM exp))"
        ).fetchone()[0]
        if n_diff:
            sample = con.execute(
                f"SELECT {collist} FROM exp EXCEPT ALL "
                f"SELECT {collist} FROM got LIMIT 3").fetchall()
            return (False, f"{n_diff} multiset-diff rows of {n_rows}; "
                    f"oracle-only sample={sample}")
        # EXCEPT ALL is order-insensitive, but compare_small enforces the
        # query's ORDER BY — keep that discipline here with a bounded head
        # sample. The got side is the order Spark WROTE (zero-padded part
        # files keep the glob scan in written order); the exp side is read
        # from a FRESH cursor on the original SQL, whose result order is
        # the query's own ORDER BY by SQL semantics — never through the
        # CTAS temp table, whose scan order is mere insertion-order
        # convention.
        head_k = 1000
        head_got = [tuple(canon(v) for v in r) for r in con.execute(
            f"SELECT {collist} FROM got LIMIT {head_k}").fetchall()]
        head_exp = [tuple(canon(v) for v in r) for r in con.execute(
            f"SELECT {collist} FROM exp LIMIT {head_k}").fetchall()]
        if head_got != head_exp:
            # Slow path, mismatch only: the exp-table head went through a
            # CTAS temp table whose scan order is insertion-order
            # convention, not SQL semantics — re-run the ORIGINAL sql on a
            # fresh cursor, whose result order IS the query's ORDER BY,
            # before judging.
            cur = con.execute(sql)
            names = [d[0] for d in cur.description]
            idx = [names.index(c) for c in gc]
            head_exp = [tuple(canon(r[i]) for i in idx)
                        for r in cur.fetchmany(head_k)]
        if head_got != head_exp:
            # A non-total ORDER BY cannot pin tie order cross-engine: if
            # the two heads hold the SAME multiset, the difference MAY be
            # a pure permutation among order-by ties. Equal multisets
            # alone do not prove that (a dropped secondary sort key also
            # preserves the multiset), so additionally require head_got to
            # be NON-DECREASING on the query's declared ORDER BY keys —
            # only then is the permutation confined to tie runs. If the
            # ORDER BY cannot be resolved to plain columns/ordinals, stay
            # strict and fail.
            from collections import Counter
            if Counter(head_got) != Counter(head_exp):
                i = next(i for i, (g, e)
                         in enumerate(zip(head_got, head_exp)) if g != e)
                return (False, f"multiset matches but head-{head_k} ORDER "
                        f"differs beyond tie permutation; first @{i}\n"
                        f"  spark={head_got[i]}\n  duck ={head_exp[i]}")
            keys = parse_order_keys(sql)
            key_idx = None
            if keys is not None:
                names = [d[0] for d in con.execute(
                    "SELECT * FROM exp LIMIT 0").description]
                try:
                    key_idx = [
                        (gc.index(names[int(c) - 1] if c.isdigit() else c), d)
                        for c, d in keys]
                except (ValueError, IndexError):
                    key_idx = None
            if key_idx is None:
                return (False, f"head-{head_k} order differs and the ORDER "
                        f"BY keys could not be resolved to plain columns — "
                        f"cannot prove a tie-only permutation")

            def pair_ok(a, b):
                for i, desc in key_idx:
                    x, y = a[i], b[i]
                    if x is None or y is None:
                        # engines disagree on NULL placement; the multiset
                        # gate above already pinned the content
                        return True
                    if x == y:
                        continue
                    try:
                        lt = x < y
                    except TypeError:
                        return True
                    return (not lt) if desc else lt
                return True
            bad = next((i for i in range(len(head_got) - 1)
                        if not pair_ok(head_got[i], head_got[i + 1])), None)
            if bad is not None:
                return (False, f"multiset matches but head-{head_k} violates "
                        f"the declared ORDER BY at @{bad}:\n"
                        f"  {head_got[bad]}\n  {head_got[bad + 1]}")
            return (True, f"{n_rows} rows, duckdb-side multiset; "
                    f"head-{head_k} equal up to order-by-tie permutation "
                    f"(sort keys verified non-decreasing)")
        return True, f"{n_rows} rows, duckdb-side multiset + head-{head_k} order"
    finally:
        con.execute("DROP VIEW IF EXISTS got")
        con.execute("DROP TABLE IF EXISTS exp")


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
        def attempt():
            try:
                n_rows = ds.dataset(f"{out_dir}/{name}",
                                    format="parquet").count_rows()
                if n_rows > BIG_ROWS:
                    return compare_big(con, name, sql, out_dir, n_rows)
                return compare_small(con, name, sql, out_dir)
            except Exception as exn:
                return False, f"exception {exn}"
        ok, msg = attempt()
        if not ok:
            # deterministic retry-with-diagnosis: a comparator-side flake
            # (transient OOM/IO) passes on an immediate identical re-run; a
            # real divergence fails twice and is reported as such. The
            # engine output on disk is identical in both attempts, so a
            # retried PASS can only mean the COMPARATOR flaked.
            ok2, msg2 = attempt()
            if ok2:
                print(f"PASS {name} ({msg2}; attempt 1 comparator flake: {msg})")
                n_pass += 1
                continue
            print(f"FAIL {name}: {msg2} (repeated on retry)")
            n_fail += 1
            continue
        print(f"PASS {name} ({msg})")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
