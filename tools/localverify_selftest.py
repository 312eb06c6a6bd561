#!/usr/bin/env python3
"""Self-test for localverify.py's dtype strictness (dev tool only).

The round-4 `compaction_plan` failure class: DuckDB silently promotes
`sum(BIGINT)` window results (and bare `//` over them) to HUGEINT, which
the grading comparator materializes as float64 and hash-diverges from
Spark's int64 even when every VALUE is equal. localverify.py therefore
compares arrow dtypes, not just python values. This script proves the
guard actually fires:

  1. a Spark-shaped int64 parquet vs a deliberately HUGEINT-promoted
     oracle (`sum(v) // 1`) must FAIL on dtypes;
  2. the same oracle with the promotion pinned (`CAST(... AS BIGINT)`)
     must PASS.

Run: python3 tools/localverify_selftest.py  (exit 0 = guard works)
"""
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent


def run_case(tmp, oracle_sql):
    sf = tmp / "sf"
    out = tmp / "out"
    sf.mkdir(exist_ok=True)
    (out / "q").mkdir(parents=True, exist_ok=True)
    # "testdata": one table the oracle reads; localverify registers every
    # TABLES name it finds, missing ones just fail view creation silently
    con = duckdb.connect()
    con.sql("SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS v "
            "UNION ALL SELECT 2, 3").write_parquet(str(sf / "events.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        con.sql("SELECT 1 AS dummy").write_parquet(str(sf / f"{t}.parquet"))
    # "Spark result": plain int64, the dtype Spark's sum(long) produces
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "s": pa.array([2, 3], pa.int64())}),
        str(out / "q" / "part-0.parquet"))
    (out / "oracle_sql.json").write_text(
        '{"q": %s}' % duckdb_json_quote(oracle_sql))
    r = subprocess.run(
        [sys.executable, str(ROOT / "localverify.py"), str(sf), str(out)],
        capture_output=True, text=True)
    return r.returncode, r.stdout


def duckdb_json_quote(s):
    import json
    return json.dumps(s)


def main():
    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        # HUGEINT-promoted oracle: values equal (2, 3), dtype is not int64
        rc, out = run_case(
            tmp, "SELECT k, sum(v) // 1 AS s FROM events GROUP BY k ORDER BY k")
        assert rc != 0 and "dtypes differ" in out, (
            f"dtype guard did NOT fire on a HUGEINT promotion:\n{out}")
        # pinned oracle: must pass
        rc, out = run_case(
            tmp, "SELECT k, CAST(sum(v) // 1 AS BIGINT) AS s "
                 "FROM events GROUP BY k ORDER BY k")
        assert rc == 0, f"pinned BIGINT oracle failed:\n{out}"
        # array-typed oracle output: must fail the shape guard even though
        # the spark side is scalar (the round-5 `pq_codes` class — the
        # grading comparator crashes sorting ndarray cells)
        rc, out = run_case(
            tmp, "SELECT k, list(v) AS s FROM events GROUP BY k ORDER BY k")
        assert rc != 0 and "array/map-typed" in out, (
            f"array-shape guard did NOT fire on a list-typed column:\n{out}")
    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        # array-typed SPARK output (scalar oracle): same guard must fire
        pq.write_table(
            pa.table({"k": pa.array([1, 2], pa.int64()),
                      "s": pa.array([[2], [3]], pa.list_(pa.int64()))}),
            str(tmp / "spark_arr.parquet"))
        sf = tmp / "sf"; out_d = tmp / "out"
        sf.mkdir(); (out_d / "q").mkdir(parents=True)
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            con.sql("SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS v"
                    ).write_parquet(str(sf / f"{t}.parquet"))
        (tmp / "spark_arr.parquet").rename(out_d / "q" / "part-0.parquet")
        (out_d / "oracle_sql.json").write_text(
            '{"q": "SELECT k, v AS s FROM events ORDER BY k"}')
        r = subprocess.run(
            [sys.executable, str(ROOT / "localverify.py"), str(sf),
             str(out_d)], capture_output=True, text=True)
        assert r.returncode != 0 and "array/map-typed" in r.stdout, (
            f"array-shape guard did NOT fire on a spark-side list column:\n"
            f"{r.stdout}")
    print("localverify_selftest: OK "
          "(HUGEINT promotion fails, pinned BIGINT passes, "
          "array-typed outputs rejected on either side)")


if __name__ == "__main__":
    main()
