#!/usr/bin/env python3
"""One-command round gate (dev tool — not part of the shipped library).

Runs the full correctness gate and emits the scripted GATE.json record
that SURVEY.md cites (so tallies can never drift from the code):

  1. `sbt test`                         -> test count + green/red
  2. `sbt runMain graft.Verify` per SF  -> per-SF GATE.json + parquet dumps
  3. tools/localverify.py per SF        -> per-query oracle pass/fail
  4. merge                              -> <repo>/GATE.json

Usage: python3 tools/gate.py [--sfs sf0.001,sf0.01,sf0.1] [--skip-tests]
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = "/root/testdata"


def run(cmd, extra_env=None, **kw):
    print(f"[gate] $ {' '.join(cmd)}"
          + (f"  (env {extra_env})" if extra_env else ""), flush=True)
    env = dict(os.environ, **extra_env) if extra_env else None
    return subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          env=env, **kw)


def sbt_tests():
    r = run(["sbt", "-batch", "test"])
    out = r.stdout + r.stderr
    m = re.search(r"Tests: succeeded (\d+), failed (\d+)", out)
    if not m:
        return {"tests_green": False, "tests_n": None,
                "note": "no sbt summary parsed", "rc": r.returncode}
    return {"tests_green": r.returncode == 0 and m.group(2) == "0",
            "tests_n": int(m.group(1)), "tests_failed": int(m.group(2))}


def verify_sf(sf, extra_env=None, tag=""):
    out_dir = f"/tmp/gate_{sf}{tag}"
    r = run(["sbt", "-batch",
             f"runMain graft.Verify {TESTDATA}/{sf} {out_dir}"],
            extra_env=extra_env)
    if r.returncode != 0:
        return {"sf": sf, "error": f"verify rc={r.returncode}"}
    with open(f"{out_dir}/GATE.json") as f:
        rec = json.load(f)
    lv = run([sys.executable, "tools/localverify.py",
              f"{TESTDATA}/{sf}", out_dir])
    tail = (lv.stdout.strip().splitlines() or [""])[-1]
    m = re.search(r"== (\d+) pass / (\d+) fail ==", tail)
    rec["oracle_pass"] = int(m.group(1)) if m else None
    rec["oracle_fail"] = int(m.group(2)) if m else None
    rec["oracle_fail_names"] = sorted(
        {ln.split()[1].rstrip(":") for ln in lv.stdout.splitlines()
         if ln.startswith("FAIL")})
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="sf0.001,sf0.01,sf0.1")
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-alt-config", action="store_true",
                    help="skip the shuffle.partitions=200 + AQE sf0.1 sweep")
    ap.add_argument("--alt-sf", default="sf0.1")
    args = ap.parse_args()

    gate = {} if args.skip_tests else sbt_tests()
    gate["per_sf"] = [verify_sf(sf) for sf in args.sfs.split(",")]
    if not args.skip_alt_config:
        # Partition-count agnosticism proof: the same sweep must hash-match
        # at a cluster-like shuffle.partitions=200 with AQE on (exercises
        # withGlobalRank/withGlobalCumsum/AsOfJoinExec partitioning).
        gate["alt_config"] = verify_sf(
            args.alt_sf,
            extra_env={"SPARK_GRAFT_SHUFFLE_PARTITIONS": "200",
                       "SPARK_GRAFT_AQE": "true"},
            tag="_alt200aqe")
    first = next((r for r in gate["per_sf"] if "registry_n" in r), {})
    gate["registry_n"] = first.get("registry_n")
    gate["oracled_n"] = first.get("oracled_n")
    gate["rows_only"] = first.get("rows_only")
    gate["all_green"] = (gate.get("tests_green", True)
                         and all(r.get("oracle_fail") == 0
                                 for r in gate["per_sf"])
                         and (args.skip_alt_config
                              or gate["alt_config"].get("oracle_fail") == 0))
    path = os.path.join(REPO, "GATE.json")
    with open(path, "w") as f:
        json.dump(gate, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[gate] wrote {path}: all_green={gate['all_green']}")
    return 0 if gate["all_green"] else 1


if __name__ == "__main__":
    sys.exit(main())
