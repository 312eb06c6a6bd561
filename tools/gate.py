#!/usr/bin/env python3
"""One-command round gate (dev tool — not part of the shipped library).

Runs the full correctness gate and emits the scripted GATE.json record
that SURVEY.md cites (so tallies can never drift from the code):

  1. `sbt test`                         -> test count + green/red
  2. `sbt runMain graft.Verify` per SF  -> per-SF GATE.json + parquet dumps
  3. tools/localverify.py per SF        -> per-query oracle pass/fail
  4. fresh bench vs committed BENCH_FULL.json (calibration-normalized
     via benchdiff.compare)             -> bench_regressions record;
     a query flagged in 2+ consecutive gate records FAILS the gate
     unless waived in tools/bench_waivers.json
  5. fresh sf2 bench vs committed BENCH_SF2.json (same normalization +
     window counter)                    -> bench_regressions_sf2 record
  6. merge (atomic os.replace; partial checkpoint removed on success)
                                        -> <repo>/GATE.json

Every phase record is stamped with the short HEAD sha (+dirty marker).
--merge keeps prior phases' records but lists any whose stamp differs
from the current tree in merge_stale and refuses all_green unless
--allow-stale — a merged gate can never silently claim green with
evidence that predates the code it vouches for.

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


_HEAD_AT_START = None


def git_head():
    """Short HEAD sha + dirty marker, captured ONCE at process start and
    reused for every stamp in this invocation. Gate phases themselves
    rewrite tracked artifacts (BENCH_FULL.json, LEAKCHECK.json, ...), so
    a run started on a clean tree turns dirty mid-run; re-probing per
    phase would stamp early phases clean and late phases dirty and a
    --merge would spuriously flag the early ones as stale.

    Scoped to CODE paths (src/tools/build.sbt/conf/project): a phase
    record is evidence about the code, so an artifact-only commit (e.g.
    the --commit-artifacts one, or a SURVEY edit) must not make every
    kept record look stale on the next --merge."""
    global _HEAD_AT_START
    if _HEAD_AT_START is None:
        # bench_isolated_baseline.json is a gate-WRITTEN artifact that
        # happens to live under tools/ — exclude it from the code scope,
        # or the gate's own write would flip dirtiness for later runs
        code_paths = ["src", "tools", "build.sbt", "conf", "project",
                      ":(exclude)tools/bench_isolated_baseline.json"]
        sha = subprocess.run(
            ["git", "log", "-1", "--format=%h", "--"] + code_paths,
            cwd=REPO, capture_output=True, text=True).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no", "--"]
            + code_paths,
            cwd=REPO, capture_output=True, text=True).stdout.strip() != ""
        _HEAD_AT_START = (sha or "unknown") + ("+dirty" if dirty else "")
    return _HEAD_AT_START


def stamp_stale(stamp, head_now):
    """Full-stamp staleness compare (round-13, replacing the sha-only
    head_sha strip): git_head is already scoped to CODE paths, so
    gate-written artifacts cannot flip dirtiness mid-run — the original
    motivation for stripping '+dirty' is solved upstream, and keeping the
    strip only laundered records produced with uncommitted CODE edits
    into evidence for the clean commit. A '+dirty' stamp is stale by
    definition (it describes a tree state that was never committed);
    --allow-stale remains the explicit escape hatch."""
    s = str(stamp)
    return s != head_now or s.endswith("+dirty")


def stamp(rec):
    if isinstance(rec, dict):
        rec["commit"] = git_head()
    return rec


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
    # `sf` is either a tier name under /root/testdata (sf0.01) or a
    # path to a generated tier (testdata-sf1 / absolute dir)
    sf_dir = sf if "/" in sf or sf.startswith("testdata-") else f"{TESTDATA}/{sf}"
    if not os.path.isabs(sf_dir):
        sf_dir = os.path.join(REPO, sf_dir)
    out_dir = f"/tmp/gate_{os.path.basename(sf.rstrip('/'))}{tag}"
    r = run(["sbt", "-batch",
             f"runMain graft.Verify {sf_dir} {out_dir}"],
            extra_env=extra_env)
    if r.returncode != 0:
        return {"sf": sf, "error": f"verify rc={r.returncode}"}
    with open(f"{out_dir}/GATE.json") as f:
        rec = json.load(f)
    lv = run([sys.executable, "tools/localverify.py", sf_dir, out_dir])
    tail = (lv.stdout.strip().splitlines() or [""])[-1]
    m = re.search(r"== (\d+) pass / (\d+) fail ==", tail)
    rec["oracle_pass"] = int(m.group(1)) if m else None
    rec["oracle_fail"] = int(m.group(2)) if m else None
    rec["oracle_fail_names"] = sorted(
        {ln.split()[1].rstrip(":") for ln in lv.stdout.splitlines()
         if ln.startswith("FAIL")})
    return rec


STREAMING_SUITES = ["graft.StreamingSpec", "graft.StreamingEntrySpec",
                    "graft.DynamicSessionsSpec", "graft.RateLimiterSpec"]


def rocksdb_twins():
    """Re-run the whole streaming-twin manifest under the RocksDB state
    store + changelog checkpointing (the cluster-100tb.conf backend) —
    proving the state-store swap is config-only for every stateful twin,
    not just the transformWithState one."""
    r = run(["sbt", "-batch", "testOnly " + " ".join(STREAMING_SUITES)],
            extra_env={"SPARK_GRAFT_STATESTORE": "rocksdb"})
    out = r.stdout + r.stderr
    m = re.search(r"Tests: succeeded (\d+), failed (\d+)", out)
    if not m:
        return {"green": False, "note": "no sbt summary parsed",
                "rc": r.returncode}
    return {"green": r.returncode == 0 and m.group(2) == "0",
            "suites": STREAMING_SUITES,
            "tests_n": int(m.group(1)), "tests_failed": int(m.group(2)),
            "statestore": "RocksDBStateStoreProvider+changelog"}


def bench_regressions(flag=1.35, bench_file="BENCH_FULL.json",
                      sf_dir=None, record_key="bench_regressions",
                      extra_env=None):
    """Run the bench fresh, diff it calibration-normalized against the last
    COMMITTED <bench_file> (benchdiff.compare — the same logic the
    by-hand tool uses), and carry a repeated-window counter forward from
    the previous GATE.json. A query flagged in 2+ consecutive gate records
    FAILS the gate unless tools/bench_waivers.json explains it. The sf0.1
    default diffs BENCH_FULL.json; the scale tier (record_key
    `bench_regressions_sf2`) diffs BENCH_SF2.json so superlinear-at-scale
    regressions are caught by the gate, not only by the per-round
    scalediff study."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import benchdiff

    prior_windows = {}
    try:
        with open(os.path.join(REPO, "GATE.json")) as f:
            prior = json.load(f).get(record_key, {})
        prior_windows = {q: v.get("windows", 1)
                         for q, v in prior.get("flagged", {}).items()}
    except (OSError, json.JSONDecodeError):
        pass

    base = subprocess.run(["git", "show", f"HEAD:{bench_file}"],
                          cwd=REPO, capture_output=True, text=True)
    if base.returncode != 0:
        return {"error": f"no committed {bench_file} baseline"}
    baseline = json.loads(base.stdout)
    old_qc = (baseline.get("queries") or {}, baseline.get("calibration"))

    env = {"SPARK_GRAFT_SF_DIR": sf_dir or f"{TESTDATA}/sf0.1",
           "SPARK_GRAFT_CPUS": "32"}
    if bench_file != "BENCH_FULL.json":
        env["SPARK_GRAFT_BENCH_FULL"] = bench_file
    if extra_env:
        env.update(extra_env)
    r = run(["sbt", "-batch", "runMain graft.Bench"], extra_env=env)
    if r.returncode != 0:
        return {"error": f"bench rc={r.returncode}"}
    new_qc = benchdiff.load(os.path.join(REPO, bench_file))

    norm, how, flagged = benchdiff.compare(old_qc, new_qc, flag)
    # Isolated re-probe (round-12): in-run times for small queries can be
    # ~3x their isolated times from neighbors' GC/JIT churn, so a flag
    # from the full run is not yet evidence of a plan regression. Re-run
    # the flagged queries alone (own calibration, min-of-2 preserved) and
    # record both numbers in the flag entry — a real plan regression
    # persists in isolation, an in-run artifact does not, and that
    # distinction used to require a by-hand SPARK_GRAFT_ONLY adjudication.
    if flagged and len(flagged) <= 20:
        probe_path = "/tmp/BENCH_GATE_PROBE.json"
        try:
            os.remove(probe_path)
        except OSError:
            pass
        penv = dict(env)
        penv["SPARK_GRAFT_ONLY"] = ",".join(sorted(flagged))
        penv["SPARK_GRAFT_BENCH_FULL"] = probe_path
        pr = run(["sbt", "-batch", "runMain graft.Bench"], extra_env=penv)
        try:
            iso_q, iso_c = benchdiff.load(probe_path)
            inorm, _, _ = benchdiff.compare(old_qc, (iso_q, iso_c), flag)
            # Like-for-like exoneration (round-13): the committed BENCH
            # baselines are IN-RUN times (up to ~3x inflated for small
            # queries by neighbor GC/JIT), so a clean isolated probe
            # compared against them is biased toward clearing — a real
            # 1.3-2x plan regression could hide inside the inflation.
            # Prefer a committed ISOLATED baseline for the same tier when
            # one exists; without one, require the isolated probe to beat
            # the in-run baseline OUTRIGHT (ratio <= 1.0, not <= flag).
            iso_base_path = os.path.join(REPO, "tools",
                                         "bench_isolated_baseline.json")
            try:
                with open(iso_base_path) as f:
                    iso_base_all = json.load(f)
            except (OSError, json.JSONDecodeError):
                iso_base_all = {}
            tier = iso_base_all.get(bench_file, {})
            base_iso_qc = (tier.get("queries", {}), tier.get("calibration"))
            bnorm = None
            if any(q in base_iso_qc[0] for q in flagged):
                bnorm, _, _ = benchdiff.compare(base_iso_qc,
                                                (iso_q, iso_c), flag)
            for q, v in flagged.items():
                if q in iso_q and old_qc[0].get(q):
                    v["isolated_s"] = iso_q[q]
                    v["isolated_ratio_norm"] = \
                        iso_q[q] / old_qc[0][q] / inorm
                    if bnorm and base_iso_qc[0].get(q):
                        v["isolated_vs_isolated_norm"] = \
                            iso_q[q] / base_iso_qc[0][q] / bnorm
                        v["isolated_clears"] = \
                            v["isolated_vs_isolated_norm"] <= flag
                    else:
                        v["isolated_clears"] = v["isolated_ratio_norm"] <= 1.0
            # fold CLEARED probes into the committed isolated baseline so
            # the next flag on the same query compares like-for-like
            # (regressed probes are NOT recorded — they must not become
            # their own exoneration baseline)
            cleared = {q: iso_q[q] for q, v in flagged.items()
                       if v.get("isolated_clears") and q in iso_q}
            if cleared:
                tier.setdefault("queries", {}).update(cleared)
                tier["calibration"] = iso_c
                iso_base_all[bench_file] = tier
                with open(iso_base_path, "w") as f:
                    json.dump(iso_base_all, f, indent=1, sort_keys=True)
                    f.write("\n")
        except (OSError, json.JSONDecodeError, ZeroDivisionError) as exn:
            for v in flagged.values():
                v["isolated_probe_error"] = f"{type(exn).__name__}: {exn}"
    waivers = {}
    try:
        with open(os.path.join(REPO, "tools", "bench_waivers.json")) as f:
            waivers = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    for q, v in flagged.items():
        v["windows"] = prior_windows.get(q, 0) + 1
        if q in waivers:
            v["waived"] = waivers[q]
    # an isolated probe that comes back under the flag line EXONERATES the
    # query (the full-run flag was neighbor contention, and the evidence
    # is recorded in the entry); windows still accumulate so a recurring
    # in-run-only flag stays visible
    failing = sorted(q for q, v in flagged.items()
                     if v["windows"] >= 2 and q not in waivers
                     and not v.get("isolated_clears", False))
    return {"baseline": f"HEAD:{bench_file}", "drift": norm,
            "normalized_by": how, "flag_threshold": flag,
            "flagged": flagged, "failing": failing,
            "green": not failing}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="sf0.001,sf0.01,sf0.1")
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-alt-config", action="store_true",
                    help="skip the shuffle.partitions=200 + AQE sf0.1 sweep")
    ap.add_argument("--skip-bench", action="store_true",
                    help="skip the fresh bench + regression diff vs the "
                         "last committed BENCH_FULL.json")
    ap.add_argument("--alt-sf", default="sf0.1")
    ap.add_argument("--merge", action="store_true",
                    help="start from the existing GATE.json and re-run only "
                         "the named --sfs tiers into it (post-fix tier "
                         "refresh), keeping every other phase's record. "
                         "Kept records whose stamped commit differs from "
                         "the current tree are listed in merge_stale and "
                         "FORCE all_green=false unless --allow-stale")
    ap.add_argument("--allow-stale", action="store_true",
                    help="merge mode: let kept records from an older "
                         "commit still count toward all_green (recorded "
                         "in the gate as allow_stale=true)")
    ap.add_argument("--commit-artifacts", action="store_true",
                    help="after writing GATE.json, git-commit the gate-"
                         "written artifacts (GATE/BENCH_*/LEAKCHECK/"
                         "COPYCHECK) so claims and evidence share history")
    ap.add_argument("--skip-scale-bench", action="store_true",
                    help="skip the testdata-sf2 bench + regression diff "
                         "vs the last committed BENCH_SF2.json")
    args = ap.parse_args()

    # Checkpoint the record after every phase: a gate killed at the
    # round's wall-clock budget leaves GATE.json.partial instead of
    # nothing (the round-3 "contentless artifact" lesson).
    partial = os.path.join(REPO, "GATE.json.partial")

    def checkpoint(g):
        with open(partial, "w") as f:
            json.dump(g, f, indent=1, sort_keys=True)
            f.write("\n")

    if args.merge:
        with open(os.path.join(REPO, "GATE.json")) as f:
            gate = json.load(f)
        gate["merged_from"] = gate.get("commit_at_write", "unstamped")
        if not args.skip_tests:
            gate.update(stamp(sbt_tests()))
            gate["tests_commit"] = gate.pop("commit")
            checkpoint(gate)
        for sf in args.sfs.split(","):
            rec = stamp(verify_sf(sf))
            tail = os.path.basename(sf.rstrip("/"))
            gate["per_sf"] = [r for r in gate.get("per_sf", [])
                              if os.path.basename(str(r.get("sf", ""))
                                                  .rstrip("/")) != tail]
            gate["per_sf"].append(rec)
            checkpoint(gate)
    else:
        gate = {} if args.skip_tests else sbt_tests()
        if not args.skip_tests:
            gate["tests_commit"] = git_head()
        checkpoint(gate)
        gate["per_sf"] = []
        for sf in args.sfs.split(","):
            gate["per_sf"].append(stamp(verify_sf(sf)))
            checkpoint(gate)
    if not args.skip_alt_config:
        # Partition-count agnosticism proof: the same sweep must hash-match
        # at a cluster-like shuffle.partitions=200 with AQE on (exercises
        # withGlobalRank/withGlobalCumsum/AsOfJoinExec partitioning).
        gate["alt_config"] = stamp(verify_sf(
            args.alt_sf,
            extra_env={"SPARK_GRAFT_SHUFFLE_PARTITIONS": "200",
                       "SPARK_GRAFT_AQE": "true"},
            tag="_alt200aqe"))
        checkpoint(gate)
    if not args.skip_tests:
        gate["rocksdb_twins"] = stamp(rocksdb_twins())
        checkpoint(gate)
    if not args.skip_bench:
        # Run the benches LAST (never concurrent with another Spark JVM —
        # contention inflates times 2-5x) and diff each against its last
        # committed baseline, calibration-normalized.
        gate["bench_regressions"] = stamp(bench_regressions())
        checkpoint(gate)
        sf2_dir = os.path.join(REPO, "testdata-sf2")
        if not args.skip_scale_bench and os.path.isdir(sf2_dir):
            # the scale tier: the three real round-10 findings came from
            # sf2, which the sf0.1 diff structurally cannot see
            gate["bench_regressions_sf2"] = stamp(bench_regressions(
                bench_file="BENCH_SF2.json", sf_dir=sf2_dir,
                record_key="bench_regressions_sf2",
                extra_env={"SPARK_GRAFT_DEADLINE": "3600",
                           "SPARK_GRAFT_WARM_DIR": f"{TESTDATA}/sf0.001"}))
            checkpoint(gate)
    first = next((r for r in gate["per_sf"] if "registry_n" in r), {})
    gate["registry_n"] = first.get("registry_n")
    gate["oracled_n"] = first.get("oracled_n")
    gate["rows_only"] = first.get("rows_only")
    # all_green judges every record PRESENT in the gate (merge mode keeps
    # earlier phases' records, so they stay load-bearing even when their
    # phase was skipped on this invocation) — but a kept record stamped
    # with an OLDER commit than the current tree is evidence about code
    # that no longer exists: merge mode lists those in merge_stale and
    # refuses all_green unless --allow-stale says otherwise.
    head_now = git_head()
    gate["commit_at_write"] = head_now
    if args.merge:
        # FULL-stamp compare (stamp_stale): records kept from a prior
        # invocation are stale when produced at a different commit OR
        # with uncommitted code edits ('+dirty') — git_head is
        # code-scoped, so the gate's own artifact writes can no longer
        # flip the marker, and a dirty-stamped record is evidence about a
        # tree that was never committed.
        stale = []
        for r in gate.get("per_sf", []):
            if stamp_stale(r.get("commit", "unstamped"), head_now):
                stale.append(f"per_sf:{os.path.basename(str(r.get('sf', '?')).rstrip('/'))}")
        for key in ("alt_config", "rocksdb_twins", "bench_regressions",
                    "bench_regressions_sf2"):
            if key in gate and stamp_stale(
                    gate[key].get("commit", "unstamped"), head_now):
                stale.append(key)
        if "tests_green" in gate and stamp_stale(
                gate.get("tests_commit", "unstamped"), head_now):
            stale.append("tests")
        gate["merge_stale"] = sorted(stale)
        gate["allow_stale"] = bool(args.allow_stale)
    green = (gate.get("tests_green", True)
             and gate.get("rocksdb_twins", {}).get("green", True)
             and all(r.get("oracle_fail") == 0
                     for r in gate["per_sf"])
             and gate.get("alt_config",
                          {"oracle_fail": 0})
                 .get("oracle_fail") == 0
             and gate.get("bench_regressions",
                          {"green": True}).get("green", False)
             and gate.get("bench_regressions_sf2",
                          {"green": True}).get("green", False))
    if args.merge and gate.get("merge_stale") and not args.allow_stale:
        print(f"[gate] merge kept stale records {gate['merge_stale']} "
              "(stamped commit != current tree) — forcing all_green=false; "
              "re-run those phases or pass --allow-stale")
        green = False
    gate["all_green"] = green
    # atomic write-back: a gate record can never be half-written, and the
    # phase-checkpoint partial is removed once the real record lands
    path = os.path.join(REPO, "GATE.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(gate, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)
    if os.path.exists(partial):
        os.remove(partial)
    print(f"[gate] wrote {path}: all_green={gate['all_green']}")
    # Artifact atomicity (round-12): the gate's own phases rewrite tracked
    # artifacts, so a finished gate ALWAYS leaves the tree dirty — and two
    # consecutive rounds shipped SURVEY claims citing uncommitted bench
    # numbers. Make the fix mechanical: list what is dirty, and with
    # --commit-artifacts commit exactly those files so the claims and
    # their evidence land in the same history.
    artifacts = [a for a in ("GATE.json", "BENCH_FULL.json", "BENCH_SF1.json",
                             "BENCH_SF2.json", "LEAKCHECK.json",
                             "COPYCHECK.json",
                             "tools/bench_isolated_baseline.json")
                 if subprocess.run(["git", "status", "--porcelain", "--", a],
                                   cwd=REPO, capture_output=True,
                                   text=True).stdout.strip()]
    if artifacts:
        if args.commit_artifacts:
            # add makes first-time artifacts known to git; the PATHSPEC
            # commit then commits EXACTLY these files, so anything the
            # user had staged before the gate ran stays in the index
            # instead of being swept into the artifact commit
            subprocess.run(["git", "add", "--"] + artifacts, cwd=REPO,
                           check=True)
            msg = (f"Commit gate artifacts: all_green={gate['all_green']} "
                   f"({', '.join(artifacts)})")
            subprocess.run(["git", "commit", "-m", msg, "--"] + artifacts,
                           cwd=REPO, check=True)
            print(f"[gate] committed artifacts: {', '.join(artifacts)}")
        else:
            print(f"[gate] DIRTY ARTIFACTS not committed: "
                  f"{', '.join(artifacts)} — commit them with the claims "
                  f"that cite them (or re-run with --commit-artifacts)")
    return 0 if gate["all_green"] else 1


if __name__ == "__main__":
    sys.exit(main())
