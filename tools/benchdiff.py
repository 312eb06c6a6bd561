#!/usr/bin/env python3
"""Throttle-normalized cross-round bench comparison (dev tool only).

The host's CPU throttle swings bench totals by +-40% between runs
(documented in SURVEY's bench note), which blinds naive cross-round
per-query diffs. Bench.scala therefore times two fixed calibration
probes (pure-CPU range reduction; lineitem scan+agg) in the same
min-of-2 window as the queries and publishes them in BENCH_FULL.json's
"calibration" field. This script divides every per-query ratio by the
calibration ratio, canceling the host drift, and flags what remains.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [--flag 1.35]

Accepts BENCH_FULL.json (preferred: full registry + calibration) or a
driver BENCH_r{N}.json (machine line; may lack calibration). When either
side lacks calibration, falls back to normalizing by the MEDIAN
per-query ratio — the judge's own method, valid because a throttle
shifts every query, while a real regression shifts few.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries") or {}
    cal = d.get("calibration")
    if cal is None and "calib_cpu" in d:
        cal = {"cpu_sec": d["calib_cpu"], "scan_sec": d.get("calib_scan")}
    return qs, cal


def compare(old_qc, new_qc, flag=1.35):
    """Calibration-normalized per-query comparison.

    `old_qc`/`new_qc` are (queries, calibration) pairs as returned by
    [[load]]. Returns (norm, how, flagged) where flagged is
    {query: {"old": s, "new": s, "ratio_norm": r}} for every query whose
    normalized ratio exceeds `flag`. Importable by tools/gate.py — the
    gate's bench_regressions record runs THIS logic, not a copy."""
    old_q, old_c = old_qc
    new_q, new_c = new_qc
    common = sorted(set(old_q) & set(new_q))
    if not common:
        return None, "no common queries", {}
    ratios = {q: new_q[q] / old_q[q] for q in common if old_q[q] > 0}
    if old_c and new_c and old_c.get("cpu_sec") and new_c.get("cpu_sec"):
        # calibration-normalized: scan probe covers I/O-bound queries, cpu
        # probe covers compute-bound ones; use their geometric mean as the
        # single host-drift factor (both move together under throttle)
        oc = (old_c["cpu_sec"] * old_c["scan_sec"]) ** 0.5 \
            if old_c.get("scan_sec") else old_c["cpu_sec"]
        nc = (new_c["cpu_sec"] * new_c["scan_sec"]) ** 0.5 \
            if new_c.get("scan_sec") else new_c["cpu_sec"]
        norm = nc / oc
        how = f"calibration (host drift {norm:.3f}x)"
    else:
        norm = statistics.median(ratios.values())
        how = (f"median-of-ratios fallback (drift {norm:.3f}x)"
               " — no calibration on one side")
    flagged = {q: {"old": old_q[q], "new": new_q[q], "ratio_norm": r / norm}
               for q, r in ratios.items() if r / norm > flag}
    return norm, how, flagged


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag = 1.35
    for i, a in enumerate(sys.argv):
        if a == "--flag":
            flag = float(sys.argv[i + 1])
    old_qc = load(args[0])
    new_qc = load(args[1])
    norm, how, flagged_d = compare(old_qc, new_qc, flag)
    if norm is None:
        print("no common queries"); sys.exit(2)
    old_q, new_q = old_qc[0], new_qc[0]
    common = sorted(set(old_q) & set(new_q))
    ratios = {q: new_q[q] / old_q[q] for q in common if old_q[q] > 0}
    print(f"normalizing by {how}; {len(common)} common queries; flag > {flag}x")
    flagged = [(v["ratio_norm"], q, v["old"], v["new"])
               for q, v in flagged_d.items()]
    for adj, q, o, n in sorted(flagged, reverse=True):
        print(f"REGRESSION {q}: {o:.3f}s -> {n:.3f}s ({adj:.2f}x normalized)")
    improved = sorted((r / norm, q) for q, r in ratios.items() if r / norm < 1 / flag)
    for adj, q in improved[:10]:
        print(f"improved   {q}: {adj:.2f}x normalized")
    print(f"== {len(flagged)} regression(s) flagged ==")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
