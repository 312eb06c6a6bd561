#!/usr/bin/env python3
"""Cross-tier scaling report (dev tool; round-9 "prove it at 10x" tier,
round-10 sf2 tier).

Takes two BENCH_FULL-style json files (the baseline run and the larger
tier's run, ideally from the same host window), divides per-query ratios
by the calibration drift between the runs, and writes the per-query
scaling table into --into (default: the baseline file) under --key
(default "scaling_sf1") so the round artifact carries it.

A query is flagged when its normalized ratio exceeds --flag (default
12x: 10x data x a log factor of headroom; use ~3 for a 2x tier step).
Sub-threshold absolute times are noise-floored: a query that takes
<0.15s at BOTH scales cannot meaningfully flag (measured same-code
noise is +-40-70% there).

Usage: python3 tools/scalediff.py BASE.json SCALED.json
         [--flag 12] [--key scaling_sf1] [--into BENCH_FULL.json]
"""
import json
import sys


def calib(d):
    c = d.get("calibration") or {}
    if c.get("cpu_sec") and c.get("scan_sec"):
        return (c["cpu_sec"] * c["scan_sec"]) ** 0.5
    return c.get("cpu_sec")


def main():
    argv = sys.argv[1:]
    skip = set()
    flag, key, into = 12.0, "scaling_sf1", None
    for i, a in enumerate(argv):
        if a == "--flag":
            flag = float(argv[i + 1]); skip |= {i, i + 1}
        elif a == "--key":
            key = argv[i + 1]; skip |= {i, i + 1}
        elif a == "--into":
            into = argv[i + 1]; skip |= {i, i + 1}
    args = [a for i, a in enumerate(argv)
            if i not in skip and not a.startswith("--")]
    into = into or args[0]
    with open(args[0]) as f:
        base = json.load(f)
    with open(args[1]) as f:
        sf1 = json.load(f)
    bq, nq = base.get("queries", {}), sf1.get("queries", {})
    cb, cn = calib(base), calib(sf1)
    drift = (cn / cb) if (cb and cn) else 1.0
    common = sorted(set(bq) & set(nq))
    scaling = {}
    flagged = []
    for q in common:
        if bq[q] <= 0:
            continue
        r = round(nq[q] / bq[q] / drift, 2)
        scaling[q] = {"base": bq[q], "scaled": nq[q], "ratio_norm": r}
        if r > flag and (bq[q] >= 0.15 or nq[q] >= 0.15 * flag):
            flagged.append((r, q))
    # a flag can carry a waiver from tools/bench_waivers.json (the gate's
    # convention): the flag STAYS in the table — a waiver documents
    # measured isolated/alternating evidence next to it, never hides it
    try:
        import os
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_waivers.json")) as f:
            waivers = json.load(f)
    except (OSError, json.JSONDecodeError):
        waivers = {}
    waived = {q: waivers[q] for _, q in flagged if q in waivers}
    section = {
        "baseline": args[0], "scaled_run": args[1],
        "calib_drift": round(drift, 3), "flag_threshold": flag,
        "flagged": sorted(q for _, q in flagged),
        "waived": waived,
        "queries": scaling,
    }
    with open(into) as f:
        target = json.load(f)
    target[key] = section
    with open(into, "w") as f:
        json.dump(target, f)
        f.write("\n")
    rs = sorted(v["ratio_norm"] for v in scaling.values())
    med = rs[len(rs) // 2] if rs else float("nan")
    print(f"{len(common)} queries; calib drift {drift:.3f}x; "
          f"median normalized scaling {med:.2f}x; flag > {flag}x")
    for r, q in sorted(flagged, reverse=True):
        note = " [WAIVED: see bench_waivers.json]" if q in waived else ""
        print(f"SUPERLINEAR {q}: {scaling[q]['base']:.3f}s -> "
              f"{scaling[q]['scaled']:.3f}s ({r:.2f}x normalized){note}")
    top = sorted(((v["ratio_norm"], q) for q, v in scaling.items()),
                 reverse=True)[:15]
    print("top ratios:", ", ".join(f"{q}={r:.1f}x" for r, q in top))
    print(f"== {len(flagged)} superlinear flag(s) ==")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
