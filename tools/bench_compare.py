#!/usr/bin/env python3
"""Classify a bench delta as BOX DRIFT vs REGRESSION.

Raw bench totals are not comparable across rounds: the box itself
varies (round 11 measured a UNIFORM 1.38x per-query ratio against the
round-9 artifact, including trivial scans with untouched plans). The
per-query MIN-of-two absorbs transient load but not a slower CPU
allocation. The stable signal is the SHAPE of the per-query ratio
distribution:

  - uniform ratio across unrelated queries  -> box drift, ignore
  - localized ratio on specific queries     -> a real plan/code change

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts either a raw Bench JSON line ({"metric": ..., "queries": ...})
or a driver BENCH_r*.json wrapper (queries regex-recovered from its
truncated `tail`). Flags queries whose ratio exceeds
median * threshold (default 1.25 -- the documented per-query noise
class on one box, scaled by the measured box factor).
"""
import json
import re
import statistics
import sys


def load_queries(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    if "tail" in d:  # driver artifact: truncated fragment, regex-recover
        # demand a trailing delimiter after the number: a match that
        # abuts the end of the tail may have had its digits cut at the
        # truncation boundary ("3.47" -> "3.4"), silently skewing that
        # query's ratio
        pairs = re.findall(r'"((?:q|img)[^"]+)":([0-9.]+)(?=[,}\]])', d["tail"])
        return {k: float(v) for k, v in pairs}
    raise SystemExit(f"{path}: no queries found")


def main() -> int:
    old = load_queries(sys.argv[1])
    new = load_queries(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    if len(ratios) < 2:
        raise SystemExit(f"only {len(ratios)} comparable queries — "
                         "too few for a distribution verdict")
    med = statistics.median(ratios.values())
    qs = statistics.quantiles(ratios.values(), n=10)
    p10, p90 = qs[0], qs[8]
    print(f"common={len(common)} median_ratio={med:.2f} p10={p10:.2f} p90={p90:.2f}")
    print(f"box factor (median) {med:.2f} -- ratios are judged RELATIVE to it")
    # flag only when BOTH the relative ratio exceeds the box-adjusted
    # threshold AND the excess over the box-adjusted expectation is
    # material in absolute seconds -- sub-second queries ride a fixed
    # per-query overhead whose jitter dominates their ratios
    flagged = {k: r for k, r in ratios.items()
               if r > med * threshold and (new[k] - old[k] * med) > 0.3}
    if not flagged:
        print(f"no query exceeds median*{threshold} by >0.3s absolute: "
              "delta is UNIFORM -> box drift")
        return 0
    print(f"LOCALIZED deltas (ratio > median*{threshold}, excess > 0.3s) -- investigate:")
    for k, r in sorted(flagged.items(), key=lambda x: -x[1]):
        print(f"  {r:5.2f}x  {k}  {old[k]:.2f}s -> {new[k]:.2f}s "
              f"(excess {new[k] - old[k] * med:+.2f}s)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
