"""No-change bench-drift gate (round-6 VERDICT #8).

Compares two bench artifacts (``BENCH_detail.json`` shape: full per-query
steady medians, or a ``BENCH_r{N}.json`` driver record whose ``parsed``
block holds the 20 slowest) and FAILS when identical (or
intended-identical) code drifted more than the measured noise floor:

    total drift   > 5%                     -> fail
    per-query     > 15% AND > 0.3s abs     -> fail (floor masks sub-second
                                              JIT jitter — round-5 noise
                                              study: ~3/4 of queries stay
                                              within 15%, run-level JIT/heap
                                              mode shifts small queries 1.5x)

Usage:
    python scripts/bench_drift.py OLD.json NEW.json [--max-total PCT]
        [--max-query PCT] [--abs-floor SEC]

Exit 0 = within tolerance, 1 = drift, 2 = unusable inputs.
Only queries present in BOTH artifacts are compared (the registry grows
every round); the total is recomputed over the common set so growth
doesn't read as drift.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    # driver record: {"parsed": {"queries": {...}}}; detail/stdout record:
    # {"queries": {...}}
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries")
    if not isinstance(qs, dict) or not qs:
        raise ValueError(f"{path}: no per-query medians found")
    return {k: float(v) for k, v in qs.items()}


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--max-total", type=float, default=5.0, help="total drift %%")
    ap.add_argument("--max-query", type=float, default=15.0, help="per-query drift %%")
    ap.add_argument(
        "--abs-floor", type=float, default=0.3,
        help="ignore per-query drift below this many seconds absolute",
    )
    args = ap.parse_args(argv)
    try:
        old, new = load_queries(args.old), load_queries(args.new)
    except (OSError, ValueError, json.JSONDecodeError) as exc:
        print(f"bench_drift: {exc}", file=sys.stderr)
        return 2
    common = sorted(set(old) & set(new))
    if not common:
        print("bench_drift: no common queries", file=sys.stderr)
        return 2
    to, tn = sum(old[q] for q in common), sum(new[q] for q in common)
    total_pct = 100.0 * (tn - to) / to if to else 0.0
    bad = []
    for q in common:
        o, n = old[q], new[q]
        if o <= 0:
            continue
        pct = 100.0 * (n - o) / o
        if abs(pct) > args.max_query and abs(n - o) > args.abs_floor:
            bad.append((q, o, n, pct))
    bad.sort(key=lambda t: -abs(t[3]))
    print(
        f"common={len(common)} total {to:.1f}s -> {tn:.1f}s "
        f"({total_pct:+.1f}%, gate ±{args.max_total}%)"
    )
    for q, o, n, pct in bad:
        print(f"  DRIFT {q}: {o:.2f}s -> {n:.2f}s ({pct:+.0f}%)")
    ok = abs(total_pct) <= args.max_total and not bad
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
