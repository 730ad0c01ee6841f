"""Measured scaling curve for the heaviest bench queries (round-6
VERDICT #1): run each query at sf0.01 / sf0.1 / the synthesized 10x
corpus (scripts/make_scaling_corpus.py) and record the per-query
scaling EXPONENT — slope of log(time) vs log(scale) — so a
super-linear term (candidate-pair blowup in gram joins, band-collision
skew) shows up as a number instead of hiding behind a single-SF bench
point.

Methodology = bench.py's (see its module docstring): one session,
untimed codegen-diverse warmup at sf0.001, per SF one untimed fresh run
(JIT + AQE reshape) then TRIALS timed steady runs, median reported,
cleanup(all=True) between runs. SFs are run smallest-first so each
query's 10x run never pays first-compile costs.

The reported exponent is the BIG leg, log10(t_10x / t_sf0.1): the small
leg is floor-dominated (session overhead ~0.2-0.4s per query swamps
sf0.01 compute) and would read as sub-linear for everything.

Usage:
    python scripts/make_scaling_corpus.py            # once
    python scripts/scaling_curve.py [--trials 2] [--out SCALING.md]
        [--queries a,b,c] [--big /tmp/seafan_scaling/sf1]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import force
from seafan_spark.session import cleanup as session_cleanup
from seafan_spark.session import get_session

# the 20 slowest steady medians of BENCH_r06 — the queries whose scale
# behavior carries the 100 TB claims
DEFAULT_QUERIES = [
    "leakage_split", "model_nn", "pagerank", "minhash_clusters",
    "minhash_pairs", "mmr", "minhash_pairs_fast", "profile_diff",
    "semantic_dedup", "bootstrap", "simhash_pairs", "marginal",
    "ngram_jaccard_prefix", "semantic_dedup_incr", "kcenter", "ann_pq",
    "profile", "embed_incr", "simhash_pairs_fast", "minhash_incr",
]

WARMUP = [
    "join_3way", "window_cume", "simhash_pairs", "minhash_pairs",
    "minhash_pairs_fast", "multimodal", "model_glm", "describe", "marginal",
    "ngram_jaccard", "ann_ivf", "minhash_incr", "minhash_clusters",
    "kcenter", "mmr",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--big", default="/tmp/seafan_scaling/sf1")
    ap.add_argument("--out", default=None, help="render SCALING.md here")
    ap.add_argument("--json", default="scaling_results.json")
    args = ap.parse_args()
    names = [s.strip() for s in args.queries.split(",") if s.strip()]
    qs = entrymod.queries()
    unknown = set(names) - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")
    scales = [("sf0.01", "/root/testdata/sf0.01", 0.1),
              ("sf0.1", "/root/testdata/sf0.1", 1.0),
              ("10x", args.big, 10.0)]
    if not os.path.isdir(args.big):
        raise SystemExit(f"{args.big} missing — run scripts/make_scaling_corpus.py")

    spark = get_session("seafan-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def cleanup() -> None:
        session_cleanup(spark, all=True)
        gc.collect()
        time.sleep(0.3)

    for w in WARMUP:
        try:
            force(qs[w](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
        spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for label, sf_dir, _rel in scales:
        # touch tables once: timings measure compute, not first-read I/O
        from seafan_spark.sources import read_parquet

        for t in ("lineitem", "orders", "events", "documents", "embeddings"):
            try:
                force(read_parquet(spark, f"{sf_dir}/{t}.parquet"))
            except Exception:
                pass
        cleanup()
        for n in names:
            fn = qs[n]
            try:
                force(fn(spark, sf_dir))  # fresh: untimed (JIT/AQE reshape)
            except Exception as exc:  # noqa: BLE001
                print(f"ERR {n} @ {label}: {exc}", file=sys.stderr)
                # None, not float('nan'): json.dump emits a bare NaN
                # token for nan — invalid strict JSON (round-7 ADVICE)
                results[n][label] = None
                continue
            cleanup()
            trials = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                trials.append(time.perf_counter() - t0)
                cleanup()
            results[n][label] = round(statistics.median(trials), 4)
            print(f"{label:7s} {n:22s} {results[n][label]:8.2f}s", flush=True)

    import math

    rows = []
    for n in names:
        t_s, t_m, t_b = (results[n].get(k) for k in ("sf0.01", "sf0.1", "10x"))
        e_small = (
            round(math.log10(t_m / t_s), 3) if t_s and t_m and t_s > 0 else None
        )
        e_big = (
            round(math.log10(t_b / t_m), 3) if t_m and t_b and t_m > 0 else None
        )
        rows.append((n, t_s, t_m, t_b, e_small, e_big))
    rows.sort(key=lambda r: -(r[5] or 0))
    with open(args.json, "w") as fh:
        json.dump(
            {
                "queries": {
                    n: {"sf0.01": a, "sf0.1": b, "10x": c,
                        "exp_small": d, "exp_big": e}
                    for n, a, b, c, d, e in rows
                },
                "trials": args.trials,
                "big_dir": args.big,
            },
            fh,
            indent=1,
            allow_nan=False,
        )
    print(f"\n{'query':22s} {'sf0.01':>8s} {'sf0.1':>8s} {'10x':>8s} "
          f"{'e_small':>8s} {'e_big':>7s}")
    for n, a, b, c, d, e in rows:
        flag = "  <-- SUPER-LINEAR" if (e or 0) > 1.3 else ""
        fa, fb, fc = (f"{v:8.2f}" if v is not None else f"{'ERR':>8s}"
                      for v in (a, b, c))
        print(f"{n:22s} {fa} {fb} {fc} "
              f"{d if d is not None else '':>8} {e if e is not None else '':>7}{flag}")


if __name__ == "__main__":
    main()
