"""Measure the documented scale mitigations as the RUNNING configuration
(round-7 VERDICT #1) instead of leaving them as footnotes:

1. ``ngram_jaccard_prefix`` with the ``max_df`` cap ENGAGED at 10x.
   The 10x corpus saturates its 31-word/language gram space (29,791 =
   31^3 grams, df p50=87 / max=129 vs sf0.1's max=25), so the posting
   lists grow ~10x and the candidate relation is inherently quadratic
   there (SCALING.md measured e_big 1.225 uncapped). A FIXED absolute
   cap engages progressively as the corpus grows — no-op at sf0.1,
   pruning the hottest posting lists at 10x — which is exactly the
   documented remedy. We record the capped exponent AND the recall
   price (pairs lost vs uncapped at 10x).

2. ``semantic_dedup`` with the new adaptive DEFAULT
   (``n_clusters=None`` -> ~sqrt(N), dedup.adaptive_n_clusters): the
   oracled query pins k=8 for its deterministic DuckDB twin and
   measured e_big 1.15 (cluster populations grow 10x -> within-cluster
   pairs ~100x); the default a user gets should be the linear path.

Methodology = scaling_curve.py's: one session, untimed warmup at
sf0.001, per scale one untimed fresh run then --trials timed steady
runs, median reported, cleanup(all=True) between runs, scales
smallest-first.

Usage:
    python scripts/make_scaling_corpus.py              # once
    python scripts/scaling_mitigations.py [--trials 2]
Writes scaling_mitigations.json; paste the table into SCALING.md.
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force
from seafan_spark.session import cleanup as session_cleanup
from seafan_spark.session import get_session
from seafan_spark.sources import parquet_to_pipe

NGRAM_CAP = 90  # engages at 10x (df p50=87), no-op at sf0.1 (max df 25)


def _docs(spark, sf_dir):
    return parquet_to_pipe(spark, f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return parquet_to_pipe(spark, f"{sf_dir}/embeddings.parquet")


def ngram_capped(spark, sf_dir, max_df=NGRAM_CAP):
    from seafan_spark.llmops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", "text",
        n=3, threshold=0.3, max_df=max_df, method="prefix",
    )


def ngram_uncapped(spark, sf_dir):
    # max_df=1000 never engages on either corpus (max df 129 at 10x):
    # this IS the SCALING.md baseline configuration
    return ngram_capped(spark, sf_dir, max_df=1000)


def semantic_default(spark, sf_dir):
    from seafan_spark.llmops.dedup import semantic_dedup

    # n_clusters omitted -> adaptive ~sqrt(N); kmeans = the scale path.
    # eps matches the oracled query so keep rates are comparable.
    return semantic_dedup(
        _emb(spark, sf_dir), "vec_id", "embedding", eps=0.42, dim=64
    )


def ann_lsh_adaptive(spark, sf_dir):
    from seafan_spark.llmops.similarity import ann_lsh_topk

    # planes omitted -> adaptive ~log2(N/16) (round-8 fix: the oracled
    # query pins planes=8, which measured e_big 1.58 at 10x — candidate
    # volume N^2/2^planes is quadratic at any FIXED plane count)
    return ann_lsh_topk(_emb(spark, sf_dir), "vec_id", "embedding", k=5, dim=64)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--big", default="/tmp/seafan_scaling/sf1")
    ap.add_argument("--json", default="scaling_mitigations.json")
    args = ap.parse_args()
    if not os.path.isdir(args.big):
        raise SystemExit(f"{args.big} missing — run scripts/make_scaling_corpus.py")

    spark = get_session("seafan-scaling-mitigations")
    spark.sparkContext.setLogLevel("ERROR")

    def cleanup() -> None:
        session_cleanup(spark, all=True)
        gc.collect()
        time.sleep(0.3)

    variants = {
        "ngram_prefix_capped": ngram_capped,
        "ngram_prefix_uncapped": ngram_uncapped,
        "semantic_dedup_default": semantic_default,
        "ann_lsh_adaptive": ann_lsh_adaptive,
    }
    for fn in variants.values():  # warmup: codegen+JIT per plan shape
        force(fn(spark, "/root/testdata/sf0.001"))
        cleanup()

    scales = [("sf0.1", "/root/testdata/sf0.1"), ("10x", args.big)]
    results: dict[str, dict[str, float]] = {n: {} for n in variants}
    rows_out: dict[str, dict[str, int]] = {n: {} for n in variants}
    for label, sf_dir in scales:
        for n, fn in variants.items():
            force(fn(spark, sf_dir))  # fresh, untimed (codegen/JIT/AQE)
            rows_out[n][label] = fn(spark, sf_dir).count()
            cleanup()
            trials = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                trials.append(time.perf_counter() - t0)
                cleanup()
            results[n][label] = round(statistics.median(trials), 4)
            print(f"{label:7s} {n:24s} {results[n][label]:8.2f}s "
                  f"rows={rows_out[n][label]}", flush=True)

    out = {"cap": NGRAM_CAP, "trials": args.trials, "queries": {}}
    for n in variants:
        t_m, t_b = results[n]["sf0.1"], results[n]["10x"]
        e = round(math.log10(t_b / t_m), 3) if t_m and t_b else None
        out["queries"][n] = {
            "sf0.1": t_m, "10x": t_b, "exp_big": e,
            "rows_sf0.1": rows_out[n]["sf0.1"], "rows_10x": rows_out[n]["10x"],
        }
    u, c = rows_out["ngram_prefix_uncapped"]["10x"], rows_out["ngram_prefix_capped"]["10x"]
    out["ngram_recall_cost_10x"] = {
        "uncapped_pairs": u, "capped_pairs": c,
        "pairs_lost_frac": round((u - c) / u, 4) if u else None,
    }
    with open(args.json, "w") as fh:
        json.dump(out, fh, indent=1, allow_nan=False)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
