"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "queries_fresh": {...}, "sf": ...}

Each query is forced to full evaluation with a checksum aggregate over every
output column (column pruning cannot skip computed columns), so timings
reflect real work, not plan construction.

Measurement protocol — every query runs TWICE at the bench SF:

- run 1 ("queries_fresh"): pays the one-time costs of a never-seen plan
  shape — janino source generation and JVM JIT of the generated classes.
  Instrumented runs show this dominates the heaviest queries' first
  execution (e.g. 8s of compiler-thread time on a 4s query), and a
  small-SF warmup cannot absorb it because AQE picks different physical
  shapes at the bench SF.
- run 2 ("queries", summed into "value"): steady-state compute — the cost
  a recurring production run pays, and the number that extrapolates to a
  long-running cluster where one-time JIT amortizes to zero.

Both are reported so neither story hides the other; round-over-round
comparisons should use like-for-like fields.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from seafan_spark.session import get_session


def force(df) -> int:
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    row = df.select(F.sum(F.pmod(h, F.lit(1_000_000_007))).alias("chk")).collect()
    return int(row[0]["chk"] or 0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("seafan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Warmup (untimed): run a codegen-diverse set at the smallest SF so
    # whole-stage-codegen JIT, Arrow/pandas-UDF workers, MLlib, and window
    # paths are compiled before anything is timed — mirrors steady-state
    # cluster behavior instead of charging the first heavy query ~10s of
    # one-time JIT.
    warm_dir = "/root/testdata/sf0.001"
    for wname in ("join_3way", "window_cume", "simhash_pairs", "minhash_pairs",
                  "minhash_pairs_fast", "multimodal", "model_glm", "describe",
                  "ks", "decile", "marginal", "ngram_jaccard", "irr_by",
                  "ann_ivf", "winnow", "minhash_incr", "minhash_clusters",
                  "sort_rank"):
        try:
            force(qs[wname](spark, warm_dir))
        except Exception:
            pass
        spark.catalog.clearCache()
    # touch the bench tables once so footer caches + OS page cache are warm
    # (timed queries measure compute, not first-read disk I/O)
    from seafan_spark.sources import read_parquet

    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        try:
            force(read_parquet(spark, f"{sf_dir}/{t}.parquet"))
        except Exception:
            pass
    gc.collect()
    spark.sparkContext._jvm.System.gc()

    def cleanup() -> None:
        # isolate queries: drop cached blocks / checkpoint RDDs / broadcasts
        # the query left behind so later timings don't pay its GC bill;
        # the explicit JVM full GC keeps one query's garbage from inflating
        # its neighbors (cleanup itself is outside the timed region)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        # ContextCleaner releases checkpoint/broadcast blocks async — give
        # it a beat so cleanup doesn't overlap the next timed query
        time.sleep(0.3)

    timings: dict[str, float] = {}
    fresh: dict[str, float] = {}
    for name, fn in qs.items():
        # run 1: fresh plan shape — includes one-time codegen + JIT
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        fresh[name] = round(time.perf_counter() - t0, 4)
        cleanup()
        # run 2: steady state — the recurring production cost
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        cleanup()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "seafan_spark headline queries, steady-state wall clock (fresh-plan timings in queries_fresh)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_fresh": fresh,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
