"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full evaluation with a checksum aggregate over every
output column (column pruning cannot skip computed columns), so timings
reflect real work, not plan construction.

Measurement protocol — every query runs FOUR times at the bench SF:

- run 1 ("queries_fresh" in BENCH_detail.json): pays the one-time costs of
  a never-seen plan shape — janino source generation and JVM JIT of the
  generated classes. Instrumented runs show this dominates the heaviest
  queries' first execution (e.g. 8s of compiler-thread time on a 4s
  query), and a small-SF warmup cannot absorb it because AQE picks
  different physical shapes at the bench SF.
- runs 2-4 ("queries", median of the 3, summed into "value"): steady-state
  compute — the cost a recurring production run pays, and the number that
  extrapolates to a long-running cluster where one-time JIT amortizes to
  zero. The MEDIAN of 3 trials is reported because a single trial was
  measured ×2.4 noisy on identical code (round 3 vs round 4); medians make
  round-over-round per-query deltas a usable regression gate (<15% drift
  on a no-change rerun).

The printed line is kept under the driver's 2,000-char stdout tail (total +
the 20 slowest 2-dp medians only) so the bounded capture stores and parses
it whole; the full per-trial record — fresh timings, all steady trials, all
medians — is written to BENCH_detail.json at the repo root.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from seafan_spark.session import cleanup as session_cleanup
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
    # local-iteration subset (comma-separated names); the driver never sets
    # this — full-registry runs stay the default
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        unknown = keep - set(qs)
        if unknown:
            raise SystemExit(f"bench: unknown query name(s) {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in keep}
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
                  "sort_rank", "kcenter", "mmr"):
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

    # Per-cleanup blocking JVM full GCs (4 per query, ~340 per run over a
    # pre-touched 8g heap) measured SLOWER in total (~8%) and no stabler
    # than letting G1 run incrementally — off by default, knob retained.
    jvm_gc = os.environ.get("SPARK_GRAFT_BENCH_JVMGC", "0") == "1"

    def cleanup() -> None:
        # isolate queries: drop cached blocks / checkpoint RDDs / broadcasts
        # the query left behind so later timings don't pay its GC bill
        # (cleanup itself is outside the timed region). session_cleanup
        # frees ESCAPED localCheckpoint blocks too — without it, unchanged
        # late-registry queries measured up to x3 slower as dead blocks
        # from ~100 earlier queries accumulated in the shared heap (r05).
        session_cleanup(spark, all=True)
        gc.collect()
        if jvm_gc:
            spark.sparkContext._jvm.System.gc()
        # ContextCleaner releases checkpoint/broadcast blocks async — give
        # it a beat so cleanup doesn't overlap the next timed query
        time.sleep(0.3)

    steady_trials_n = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    load_start = os.getloadavg()  # machine-load evidence for drift triage
    timings: dict[str, float] = {}
    fresh: dict[str, float] = {}
    steady_trials: dict[str, list[float]] = {}
    for name, fn in qs.items():
        # run 1: fresh plan shape — includes one-time codegen + JIT
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        fresh[name] = round(time.perf_counter() - t0, 4)
        cleanup()
        # runs 2..4: steady state — report the median (single trials were
        # measured ×2.4 noisy on identical code; medians gate regressions)
        trials = []
        for _ in range(steady_trials_n):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            trials.append(round(time.perf_counter() - t0, 4))
            cleanup()
        steady_trials[name] = trials
        timings[name] = round(statistics.median(trials), 4)

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    repo = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(repo, "BENCH_detail.json")

    # trial-spread summary: per-query relative spread (max-min)/median
    # over the steady trials — run-level noise evidence that travels WITH
    # the artifact (round-8 VERDICT #2: drift triage needs the spread in
    # the JSON, not re-derived by hand each round)
    spreads = sorted(
        100.0 * (max(ts) - min(ts)) / med
        for name, ts in steady_trials.items()
        for med in [timings[name]]
        if med > 0
    )
    trial_spread = {
        "median_rel_spread_pct": round(statistics.median(spreads), 1) if spreads else None,
        "p90_rel_spread_pct": round(spreads[int(0.9 * (len(spreads) - 1))], 1) if spreads else None,
        "n_spread_gt_15pct": sum(1 for s in spreads if s > 15.0),
    }

    # committed-vs-run drift gate: compare against the artifact this run
    # is ABOUT to overwrite (when launched from a clean tree that is the
    # committed record) and embed the verdict — one-directional exceeders
    # + elevated load here is the machine-load signature, adjudicated in
    # the artifact instead of by hand (scripts/bench_drift.py)
    drift_gate = {"verdict": "no-prior"}
    try:
        sys.path.insert(0, os.path.join(repo, "scripts"))
        import bench_drift

        prior = bench_drift.load_artifact(detail_path)
        prior_q = {k: float(v) for k, v in (prior.get("queries") or {}).items()}
        if prior_q and prior.get("sf") == sf_val:
            drift_gate = bench_drift.gate_queries(prior_q, timings)
            drift_gate["prior_loadavg_start"] = prior.get("loadavg_start")
    except Exception as exc:  # a broken prior artifact must not kill the run
        drift_gate = {"verdict": f"prior-unreadable: {exc}"}

    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "seafan_spark headline queries: full per-trial record",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_fresh": fresh,
                "queries_steady_trials": steady_trials,
                "steady_trials_per_query": steady_trials_n,
                "trial_spread": trial_spread,
                "drift_gate": drift_gate,
                "sf": sf_val,
                # 1/5/15-min load averages at start and end: a broad
                # one-directional per-query drift on identical code with
                # elevated load here is the machine-load signature, not a
                # regression (round-6/7 lesson; scripts/bench_drift.py)
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            },
            fh,
            indent=1,
        )
    # ONE compact line on stdout. The driver's capture is the LAST 2,000
    # chars of stdout; at 146 queries even 2-dp medians overflow that
    # (r01-r05 all recorded "parsed": null tails), so print only the 20
    # slowest medians + the total — the full record is BENCH_detail.json.
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    if drift_gate.get("common"):
        drift_str = (
            f"{drift_gate['verdict']} {drift_gate['total_pct']:+.1f}% vs "
            f"{drift_gate['total_old']:.1f}s prior "
            f"({drift_gate['slower']}slow/{drift_gate['faster']}fast"
            f"{', ONE-DIRECTIONAL' if drift_gate['one_directional'] else ''})"
        )
    else:
        drift_str = drift_gate.get("verdict", "no-prior")
    print(
        json.dumps(
            {
                "metric": (
                    f"steady-state sec, median of {steady_trials_n}, total over "
                    f"{len(timings)} queries; 20 slowest shown, all medians + "
                    "per-trial record in BENCH_detail.json"
                ),
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in top.items()},
                "sf": sf_val,
                "loadavg_1m": [round(load_start[0], 2), round(os.getloadavg()[0], 2)],
                "drift_vs_committed": drift_str,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
