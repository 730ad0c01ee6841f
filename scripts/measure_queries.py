"""Per-query optimization measurement harness (guide §1).

For each named query (default: all), in bench-identical session/state:

- t_build: seconds to call the query fn (plan construction + any eager
  guard/checkpoint jobs it runs)
- t_force: seconds for the bench checksum action
- jobs:    Spark jobs launched across build+force (DAGScheduler nextJobId
  delta) — driver round-trips are the dominant local-mode overhead
- plan:    .explain("formatted") written to plans/r10/<name>_<tag>.txt

Usage: python scripts/measure_queries.py [--tag before|after] [--plans]
           [--trials N] [query ...]
Writes a JSON summary to /tmp/measure_<tag>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from seafan_spark.session import cleanup as session_cleanup
from seafan_spark.session import get_session


def force(df) -> int:
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    row = df.select(F.sum(F.pmod(h, F.lit(1_000_000_007))).alias("chk")).collect()
    return int(row[0]["chk"] or 0)


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    plans = False
    trials = 3
    names = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--plans":
            plans = True
        elif a == "--trials":
            trials = int(next(it))
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("seafan-measure")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    dag = sc._jsc.sc().dagScheduler()

    qs = entrymod.queries()
    if names:
        unknown = set(names) - set(qs)
        if unknown:
            raise SystemExit(f"unknown: {sorted(unknown)}")
        qs = {k: qs[k] for k in names}

    # same warmup as bench.py so codegen/JIT is paid before timing
    warm_dir = "/root/testdata/sf0.001"
    allq = entrymod.queries()
    for wname in ("join_3way", "window_cume", "simhash_pairs", "minhash_pairs",
                  "minhash_pairs_fast", "multimodal", "model_glm", "describe",
                  "ks", "decile", "marginal", "ngram_jaccard", "irr_by",
                  "ann_ivf", "winnow", "minhash_incr", "minhash_clusters",
                  "sort_rank", "kcenter", "mmr"):
        try:
            force(allq[wname](spark, warm_dir))
        except Exception:
            pass
        spark.catalog.clearCache()
    from seafan_spark.sources import read_parquet
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        try:
            force(read_parquet(spark, f"{sf_dir}/{t}.parquet"))
        except Exception:
            pass

    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r11")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name, fn in qs.items():
        sc.setJobDescription(f"measure:{name}")
        # fresh run (not recorded) to stabilize codegen for this plan shape
        try:
            force(fn(spark, sf_dir))
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
            continue
        session_cleanup(spark, all=True)
        time.sleep(0.2)
        builds, forces, jobss = [], [], []
        for _ in range(trials):
            j0 = dag.nextJobId()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            j1 = dag.nextJobId()
            builds.append(t1 - t0)
            forces.append(t2 - t1)
            jobss.append(j1 - j0)
            session_cleanup(spark, all=True)
            time.sleep(0.2)
        if plans:
            try:
                df = fn(spark, sf_dir)
                p = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import contextlib, io
                buf = io.StringIO()
                df = fn(spark, sf_dir)
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                p = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(p)
            session_cleanup(spark, all=True)
        out[name] = {
            "build": round(statistics.median(builds), 3),
            "force": round(statistics.median(forces), 3),
            "total": round(statistics.median(builds) + statistics.median(forces), 3),
            "jobs": int(statistics.median(jobss)),
        }
        print(f"{name}: {out[name]}", flush=True)
    with open(f"/tmp/measure_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"n": len(out), "tag": tag}))


if __name__ == "__main__":
    main()
