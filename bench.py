"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full evaluation with a checksum aggregate over every
output column (column pruning cannot skip computed columns), so timings
reflect real work, not plan construction.
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
    # warm the JVM + parquet footer caches with the cheapest query
    force(qs["join_3way"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        # isolate queries: drop cached blocks / checkpoint RDDs / broadcasts
        # the query left behind so later timings don't pay its GC bill
        # (cleanup itself is outside the timed region)
        spark.catalog.clearCache()
        gc.collect()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "seafan_spark headline queries, end-to-end wall clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
