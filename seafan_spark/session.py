"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design target, testable on local[N]:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast conversion).
- Arrow on (vectorized Python<->JVM transfer for the few pandas-UDF paths).
- ``spark.sql.shuffle.partitions`` sized from the env (the driver runs
  local[$SPARK_GRAFT_CPUS]); on a real cluster you would leave AQE to
  coalesce from a large initial value instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "seafan_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) reads
        # as bigint nanoseconds instead of erroring
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode: all task threads share the driver JVM heap. 8g
        # measured best for the bench workload — larger heaps made the
        # inter-query full GCs (bench hygiene) disproportionately slow.
        # On a real cluster this is spark.executor.memory territory.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # pin the initial heap to the max and pre-touch it: adaptive heap
        # growth + lazy page commit made identical bench processes differ
        # 30-40% on individual queries (run-level, not trial-level, noise)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g')} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
