"""Cheap scan-parallelism estimation — no plan->RDD conversion.

``df.rdd.getNumPartitions()`` forces the logical plan through RDD
translation just to read one integer; for the only question the engine
ever asks ("did this arrive under-partitioned from a small file
scan?"), the file listing answers it: Spark's file scan packs/splits
input files into tasks of ~maxPartitionBytes, so the split estimate
from (file count, local file sizes) bounds the scan's parallelism.

Non-file sources (in-memory frames, checkpoints) and remote object
stores return None — callers treat unknown as "already well
partitioned", which is the right default on a real cluster where scans
of large data are split by the source.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _max_partition_bytes(df: DataFrame) -> int:
    raw = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", str(_DEFAULT_MAX_PARTITION_BYTES)
    )
    digits = "".join(ch for ch in str(raw) if ch.isdigit())
    return int(digits) if digits else _DEFAULT_MAX_PARTITION_BYTES


def estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimated partition count of a file-backed DataFrame's scan, or
    None when it cannot be determined without executing the plan (not a
    file scan, or files not on a locally stat-able filesystem)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    max_bytes = _max_partition_bytes(df)
    splits = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        try:
            size = os.path.getsize(u.path)
        except OSError:
            return None
        splits += max(1, math.ceil(size / max_bytes))
    return splits


def _plan_already_repartitions(df: DataFrame) -> bool:
    """True when the frame's own plan contains a repartition/rebalance —
    the file listing then says nothing about its real parallelism, and a
    second spread would be a pure-cost full shuffle."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    return "Repartition" in plan or "Rebalance" in plan


def spread_if_narrow(df: DataFrame, target: int, *keys: str) -> DataFrame:
    """Repartition to ``target`` iff the source scan is provably narrower
    (single/few small files). Unknown-parallelism sources and frames that
    already repartition in-plan pass through untouched — repartitioning
    an already-wide frame would be a pure-cost shuffle of the whole
    relation."""
    if _plan_already_repartitions(df):
        return df
    est = estimated_scan_partitions(df)
    if est is None or est >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
