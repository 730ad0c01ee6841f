"""Distributed global ranking — no single-partition sort.

An unpartitioned ``Window.orderBy`` funnels every row through ONE task,
the canonical scale killer. The standard scalable alternative implemented
here: range-repartition on the sort key (each partition holds a contiguous
key range, ascending with partition id), rank rows *within* each partition,
and add the driver-computed cumulative row-count offset of the preceding
partitions. Both passes are fully parallel; the only driver-side data is
one (partition_id, count) row per shuffle partition, and the second job
reuses the first's shuffle files (stage skipping).

Used by diagnostics that need exact quantile buckets (decile/marginal —
reference diags.go:354-473, 592-731) with NTILE-identical assignment, so
the DuckDB oracle parity of the single-partition form is preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OrderKeys = list[tuple[str, bool]]  # (column, ascending)


def _order_cols(order: OrderKeys) -> list[Column]:
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]


def global_row_number(
    df: DataFrame, order: OrderKeys, out: str = "_grn"
) -> tuple[DataFrame, int]:
    """Attach an exact 1-based global row number under ``order`` without a
    single-partition sort. Returns (df_with_rank, total_rows).

    ``order`` should be a total order (include tiebreak columns) for a
    deterministic result — same contract as any rank over ties.
    """
    cols = _order_cols(order)
    d = df.repartitionByRange(*cols).withColumn("_gpid", F.spark_partition_id())
    counts = {
        r["_gpid"]: r["cnt"]
        for r in d.groupBy("_gpid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    if not counts:
        return df.withColumn(out, F.lit(None).cast("long")), 0
    acc = 0
    pairs: list[Column] = []
    for pid in sorted(counts):
        pairs.append(F.lit(pid))
        pairs.append(F.lit(acc))
        acc += counts[pid]
    omap = F.create_map(*pairs)
    w = Window.partitionBy("_gpid").orderBy(*cols)
    d = d.withColumn(out, (F.row_number().over(w) + omap[F.col("_gpid")]).cast("long"))
    return d.drop("_gpid"), total


def ntile_bucket_col(rank: Column, total: int, n_buckets: int) -> Column:
    """Bucket assignment identical to SQL ``NTILE(n) OVER (ORDER BY ...)``
    given a 1-based dense global rank: the first ``total mod n`` buckets get
    ``total div n + 1`` rows, the rest ``total div n``. 1-based bucket ids.
    """
    base, rem = divmod(total, n_buckets)
    if base == 0:
        return rank.cast("int")
    cut = rem * (base + 1)
    return (
        F.when(rank <= F.lit(cut), F.floor((rank - 1) / F.lit(base + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((rank - F.lit(cut) - 1) / F.lit(base)) + 1)
        .cast("int")
    )


def ntile_exact(
    df: DataFrame, order: OrderKeys, n_buckets: int, out: str = "_ntile"
) -> tuple[DataFrame, int]:
    """NTILE with no unpartitioned window: global_row_number + closed-form
    bucket assignment. Returns (df_with_bucket, total_rows); the helper rank
    column is dropped."""
    d, total = global_row_number(df, order, "_grn_nt")
    d = d.withColumn(out, ntile_bucket_col(F.col("_grn_nt"), total, n_buckets))
    return d.drop("_grn_nt"), total
