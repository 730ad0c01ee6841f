"""Bucketed storage — shuffle-free co-located joins and aggregations.

The biggest recurring cost of a 100 TB fact-fact join is shuffling both
relations on the join key. Spark's answer is bucketed tables: write each
relation hash-bucketed (and sorted) by the key once, and every subsequent
equi-join or aggregation on that key reads co-located buckets with NO
exchange — the physical plan joins bucket i of A against bucket i of B
directly (SortMergeJoin with zero Exchange operators when bucket counts
match).

This costs one up-front shuffle at write time and pays it back on every
downstream join/agg — the right trade for dimension/fact tables that are
joined repeatedly (the reference's SQL-sourced pipelines re-join the same
keys constantly).

Bucketed data must live in the session catalog (bucket metadata is not
self-describing in the files), so these helpers manage named tables;
``path`` makes them external tables with data at a chosen location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table hash-bucketed (and per-bucket
    sorted) by ``key``. One shuffle now; joins/aggs on ``key`` against
    other tables bucketed the same way plan with no Exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so downstream joins on the bucket key skip the shuffle)."""
    return spark.table(table)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts the plan contains no Exchange on either side — verify
    with ``df.explain()``; ``tests/test_bucketing.py`` asserts it."""
    keys = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=keys, how=how
    )
