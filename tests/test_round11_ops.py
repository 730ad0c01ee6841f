"""Round-11 optimization pins.

The rank substrate's per-partition carry-ins ride back as a broadcast
stats-join, never a literal create_map (a 2xP-child literal fails janino
codegen at production partition counts). These tests pin (a) value
equality against the single-partition window reference at an
artificially HIGH shuffle-partition count, and (b) the plan shape:
no create_map anywhere in the substrate's physical plan.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from seafan_spark.rank import attach_running_ops, global_row_number, ntile_exact


@pytest.fixture()
def high_partitions(spark):
    # AQE coalescing would shrink the tiny test exchange back to a
    # handful of partitions; disable it so the substrate actually runs
    # with a production-scale partition count
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_co = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "2048")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", old)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_co)


def _seamy(spark, n=300):
    rows = []
    for i in range(n):
        v = None if i % 7 == 3 else float((-1) ** i * (i % 5))
        rows.append((i, v))
    return spark.createDataFrame(rows, "k long, v double").repartition(16)


def test_global_row_number_high_partition_count(high_partitions):
    df = _seamy(high_partitions)
    d, total = global_row_number(df, [("k", True)], "rn")
    got = {r["k"]: r["rn"] for r in d.collect()}
    assert total == 300
    assert got == {i: i + 1 for i in range(300)}


def test_attach_running_ops_high_partition_count(high_partitions):
    df = _seamy(high_partitions)
    got = {
        r["k"]: (r["rn"], r["s"], r["l"])
        for r in attach_running_ops(
            df,
            [("k", True)],
            [
                ("rn", "rownum", None),
                ("s", "sum", F.col("v")),
                ("l", "lag", F.col("v")),
            ],
        ).collect()
    }
    w = Window.orderBy("k")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = {
        r["k"]: (r["rn"], r["s"], r["l"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.sum("v").over(run).alias("s"),
            F.lag("v", 1).over(w).alias("l"),
        ).collect()
    }
    assert got == ref


def test_ntile_exact_high_partition_count(high_partitions):
    df = _seamy(high_partitions)
    d, total = ntile_exact(df, [("k", True)], 7, "b")
    got = {r["k"]: r["b"] for r in d.collect()}
    ref = {
        r["k"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(7).over(Window.orderBy("k"))
        ).collect()
    }
    assert total == 300 and got == ref


def test_rank_substrate_plan_has_no_literal_map_at_scale(high_partitions):
    # plan-shape insurance: above CARRY_MAP_MAX partitions the carries
    # attach via a broadcast hash join, never a map literal whose child
    # count grows with the partition count (janino fails ~10^4 children)
    df = _seamy(high_partitions)
    d, _ = global_row_number(df, [("k", True)], "rn")
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "create_map" not in plan.lower()
    assert "BroadcastHashJoin" in plan

    d2 = attach_running_ops(
        df, [("k", True)], [("s", "sum", F.col("v")), ("l", "lag", F.col("v"))]
    )
    plan2 = d2._jdf.queryExecution().executedPlan().toString()
    assert "create_map" not in plan2.lower()
    assert "BroadcastHashJoin" in plan2
