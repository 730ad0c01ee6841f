"""attach_running_ops: distributed global running ops must match the
single-partition window reference exactly — including null handling and
partition-boundary carries (the repartitionByRange seams)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from seafan_spark.rank import attach_running_ops


@pytest.fixture()
def seamy(spark):
    # 40 rows over >=8 range partitions forces several partition seams;
    # nulls sprinkled at seam-adjacent positions
    rows = []
    for i in range(40):
        v = None if i % 7 == 3 else float((-1) ** i * (i % 5))
        rows.append((i, v))
    return spark.createDataFrame(rows, "k long, v double").repartition(8)


def _reference(df):
    w = Window.orderBy("k")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return {
        r["k"]: (r["rn"], r["s"], r["l"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.sum("v").over(run).alias("s"),
            F.lag("v", 1).over(w).alias("l"),
        ).collect()
    }


def test_running_ops_match_global_window(seamy):
    got = {
        r["k"]: (r["rn"], r["s"], r["l"])
        for r in attach_running_ops(
            seamy,
            [("k", True)],
            [("rn", "rownum", None), ("s", "sum", F.col("v")), ("l", "lag", F.col("v"))],
        ).collect()
    }
    assert got == _reference(seamy)


def test_running_ops_all_null_prefix(spark):
    # running sum must stay NULL until the first non-null value
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, 5.0), (3, None)], "k long, v double"
    ).repartition(3)
    out = {
        r["k"]: r["s"]
        for r in attach_running_ops(
            df, [("k", True)], [("s", "sum", F.col("v"))]
        ).collect()
    }
    assert out == {0: None, 1: None, 2: 5.0, 3: 5.0}


def test_running_ops_empty(spark):
    df = spark.createDataFrame([], "k long, v double")
    out = attach_running_ops(
        df, [("k", True)], [("rn", "rownum", None), ("s", "sum", F.col("v"))]
    )
    assert out.count() == 0 and {"rn", "s"} <= set(out.columns)


def test_spread_skips_already_repartitioned(spark):
    from seafan_spark.partitions import spread_if_narrow

    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    wide = df.repartition(8, "c_custkey")
    out = spread_if_narrow(wide, 32, "c_custkey")
    assert out is wide  # no second shuffle on an already-spread frame
