"""Bucketed tables: the join on the bucket key must plan WITHOUT any
Exchange (the whole point — co-located buckets, no shuffle), and results
must match the plain join."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.bucketing import cobucket_join, read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "t_orders_b", "custkey", buckets=8, path=str(base / "orders"),
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"),
        "t_customer_b", "custkey", buckets=8, path=str(base / "customer"),
    )
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_cobucket_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast so the test exercises the SMJ path the
    # bucketing is for (small test tables would otherwise broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucket_join(spark, lt, rt, on="custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucket_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = cobucket_join(spark, lt, rt, on="custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    ref = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
    got, want = j.collect()[0], ref.collect()[0]
    assert got["n"] == want["n"]
    assert got["s"] == pytest.approx(want["s"])


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    # per-key aggregation on the bucket key also skips the shuffle
    g = read_bucketed(spark, lt).groupBy("custkey").agg(F.sum("o_totalprice").alias("s"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
