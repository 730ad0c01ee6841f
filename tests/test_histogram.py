"""Histogram sketch table: merge exactness, quantile bounds, cross-engine
bucket parity, and representative selection."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from seafan_spark.histogram import (
    bucket_col,
    bucket_sql,
    histogram_rollup,
    histogram_sketch_table,
    quantiles_from_histogram,
)
from seafan_spark.llmops.dedup import select_representatives

SF = "/root/testdata/sf0.001"
LO, HI, NB = 900.0, 105000.0, 32


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_rollup_equals_direct_sketch(lineitem):
    """Merging fine sketches == sketching the union (the mergeability
    contract that makes incremental refresh exact)."""
    fine = histogram_sketch_table(
        lineitem, ["l_returnflag", "l_linestatus"], "l_extendedprice", LO, HI, NB
    )
    rolled = histogram_rollup(fine, ["l_returnflag"])
    direct = histogram_sketch_table(
        lineitem, ["l_returnflag"], "l_extendedprice", LO, HI, NB
    )
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0


def test_bucket_sql_parity(lineitem):
    """The explicit-arithmetic bucket formula assigns identical buckets in
    Spark and DuckDB (the property the driver oracle rests on)."""
    spark_counts = {
        (r["b"], r["n"])
        for r in lineitem.groupBy(
            bucket_col(F.col("l_extendedprice"), LO, HI, NB).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sql = (
        f"SELECT {bucket_sql('l_extendedprice', LO, HI, NB)} AS b, COUNT(*) AS n "
        f"FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
    )
    duck_counts = {(int(b), int(n)) for b, n in duckdb.sql(sql).fetchall()}
    assert spark_counts == duck_counts


def test_quantiles_bounded_by_bucket_spread(lineitem):
    hist = histogram_sketch_table(
        lineitem, ["l_returnflag"], "l_extendedprice", LO, HI, NB
    )
    qs = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]
    est = {
        (r["l_returnflag"], r["q"]): r["estimate"]
        for r in quantiles_from_histogram(hist, ["l_returnflag"], qs).collect()
    }
    exact = {
        r["l_returnflag"]: (r["ex"], r["mn"], r["mx"])
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.0,0.25,0.5,0.75,0.99,1.0))"
            ).alias("ex"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    bucket_width = (HI - LO) / NB
    for flag, (ex, mn, mx) in exact.items():
        # endpoints are exact: q=0 -> observed min, q=1 -> observed max
        assert est[(flag, 0.0)] == mn
        assert est[(flag, 1.0)] == mx
        for q, true_v in zip([0.0, 0.25, 0.5, 0.75, 0.99, 1.0], ex):
            # estimate interpolates inside the true value's bucket: error
            # is bounded by one bucket's observed spread (<= grid width
            # for in-range buckets)
            assert abs(est[(flag, q)] - true_v) <= bucket_width + 1e-9, (flag, q)


def test_quantiles_single_value_bins_exact(spark):
    """When every bucket holds one distinct value the estimate is exact."""
    df = spark.createDataFrame(
        [(float(v),) for v in [10, 10, 20, 30, 40, 40, 40, 50]], "v double"
    )
    hist = histogram_sketch_table(df, [], "v", 0.0, 60.0, 6)
    got = {
        r["q"]: r["estimate"]
        for r in quantiles_from_histogram(hist, [], [0.5, 1.0]).collect()
    }
    assert got[1.0] == 50.0
    assert got[0.5] == 30.0  # rank 4 of 8 lands in the value-30 bucket


def test_bucket_col_edges(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (9.999,), (10.0,), (25.0,), (60.0,), (100.0,), (None,)],
        "v double",
    )
    got = [
        r["b"]
        for r in df.select(bucket_col(F.col("v"), 0.0, 60.0, 6).alias("b")).collect()
    ]
    assert got == [0, 1, 1, 2, 3, 7, 7, None]


def test_select_representatives(spark):
    rows = [
        # cluster a: doc 3 longest -> rep; tie on length in cluster b -> min id
        (1, "a", 5.0),
        (2, "a", 7.0),
        (3, "a", 9.0),
        (4, "b", 4.0),
        (5, "b", 4.0),
        (6, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, cl string, score double")
    reps = {
        r["cl"]: (r["id"], r["cluster_size"])
        for r in select_representatives(df, "cl", "id", "score").collect()
    }
    assert reps == {"a": (3, 3), "b": (4, 2), "c": (6, 1)}
    # keep_all: every row annotated, winners flagged
    marked = select_representatives(df, "cl", "id", "score", keep_all=True)
    got = {(r["id"]): (r["rep_id"], r["is_rep"]) for r in marked.collect()}
    assert got[3] == (3, 1.0) and got[1] == (3, 0.0) and got[5] == (4, 0.0)
    assert marked.count() == 6
    # no score: min-id wins
    noscore = {
        r["cl"]: r["id"] for r in select_representatives(df, "cl", "id").collect()
    }
    assert noscore == {"a": 1, "b": 4, "c": 6}


def test_cap_per_group(spark):
    from seafan_spark.sampling import cap_per_group

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = cap_per_group(docs, "source", "doc_id", 5, "n_chars")
    # every group capped, winners are the per-source top-5 by (n_chars, -id)
    sizes = {
        r["source"]: r["n"]
        for r in plain.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes and all(n <= 5 for n in sizes.values())
    # two-phase (skew-safe) result is exactly the one-phase result
    split = cap_per_group(docs, "source", "doc_id", 5, "n_chars", presplit=8)
    assert plain.select("doc_id").exceptAll(split.select("doc_id")).count() == 0
    assert split.select("doc_id").exceptAll(plain.select("doc_id")).count() == 0
    # no score: min-ids kept
    by_id = cap_per_group(docs.where(F.col("source") == "src0"), "source", "doc_id", 3)
    got = sorted(r["doc_id"] for r in by_id.collect())
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("source") == "src0")
        .orderBy("doc_id")
        .limit(3)
        .collect()
    )
    assert got == want


def test_stream_sketch_ingest_equals_batch(spark, tmp_path):
    """Streaming-maintained sketch store == one batch sketch of all rows
    (the merge-exactness contract, exercised through foreachBatch)."""
    from seafan_spark.streaming import stream_sketch_ingest

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    src = f"{tmp_path}/src"
    # several files -> several micro-batches with maxFilesPerTrigger=1
    li.repartition(3).write.parquet(src)
    store = f"{tmp_path}/sketch_store"
    sdf = (
        spark.readStream.schema("l_returnflag string, l_extendedprice double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_sketch_ingest(sdf, store, ["l_returnflag"], "l_extendedprice", LO, HI, NB)
    got = spark.read.parquet(store)
    want = histogram_sketch_table(
        spark.read.parquet(src), ["l_returnflag"], "l_extendedprice", LO, HI, NB
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_psi_from_histograms(spark, lineitem):
    from seafan_spark.histogram import psi_from_histograms

    a = histogram_sketch_table(
        lineitem.where(F.col("l_returnflag") == "A"), [], "l_extendedprice", LO, HI, NB
    )
    # identical distributions -> PSI 0
    same = psi_from_histograms(a, a, []).collect()[0]["psi"]
    assert abs(same) < 1e-12
    # a genuinely different distribution (shifted value range) -> PSI > 0
    shifted = histogram_sketch_table(
        lineitem.where(F.col("l_returnflag") == "A").select(
            (F.col("l_extendedprice") * 0.5).alias("l_extendedprice")
        ),
        [],
        "l_extendedprice",
        LO,
        HI,
        NB,
    )
    drift = psi_from_histograms(a, shifted, []).collect()[0]["psi"]
    assert drift > 0.25  # halving every value is a major shift
    # near-identical populations (A vs R returnflags are iid slices) -> small
    r = histogram_sketch_table(
        lineitem.where(F.col("l_returnflag") == "R"), [], "l_extendedprice", LO, HI, NB
    )
    near = psi_from_histograms(a, r, []).collect()[0]["psi"]
    assert 0 <= near < 0.1
    # grouped variant returns one psi per group
    ga = histogram_sketch_table(lineitem, ["l_linestatus"], "l_extendedprice", LO, HI, NB)
    out = psi_from_histograms(ga, ga, ["l_linestatus"]).collect()
    assert {r["l_linestatus"] for r in out} and all(abs(r["psi"]) < 1e-12 for r in out)


def test_psi_one_sided_group_dropped(spark):
    """A group present on only one side must be dropped, not abort with
    an ANSI 0/0 on its empty-side total."""
    from seafan_spark.histogram import psi_from_histograms

    a = spark.createDataFrame(
        [("x", 1, 10, 0.0, 1.0), ("y", 1, 5, 0.0, 1.0)],
        "g string, bucket bigint, cnt bigint, bin_min double, bin_max double",
    )
    b = spark.createDataFrame(
        [("x", 1, 10, 0.0, 1.0)],
        "g string, bucket bigint, cnt bigint, bin_min double, bin_max double",
    )
    out = psi_from_histograms(a, b, ["g"]).collect()
    assert {r["g"] for r in out} == {"x"}
    assert abs(out[0]["psi"]) < 1e-12
