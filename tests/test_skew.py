"""Salted join / salted groupby: equivalence to the unsalted forms on
skewed data, determinism, and multi-key Pipeline.join."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.skew import salted_groupby, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows under one key — the pathological shape
    rows = [(0 if i % 10 else i % 7 + 1, i, float(i % 100)) for i in range(5000)]
    left = spark.createDataFrame(rows, ["k", "lid", "v"])
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(8)], ["k", "label"]
    )
    return left, right


def _sorted(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain(skewed):
    left, right = skewed
    for how in ("inner", "left"):
        got = _sorted(salted_join(left, right, "k", salt=8, how=how), ["k", "lid", "label"])
        want = _sorted(left.join(right, "k", how), ["k", "lid", "label"])
        assert got == want


def test_salted_join_salt_one_is_plain(skewed):
    left, right = skewed
    got = _sorted(salted_join(left, right, "k", salt=1), ["k", "lid", "label"])
    want = _sorted(left.join(right, "k"), ["k", "lid", "label"])
    assert got == want


def test_salted_join_rejects_outer(skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="outer")


def test_salted_groupby_matches_plain(skewed):
    left, _ = skewed
    got = _sorted(
        salted_groupby(
            left,
            "k",
            {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v"),
             "mn": ("min", "v"), "m": ("avg", "v")},
            salt=16,
        ).select("k", "n", F.round("s", 6).alias("s"), "mx", "mn", F.round("m", 6).alias("m")),
        ["k", "n", "s", "mx", "mn", "m"],
    )
    want = _sorted(
        left.groupBy("k").agg(
            F.count("v").alias("n"),
            F.round(F.sum("v"), 6).alias("s"),
            F.max("v").alias("mx"),
            F.min("v").alias("mn"),
            F.round(F.avg("v"), 6).alias("m"),
        ),
        ["k", "n", "s", "mx", "mn", "m"],
    )
    assert got == want


def test_pipeline_join_multi_key(spark):
    from seafan_spark.sources import vec_to_pipe

    l = vec_to_pipe(
        spark,
        {"a": [1, 1, 2, 2], "b": ["x", "y", "x", "y"], "v": [1.0, 2.0, 3.0, 4.0]},
    )
    r = vec_to_pipe(
        spark, {"a": [1, 2], "b": ["x", "x"], "w": [10.0, 20.0]}
    )
    j = l.join(r, ["a", "b"], how="inner")
    rows = sorted((row["a"], row["b"], row["v"], row["w"]) for row in j.df.collect())
    assert rows == [(1, "x", 1.0, 10.0), (2, "x", 3.0, 20.0)]
    # left join fills defaults, not NULLs (reference semantics)
    jl = l.join(r, ["a", "b"], how="left")
    vals = {(row["a"], row["b"]): row["w"] for row in jl.df.collect()}
    assert vals[(1, "y")] == 0.0 and vals[(2, "y")] == 0.0


def test_skew_report_orders_and_ratios(spark):
    from seafan_spark.skew import skew_report

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top=2).collect()
    assert [r["k"] for r in out] == ["hot", "warm"]
    hot = out[0]
    assert hot["n"] == 80
    assert hot["share"] == pytest.approx(0.8)
    # 3 distinct keys, uniform would be 100/3 rows: 80 / (100/3) = 2.4
    assert hot["skew_ratio"] == pytest.approx(2.4)
