"""market.py — basket affinity, concentration, Benford, attribution."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafan_spark.guards import SmallDataLimitError
from seafan_spark.market import (
    association_rules,
    attribution_touch,
    benford_screen,
    gini_by,
    lorenz_deciles,
)


def test_association_rules_pinned(spark):
    rows = [(1, "milk"), (1, "bread"), (1, "eggs"), (2, "milk"),
            (2, "bread"), (3, "milk"), (3, "milk")]  # dup counted once
    df = spark.createDataFrame(rows, "b long, i string")
    d = {(r["item_a"], r["item_b"]): r
         for r in association_rules(df, "b", "i").collect()}
    assert len(d) == 6  # both directions of 3 pairs
    r = d[("bread", "milk")]
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"]) == (2, 2, 3, 3)
    assert r["confidence"] == 1.0 and r["lift"] == pytest.approx(1.0)
    assert d[("milk", "eggs")]["confidence"] == pytest.approx(1 / 3)
    assert d[("bread", "eggs")]["lift"] == pytest.approx(1.5)


def test_association_rules_min_support_and_keys(spark):
    rows = [("s1", 1, "a"), ("s1", 1, "b"), ("s1", 2, "a"),
            ("s2", 1, "a"), ("s2", 1, "c")]
    df = spark.createDataFrame(rows, "seg string, b long, i string")
    out = association_rules(df, "b", "i", keys=["seg"]).collect()
    segs = {r["seg"] for r in out}
    assert segs == {"s1", "s2"}
    filtered = association_rules(df, "b", "i", keys=["seg"], min_support=0.9)
    assert filtered.count() == 2  # only s2's (a,c) pair at support 1.0


def test_association_rules_basket_budget(spark):
    df = spark.range(200).select(
        F.lit(1).alias("b"), F.col("id").alias("i")
    )
    with pytest.raises(SmallDataLimitError, match="basket"):
        association_rules(df, "b", "i", max_basket_items=100)


def test_gini_extremes_and_theory(spark):
    eq = spark.createDataFrame([(i, 10.0) for i in range(5)], "id long, v double")
    assert gini_by(eq, "v", "id").collect()[0]["gini"] == pytest.approx(0.0)
    one = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "id long, v double"
    )
    # single holder: G = (n-1)/n
    assert gini_by(one, "v", "id").collect()[0]["gini"] == pytest.approx(0.8)
    # uniform 1..n: G = (n-1)/(3n) ... exact closed form (n^2-1)/(3n^2)
    unif = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    g = gini_by(unif, "v", "id").collect()[0]["gini"]
    assert g == pytest.approx(99.0 / 300.0, abs=1e-9)
    neg = spark.createDataFrame([(0, -1.0), (1, 2.0)], "id long, v double")
    assert gini_by(neg, "v", "id").collect()[0]["gini"] is None


def test_lorenz_monotone_and_total(spark):
    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(10)], "id long, v double"
    )
    rows = lorenz_deciles(df, "v", "id", n_buckets=5).orderBy("bucket").collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares) and shares[-1] == 1.0
    assert rows[0]["bucket_value"] == 3.0  # 1+2
    assert rows[-1]["cum_value"] == 55.0
    # Lorenz curve lies below the diagonal for unequal data
    assert shares[0] < 1 / 5


def test_benford_uniform_magnitudes_lowish_chi2(spark):
    import random

    rng = random.Random(5)
    rows = [(float(int(10 ** rng.uniform(0, 4))),) for _ in range(3000)]
    df = spark.createDataFrame(rows, "v double")
    out = benford_screen(df, "v", value_decimals=0).orderBy("digit").collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert sum(r["share"] for r in out) == pytest.approx(1.0)
    assert len({r["chi2"] for r in out}) == 1  # repeated per group
    assert out[0]["n"] == 3000
    # log-uniform magnitudes approximate Benford: chi2 below blow-up level
    assert out[0]["chi2"] < 50.0


def test_benford_excludes_zero_counts_negatives_by_magnitude(spark):
    df = spark.createDataFrame(
        [(0.0,), (-123.0,), (923.0,), (None,)], "v double"
    )
    out = {r["digit"]: r for r in benford_screen(df, "v").collect()}
    assert set(out) == {1, 9}  # 0/NULL dropped; -123 -> digit 1
    assert out[1]["n"] == 2


def test_attribution_pinned(spark):
    rows = [
        (1, "a", 1, 1), (1, "b", 2, 2), (1, "c", 3, 3),
        (2, "b", 1, 4), (2, "b", 2, 5),
        (3, "a", 1, 6),
    ]
    df = spark.createDataFrame(rows, "u long, c string, t long, id long")
    at = {r["channel"]: r
          for r in attribution_touch(df, "u", "c", "t", "id").collect()}
    assert (at["a"]["first_touch"], at["a"]["last_touch"]) == (2, 1)
    assert (at["b"]["first_touch"], at["b"]["last_touch"]) == (1, 1)
    assert (at["c"]["first_touch"], at["c"]["last_touch"]) == (0, 1)
    assert at["a"]["linear"] == pytest.approx(1 / 3 + 1)
    assert at["c"]["linear"] == pytest.approx(1 / 3)
    # each credit model conserves one unit per user
    n_users = 3
    for col in ("first_touch", "last_touch", "linear"):
        assert sum(r[col] for r in at.values()) == pytest.approx(n_users)
    assert at["b"]["n_touches"] == 3


def test_attribution_tiebreak_deterministic(spark):
    # equal timestamps: id tiebreak decides first/last
    rows = [(1, "x", 5, 1), (1, "y", 5, 2)]
    df = spark.createDataFrame(rows, "u long, c string, t long, id long")
    at = {r["channel"]: r
          for r in attribution_touch(df, "u", "c", "t", "id").collect()}
    assert at["x"]["first_touch"] == 1 and at["y"]["last_touch"] == 1
    assert at["x"]["last_touch"] == 0 and at["y"]["first_touch"] == 0
