"""Round-10 commercial-analytics additions: Lorenz deciles (agg),
multi-touch attribution (temporal), and the gini_by keyed-path
scale-shape upgrade (keyed_running_scan rank instead of a
single-task-per-key window)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafan_spark.agg import gini_by, lorenz_deciles
from seafan_spark.temporal import attribution_touch


def test_gini_extremes_and_theory(spark):
    eq = spark.createDataFrame([(i, 10.0) for i in range(5)], "id long, v double")
    assert gini_by(eq, "v", keys=[]).collect()[0]["gini"] == pytest.approx(0.0)
    one = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "id long, v double"
    )
    # single holder: G = (n-1)/n
    assert gini_by(one, "v").collect()[0]["gini"] == pytest.approx(0.8)
    # uniform 1..n: exact closed form (n-1)/(3n), 6dp-rounded output
    unif = spark.createDataFrame(
        [(i, float(i), "g") for i in range(1, 101)], "id long, v double, k string"
    )
    g = gini_by(unif, "v", keys=["k"]).collect()[0]["gini"]
    assert g == pytest.approx(99.0 / 300.0, abs=1e-9)


def test_gini_keyed_path_uses_range_layout(spark):
    """Round-10 scale-shape: the keyed rank must come from the
    keyed_running_scan range layout (visible as the checkpointed _gpid
    column), not a corpus-sized Window.partitionBy(low-card keys)."""
    df = spark.createDataFrame(
        [(i, float(i % 17), "k%d" % (i % 3)) for i in range(300)],
        "id long, v double, k string",
    )
    out = gini_by(df, "v", keys=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_gpid" in plan
    assert out.count() == 3


def test_lorenz_monotone_and_total(spark):
    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(10)], "id long, v double"
    )
    rows = lorenz_deciles(df, "v", "id", n_buckets=5).orderBy("bucket").collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares) and shares[-1] == 1.0
    assert rows[0]["bucket_value"] == 3.0  # 1+2 (ascending cut)
    assert rows[-1]["cum_value"] == 55.0
    # Lorenz curve lies below the diagonal for unequal data
    assert shares[0] < 1 / 5


def test_lorenz_keyed(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7 + 1), "s%d" % (i % 2)) for i in range(40)],
        "id long, v double, k string",
    )
    rows = lorenz_deciles(df, "v", "id", keys=["k"], n_buckets=4).collect()
    assert {r["k"] for r in rows} == {"s0", "s1"}
    for k in ("s0", "s1"):
        sub = sorted((r for r in rows if r["k"] == k), key=lambda r: r["bucket"])
        assert sub[-1]["cum_share"] == pytest.approx(1.0)
        assert sum(r["n"] for r in sub) == 20


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


def test_attribution_keyed_isolated(spark):
    rows = [("A", 1, "x", 1, 1), ("A", 1, "y", 2, 2),
            ("B", 1, "y", 1, 3)]
    df = spark.createDataFrame(rows, "seg string, u long, c string, t long, id long")
    at = {(r["seg"], r["channel"]): r for r in attribution_touch(
        df, "u", "c", "t", "id", keys=["seg"]).collect()}
    assert at[("A", "x")]["first_touch"] == 1
    assert at[("B", "y")]["first_touch"] == 1 and at[("B", "y")]["linear"] == 1.0
