"""Tests for round-2 operators: rollup/cube, corr matrix, distinct counts,
funnel, retention, edit-distance dedup, vocabulary, winsorize."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seafan_spark.agg import corr_matrix, distinct_counts, rollup_table
from seafan_spark.encode import winsorize
from seafan_spark.llmops.dedup import edit_distance_pairs
from seafan_spark.llmops.text import vocab_top_terms
from seafan_spark.sources import vec_to_pipe
from seafan_spark.temporal import funnel, retention


@pytest.fixture(scope="module")
def sales(spark):
    return vec_to_pipe(
        spark,
        {
            "reg": ["e", "e", "w", "w", "w"],
            "cat": ["a", "b", "a", "a", "b"],
            "amt": [1.0, 2.0, 3.0, 4.0, 5.0],
        },
    )


def test_rollup_levels(sales):
    rows = rollup_table(sales, ["reg", "cat"], {"s": F.sum("amt")}).collect()
    by_key = {(r["reg"], r["cat"]): (r["g_reg"], r["g_cat"], r["s"]) for r in rows}
    assert by_key[("e", "a")] == (0, 0, 1.0)
    assert by_key[("w", None)] == (0, 1, 12.0)  # reg subtotal
    assert by_key[(None, None)] == (1, 1, 15.0)  # grand total
    assert len(rows) == 4 + 2 + 1


def test_cube_has_cat_margins(sales):
    rows = rollup_table(sales, ["reg", "cat"], {"s": F.sum("amt")}, kind="cube").collect()
    by_key = {(r["reg"], r["cat"]): r["s"] for r in rows}
    assert by_key[(None, "a")] == 8.0  # cat margin rollup lacks
    assert len(rows) == 4 + 2 + 2 + 1


def test_rollup_bad_kind(sales):
    with pytest.raises(ValueError):
        rollup_table(sales, ["reg"], {"s": F.sum("amt")}, kind="nope")


def test_corr_matrix_known_values(spark):
    xs = [1.0, 2.0, 3.0, 4.0]
    p = vec_to_pipe(
        spark,
        {"x": xs, "y": [2.0 * v for v in xs], "z": [-v for v in xs]},
    )
    rows = corr_matrix(p, ["x", "y", "z"]).collect()
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in rows}
    assert got[("x", "y")] == pytest.approx(1.0)
    assert got[("x", "z")] == pytest.approx(-1.0)
    assert got[("y", "z")] == pytest.approx(-1.0)
    assert len(rows) == 3


def test_distinct_counts_exact_and_approx(spark):
    p = vec_to_pipe(
        spark,
        {"a": [1, 1, 2, 2, 3], "b": ["x"] * 5},
    )
    exact = {r["field"]: r["n_distinct"] for r in distinct_counts(p, ["a", "b"]).collect()}
    assert exact == {"a": 3, "b": 1}
    approx = {
        r["field"]: r["n_distinct"]
        for r in distinct_counts(p, ["a", "b"], approx=True).collect()
    }
    # tiny cardinalities are exact under HLL++
    assert approx == {"a": 3, "b": 1}


def _events(spark):
    # u1 completes view->click->purchase in order; u2 clicks BEFORE viewing
    # (must not count past step 1 of click); u3 views only
    s = 1_000_000_000  # long ts is nanoseconds
    rows = [
        ("u1", 100 * s, "view"), ("u1", 200 * s, "click"), ("u1", 300 * s, "purchase"),
        ("u2", 100 * s, "click"), ("u2", 200 * s, "view"), ("u2", 50 * s, "purchase"),
        ("u3", 10 * s, "view"),
    ]
    return spark.createDataFrame(rows, "user string, ts long, ev string")


def test_funnel_strict_order(spark):
    out = {
        r["step"]: (r["event"], r["n_users"])
        for r in funnel(_events(spark), "user", "ts", "ev", ["view", "click", "purchase"]).collect()
    }
    assert out[1] == ("view", 3)
    assert out[2] == ("click", 1)  # only u1 clicked after viewing
    assert out[3] == ("purchase", 1)


def test_retention_cohorts(spark):
    day = 86_400_000_000_000  # ns per day (long ts treated as nanos)
    rows = [
        ("a", 0 * day), ("a", 7 * day), ("a", 14 * day),
        ("b", 7 * day), ("b", 21 * day),
    ]
    df = spark.createDataFrame(rows, "user string, ts long")
    got = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in retention(df, "user", "ts", period="week").collect()
    }
    assert got[(0, 0)] == 1 and got[(0, 1)] == 1 and got[(0, 2)] == 1
    assert got[(1, 0)] == 1 and got[(1, 2)] == 1
    assert (1, 1) not in got


def test_edit_distance_planted(spark):
    p = vec_to_pipe(
        spark,
        {
            "i": [1, 2, 3, 4],
            "t": [
                "the quick brown fox jumps",
                "the quick brown fox jumped",  # dist 2 (insert e, s->d)
                "the quick brown cat naps",    # same prefix, far
                "completely different text",
            ],
        },
    )
    rows = edit_distance_pairs(p, "i", "t", max_dist=2, prefix_len=8).collect()
    assert {(r["id_a"], r["id_b"], r["dist"]) for r in rows} == {(1, 2, 2)}


def test_vocab_counts(spark):
    p = vec_to_pipe(
        spark,
        {"i": [1, 2], "t": ["red red blue", "red  GREEN\tblue"]},
    )
    rows = vocab_top_terms(p, "t", k=10).collect()
    got = {r["term"]: (r["n"], r["rank"]) for r in rows}
    assert got["red"] == (3, 1)
    assert got["blue"] == (2, 2)
    assert got["green"] == (1, 3)


def test_winsorize_bounds(spark):
    vals = [float(i) for i in range(1, 101)]
    p = vec_to_pipe(spark, {"x": vals})
    out = winsorize(p, "x", 0.10, 0.90, name="xw")
    xs = [r["xw"] for r in out.df.select("xw").collect()]
    lo, hi = min(xs), max(xs)
    # exact percentile of 1..100 at .1/.9 interpolates to 10.9 / 90.1
    assert lo == pytest.approx(10.9)
    assert hi == pytest.approx(90.1)
    assert all(lo - 1e-9 <= v <= hi + 1e-9 for v in xs)
    # interior values pass through
    assert 50.0 in xs


def test_winsorize_preserves_nulls(spark):
    p = vec_to_pipe(spark, {"x": [1.0, None, 50.0, 100.0, None]})
    out = winsorize(p, "x", 0.10, 0.90, name="xw")
    rows = out.ordered_df().select("xw").collect()
    got = [r["xw"] for r in rows]
    # NULLs pass through (greatest/least would have clipped them to lo)
    assert got[1] is None and got[4] is None
    assert all(v is not None for i, v in enumerate(got) if i not in (1, 4))


def test_retention_pre_epoch_floor_division(spark):
    day = 86_400_000_000_000  # ns per day
    rows = [
        ("a", -1 * day), ("a", 6 * day),   # cohort = floor(-1/7) = -1
        ("b", 0 * day), ("b", 7 * day),
    ]
    df = spark.createDataFrame(rows, "user string, ts long")
    got = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in retention(df, "user", "ts", period="week").collect()
    }
    # pre-1970 event floors DOWN into week -1 (truncation would give 0)
    assert got[(-1, 0)] == 1 and got[(-1, 1)] == 1
    assert got[(0, 0)] == 1 and got[(0, 1)] == 1
