"""Data-quality rules engine: one-pass evaluation, per-rule semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafan_spark.quality import (
    Rule,
    accepted_values,
    check_rules,
    in_range,
    matches,
    not_null,
    unique,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "A", 0.05, "a@b.co"),
        (2, "A", 0.20, "bad"),      # out of range, bad email
        (3, "X", 0.00, None),       # bad flag; NULL email passes matches
        (3, "N", None, "c@d.eu"),   # dup id; NULL discount passes range
    ]
    return spark.createDataFrame(rows, "id bigint, flag string, disc double, email string")


def test_rule_semantics(df):
    report = {
        r["rule"]: (r["violations"], r["passed"])
        for r in check_rules(
            df,
            [
                not_null("disc"),
                in_range("disc", 0.0, 0.1),
                accepted_values("flag", ["A", "N", "R"]),
                matches("email", r"[a-z]+@[a-z]+\.[a-z]+"),
                unique("id"),
                unique("flag"),
            ],
        ).collect()
    }
    assert report["not_null(disc)"] == (1, False)
    assert report["in_range(disc,0.0,0.1)"] == (1, False)  # NULL passes
    assert report["accepted_values(flag,[A,N,R])"] == (1, False)
    assert report["matches(email)"] == (1, False)  # NULL passes
    assert report["unique(id)"] == (1, False)  # id 3 twice
    assert report["unique(flag)"] == (1, False)  # 4 values, 3 distinct


def test_all_pass_and_order(df):
    rep = check_rules(df, [not_null("id"), in_range("disc", -1.0, 1.0)]).collect()
    assert [r["rule"] for r in rep] == ["not_null(id)", "in_range(disc,-1.0,1.0)"]
    assert all(r["passed"] for r in rep)


def test_one_pass_plan(df):
    """All rules evaluate in a single aggregation over one scan."""
    plan = check_rules(
        df, [not_null("disc"), in_range("disc", 0.0, 0.1), unique("id")]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # the source appears exactly once


def test_rule_validation():
    with pytest.raises(ValueError):
        Rule(name="bad")
    with pytest.raises(ValueError):
        check_rules(None, [])


def test_matches_rejects_trailing_newline(spark):
    """'F\\n' must count as a violation: Java's $ matches before a trailing
    newline, so the old ^...$ anchoring silently passed it while the
    DuckDB regexp_full_match twin counted it — \\A...\\z closes the gap."""
    df = spark.createDataFrame(
        [("F",), ("O",), ("F\n",), ("\nF",), ("FO",), (None,)], "flag string"
    )
    report = {
        r["rule"]: (r["violations"], r["passed"])
        for r in check_rules(df, [matches("flag", "[FO]")]).collect()
    }
    # violations: 'F\n', '\nF', 'FO'; NULL passes
    assert report["matches(flag)"] == (3, False)
    import duckdb

    n = duckdb.sql(
        "SELECT SUM(CASE WHEN v IS NOT NULL AND NOT regexp_full_match(v, '(?:[FO])')"
        " THEN 1 ELSE 0 END) FROM (VALUES ('F'), ('O'), ('F' || chr(10)),"
        " (chr(10) || 'F'), ('FO'), (NULL)) t(v)"
    ).fetchone()[0]
    assert n == 3  # the Spark gate now agrees with its oracle twin


def test_k_anonymity_planted(spark):
    from seafan_spark.quality import k_anonymity

    rows = (
        [("en", "web")] * 10      # class of 10: fine at k=5
        + [("en", "wiki")] * 3    # class of 3: violates
        + [("fr", None)]          # singleton with NULL QI: violates
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    r = k_anonymity(df, ["lang", "source"], k=5).collect()[0]
    assert (r["k"], r["n_rows"], r["n_classes"]) == (5, 14, 3)
    assert r["min_class_size"] == 1
    assert r["violating_classes"] == 2
    assert r["violating_rows"] == 4

    import pytest as _pt

    with _pt.raises(ValueError, match="quasi-identifier"):
        k_anonymity(df, [], k=5)
