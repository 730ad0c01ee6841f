"""HLL sketch tables: merge semantics (union of partial sketches ==
sketch of the union), rollup correctness vs exact distinct counts, and
the scale contracts (tiny binary state, no raw-value shuffle)."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.sketches import (
    distinct_over_slices,
    hll_estimate,
    hll_rollup,
    hll_sketch_table,
)


@pytest.fixture(scope="module")
def facts(spark):
    # (day, segment, user): users overlap across days — the case where
    # summing per-day distincts overcounts but sketch union does not
    rows = [
        (d, "ab"[u % 2], u % (50 + 10 * d))
        for d in range(4)
        for u in range(400)
    ]
    return spark.createDataFrame(rows, ["day", "seg", "user"])


def test_rollup_equals_direct_sketch(facts):
    """Union of per-(day, seg) sketches == one global sketch, exactly:
    sketch state is a pure function of the inserted value set, so the
    mergeable path must estimate identically to the direct path."""
    fine = hll_sketch_table(facts, ["day", "seg"], "user")
    merged = hll_rollup(fine, []).select(hll_estimate("sketch").alias("e"))
    direct = facts.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12))).alias("e")
    )
    assert merged.first()["e"] == direct.first()["e"]


def test_estimates_close_to_exact(facts):
    got = {
        r["seg"]: r["estimate"]
        for r in distinct_over_slices(
            facts, ["day", "seg"], ["seg"], "user"
        ).collect()
    }
    want = {
        r["seg"]: r["n"]
        for r in facts.groupBy("seg")
        .agg(F.countDistinct("user").alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for seg, est in got.items():
        # lg_k=12 -> ~1.6% RSE; 5% is > 3 sigma at these cardinalities
        assert abs(est - want[seg]) <= max(3, 0.05 * want[seg])


def test_sum_of_parts_overcounts_but_union_does_not(facts):
    """The reason sketches beat per-partition exact counts: distincts
    don't add across overlapping slices."""
    fine = hll_sketch_table(facts, ["day"], "user")
    per_day_sum = (
        fine.select(hll_estimate("sketch").alias("e")).agg(F.sum("e")).first()[0]
    )
    union_est = hll_rollup(fine, []).select(hll_estimate("sketch").alias("e")).first()["e"]
    exact = facts.select("user").distinct().count()
    assert per_day_sum > exact * 1.5  # heavy overlap by construction
    assert abs(union_est - exact) <= max(3, 0.05 * exact)


def test_sketch_state_is_small(facts):
    row = hll_sketch_table(facts, ["seg"], "user", lg_k=12).first()
    assert len(row["sketch"]) < 4096  # ~2.5 KB at lg_k=12


def test_coarse_must_subset_fine(facts):
    with pytest.raises(ValueError, match="coarse_cols"):
        distinct_over_slices(facts, ["day"], ["seg"], "user")


def test_rollup_plan_has_partial_aggregation(facts):
    """The sketch build must partial-aggregate map-side (HLL union is the
    combiner) — the shuffle carries sketch states, not raw user ids."""
    fine = hll_sketch_table(facts, ["day", "seg"], "user")
    plan = fine._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hll_sketch_agg") >= 2  # partial + final modes


def test_hll_overlap(spark):
    from seafan_spark.sketches import hll_overlap, hll_sketch_table

    # two overlapping id ranges with known intersection size
    a = spark.range(0, 10000).select(F.col("id"))
    b = spark.range(7000, 20000).select(F.col("id"))
    sa = hll_sketch_table(a, [], "id").select(F.col("sketch").alias("sa"))
    sb = hll_sketch_table(b, [], "id").select(F.col("sketch").alias("sb"))
    est = (
        sa.crossJoin(sb)
        .select(hll_overlap("sa", "sb").alias("overlap"))
        .collect()[0]["overlap"]
    )
    # true overlap 3000; three ~1.6% estimates compound -> allow 10%
    assert abs(est - 3000) <= 0.10 * 20000, est
    # disjoint sets: clamped at >= 0 and small
    c = spark.range(50000, 60000)
    sc = hll_sketch_table(c, [], "id").select(F.col("sketch").alias("sb"))
    est0 = (
        sa.crossJoin(sc)
        .select(hll_overlap("sa", "sb").alias("overlap"))
        .collect()[0]["overlap"]
    )
    assert 0 <= est0 <= 0.05 * 20000, est0
