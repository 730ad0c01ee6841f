"""Tests for round-8 session-2 operators: smoothed target encoding,
rank-based ROC AUC, Kaplan-Meier survival, and perceptual-hash
image near-dup."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from seafan_spark.diags import auc_by
from seafan_spark.encode import target_encode
from seafan_spark.llmops.multimodal import (
    PHASH_WORDS,
    phash_hamming_pairs,
    phash_signatures,
)
from seafan_spark.sources import vec_to_pipe
from seafan_spark.temporal import survival_km


# --------------------------------------------------------- target_encode ----
@pytest.fixture(scope="module")
def te_pipe(spark):
    return vec_to_pipe(
        spark,
        {
            "cat": ["a", "a", "a", "b", "b", "c", None, None],
            "y": [1.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        },
    )


def test_target_encode_smoothed_values(te_pipe):
    # prior = 5/8 = 0.625; m = 2
    out = target_encode(te_pipe, "cat", "y", name="te", smoothing=2.0)
    rows = {(r["cat"], r["y"]): r["te"] for r in out.df.collect()}
    assert rows[("a", 1.0)] == pytest.approx((2 + 2 * 0.625) / (3 + 2))
    assert rows[("b", 0.0)] == pytest.approx((0 + 2 * 0.625) / (2 + 2))
    assert rows[("c", 1.0)] == pytest.approx((1 + 2 * 0.625) / (1 + 2))
    # NULL field values form their own level (2 rows, sum 2) — and the
    # expected value differs from the prior, so a key-dropping join
    # (which would fall back to the prior) cannot fake this
    assert rows[(None, 1.0)] == pytest.approx((2 + 2 * 0.625) / (2 + 2))


def test_target_encode_loo_singleton_is_prior(te_pipe):
    out = target_encode(
        te_pipe, "cat", "y", name="te", smoothing=2.0, out_of_fold=True
    )
    rows = [(r["cat"], r["y"], r["te"]) for r in out.df.collect()]
    # singleton level 'c': (1-1 + 2*prior)/(1-1+2) = exactly the prior
    c = [v for cat, _, v in rows if cat == "c"]
    assert c == [pytest.approx(0.625)]
    # 'a' row with y=1: (2-1 + 1.25)/(2+2); with y=0: (2-0 + 1.25)/(2+2)
    a1 = sorted(v for cat, y, v in rows if cat == "a" and y == 1.0)
    a0 = sorted(v for cat, y, v in rows if cat == "a" and y == 0.0)
    assert a1 == pytest.approx([2.25 / 4, 2.25 / 4])
    assert a0 == pytest.approx([3.25 / 4])


def test_target_encode_all_null_target_level_gets_prior(spark):
    p = vec_to_pipe(
        spark,
        {"cat": ["a", "a", "z", "z"], "y": [1.0, 0.0, None, None]},
    )
    out = target_encode(p, "cat", "y", name="te", smoothing=4.0)
    rows = {r["cat"]: r["te"] for r in out.df.collect()}
    # prior over non-NULL targets = 0.5; level 'z' has no observations
    assert rows["z"] == pytest.approx(0.5)
    assert rows["a"] == pytest.approx((1 + 4 * 0.5) / (2 + 4))


# ------------------------------------------------------------------ auc ----
def test_auc_perfect_and_reversed(spark):
    p = vec_to_pipe(
        spark,
        {"s": [0.1, 0.2, 0.8, 0.9], "y": [0.0, 0.0, 1.0, 1.0]},
    )
    row = auc_by(p, "s", "y").collect()[0]
    assert row["auc"] == pytest.approx(1.0)
    assert row["n_pos"] == 2 and row["n_neg"] == 2
    p2 = vec_to_pipe(
        spark,
        {"s": [0.9, 0.8, 0.2, 0.1], "y": [0.0, 0.0, 1.0, 1.0]},
    )
    assert auc_by(p2, "s", "y").collect()[0]["auc"] == pytest.approx(0.0)


def test_auc_all_tied_is_half(spark):
    p = vec_to_pipe(
        spark, {"s": [1.0, 1.0, 1.0, 1.0], "y": [1.0, 0.0, 1.0, 0.0]}
    )
    assert auc_by(p, "s", "y").collect()[0]["auc"] == pytest.approx(0.5)


def test_auc_manual_midrank_value(spark):
    # scores: pos {3, 2}, neg {2, 1}; midranks: 1->1, 2->2.5 (tie), 3->4
    # AUC = (sum pos mid - n1(n1+1)/2) / (n1 n0) = (4+2.5-3)/4 = 0.875
    p = vec_to_pipe(
        spark, {"s": [3.0, 2.0, 2.0, 1.0], "y": [1.0, 1.0, 0.0, 0.0]}
    )
    assert auc_by(p, "s", "y").collect()[0]["auc"] == pytest.approx(0.875)


def test_auc_grouped_and_degenerate_group(spark):
    p = vec_to_pipe(
        spark,
        {
            "g": ["a", "a", "a", "a", "b", "b"],
            "s": [0.1, 0.2, 0.8, 0.9, 0.3, 0.4],
            "y": [0.0, 0.0, 1.0, 1.0, 1.0, 1.0],  # group b: no negatives
        },
    )
    rows = {r["g"]: r for r in auc_by(p, "s", "y", keys=["g"]).collect()}
    assert rows["a"]["auc"] == pytest.approx(1.0)
    assert rows["b"]["auc"] is None  # undefined, not an error
    assert rows["b"]["n_neg"] == 0


# -------------------------------------------------------------- survival ----
def test_survival_km_textbook_table(spark):
    # 5 subjects: events at t=1,2,4; censored at t=3,4
    p = vec_to_pipe(
        spark,
        {"t": [1.0, 2.0, 3.0, 4.0, 4.0], "e": [1, 1, 0, 1, 0]},
    )
    rows = {r["t"]: r for r in survival_km(p, "t", "e").collect()}
    assert rows[1.0]["n_risk"] == 5 and rows[1.0]["n_event"] == 1
    assert rows[1.0]["survival"] == pytest.approx(4 / 5)
    assert rows[2.0]["n_risk"] == 4
    assert rows[2.0]["survival"] == pytest.approx(4 / 5 * 3 / 4)
    # censor-only time keeps the previous survival
    assert rows[3.0]["n_event"] == 0 and rows[3.0]["n_censor"] == 1
    assert rows[3.0]["survival"] == pytest.approx(0.6)
    # t=4: 2 at risk, 1 event, 1 censored
    assert rows[4.0]["n_risk"] == 2
    assert rows[4.0]["survival"] == pytest.approx(0.6 * 1 / 2)


def test_survival_km_zero_tail_and_groups(spark):
    p = vec_to_pipe(
        spark,
        {
            "g": ["x", "x", "y", "y"],
            "t": [1.0, 2.0, 1.0, 1.0],
            "e": [1, 1, 0, 0],
        },
    )
    rows = {(r["g"], r["t"]): r for r in survival_km(p, "t", "e", keys=["g"]).collect()}
    # group x: everyone events; survival hits exactly 0 at the last time
    assert rows[("x", 2.0)]["survival"] == 0.0
    # group y: all censored at t=1 -> survival stays 1
    assert rows[("y", 1.0)]["survival"] == pytest.approx(1.0)
    assert rows[("y", 1.0)]["n_event"] == 0


# ----------------------------------------------------------------- phash ----
def test_phash_fake_signature_matches_md5(spark):
    df = spark.createDataFrame([(1, bytearray(b"payload-one"))], "id long, img binary")
    row = phash_signatures(df, "id", "img").collect()[0]
    hexd = hashlib.md5(b"payload-one").hexdigest()
    for w in range(PHASH_WORDS):
        assert row[f"w{w}"] == int(hexd[4 * w : 4 * w + 4], 16)


def test_phash_pairs_pigeonhole_and_filter(spark):
    # doc 1 base; doc 2 = 1 bit flip on w0; doc 3 = 3 flips (7) on w0;
    # doc 9 unrelated (random words, expected far)
    base = [100, 200, 300, 400]
    rows = [
        (1, base[0], base[1], base[2], base[3]),
        (2, base[0] ^ 1, base[1], base[2], base[3]),
        (3, base[0] ^ 7, base[1], base[2], base[3]),
        (9, 54321, 11111, 22222, 33333),
    ]
    sig = spark.createDataFrame(
        rows, "id long, w0 int, w1 int, w2 int, w3 int"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_hamming_pairs(sig, "id", max_hamming=2).collect()
    }
    # (1,2) at hamming 1 and (2,3) at hamming 2 survive; (1,3) at 3 filtered
    assert got == {(1, 2): 1, (2, 3): 2}


def test_phash_pairs_max_hamming_guard(spark):
    sig = spark.createDataFrame([(1, 0, 0, 0, 0)], "id long, w0 int, w1 int, w2 int, w3 int")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_hamming_pairs(sig, "id", max_hamming=4)


def test_phash_pil_decoder_raises_without_pillow(spark):
    from seafan_spark.llmops.multimodal import _pil_module

    if _pil_module() is not None:
        pytest.skip("Pillow available: the pil path decodes for real")
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, img binary")
    with pytest.raises(NotImplementedError):
        phash_signatures(df, "id", "img", decoder="pil")


# ----------------------------------------------------- average precision ----
def test_ap_perfect_is_one(spark):
    from seafan_spark.diags import average_precision_by

    p = vec_to_pipe(
        spark, {"s": [0.1, 0.2, 0.8, 0.9], "y": [0.0, 0.0, 1.0, 1.0]}
    )
    row = average_precision_by(p, "s", "y").collect()[0]
    assert row["ap"] == pytest.approx(1.0)


def test_ap_manual_value_and_ties(spark):
    from seafan_spark.diags import average_precision_by

    # descending distinct scores: 3 (1 pos), 2 (1 pos + 1 neg), 1 (1 neg)
    # thresholds: tp/fp = (1,0) P=1; (2,1) P=2/3; (2,2)
    # AP = (1*1 + 1*(2/3) + 0) / 2 = 5/6
    p = vec_to_pipe(
        spark, {"s": [3.0, 2.0, 2.0, 1.0], "y": [1.0, 1.0, 0.0, 0.0]}
    )
    row = average_precision_by(p, "s", "y").collect()[0]
    assert row["ap"] == pytest.approx(5 / 6, abs=1e-6)
    assert row["n_pos"] == 2 and row["n_neg"] == 2


def test_ap_grouped_no_positive_group_is_null(spark):
    from seafan_spark.diags import average_precision_by

    p = vec_to_pipe(
        spark,
        {
            "g": ["a", "a", "b", "b"],
            "s": [0.9, 0.1, 0.5, 0.6],
            "y": [1.0, 0.0, 0.0, 0.0],
        },
    )
    rows = {r["g"]: r for r in
            average_precision_by(p, "s", "y", keys=["g"]).collect()}
    assert rows["a"]["ap"] == pytest.approx(1.0)
    assert rows["b"]["ap"] is None


def test_ap_global_matches_grouped_single_group(spark):
    # the ungrouped attach_running_ops path must agree with the keyed
    # window path on identical data
    from seafan_spark.diags import average_precision_by

    data = {
        "g": ["x"] * 8,
        "s": [0.1, 0.3, 0.3, 0.5, 0.5, 0.7, 0.8, 0.9],
        "y": [0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.0],
    }
    p = vec_to_pipe(spark, data)
    grouped = average_precision_by(p, "s", "y", keys=["g"]).collect()[0]
    ungrouped = average_precision_by(p, "s", "y").collect()[0]
    assert ungrouped["ap"] == pytest.approx(grouped["ap"], abs=2e-6)


# ----------------------------------------------------------------- cusum ----
def test_cusum_finds_planted_shift(spark):
    from seafan_spark.temporal import cusum_changepoint

    # level shift after t=5: 10,10,10,10,10 then 20,20,20,20,20
    p = vec_to_pipe(
        spark,
        {
            "t": [float(i) for i in range(1, 11)],
            "x": [10.0] * 5 + [20.0] * 5,
        },
    )
    row = cusum_changepoint(p, "t", "x").collect()[0]
    # |S| peaks at the last pre-shift point: S_5 = 5*(10-15) = -25
    assert row["t_star"] == 5.0
    assert row["s_max"] == pytest.approx(25.0)
    assert row["n"] == 10
    assert row["stat"] is not None and row["stat"] > 1.36


def test_cusum_constant_series_null_stat(spark):
    from seafan_spark.temporal import cusum_changepoint

    p = vec_to_pipe(spark, {"t": [1.0, 2.0, 3.0], "x": [4.0, 4.0, 4.0]})
    row = cusum_changepoint(p, "t", "x").collect()[0]
    assert row["s_max"] == pytest.approx(0.0)
    assert row["stat"] is None


def test_cusum_grouped_independent(spark):
    from seafan_spark.temporal import cusum_changepoint

    p = vec_to_pipe(
        spark,
        {
            "g": ["a"] * 6 + ["b"] * 6,
            "t": [float(i) for i in range(6)] * 2,
            "x": [1.0, 1.0, 1.0, 9.0, 9.0, 9.0,   # shift at t=2|3
                  5.0, 5.0, 5.0, 5.0, 5.0, 5.0],  # flat
        },
    )
    rows = {r["g"]: r for r in
            cusum_changepoint(p, "t", "x", keys=["g"]).collect()}
    assert rows["a"]["t_star"] == 2.0
    assert rows["b"]["stat"] is None


# ---------------------------------------------------------------- fdr_bh ----
def test_fdr_bh_textbook_adjustment(spark):
    from seafan_spark.agg import fdr_bh

    # classic worked example: p = .01, .02, .03, .04, .05 with m=5
    # raw = .05, .05, .05, .05, .05 -> all adjusted to 0.05
    p = vec_to_pipe(spark, {"p": [0.01, 0.02, 0.03, 0.04, 0.05]})
    rows = fdr_bh(p, "p").orderBy("rank").collect()
    assert [r["p_adj"] for r in rows] == pytest.approx([0.05] * 5)
    assert all(r["rejected"] for r in rows)


def test_fdr_bh_monotone_and_clamped(spark):
    from seafan_spark.agg import fdr_bh

    p = vec_to_pipe(spark, {"p": [0.001, 0.4, 0.9, 0.95]})
    rows = fdr_bh(p, "p").orderBy("rank").collect()
    adj = [r["p_adj"] for r in rows]
    # adjusted sequence is non-decreasing in rank and never exceeds 1
    assert adj == sorted(adj)
    assert adj[0] == pytest.approx(0.004)  # 0.001 * 4 / 1
    assert all(a <= 1.0 for a in adj)
    assert rows[0]["rejected"] and not rows[-1]["rejected"]


def test_fdr_bh_ties_share_adjusted_value(spark):
    from seafan_spark.agg import fdr_bh

    p = vec_to_pipe(spark, {"id": [1, 2, 3], "p": [0.02, 0.02, 0.9]})
    rows = fdr_bh(p, "p").collect()
    tied = sorted(r["p_adj"] for r in rows if r["p"] == 0.02)
    assert tied[0] == pytest.approx(tied[1])
    # both ties get the rank-2 schedule value: 0.02*3/2 = 0.03
    assert tied[0] == pytest.approx(0.03)


def test_fdr_bh_grouped_families_independent(spark):
    from seafan_spark.agg import fdr_bh

    p = vec_to_pipe(
        spark,
        {
            "fam": ["a", "a", "b", "b"],
            "p": [0.01, 0.8, 0.01, 0.8],
        },
    )
    rows = fdr_bh(p, "p", keys=["fam"]).collect()
    # each family has m=2: smallest p adjusts to 0.02 in BOTH families
    small = [r["p_adj"] for r in rows if r["p"] == 0.01]
    assert small == pytest.approx([0.02, 0.02])


# ----------------------------------------------------------------- brier ----
def test_brier_perfect_forecast(spark):
    from seafan_spark.diags import brier_decomposition

    p = vec_to_pipe(spark, {"p": [1.0, 1.0, 0.0, 0.0], "y": [1.0, 1.0, 0.0, 0.0]})
    row = brier_decomposition(p, "p", "y", bins=10).collect()[0]
    assert row["brier"] == pytest.approx(0.0)
    assert row["reliability"] == pytest.approx(0.0)
    # resolution equals uncertainty for a perfect sharp forecast
    assert row["resolution"] == pytest.approx(row["uncertainty"])


def test_brier_constant_forecast_identity(spark):
    from seafan_spark.diags import brier_decomposition

    # constant p=0.5 vs base rate 0.25: brier = mean((0.5-y)^2) = 0.25,
    # rel = (0.5-0.25)^2 = 0.0625, res = 0, unc = 0.1875; within_bin = 0
    p = vec_to_pipe(
        spark, {"p": [0.5] * 4, "y": [1.0, 0.0, 0.0, 0.0]}
    )
    row = brier_decomposition(p, "p", "y", bins=10).collect()[0]
    assert row["brier"] == pytest.approx(0.25)
    assert row["reliability"] == pytest.approx(0.0625)
    assert row["resolution"] == pytest.approx(0.0)
    assert row["uncertainty"] == pytest.approx(0.1875)
    assert row["within_bin"] == pytest.approx(0.0, abs=1e-6)


def test_brier_bins_guard(spark):
    from seafan_spark.diags import brier_decomposition

    p = vec_to_pipe(spark, {"p": [0.5], "y": [1.0]})
    with pytest.raises(ValueError, match="bins"):
        brier_decomposition(p, "p", "y", bins=0)


# ----------------------------------------------------------- l_diversity ----
def test_l_diversity_counts(spark):
    from seafan_spark.quality import l_diversity

    p = vec_to_pipe(
        spark,
        {
            "zip": ["a", "a", "a", "b", "b", "c"],
            "diag": ["flu", "flu", "cold", "flu", "flu", None],
        },
    )
    row = l_diversity(p.df, ["zip"], "diag", l=2).collect()[0]
    assert row["n_rows"] == 6 and row["n_classes"] == 3
    # class a has 2 distinct diagnoses; b has 1; c has 0 (NULL only)
    assert row["min_distinct_sensitive"] == 0
    assert row["violating_classes"] == 2
    assert row["violating_rows"] == 3


def test_l_diversity_guards(spark):
    from seafan_spark.quality import l_diversity

    p = vec_to_pipe(spark, {"zip": ["a"], "diag": ["flu"]})
    with pytest.raises(ValueError, match="quasi-identifier"):
        l_diversity(p.df, [], "diag")
    with pytest.raises(ValueError, match="l must be"):
        l_diversity(p.df, ["zip"], "diag", l=0)


# ----------------------------------------------------------------- ks_by ----
def test_ks_by_matches_scalar_ks(spark):
    # the distributed grouped form must agree with the driver-fold ks()
    # on identical data (single group)
    from seafan_spark.diags import ks, ks_by

    import random

    rng = random.Random(3)
    s = [rng.gauss(0, 1) for _ in range(200)] + [rng.gauss(1, 1) for _ in range(200)]
    y = [0.0] * 200 + [1.0] * 200
    p = vec_to_pipe(spark, {"s": s, "y": y})
    scalar = ks(p, "s", "y", bins=100)
    row = ks_by(p, "s", "y", bins=100).collect()[0]
    assert row["ks"] == pytest.approx(scalar, abs=1e-6)
    assert row["n_pos"] == 200 and row["n_neg"] == 200


def test_ks_by_separated_and_identical(spark):
    from seafan_spark.diags import ks_by

    # perfectly separated classes -> KS 100
    p = vec_to_pipe(
        spark, {"s": [1.0, 2.0, 3.0, 11.0, 12.0, 13.0],
                "y": [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]}
    )
    assert ks_by(p, "s", "y", bins=10).collect()[0]["ks"] == pytest.approx(100.0)
    # identical distributions -> KS 0
    p2 = vec_to_pipe(
        spark, {"s": [1.0, 2.0, 1.0, 2.0], "y": [0.0, 0.0, 1.0, 1.0]}
    )
    assert ks_by(p2, "s", "y", bins=10).collect()[0]["ks"] == pytest.approx(0.0)


def test_ks_by_grouped_degenerate_and_zero_range(spark):
    from seafan_spark.diags import ks_by

    p = vec_to_pipe(
        spark,
        {
            "g": ["a", "a", "a", "a", "b", "b", "c", "c"],
            "s": [1.0, 2.0, 9.0, 10.0, 5.0, 5.0, 1.0, 2.0],
            "y": [0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 1.0, 1.0],
        },
    )
    rows = {r["g"]: r for r in ks_by(p, "s", "y", keys=["g"], bins=10).collect()}
    assert rows["a"]["ks"] == pytest.approx(100.0)
    # zero score range: KS is exactly 0
    assert rows["b"]["ks"] == pytest.approx(0.0)
    # one-class group: NULL, not an error
    assert rows["c"]["ks"] is None


def test_target_encode_zero_smoothing_empty_level(spark):
    # smoothing=0 with an all-NULL-target level: falls back to the prior
    # instead of an ANSI divide-by-zero
    p = vec_to_pipe(
        spark, {"cat": ["a", "a", "z"], "y": [1.0, 0.0, None]}
    )
    out = target_encode(p, "cat", "y", name="te", smoothing=0.0)
    rows = {r["cat"]: r["te"] for r in out.df.collect()}
    assert rows["z"] == pytest.approx(0.5)
    assert rows["a"] == pytest.approx(0.5)


# --------------------------------------------------------------- logrank ----
def test_logrank_hand_computed(spark):
    from seafan_spark.temporal import logrank_test

    # arm 0 events at t=1,2; arm 1 events at t=3,4 (complete separation):
    # t=1: n=4 n1=2 d=1 d1=0 E1=0.5    V=0.25
    # t=2: n=3 n1=2 d=1 d1=0 E1=2/3    V=2/9
    # t=3: n=2 n1=2 d=1 d1=1 E1=1      V=0
    # t=4: n=1 n1=1 d=1 d1=1 E1=1      V=0 (n=1 guard)
    # chi2 = (2 - 19/6)^2 / (0.25 + 2/9) = 2.882353
    p = vec_to_pipe(
        spark,
        {"t": [1.0, 2.0, 3.0, 4.0], "e": [1, 1, 1, 1], "g": [0, 0, 1, 1]},
    )
    row = logrank_test(p, "t", "e", "g").collect()[0]
    assert row["observed1"] == 2
    assert row["expected1"] == pytest.approx(19 / 6, abs=1e-6)
    assert row["chi2"] == pytest.approx((2 - 19 / 6) ** 2 / (0.25 + 2 / 9), abs=1e-5)
    assert row["n0"] == 2 and row["n1"] == 2


def test_logrank_identical_arms_zero(spark):
    from seafan_spark.temporal import logrank_test

    # both arms share the same event times -> O1 == E1 -> chi2 == 0
    p = vec_to_pipe(
        spark,
        {
            "t": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
            "e": [1, 1, 1, 1, 1, 1],
            "g": [0, 0, 0, 1, 1, 1],
        },
    )
    row = logrank_test(p, "t", "e", "g").collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert row["significant"] is False


def test_logrank_one_arm_is_null(spark):
    from seafan_spark.temporal import logrank_test

    p = vec_to_pipe(
        spark, {"t": [1.0, 2.0], "e": [1, 1], "g": [0, 0]}
    )
    row = logrank_test(p, "t", "e", "g").collect()[0]
    assert row["chi2"] is None and row["significant"] is None


def test_logrank_grouped_cells(spark):
    from seafan_spark.temporal import logrank_test

    p = vec_to_pipe(
        spark,
        {
            "cell": ["a"] * 4 + ["b"] * 4,
            "t": [1.0, 2.0, 3.0, 4.0] * 2,
            "e": [1, 1, 1, 1] * 2,
            "g": [0, 0, 1, 1, 0, 0, 1, 1],
        },
    )
    rows = {r["cell"]: r for r in
            logrank_test(p, "t", "e", "g", keys=["cell"]).collect()}
    # identical fixture per cell -> identical statistic, computed per cell
    assert rows["a"]["chi2"] == pytest.approx(rows["b"]["chi2"])


# ------------------------------------------------------ conformal / NA ----
def test_survival_km_cumhaz_nelson_aalen(spark):
    # same textbook fixture: cumhaz = running sum of d/n over all times
    p = vec_to_pipe(
        spark,
        {"t": [1.0, 2.0, 3.0, 4.0, 4.0], "e": [1, 1, 0, 1, 0]},
    )
    rows = {r["t"]: r for r in survival_km(p, "t", "e").collect()}
    assert rows[1.0]["cumhaz"] == pytest.approx(1 / 5)
    assert rows[2.0]["cumhaz"] == pytest.approx(1 / 5 + 1 / 4)
    assert rows[3.0]["cumhaz"] == pytest.approx(1 / 5 + 1 / 4)  # censor-only
    assert rows[4.0]["cumhaz"] == pytest.approx(1 / 5 + 1 / 4 + 1 / 2)


def test_logrank_wilcoxon_weights_differ(spark):
    from seafan_spark.temporal import logrank_test

    p = vec_to_pipe(
        spark,
        {"t": [1.0, 2.0, 3.0, 4.0], "e": [1, 1, 1, 1], "g": [0, 0, 1, 1]},
    )
    lr = logrank_test(p, "t", "e", "g").collect()[0]
    wx = logrank_test(p, "t", "e", "g", weights="wilcoxon").collect()[0]
    # same O/E bookkeeping, different statistic
    assert wx["observed1"] == lr["observed1"]
    assert wx["expected1"] == pytest.approx(lr["expected1"])
    assert wx["chi2"] != pytest.approx(lr["chi2"])
    # hand check: oe_w = 4*(-.5) + 3*(-2/3) + 0 + 0 = -4;
    # vv_w = 16*.25 + 9*(2/9) = 6; chi2 = 16/6
    assert wx["chi2"] == pytest.approx(16 / 6, abs=1e-5)
    with pytest.raises(ValueError, match="weights"):
        logrank_test(p, "t", "e", "g", weights="tarone")


def test_conformal_coverage_and_determinism(spark):
    import random

    from seafan_spark.diags import conformal_interval

    rng = random.Random(11)
    n = 400
    data = {
        "rid": list(range(n)),
        "pred": [float(i % 50) for i in range(n)],
        "actual": [float(i % 50) + rng.gauss(0, 2.0) for i in range(n)],
    }
    p = vec_to_pipe(spark, data)
    out = conformal_interval(p, "pred", "actual", "rid", alpha=0.1)
    test_rows = out.filter(~F.col("is_calibration")).collect()
    covered = sum(
        1 for r in test_rows if r["conf_lo"] <= r["actual"] <= r["conf_hi"]
    )
    # exchangeable data: coverage should be ~90%; allow slack for n=~200
    assert covered / len(test_rows) >= 0.8
    # same split + same q on a second run (determinism)
    out2 = conformal_interval(p, "pred", "actual", "rid", alpha=0.1)
    assert out2.select("conf_lo").first()[0] == out.select("conf_lo").first()[0]


def test_conformal_guards(spark):
    from seafan_spark.diags import conformal_interval

    p = vec_to_pipe(spark, {"rid": [1, 2], "pred": [1.0, 2.0], "actual": [1.0, 2.0]})
    with pytest.raises(ValueError, match="alpha"):
        conformal_interval(p, "pred", "actual", "rid", alpha=0.0)
    with pytest.raises(ValueError, match="too small"):
        conformal_interval(p, "pred", "actual", "rid", alpha=0.01)


# ---------------------------------------------------------------- impute ----
def test_impute_mean_grouped_and_all_null_group(spark):
    from seafan_spark.encode import impute

    p = vec_to_pipe(
        spark,
        {
            "g": ["a", "a", "a", "b", "b"],
            "x": [1.0, 3.0, None, None, None],
        },
    )
    out = impute(p, "x", strategy="mean", keys=["g"], name="xi")
    rows = [(r["g"], r["x"], r["xi"]) for r in out.df.collect()]
    a_null = [xi for g, x, xi in rows if g == "a" and x is None]
    assert a_null == [pytest.approx(2.0)]
    # group b has no observations: falls back to the GLOBAL mean (2.0)
    b_vals = sorted(xi for g, _, xi in rows if g == "b")
    assert b_vals == pytest.approx([2.0, 2.0])


def test_impute_median_grouped_even_odd(spark):
    from seafan_spark.encode import impute

    p = vec_to_pipe(
        spark,
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "x": [1.0, 2.0, 10.0, None, 5.0, 7.0, None],
        },
    )
    out = impute(p, "x", strategy="median", keys=["g"], name="xi")
    rows = [(r["g"], r["x"], r["xi"]) for r in out.df.collect()]
    # group a: 3 observed values {1,2,10} -> median 2
    assert [xi for g, x, xi in rows if g == "a" and x is None] == [
        pytest.approx(2.0)
    ]
    # group b: {5,7} -> median 6
    assert [xi for g, x, xi in rows if g == "b" and x is None] == [
        pytest.approx(6.0)
    ]


def test_impute_median_ungrouped_exact(spark):
    from seafan_spark.encode import impute

    p = vec_to_pipe(spark, {"x": [1.0, 2.0, 3.0, 100.0, None]})
    out = impute(p, "x", strategy="median", name="xi")
    got = {r["x"]: r["xi"] for r in out.df.collect()}
    assert got[None] == pytest.approx(2.5)


def test_impute_mode_tiebreak_and_constant(spark):
    from seafan_spark.encode import impute
    from seafan_spark.encode import EncodeError

    p = vec_to_pipe(spark, {"x": ["b", "a", None, "a", "b"]})
    out = impute(p, "x", strategy="mode", name="xi")
    # a and b tie at 2: smallest value wins
    assert [r["xi"] for r in out.df.collect() if r["x"] is None] == ["a"]
    out2 = impute(p, "x", strategy="constant", value="z", name="xi")
    assert [r["xi"] for r in out2.df.collect() if r["x"] is None] == ["z"]
    with pytest.raises(EncodeError, match="strategy"):
        impute(p, "x", strategy="knn")
    with pytest.raises(EncodeError, match="value"):
        impute(p, "x", strategy="constant")


def test_impute_all_null_column_raises_not_empty(spark):
    """An all-NULL column must raise a clear EncodeError, never silently
    return an empty relation (the old mode path crossJoined an EMPTY
    1-row global-mode relation, dropping every input row)."""
    from seafan_spark.encode import EncodeError, impute
    from seafan_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", None, 0), ("b", None, 1)],
        "g string, x double, _rid long",
    )
    p = Pipeline(df)
    with pytest.raises(EncodeError, match="no observed"):
        impute(p, "x", strategy="mode", name="xi")
    with pytest.raises(EncodeError, match="no observed"):
        impute(p, "x", strategy="median", name="xi")
    with pytest.raises(EncodeError, match="no observed"):
        impute(p, "x", strategy="median", keys=["g"], name="xi")
    # mean leaves NULLs (the 1-row global agg is NULL, coalesce no-ops)
    out = impute(p, "x", strategy="mean", name="xi")
    assert [r["xi"] for r in out.df.collect()] == [None, None]


# ---------------------------------------------------------------- cox_ph ----
def _cox_numpy_reference(t, e, X, max_iter=12, tol=1e-9):
    """Independent plain-numpy Newton on the Breslow partial likelihood
    (suffix sums over sorted times) — the parity oracle for cox_ph."""
    import numpy as np

    t = np.asarray(t, dtype=float)
    e = np.asarray(e, dtype=int)
    X = np.asarray(X, dtype=float)
    n, p = X.shape
    beta = np.zeros(p)
    order = np.argsort(-t)  # descending
    ts, es, Xs = t[order], e[order], X[order]
    for _ in range(max_iter):
        s = np.exp(Xs @ beta)
        S0 = np.cumsum(s)
        S1 = np.cumsum(s[:, None] * Xs, axis=0)
        S2 = np.cumsum(s[:, None, None] * (Xs[:, :, None] * Xs[:, None, :]), axis=0)
        grad = np.zeros(p)
        info = np.zeros((p, p))
        # iterate distinct event times; suffix sums = cumsum at the LAST
        # index of each time block (all subjects with t >= that time)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and ts[j + 1] == ts[i]:
                j += 1
            d = es[i : j + 1].sum()
            if d > 0:
                dx = (es[i : j + 1, None] * Xs[i : j + 1]).sum(axis=0)
                s0, s1, s2 = S0[j], S1[j], S2[j]
                grad += dx - d * s1 / s0
                info += d * (s2 / s0 - np.outer(s1, s1) / s0**2)
            i = j + 1
        step = np.linalg.solve(info, grad)
        beta = beta + step
        if np.max(np.abs(step)) < tol:
            break
    return beta


def test_cox_ph_matches_numpy_reference(spark):
    import random

    from seafan_spark.temporal import cox_ph

    rng = random.Random(5)
    n = 120
    x1 = [float(rng.random() > 0.5) for _ in range(n)]
    x2 = [round(rng.gauss(0, 1), 3) for _ in range(n)]
    t = [round(rng.expovariate(0.1 * (2.0 ** x1[i])), 2) for i in range(n)]
    e = [1 if t[i] < 15 else 0 for i in range(n)]
    t = [min(v, 15.0) for v in t]
    p = vec_to_pipe(spark, {"t": t, "e": e, "x1": x1, "x2": x2})
    res = cox_ph(p, "t", "e", ["x1", "x2"])
    import numpy as np

    ref = _cox_numpy_reference(t, e, np.column_stack([x1, x2]))
    assert res[0]["beta"] == pytest.approx(ref[0], abs=1e-6)
    assert res[1]["beta"] == pytest.approx(ref[1], abs=1e-6)
    # planted hazard ratio ~2 on x1: positive, significant
    assert res[0]["beta"] > 0.2 and res[0]["z"] > 1.5
    assert res[0]["hr"] == pytest.approx(float(np.exp(res[0]["beta"])))


def test_cox_ph_null_covariate_near_zero(spark):
    import random

    from seafan_spark.temporal import cox_ph

    rng = random.Random(9)
    n = 150
    x = [float(i % 2) for i in range(n)]
    t = [round(rng.expovariate(0.2), 2) + 0.01 for _ in range(n)]
    e = [1] * n
    p = vec_to_pipe(spark, {"t": t, "e": e, "x": x})
    res = cox_ph(p, "t", "e", ["x"])
    # covariate independent of hazard: |z| small
    assert abs(res[0]["z"]) < 2.0


def test_cox_ph_needs_covariates(spark):
    from seafan_spark.temporal import cox_ph

    p = vec_to_pipe(spark, {"t": [1.0], "e": [1], "x": [0.0]})
    with pytest.raises(ValueError, match="covariate"):
        cox_ph(p, "t", "e", [])


def test_cox_ph_collinear_covariates_descriptive_error(spark):
    """Duplicated covariate -> singular information matrix: must raise a
    descriptive ValueError, not a bare numpy LinAlgError."""
    from seafan_spark.temporal import cox_ph

    t = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    x = [0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    p = vec_to_pipe(spark, {"t": t, "e": [1] * 6, "x1": x, "x2": x})
    with pytest.raises(ValueError, match="collinear|singular"):
        cox_ph(p, "t", "e", ["x1", "x2"])


def test_cox_ph_reports_convergence_flag(spark):
    from seafan_spark.temporal import cox_ph

    t = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    e = [1, 1, 0, 1, 1, 0, 1, 1]
    x = [0.2, -0.1, 0.4, 0.0, -0.3, 0.5, 0.1, -0.2]
    p = vec_to_pipe(spark, {"t": t, "e": e, "x": x})
    assert cox_ph(p, "t", "e", ["x"])[0]["converged"] is True
    # one Newton step on a non-trivial likelihood cannot hit tol=1e-9
    assert cox_ph(p, "t", "e", ["x"], max_iter=1)[0]["converged"] is False


def test_fdr_bh_output_name_collision_guard(spark):
    """Pre-existing 'rank' column must raise (not emit two ambiguous
    'rank' columns); rank_col= reroutes the output name."""
    from seafan_spark.agg import fdr_bh

    p = vec_to_pipe(spark, {"p": [0.01, 0.2, 0.9], "rank": [9, 9, 9]})
    with pytest.raises(ValueError, match="rank"):
        fdr_bh(p, "p")
    out = fdr_bh(p, "p", rank_col="bh_rank")
    assert "bh_rank" in out.columns and out.columns.count("rank") == 1
    assert [r["bh_rank"] for r in out.orderBy("p").collect()] == [1, 2, 3]


# --------------------------------------------------------------- ann_lsh ----
def test_adaptive_planes_keeps_bucket_size_constant():
    from seafan_spark.llmops.similarity import adaptive_planes

    # expected bucket size n / 2^planes stays <= ~2*target as n grows
    for n in (100, 2_000, 20_000, 200_000, 2_000_000):
        p = adaptive_planes(n, target_bucket=16)
        assert n / (2 ** p) <= 32 or p == 8  # floor dominates tiny n
    assert adaptive_planes(10) == 8           # floor
    assert adaptive_planes(2_000) == 8        # log2(125) ~ 7 -> floor
    assert adaptive_planes(20_000) == 11      # log2(1250) ~ 10.3 -> 11
    assert adaptive_planes(2_000_000) == 17


def test_ann_lsh_adaptive_default_runs_and_finds_planted(spark):
    import random

    from seafan_spark.llmops.similarity import ann_lsh_topk
    from seafan_spark.sources import vec_to_pipe

    rng = random.Random(3)
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(60)]
    vecs[1] = [v + rng.gauss(0, 0.01) for v in vecs[0]]  # planted near-dup
    p = vec_to_pipe(spark, {"id": list(range(60)), "v": vecs})
    out = ann_lsh_topk(p, "id", "v", k=3, dim=8)  # planes=None adaptive
    top = {r["neighbor_id"] for r in out.collect() if r["q_id"] == 0 and r["rank"] == 1}
    assert top == {1}
