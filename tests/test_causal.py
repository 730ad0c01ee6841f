"""Tests for the causal/experimentation estimators (seafan_spark.causal):
difference-in-differences, IPW ATE, and relational propensity matching."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafan_spark.causal import did_estimator, ipw_ate, propensity_match
from seafan_spark.sources import vec_to_pipe


# ------------------------------------------------------------------- did ----
def test_did_hand_computed_2x2(spark):
    # treated: pre mean 10, post mean 15 (+5); control: 8 -> 9 (+1)
    rows = {
        "t": [1, 1, 1, 1, 0, 0, 0, 0],
        "post": [0, 0, 1, 1, 0, 0, 1, 1],
        "y": [9.0, 11.0, 14.0, 16.0, 7.0, 9.0, 8.0, 10.0],
    }
    p = vec_to_pipe(spark, rows)
    r = did_estimator(p, "t", "post", "y").collect()[0]
    assert r["y_t_pre"] == 10.0 and r["y_t_post"] == 15.0
    assert r["y_c_pre"] == 8.0 and r["y_c_post"] == 9.0
    assert r["att"] == pytest.approx(4.0)
    assert (r["n_t_pre"], r["n_t_post"], r["n_c_pre"], r["n_c_post"]) == (
        2, 2, 2, 2,
    )


def test_did_empty_arm_yields_null_not_zero(spark):
    rows = {"t": [1, 1, 1, 1], "post": [0, 0, 1, 1], "y": [1.0, 2.0, 3.0, 4.0]}
    p = vec_to_pipe(spark, rows)
    r = did_estimator(p, "t", "post", "y").collect()[0]
    assert r["att"] is None and r["n_c_pre"] == 0


def test_did_keyed_cells_independent(spark):
    rows = {
        "seg": ["a"] * 8 + ["b"] * 8,
        "t": [1, 1, 1, 1, 0, 0, 0, 0] * 2,
        "post": [0, 0, 1, 1, 0, 0, 1, 1] * 2,
        "y": [9.0, 11.0, 14.0, 16.0, 7.0, 9.0, 8.0, 10.0]  # att 4
        + [0.0, 2.0, 1.0, 3.0, 0.0, 2.0, 1.0, 3.0],        # att 0
    }
    p = vec_to_pipe(spark, rows)
    got = {r["seg"]: r["att"] for r in did_estimator(p, "t", "post", "y", keys=["seg"]).collect()}
    assert got == {"a": pytest.approx(4.0), "b": pytest.approx(0.0)}


# --------------------------------------------------------------- ipw_ate ----
def test_ipw_hajek_hand_computed(spark):
    # two treated at e=0.5 (w=2 each), two controls at e=0.5 (w=2 each)
    rows = {
        "t": [1, 1, 0, 0],
        "y": [3.0, 5.0, 1.0, 3.0],
        "e": [0.5, 0.5, 0.5, 0.5],
    }
    p = vec_to_pipe(spark, rows)
    r = ipw_ate(p, "t", "y", "e").collect()[0]
    assert r["mu1"] == pytest.approx(4.0) and r["mu0"] == pytest.approx(2.0)
    assert r["ate"] == pytest.approx(2.0)
    assert r["n"] == 4 and r["n_treated"] == 2


def test_ipw_weights_correct_confounded_sample(spark):
    # stratum A (e=0.8): y1=10, y0=8; stratum B (e=0.2): y1=4, y0=2.
    # true ATE = 2 in both strata; naive diff of means is biased because
    # treated oversample stratum A. Hajek IPW recovers 2 exactly.
    rows = {"t": [], "y": [], "e": []}
    for (e, y1, y0, n1, n0) in ((0.8, 10.0, 8.0, 8, 2), (0.2, 4.0, 2.0, 2, 8)):
        rows["t"] += [1] * n1 + [0] * n0
        rows["y"] += [y1] * n1 + [y0] * n0
        rows["e"] += [e] * (n1 + n0)
    p = vec_to_pipe(spark, rows)
    r = ipw_ate(p, "t", "y", "e").collect()[0]
    assert r["ate"] == pytest.approx(2.0)
    naive = (
        p.df.groupBy()
        .agg(
            F.avg(F.when(F.col("t") == 1, F.col("y"))).alias("m1"),
            F.avg(F.when(F.col("t") == 0, F.col("y"))).alias("m0"),
        )
        .collect()[0]
    )
    assert abs((naive["m1"] - naive["m0"]) - 2.0) > 1.0  # the bias is real


def test_ipw_clip_and_estimator_validation(spark):
    p = vec_to_pipe(spark, {"t": [1, 0], "y": [1.0, 0.0], "e": [0.001, 0.999]})
    # with clip (0.01, 0.99): weights bounded at 100, no inf
    r = ipw_ate(p, "t", "y", "e").collect()[0]
    assert r["sum_w1"] == pytest.approx(100.0)
    with pytest.raises(ValueError, match="estimator"):
        ipw_ate(p, "t", "y", "e", estimator="aipw")
    with pytest.raises(ValueError, match="clip"):
        ipw_ate(p, "t", "y", "e", clip=(0.5, 0.4))


def test_ipw_horvitz_thompson_differs_from_hajek(spark):
    rows = {"t": [1, 0, 0, 0], "y": [4.0, 1.0, 1.0, 1.0], "e": [0.5, 0.5, 0.5, 0.5]}
    p = vec_to_pipe(spark, rows)
    hj = ipw_ate(p, "t", "y", "e").collect()[0]
    ht = ipw_ate(p, "t", "y", "e", estimator="horvitz_thompson").collect()[0]
    assert hj["mu1"] == pytest.approx(4.0)          # normalized
    assert ht["mu1"] == pytest.approx(8.0 / 4.0)     # sum(w*y)/n
    assert hj["ate"] != ht["ate"]


# -------------------------------------------------------------- aipw_ate ----
def test_aipw_hand_computed(spark):
    from seafan_spark.causal import aipw_ate

    # e=0.5 everywhere; mu1/mu0 constant -> psi per row hand-computable:
    # treated: (m1-m0) + (y-m1)/0.5 ; control: (m1-m0) - (y-m0)/0.5
    rows = {
        "t": [1, 0],
        "y": [6.0, 1.0],
        "e": [0.5, 0.5],
        "m1": [5.0, 5.0],
        "m0": [2.0, 2.0],
    }
    p = vec_to_pipe(spark, rows)
    r = aipw_ate(p, "t", "y", "e", "m1", "m0").collect()[0]
    psi = [(5 - 2) + (6 - 5) / 0.5, (5 - 2) - (1 - 2) / 0.5]  # [5, 5]
    assert r["ate"] == pytest.approx(sum(psi) / 2) == pytest.approx(5.0)
    assert r["se"] == pytest.approx(0.0)  # identical psi -> zero variance
    assert r["n"] == 2


def test_aipw_doubly_robust_with_correct_outcome_model(spark):
    """With the TRUE outcome regressions plugged in, AIPW recovers the
    exact ATE even when the propensity column is garbage (the 'doubly
    robust' half the estimator is named for)."""
    import random

    from seafan_spark.causal import aipw_ate

    rng = random.Random(3)
    rows = {"t": [], "y": [], "e": [], "m1": [], "m0": [], "x": []}
    for _ in range(400):
        x = float(rng.randint(0, 4))
        t = 1 if rng.random() < 0.2 + 0.12 * x else 0  # confounded assignment
        m1, m0 = 10.0 + x, 7.0 + x                      # true ATE = 3
        rows["t"].append(t)
        rows["y"].append(m1 if t else m0)               # no outcome noise
        rows["e"].append(0.5)                           # WRONG propensity
        rows["m1"].append(m1)
        rows["m0"].append(m0)
        rows["x"].append(x)
    p = vec_to_pipe(spark, rows)
    r = aipw_ate(p, "t", "y", "e", "m1", "m0").collect()[0]
    assert r["ate"] == pytest.approx(3.0)  # exact: residuals are zero
    with pytest.raises(ValueError, match="clip"):
        aipw_ate(p, "t", "y", "e", "m1", "m0", clip=(0.9, 0.1))


# ------------------------------------------------------ propensity_match ----
def test_match_picks_nearest_side_and_caliper(spark):
    rows = {
        "id": [1, 2, 3, 4, 5],
        "t": [1, 0, 0, 1, 1],
        "s": [0.30, 0.28, 0.45, 0.44, 0.90],
    }
    p = vec_to_pipe(spark, rows)
    m = {r["treated_id"]: r for r in propensity_match(p, "id", "t", "s", caliper=0.1).collect()}
    assert m[1]["control_id"] == 2 and m[1]["distance"] == pytest.approx(0.02)
    assert m[4]["control_id"] == 3 and m[4]["distance"] == pytest.approx(0.01)
    assert 5 not in m  # nearest control 0.45 is outside the 0.1 caliper


def test_match_tie_goes_to_lower_score(spark):
    rows = {
        "id": [10, 20, 30],
        "t": [0, 1, 0],
        "s": [0.4, 0.5, 0.6],  # exactly equidistant
    }
    p = vec_to_pipe(spark, rows)
    r = propensity_match(p, "id", "t", "s", caliper=1.0).collect()[0]
    assert r["control_id"] == 10 and r["control_score"] == pytest.approx(0.4)


def test_match_with_replacement_and_keys_isolation(spark):
    rows = {
        "g": ["a", "a", "a", "b", "b"],
        "id": [1, 2, 3, 4, 5],
        "t": [1, 1, 0, 1, 0],
        "s": [0.5, 0.52, 0.51, 0.5, 0.9],
    }
    p = vec_to_pipe(spark, rows)
    m = propensity_match(p, "id", "t", "s", caliper=0.05, keys=["g"]).collect()
    got = {(r["g"], r["treated_id"]): r["control_id"] for r in m}
    # control 3 is reused by both treated in group a (with replacement)
    assert got[("a", 1)] == 3 and got[("a", 2)] == 3
    # group b's only control is 0.4 away: outside caliper, no cross-group leak
    assert ("b", 4) not in got
    r = propensity_match(p, "id", "t", "s", caliper=0.5, keys=["g"]).collect()
    got2 = {(x["g"], x["treated_id"]): x["control_id"] for x in r}
    assert got2[("b", 4)] == 5


def test_match_equal_score_control_visible(spark):
    # a control at EXACTLY the treated score must match at distance 0
    rows = {"id": [1, 2], "t": [1, 0], "s": [0.7, 0.7]}
    p = vec_to_pipe(spark, rows)
    r = propensity_match(p, "id", "t", "s", caliper=0.01).collect()[0]
    assert r["control_id"] == 2 and r["distance"] == 0.0


# ----------------------------------------------------------- cluster_ttest ----
def test_cluster_ttest_welch_over_cluster_means(spark):
    """Hand-check: treated clusters mean {10, 12, 14}, control {9, 9,
    9, 9} — t computed on the 3-vs-4 cluster means, not the unit rows
    (each cluster holds several identical units, which would otherwise
    inflate n and the statistic)."""
    import math

    from seafan_spark.causal import cluster_ttest

    rows = {"c": [], "t": [], "y": []}
    for cid, (tt, m) in enumerate(
        [(1, 10.0), (1, 12.0), (1, 14.0), (0, 9.0), (0, 9.0), (0, 9.0), (0, 9.0)]
    ):
        for _ in range(5):  # 5 identical units per cluster
            rows["c"].append(cid)
            rows["t"].append(tt)
            rows["y"].append(m)
    p = vec_to_pipe(spark, rows)
    r = cluster_ttest(p, "c", "t", "y").collect()[0]
    assert (r["n1"], r["n0"]) == (3, 4)
    assert r["mean1"] == pytest.approx(12.0) and r["mean0"] == pytest.approx(9.0)
    # Welch over cluster means: v1 = 4, v0 = 0 -> se2 = 4/3, t = 3/sqrt(4/3)
    assert r["t_stat"] == pytest.approx(3.0 / math.sqrt(4.0 / 3.0))
    assert r["df"] == pytest.approx(2.0)  # all variance from the 3 treated


def test_cluster_ttest_rejects_mixed_clusters(spark):
    from seafan_spark.causal import cluster_ttest

    p = vec_to_pipe(
        spark, {"c": [1, 1, 2, 2], "t": [1, 0, 0, 0], "y": [1.0, 2.0, 3.0, 4.0]}
    )
    with pytest.raises(ValueError, match="MIXED"):
        cluster_ttest(p, "c", "t", "y")


def test_cluster_ttest_vs_unit_level_inflation(spark):
    """Correlated within-cluster outcomes: the unit-level t (ttest_by)
    is far larger than the cluster-level one — the anticonservativeness
    the estimator exists to fix."""
    import random

    from seafan_spark.agg import ttest_by
    from seafan_spark.causal import cluster_ttest

    rng = random.Random(17)
    rows = {"c": [], "t": [], "y": []}
    for cid in range(12):
        tt = 1 if cid % 2 == 0 else 0
        cluster_effect = rng.gauss(0.3 if tt else 0.0, 1.0)
        for _ in range(50):  # strong within-cluster correlation
            rows["c"].append(cid)
            rows["t"].append(tt)
            rows["y"].append(cluster_effect + rng.gauss(0, 0.05))
    p = vec_to_pipe(spark, rows)
    cl = cluster_ttest(p, "c", "t", "y").collect()[0]
    unit = ttest_by(p, "y", "t", keys=[]).collect()[0]
    assert abs(unit["t_stat"]) > 3 * abs(cl["t_stat"])
    assert cl["n1"] == 6 and cl["n0"] == 6


# -------------------------------------------------------------- power_mde ----
def test_power_mde_closed_form(spark):
    import math

    from seafan_spark.causal import power_mde

    ys = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]  # var = 3.5, mean 3.5, n 6
    p = vec_to_pipe(spark, {"y": ys})
    r = power_mde(p, "y").collect()[0]
    expect = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
        3.5 * (2.0 + 2.0) / 6.0
    )
    assert r["var"] == pytest.approx(3.5) and r["n"] == 6
    assert r["mde"] == pytest.approx(expect)
    assert r["mde_rel"] == pytest.approx(expect / 3.5)
    # unbalanced design needs a larger effect to detect
    r2 = power_mde(p, "y", treat_frac=0.1).collect()[0]
    assert r2["mde"] > r["mde"]
    with pytest.raises(ValueError, match="treat_frac"):
        power_mde(p, "y", treat_frac=1.0)


def test_srm_check_flags_broken_split(spark):
    from seafan_spark.causal import srm_check

    # 50/50 design, observed 700/300: chi2 = 2*(200^2/500) = 160 >> 3.841
    p = vec_to_pipe(spark, {"t": [1] * 700 + [0] * 300})
    r = srm_check(p, "t").collect()[0]
    assert r["srm"] is True and r["chi2"] == pytest.approx(160.0)
    assert (r["n_t"], r["n_c"], r["expected_t"]) == (700, 300, 500.0)
    # a healthy 50/50 split does not flag
    p2 = vec_to_pipe(spark, {"t": [1] * 503 + [0] * 497})
    assert srm_check(p2, "t").collect()[0]["srm"] is False
    # 90/10 design with matching observation: clean
    p3 = vec_to_pipe(spark, {"t": [1] * 900 + [0] * 100})
    assert srm_check(p3, "t", expected_frac=0.9).collect()[0]["srm"] is False
    with pytest.raises(ValueError, match="expected_frac"):
        srm_check(p3, "t", expected_frac=0.0)


# ----------------------------------------------------------- uplift_curve ----
def test_uplift_curve_hand_computed_two_buckets(spark):
    from seafan_spark.causal import uplift_curve

    # scores rank ids 1..4 descending; top half: treated converts,
    # control doesn't; bottom half: both convert equally
    rows = {
        "id": [1, 2, 3, 4],
        "t": [1, 0, 1, 0],
        "y": [1.0, 0.0, 1.0, 1.0],
        "s": [0.9, 0.8, 0.2, 0.1],
    }
    p = vec_to_pipe(spark, rows)
    out = {r["bucket"]: r for r in uplift_curve(p, "t", "y", "s", "id", n_buckets=2).collect()}
    b1, b2 = out[1], out[2]
    # bucket 1 cumulative: ids 1,2 -> n_t=1, n_c=1, y_t=1, y_c=0, qini=1
    assert (b1["n"], b1["n_t"], b1["n_c"]) == (2, 1, 1)
    assert b1["qini"] == pytest.approx(1.0)
    # full population: y_t=2, y_c=1, n_t=n_c=2 -> qini = 2 - 1*1 = 1
    assert (b2["n"], b2["y_t"], b2["y_c"]) == (4, 2.0, 1.0)
    assert b2["qini"] == pytest.approx(1.0)


def test_uplift_curve_good_model_frontloads_qini(spark):
    import random

    from seafan_spark.causal import uplift_curve

    rng = random.Random(21)
    rows = {"id": [], "t": [], "y": [], "s": []}
    for i in range(400):
        # true uplift is high for even ids; a perfect model scores them high
        hi = i % 2 == 0
        t = rng.random() < 0.5
        base = 0.2
        p_conv = base + (0.5 if (hi and t) else 0.0)
        rows["id"].append(i)
        rows["t"].append(1 if t else 0)
        rows["y"].append(1.0 if rng.random() < p_conv else 0.0)
        rows["s"].append(1.0 if hi else 0.0)
    p = vec_to_pipe(spark, rows)
    out = sorted(
        uplift_curve(p, "t", "y", "s", "id", n_buckets=4).collect(),
        key=lambda r: r["bucket"],
    )
    # half the qini should be realized by depth 1/2 (the scored-high half)
    assert out[1]["qini"] > 0.8 * out[3]["qini"]
    # cumulative counts are monotone and end at the population
    assert out[3]["n"] == 400 and out[0]["n"] < out[3]["n"]


def test_uplift_curve_no_controls_yet_null(spark):
    from seafan_spark.causal import uplift_curve

    rows = {"id": [1, 2], "t": [1, 0], "y": [1.0, 0.0], "s": [0.9, 0.1]}
    p = vec_to_pipe(spark, rows)
    out = {r["bucket"]: r for r in uplift_curve(p, "t", "y", "s", "id", n_buckets=2).collect()}
    assert out[1]["qini"] is None  # first bucket is all-treated
    with pytest.raises(ValueError, match="n_buckets"):
        uplift_curve(p, "t", "y", "s", "id", n_buckets=0)


def test_match_validates_caliper(spark):
    p = vec_to_pipe(spark, {"id": [1], "t": [1], "s": [0.5]})
    with pytest.raises(ValueError, match="caliper"):
        propensity_match(p, "id", "t", "s", caliper=0.0)
