"""Round-9 operator tests: grouped fixed-step bisection IRR
(agg.irr_by_bisect), grouped Cox PH (temporal.cox_ph keys=), and the
stratified log-rank test (temporal.logrank_test strata=)."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from seafan_spark.sources import vec_to_pipe

pytestmark = pytest.mark.usefixtures("spark")


# --------------------------------------------------------- irr_by_bisect ----
def test_irr_by_bisect_matches_scalar_irr_bisect(spark):
    """Each group's rate must be BIT-EQUAL to running irr_bisect on that
    group's flows alone (same bracket, same rounded sign decisions)."""
    from seafan_spark.agg import irr_bisect, irr_by_bisect

    rng = random.Random(3)
    rows = {"g": [], "i": [], "v": []}
    for g in ("a", "b", "c"):
        rows["g"] += [g] * 10
        rows["i"] += list(range(10))
        rows["v"] += [round(rng.uniform(50, 150), 2) for _ in range(10)]
    p = vec_to_pipe(spark, rows)
    grouped = {
        r["g"]: r["rate"]
        for r in irr_by_bisect(p.df, ["g"], "v", ["i"], steps=30).collect()
    }
    for g in ("a", "b", "c"):
        solo = irr_bisect(
            p.df.filter(F.col("g") == g), "v", ["i"], steps=30
        )
        assert grouped[g] == solo, f"group {g}: {grouped[g]} != {solo}"


def test_irr_by_bisect_degenerate_group_null(spark):
    """A group whose bracket has no sign change (all-positive NPV at both
    ends) returns NULL, not an exception."""
    from seafan_spark.agg import irr_by_bisect

    rows = {
        "g": ["ok"] * 4 + ["bad"] * 2,
        "i": [0, 1, 2, 3, 0, 1],
        # with cost=0 every all-positive-flow group has f>0 at both
        # bracket ends -> no sign change -> NULL for everyone
        "v": [100.0, 100.0, 100.0, 100.0, 1.0, 100.0],
    }
    p = vec_to_pipe(spark, rows)
    out = {
        r["g"]: r["rate"]
        for r in irr_by_bisect(
            p.df, ["g"], "v", ["i"], cost=0.0, steps=10
        ).collect()
    }
    assert out["ok"] is None and out["bad"] is None  # cost=0: nothing brackets
    # default cost (= half the flow total) brackets both
    out2 = {
        r["g"]: r["rate"]
        for r in irr_by_bisect(p.df, ["g"], "v", ["i"], steps=10).collect()
    }
    assert out2["ok"] is not None and out2["bad"] is not None


def test_irr_by_bisect_validates_args(spark):
    from seafan_spark.agg import irr_by_bisect

    p = vec_to_pipe(spark, {"g": ["a"], "i": [0], "v": [1.0]})
    with pytest.raises(ValueError, match="steps"):
        irr_by_bisect(p.df, ["g"], "v", ["i"], steps=0)
    with pytest.raises(ValueError, match="key"):
        irr_by_bisect(p.df, [], "v", ["i"])


# --------------------------------------------------------- cox_ph keys= ----
def _two_cohort_corpus(rng, n=150):
    rows = {"cohort": [], "t": [], "e": [], "x": []}
    for coh, b in (("A", 2.5), ("B", -2.0)):
        for _ in range(n):
            x = rng.random()
            t = rng.expovariate(0.1 * pow(2.718281828459045, b * x))
            rows["cohort"].append(coh)
            rows["t"].append(round(t, 3) + 0.001)
            rows["e"].append(1 if rng.random() < 0.8 else 0)
            rows["x"].append(x)
    return rows


def test_cox_ph_keyed_matches_per_cohort_pooled_fit(spark):
    """keys= fits each cohort independently: betas/se must equal the
    pooled cox_ph run on each cohort's subset (planted opposite-sign
    hazard effects so a pooled-by-mistake fit can't pass)."""
    from seafan_spark.temporal import cox_ph

    p = vec_to_pipe(spark, _two_cohort_corpus(random.Random(7)))
    keyed = {
        r["cohort"]: r
        for r in cox_ph(p, "t", "e", ["x"], keys=["cohort"])
    }
    assert set(keyed) == {"A", "B"}
    for coh in ("A", "B"):
        solo = cox_ph(
            p.df.filter(F.col("cohort") == coh), "t", "e", ["x"]
        )[0]
        assert keyed[coh]["beta"] == pytest.approx(solo["beta"], abs=1e-6)
        assert keyed[coh]["se"] == pytest.approx(solo["se"], abs=1e-6)
        assert keyed[coh]["converged"] is True
    # the planted effects have opposite signs
    assert keyed["A"]["beta"] > 0 > keyed["B"]["beta"]


def test_cox_ph_keyed_degenerate_group_flagged_not_fatal(spark):
    """A cohort with collinear covariates (constant x) is flagged with
    error/converged=False while healthy cohorts still fit."""
    from seafan_spark.temporal import cox_ph

    rng = random.Random(11)
    rows = {"cohort": [], "t": [], "e": [], "x": []}
    for i in range(60):
        rows["cohort"].append("good")
        rows["t"].append(round(rng.expovariate(0.2), 3) + 0.001)
        rows["e"].append(1)
        rows["x"].append(float(i % 3))
    for i in range(20):
        rows["cohort"].append("const")
        rows["t"].append(round(rng.expovariate(0.2), 3) + 0.001)
        rows["e"].append(1)
        rows["x"].append(1.0)  # constant covariate -> singular info
    p = vec_to_pipe(spark, rows)
    res = {r["cohort"]: r for r in cox_ph(p, "t", "e", ["x"], keys=["cohort"])}
    assert res["good"]["beta"] is not None and res["good"]["converged"]
    assert res["const"]["beta"] is None and res["const"]["converged"] is False
    assert "singular" in res["const"]["error"]


# ---------------------------------------------------- logrank strata= ----
def test_logrank_stratified_absorbs_confounder(spark):
    """Planted: arm hazard ratio 2 in both strata, but strata have very
    different baseline hazards AND the pooled test mixes them. The
    stratified chi2 must (a) differ from the pooled one and (b) equal a
    hand-built pool of the per-stratum O-E and V terms."""
    from seafan_spark.temporal import logrank_test

    rng = random.Random(5)
    rows = {"site": [], "arm": [], "t": [], "e": []}
    for site, base in (("s1", 0.05), ("s2", 0.4)):
        for i in range(120):
            arm = i % 2
            rows["site"].append(site)
            rows["arm"].append(arm)
            rows["t"].append(
                round(rng.expovariate(base * (2.0 if arm else 1.0)), 3) + 0.001
            )
            rows["e"].append(1)
    p = vec_to_pipe(spark, rows)
    strat = logrank_test(p, "t", "e", "arm", strata=["site"]).collect()[0]
    pooled = logrank_test(p, "t", "e", "arm").collect()[0]
    per_site = logrank_test(p, "t", "e", "arm", keys=["site"]).collect()
    assert strat["chi2"] != pooled["chi2"]
    assert strat["significant"] is True
    # the stratified statistic pools per-stratum sums: reconstruct from
    # the per-site rows' (observed1 - expected1) and variances via chi2
    import math

    oe = sum(r["observed1"] - r["expected1"] for r in per_site)
    v = sum(
        (r["observed1"] - r["expected1"]) ** 2 / r["chi2"]
        for r in per_site
        if r["chi2"]
    )
    assert strat["chi2"] == pytest.approx(oe * oe / v, rel=1e-4)
    assert strat["n0"] == 120 and strat["n1"] == 120
    assert math.isclose(
        strat["expected1"],
        sum(r["expected1"] for r in per_site),
        rel_tol=1e-6,
    )


# ------------------------------------------------------------------ rmst ----
def test_rmst_textbook_step_integral(spark):
    """Hand-computable KM: 4 subjects, events at t=2 (S=3/4) and t=5
    (S=1/2), censored at 7 and 10. RMST(8) = 1*2 + 0.75*3 + 0.5*3 = 5.75;
    RMST(4) = 1*2 + 0.75*2 = 3.5 (horizon inside a segment)."""
    from seafan_spark.temporal import rmst

    p = vec_to_pipe(
        spark, {"t": [2.0, 5.0, 7.0, 10.0], "e": [1, 1, 0, 0]}
    )
    r8 = rmst(p, "t", "e", tau=8.0).collect()[0]
    assert r8["rmst"] == pytest.approx(5.75) and r8["tau"] == 8.0
    r4 = rmst(p, "t", "e", tau=4.0).collect()[0]
    assert r4["rmst"] == pytest.approx(3.5)
    with pytest.raises(ValueError, match="tau"):
        rmst(p, "t", "e", tau=0.0)


def test_rmst_keyed_and_no_events_past_tau(spark):
    from seafan_spark.temporal import rmst

    p = vec_to_pipe(
        spark,
        {
            "g": ["a"] * 3 + ["b"] * 3,
            # a: event at 1 with S=2/3 then censors; b: all censored -> S=1
            "t": [1.0, 4.0, 6.0, 3.0, 5.0, 9.0],
            "e": [1, 0, 0, 0, 0, 0],
        },
    )
    got = {r["g"]: r["rmst"] for r in rmst(p, "t", "e", tau=10.0, keys=["g"]).collect()}
    # a: 1*1 + (2/3)*(4-1) + (2/3)*(6-4) + (2/3)*(10-6) = 1 + 6 = 7
    assert got["a"] == pytest.approx(1.0 + (2.0 / 3.0) * 9.0)
    # b: survival stays 1 (censoring only): rmst = tau
    assert got["b"] == pytest.approx(10.0)


# ----------------------------------------------------------- mann_kendall ----
def test_mann_kendall_textbook(spark):
    """Strictly increasing 5-point series: S = 10 (all pairs +1),
    Var = 5*4*15/18 = 50/3, z = 9/sqrt(50/3), Sen slope = median of
    pairwise slopes."""
    import math

    from seafan_spark.temporal import mann_kendall

    p = vec_to_pipe(
        spark, {"x": [1.0, 2.0, 3.0, 4.0, 5.0], "v": [1.0, 3.0, 4.0, 6.0, 9.0]}
    )
    r = mann_kendall(p, "x", "v").collect()[0]
    assert r["s"] == 10 and r["n"] == 5
    assert r["var_s"] == pytest.approx(50.0 / 3.0)
    assert r["z"] == pytest.approx(9.0 / math.sqrt(50.0 / 3.0))
    assert r["trend"] == 1
    slopes = sorted(
        (vj - vi) / (xj - xi)
        for i, (xi, vi) in enumerate(zip([1, 2, 3, 4, 5], [1, 3, 4, 6, 9]))
        for xj, vj in zip([1, 2, 3, 4, 5][i + 1:], [1, 3, 4, 6, 9][i + 1:])
    )
    mid = (slopes[4] + slopes[5]) / 2  # 10 pairs -> avg of 5th/6th
    assert r["sen_slope"] == pytest.approx(mid)


def test_mann_kendall_flat_and_ties(spark):
    from seafan_spark.temporal import mann_kendall

    # constant series: S = 0, the tie term kills the variance -> z 0
    p = vec_to_pipe(spark, {"x": [1.0, 2.0, 3.0, 4.0], "v": [2.0] * 4})
    r = mann_kendall(p, "x", "v").collect()[0]
    assert r["s"] == 0 and r["z"] == 0.0 and r["trend"] == 0
    assert r["var_s"] == pytest.approx(0.0)
    assert r["sen_slope"] == pytest.approx(0.0)


def test_mann_kendall_keyed_opposite_trends(spark):
    from seafan_spark.temporal import mann_kendall

    rows = {"g": [], "x": [], "v": []}
    for g, sign in (("up", 1.0), ("down", -1.0)):
        for i in range(12):
            rows["g"].append(g)
            rows["x"].append(float(i))
            rows["v"].append(sign * i + (0.1 if i % 2 else -0.1))
    p = vec_to_pipe(spark, rows)
    got = {r["g"]: r for r in mann_kendall(p, "x", "v", keys=["g"]).collect()}
    assert got["up"]["trend"] == 1 and got["down"]["trend"] == -1
    assert got["up"]["sen_slope"] > 0 > got["down"]["sen_slope"]


# --------------------------------------------------------- km_confidence ----
def test_km_confidence_greenwood_hand_computed(spark):
    """Textbook Greenwood: 4 subjects, event at t=2 (S=3/4):
    Var = (3/4)^2 * 1/(4*3) = 3/64, se = sqrt(3)/8."""
    import math

    from seafan_spark.temporal import km_confidence

    p = vec_to_pipe(spark, {"t": [2.0, 5.0, 7.0, 9.0], "e": [1, 0, 0, 0]})
    rows = {r["t"]: r for r in km_confidence(p, "t", "e").collect()}
    r = rows[2.0]
    se = math.sqrt(3.0) / 8.0
    assert r["se"] == pytest.approx(se)
    assert r["ci_lo"] == pytest.approx(max(0.75 - 1.959963984540054 * se, 0.0))
    assert r["ci_hi"] == pytest.approx(min(0.75 + 1.959963984540054 * se, 1.0))
    # censor-only rows keep S and accumulate no new variance
    assert rows[5.0]["se"] == pytest.approx(se)


def test_km_confidence_curve_to_zero_band_collapses(spark):
    from seafan_spark.temporal import km_confidence

    # both subjects event at the last time: S hits exact 0 there
    p = vec_to_pipe(spark, {"t": [1.0, 3.0, 3.0], "e": [1, 1, 1]})
    last = {r["t"]: r for r in km_confidence(p, "t", "e").collect()}[3.0]
    assert last["survival"] == 0.0
    assert last["se"] == 0.0 and last["ci_lo"] == 0.0 and last["ci_hi"] == 0.0


# ------------------------------------------- collapsed-relation guards ----
def test_survival_windows_enforce_collapsed_contract(spark, monkeypatch):
    """Round-8 VERDICT #4: a continuous duration column (every value
    distinct) must raise with the 'bucket first' guidance instead of
    silently running a subject-cardinality single-task window; the same
    data bucketed passes. Ceiling lowered via env so the test is fast."""
    from seafan_spark.guards import SmallDataLimitError
    from seafan_spark.temporal import (
        cox_ph,
        cusum_changepoint,
        logrank_test,
        survival_km,
    )

    monkeypatch.setenv("SEAFAN_COLLAPSED_GROUP_LIMIT", "50")
    rng = random.Random(13)
    n = 200
    rows = {
        "t": [rng.expovariate(0.1) + 1e-9 for _ in range(n)],  # all distinct
        "e": [1] * n,
        "arm": [i % 2 for i in range(n)],
        "x": [rng.random() for _ in range(n)],
    }
    p = vec_to_pipe(spark, rows)
    with pytest.raises(SmallDataLimitError, match="[Bb]ucket"):
        survival_km(p, "t", "e")
    with pytest.raises(SmallDataLimitError, match="[Bb]ucket"):
        logrank_test(p, "t", "e", "arm")
    with pytest.raises(SmallDataLimitError, match="[Bb]ucket"):
        cox_ph(p, "t", "e", ["x"])
    with pytest.raises(SmallDataLimitError, match="[Aa]ggregate"):
        cusum_changepoint(p, "t", "x")
    # bucketed to integer days: well under the 50-distinct ceiling
    b = p.df.withColumn("tb", F.floor(F.col("t") / 10.0).cast("double"))
    assert survival_km(b, "tb", "e").count() <= 50
    assert logrank_test(b, "tb", "e", "arm").count() == 1
    assert cox_ph(b, "tb", "e", ["x"])[0]["beta"] is not None
    daily = b.groupBy("tb").agg(F.avg("x").alias("xm"))
    assert cusum_changepoint(daily, "tb", "xm").count() == 1


def test_logrank_stratified_matches_unstratified_single_stratum(spark):
    """With one stratum the stratified test IS the plain test."""
    from seafan_spark.temporal import logrank_test

    rng = random.Random(9)
    rows = {"one": ["x"] * 80, "arm": [], "t": [], "e": []}
    for i in range(80):
        rows["arm"].append(i % 2)
        rows["t"].append(round(rng.expovariate(0.1 * (1 + i % 2)), 3) + 0.001)
        rows["e"].append(1 if rng.random() < 0.9 else 0)
    p = vec_to_pipe(spark, rows)
    a = logrank_test(p, "t", "e", "arm", strata=["one"]).collect()[0]
    b = logrank_test(p, "t", "e", "arm").collect()[0]
    assert a["chi2"] == b["chi2"] and a["expected1"] == b["expected1"]
