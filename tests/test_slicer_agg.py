"""Slice iterator + agg semantics (vec_test.go:10-29, 83-113;
gdata_test.go:176-200; data.go:815-837)."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.agg import by_counts, describe, group_by, summary, top_k
from seafan_spark.encode import append_cat
from seafan_spark.slicer import Slice, slicer_and, slicer_or
from seafan_spark.sources import vec_to_pipe


@pytest.fixture()
def sl_pipe(spark):
    # slicer fixture (FIXTURES.md §3)
    p = vec_to_pipe(
        spark,
        {
            "x1": [1.0, 2.0, 3.0, 4.0, 8.0, 9.0, 10.0],
            "x2": ["a", "b", "c", "a", "a", "a", "a"],
            "x3": [4, 5, 6, 1, 2, 2, 2],
        },
    )
    return append_cat(p, "x2")


def test_slice_categorical(sl_pipe):
    got = {}
    for v, sub in Slice("x2", 0, sl_pipe).groups():
        got[v] = sorted(sub.collect_field("x1"))
    assert got == {"a": [1.0, 4.0, 8.0, 9.0, 10.0], "b": [2.0], "c": [3.0]}


def test_slice_min_count_and_restrict(sl_pipe):
    vals = [v for v, _ in Slice("x2", 1, sl_pipe).groups()]
    assert vals == ["a"]  # b,c have count 1, gate is count > minCnt
    vals = [v for v, _ in Slice("x2", 0, sl_pipe, restrict=["b", "c"]).groups()]
    assert vals == ["b", "c"]


def test_slice_continuous_quartiles(sl_pipe):
    groups = list(Slice("x1", 0, sl_pipe).groups())
    assert len(groups) == 4
    total = sum(g.row_count() for _, g in groups)
    assert total == 7  # partition covers all rows


def test_slicer_combinators(sl_pipe):
    c = slicer_and(F.col("x2") == "a", F.col("x1") > 5)
    assert sorted(sl_pipe.filter(c).collect_field("x1")) == [8.0, 9.0, 10.0]
    c = slicer_or(F.col("x2") == "b", F.col("x2") == "c")
    assert sl_pipe.filter(c).row_count() == 2


def test_group_by_and_summary(sl_pipe):
    rows = group_by(sl_pipe, ["x2"], {"n": F.count(F.lit(1)), "s": F.sum("x1")}).collect()
    d = {r["x2"]: (r["n"], r["s"]) for r in rows}
    assert d["a"] == (5, 32.0)
    s = summary(sl_pipe, {"total": F.sum("x1"), "m": F.avg("x3")})
    assert s["total"] == 37.0


def test_top_k_and_by_counts(sl_pipe):
    rows = top_k(sl_pipe, "x2", 2).collect()
    assert [r["x2"] for r in rows] == ["a", "b"]
    bc = {r["x2"]: r["count"] for r in by_counts(sl_pipe, "x2").collect()}
    assert bc == {"a": 5, "b": 1, "c": 1}


def test_describe_quantiles(sl_pipe):
    d = describe(sl_pipe, fields=["x1", "x2"])
    assert d["x1"]["n"] == 7
    assert d["x1"]["quantiles"][0] == 1.0 and d["x1"]["quantiles"][-1] == 10.0
    assert d["x2"]["levels"][0] == ("a", 5)


def test_pivot_table(spark):
    from seafan_spark.agg import pivot_table
    from seafan_spark.sources import vec_to_pipe
    from pyspark.sql import functions as F

    p = vec_to_pipe(
        spark,
        {
            "g": [1, 1, 2, 2, 2],
            "cat": ["a", "b", "a", "a", "b"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        },
    )
    out = pivot_table(p, "g", "cat", F.sum("v"), values=["a", "b"])
    rows = {r["g"]: (r["a"], r["b"]) for r in out.collect()}
    assert rows == {1: (1.0, 2.0), 2: (7.0, 5.0)}
    # explicit values fix the schema even for absent levels
    out2 = pivot_table(p, "g", "cat", F.sum("v"), values=["a", "b", "zzz"])
    assert out2.columns == ["g", "a", "b", "zzz"]
    assert all(r["zzz"] is None for r in out2.collect())


def test_ols_by_matches_numpy(spark):
    """Closed-form grouped OLS vs numpy.polyfit per group, plus the
    zero-variance NULL guard."""
    import numpy as np

    from seafan_spark.agg import ols_by
    from seafan_spark.pipeline import Pipeline

    rng = np.random.default_rng(11)
    rows = []
    for g in ("a", "b"):
        x = rng.uniform(0, 50, 400)
        y = (3.0 if g == "a" else -1.5) * x + 7.0 + rng.normal(0, 2.0, 400)
        rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
    rows += [("flat", 4.0, float(v)) for v in rng.normal(0, 1, 50)]  # var(x)=0
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in ols_by(Pipeline(df), "x", "y", ["g"]).collect()}
    for g in ("a", "b"):
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r2 = np.corrcoef(xs, ys)[0, 1] ** 2
        assert abs(got[g]["slope"] - slope) < 1e-6
        assert abs(got[g]["intercept"] - intercept) < 1e-6
        assert abs(got[g]["r2"] - r2) < 1e-6
        assert got[g]["n"] == 400
    assert got["flat"]["slope"] is None and got["flat"]["r2"] is None


def test_ttest_by_matches_numpy(spark):
    """Welch t vs the textbook formula computed in numpy per group, plus
    the small-side NULL guard."""
    import numpy as np

    from seafan_spark.agg import ttest_by
    from seafan_spark.pipeline import Pipeline

    rng = np.random.default_rng(5)
    rows = []
    for g, shift in (("a", 2.0), ("b", 0.0)):
        for v in rng.normal(10.0 + shift, 3.0, 300):
            rows.append((g, float(v), 1))
        for v in rng.normal(10.0, 2.0, 200):
            rows.append((g, float(v), 0))
    rows.append(("tiny", 1.0, 1))  # n1=1 -> NULL stat
    rows.append(("tiny", 2.0, 0))
    rows.append(("tiny", 3.0, 0))
    df = spark.createDataFrame(rows, "g string, v double, lab int")
    got = {r["g"]: r for r in ttest_by(Pipeline(df), "v", "lab", ["g"]).collect()}
    for g in ("a", "b"):
        x1 = np.array([r[1] for r in rows if r[0] == g and r[2] == 1])
        x0 = np.array([r[1] for r in rows if r[0] == g and r[2] == 0])
        v1, v0 = x1.var(ddof=1), x0.var(ddof=1)
        se2 = v1 / len(x1) + v0 / len(x0)
        t = (x1.mean() - x0.mean()) / np.sqrt(se2)
        dfree = se2**2 / (
            (v1 / len(x1)) ** 2 / (len(x1) - 1) + (v0 / len(x0)) ** 2 / (len(x0) - 1)
        )
        assert got[g]["n1"] == len(x1) and got[g]["n0"] == len(x0)
        assert abs(got[g]["t_stat"] - t) < 1e-5
        assert abs(got[g]["df"] - dfree) < 1e-3
        assert abs(got[g]["mean1"] - x1.mean()) < 1e-6
    assert got["a"]["t_stat"] > 5  # the planted shift is detected
    assert abs(got["b"]["t_stat"]) < 3
    assert got["tiny"]["t_stat"] is None and got["tiny"]["df"] is None


def test_chisq_by_matches_reference(spark):
    """Chi-square vs the dense (o-e)^2/e formula computed by hand,
    including a structurally-zero cell."""
    from seafan_spark.agg import chisq_by
    from seafan_spark.pipeline import Pipeline

    # group g: 2x2 table [[30, 10], [10, 30]] -> chi2 = 20*80*80/ (40*40*40*40) ...
    rows = []
    rows += [("g", "x", 1)] * 30 + [("g", "x", 0)] * 10
    rows += [("g", "y", 1)] * 10 + [("g", "y", 0)] * 30
    # group z has a zero cell: cat 'q' never sees lab=0
    rows += [("z", "p", 1)] * 5 + [("z", "p", 0)] * 5 + [("z", "q", 1)] * 10
    df = spark.createDataFrame(rows, "g string, cat string, lab int")
    got = {r["g"]: r for r in chisq_by(Pipeline(df), "cat", "lab", ["g"]).collect()}

    def dense_chi2(table):
        n = sum(sum(r) for r in table)
        rt = [sum(r) for r in table]
        ct = [sum(c) for c in zip(*table)]
        return sum(
            (table[i][j] - rt[i] * ct[j] / n) ** 2 / (rt[i] * ct[j] / n)
            for i in range(len(table))
            for j in range(len(ct))
        )

    assert got["g"]["n"] == 80 and got["g"]["dof"] == 1
    assert abs(got["g"]["chi2"] - dense_chi2([[10, 30], [30, 10]])) < 1e-6
    assert got["z"]["n"] == 20 and got["z"]["dof"] == 1
    assert abs(got["z"]["chi2"] - dense_chi2([[5, 5], [0, 10]])) < 1e-6


def test_entropy_by_matches_formula(spark):
    """Entropy/Gini vs hand-computed values: a uniform 4-way group
    (entropy ln 4, gini 0.75), a single-category group (both 0), and a
    skewed 2-way group."""
    import math

    from seafan_spark.agg import entropy_by
    from seafan_spark.pipeline import Pipeline

    rows = (
        [("u", c) for c in "abcd" * 10]
        + [("one", "z")] * 7
        + [("skew", "x")] * 9
        + [("skew", "y")] * 1
    )
    df = spark.createDataFrame(rows, "g string, cat string")
    got = {r["g"]: r for r in entropy_by(Pipeline(df), "cat", ["g"]).collect()}
    assert got["u"]["n"] == 40 and got["u"]["n_cats"] == 4
    assert abs(got["u"]["entropy"] - math.log(4)) < 1e-6
    assert abs(got["u"]["gini"] - 0.75) < 1e-6
    assert got["one"]["entropy"] == 0.0 and got["one"]["gini"] == 0.0
    h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert abs(got["skew"]["entropy"] - h) < 1e-6
    assert abs(got["skew"]["gini"] - (1 - 0.81 - 0.01)) < 1e-6


def test_robust_outliers_by_matches_numpy(spark):
    """Median/MAD/outlier counts vs numpy, odd and even group sizes,
    planted outliers."""
    import numpy as np

    from seafan_spark.agg import robust_outliers_by
    from seafan_spark.pipeline import Pipeline

    rng = np.random.default_rng(3)
    rows = []
    vals = {}
    for g, n in (("odd", 101), ("even", 100)):
        v = list(rng.normal(50, 5, n - 2)) + [500.0, -400.0]  # planted
        vals[g] = np.array(v)
        rows += [(g, float(x)) for x in v]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in robust_outliers_by(Pipeline(df), "x", ["g"], k=3.0).collect()}
    for g, v in vals.items():
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        n_out = int((np.abs(v - med) > 3.0 * mad).sum())
        assert got[g]["n"] == len(v)
        assert abs(got[g]["median"] - med) < 1e-6, g
        assert abs(got[g]["mad"] - mad) < 1e-6, g
        assert got[g]["n_outliers"] == n_out, g
        assert n_out >= 2  # the planted points are flagged


def test_profile_table(spark):
    from seafan_spark.agg import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None), (None, "b", 4.5)],
        "k: int, s: string, v: double",
    )
    prof = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(prof) == {"k", "s", "v"}
    assert prof["k"]["n_non_null"] == 3 and prof["k"]["n_null"] == 1
    assert prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "2"
    assert prof["s"]["n_distinct"] == 2 and prof["s"]["n_null"] == 1
    assert prof["v"]["min_value"] == "1.5" and prof["v"]["max_value"] == "4.5"
    assert prof["v"]["dtype"] == "double"
    # numeric min/max is numeric, not lexicographic
    df2 = spark.createDataFrame([(9,), (10,)], "x: int")
    p2 = profile_table(df2, exact_distinct=True).collect()[0]
    assert p2["min_value"] == "9" and p2["max_value"] == "10"
    # approx default stays within rsd on a clean cardinality
    df3 = spark.createDataFrame([(i % 100,) for i in range(1000)], "y: int")
    p3 = profile_table(df3).collect()[0]
    assert abs(p3["n_distinct"] - 100) <= 10
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, columns=["nope"])


def test_profile_table_two_pass_plan(spark):
    """profile_table's plan contract (round 10): counts+distincts and
    min/max split into TWO single-row aggregates joined 1x1 — string
    min/max buffers are not UnsafeRow-mutable, and keeping them in the
    same aggregate as the multi-distinct Expand demoted the whole tree
    to SortAggregate (two full sorts of the (columns+1)-fold expanded
    relation). The split keeps the distinct tree hash-based; min/max
    fold keylessly (no sort). Still no per-column jobs or unions."""
    from seafan_spark.agg import profile_table

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = (
        profile_table(df, exact_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two scans (one per aggregate tree), never one per column
    assert plan.count("Scan parquet") == 2
    assert "Union" not in plan
    # the multi-distinct Expand tree must be HASH-aggregated now
    assert "Expand" in plan
    assert "HashAggregate" in plan
    # exactly the one 1x1 cross join stitching the two aggregate rows
    assert plan.count("Join") >= 1


def test_mutual_info_by(spark):
    import math
    from collections import Counter

    from seafan_spark.agg import mutual_info_by

    rows = []
    for i in range(200):
        g = "g1" if i % 2 else "g2"
        x = (i // 2) % 4  # all four x levels appear in BOTH groups
        # g1: y depends on x (perfectly); g2: y independent-ish of x
        y = x % 2 if g == "g1" else (i // 8) % 2
        rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g: string, x: int, y: int")
    got = {r["g"]: r for r in mutual_info_by(df, "x", "y", keys=["g"]).collect()}

    def py_mi(sub):
        n = len(sub)
        jc, xc, yc = Counter(sub), Counter(x for x, _ in sub), Counter(y for _, y in sub)
        mi = sum(c / n * math.log(c * n / (xc[x] * yc[y])) for (x, y), c in jc.items())
        hx = -sum(c / n * math.log(c / n) for c in xc.values())
        hy = -sum(c / n * math.log(c / n) for c in yc.values())
        return mi, (mi / math.sqrt(hx * hy) if hx > 0 and hy > 0 else None)

    for g in ("g1", "g2"):
        sub = [(x, y) for gg, x, y in rows if gg == g]
        mi, nmi = py_mi(sub)
        assert abs(got[g]["mi"] - mi) < 1e-6, g
        assert abs(got[g]["nmi"] - nmi) < 1e-6, g
    # x determines y in g1 -> MI equals H(y); independence in g2 -> ~0
    assert got["g1"]["mi"] > 0.5 and abs(got["g2"]["mi"]) < 0.05
    # constant column -> nmi NULL, mi 0
    df2 = spark.createDataFrame([(1, i % 3) for i in range(30)], "x: int, y: int")
    r = mutual_info_by(df2, "x", "y").collect()[0]
    assert r["mi"] == 0.0 and r["nmi"] is None
