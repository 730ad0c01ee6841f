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


# ------------------------------------------------------------ heavy hitters


@pytest.fixture(scope="module")
def zipf_tokens(spark):
    # zipf-ish: token t_i appears ~600/i times, i in 1..40, spread over
    # several partitions so the per-partition MG summaries actually merge
    rows = [(f"t{i:02d}",) for i in range(1, 41) for _ in range(600 // i)]
    return spark.createDataFrame(rows, "token string").repartition(7)


def test_heavy_hitters_matches_exact_groupby(zipf_tokens):
    from seafan_spark.sketches import heavy_hitters

    got = heavy_hitters(zipf_tokens, "token", k=10, width=64).collect()
    exact = (
        zipf_tokens.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(10)
        .collect()
    )
    assert [(r["item"], r["cnt"]) for r in got] == [
        (r["token"], r["cnt"]) for r in exact
    ]


def test_misra_gries_candidates_superset_and_bounded(zipf_tokens):
    """Every item with global count > n/width survives; per-partition
    survivor sets respect the width bound."""
    from seafan_spark.sketches import misra_gries_candidates

    width = 8
    rows = misra_gries_candidates(zipf_tokens, "token", width=width).collect()
    n = sum(r["pcount"] for r in rows if r["pcount"] is not None)
    cand = {r["item"] for r in rows if r["item"] is not None}
    exact = {
        r["token"]: r["cnt"]
        for r in zipf_tokens.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    for tok, cnt in exact.items():
        if cnt > n / width:
            assert tok in cand, f"{tok} (cnt {cnt}) missing at n={n}"
    # ≤ width survivors per partition (7 partitions)
    assert len([r for r in rows if r["item"] is not None]) <= width * 7


def test_heavy_hitters_certificate_raises_on_narrow_width(spark):
    """Uniform high-cardinality data can't certify a top-k at tiny
    width: the operator must refuse rather than return a plausible-but-
    unprovable answer."""
    from seafan_spark.sketches import heavy_hitters

    uniform = spark.createDataFrame(
        [(f"u{i}",) for i in range(3000)], "token string"
    ).repartition(4)
    with pytest.raises(ValueError, match="not provably exact|fewer than k"):
        heavy_hitters(uniform, "token", k=5, width=4)


def test_heavy_hitters_small_domain_returns_all(spark):
    """Distinct domain smaller than k: full coverage certificate accepts
    and returns every item with exact counts."""
    from seafan_spark.sketches import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "token string"
    ).repartition(3)
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "token", k=10, width=16).collect()}
    assert got == {("a", 5), ("b", 3), ("c", 2)}


def test_heavy_hitters_ignores_nulls(spark):
    from seafan_spark.sketches import heavy_hitters

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "token string"
    )
    got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "token", k=5, width=16).collect()}
    assert got == {("a", 2), ("b", 1)}


# ------------------------------------------- mergeable MG summaries / stream


def test_mg_summary_guarantee_and_bounds(zipf_tokens):
    """Global summary: every item with count > n/(width+1) present;
    est <= true <= est + n/(width+1); <= width+1 rows total."""
    from seafan_spark.sketches import misra_gries_summary

    width = 8
    rows = misra_gries_summary(zipf_tokens, "token", width=width).collect()
    n = next(r["est"] for r in rows if r["item"] is None)
    ests = {r["item"]: r["est"] for r in rows if r["item"] is not None}
    exact = {
        r["token"]: r["cnt"]
        for r in zipf_tokens.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    assert n == sum(exact.values())
    assert len(ests) <= width
    slack = n / (width + 1)
    for tok, cnt in exact.items():
        if cnt > slack:
            assert tok in ests
    for tok, est in ests.items():
        assert est <= exact[tok] <= est + slack


def test_mg_merge_matches_combined_guarantee(spark):
    """merge(summary(A), summary(B)) keeps the bound against A u B and
    adds the n rows."""
    from seafan_spark.sketches import merge_mg_summaries, misra_gries_summary

    a = spark.createDataFrame(
        [(f"t{i}",) for i in range(1, 11) for _ in range(120 // i)], "token string"
    ).repartition(3)
    b = spark.createDataFrame(
        [(f"t{i}",) for i in range(5, 21) for _ in range(200 // i)], "token string"
    ).repartition(4)
    width = 6
    m = merge_mg_summaries(
        misra_gries_summary(a, "token", width),
        misra_gries_summary(b, "token", width),
        width,
    ).collect()
    n = next(r["est"] for r in m if r["item"] is None)
    ests = {r["item"]: r["est"] for r in m if r["item"] is not None}
    exact: dict = {}
    for df in (a, b):
        for r in df.groupBy("token").agg(F.count("*").alias("c")).collect():
            exact[r["token"]] = exact.get(r["token"], 0) + r["c"]
    assert n == sum(exact.values())
    assert len(ests) <= width
    slack = n / (width + 1)
    for tok, cnt in exact.items():
        if cnt > slack:
            assert tok in ests
    for tok, est in ests.items():
        assert est <= exact[tok] <= est + slack


def test_heavy_hitters_from_summary_bounds(zipf_tokens):
    from seafan_spark.sketches import heavy_hitters_from_summary, misra_gries_summary

    width = 16
    s = misra_gries_summary(zipf_tokens, "token", width=width)
    got = heavy_hitters_from_summary(s, k=5, width=width).collect()
    exact = {
        r["token"]: r["cnt"]
        for r in zipf_tokens.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(got) == 5
    for r in got:
        assert r["est_lo"] <= exact[r["item"]] <= r["est_hi"]
    # the true #1 item is reported first (its count dwarfs the slack)
    assert got[0]["item"] == "t01"


def test_stream_heavy_hitters_ingest(spark, tmp_path):
    """Two micro-batches folded into a persisted summary: bound holds
    against the all-time counts; store stays <= width+1 rows."""
    import time as _t

    from seafan_spark.streaming import stream_heavy_hitters_ingest

    src = f"{tmp_path}/toks"
    f1 = [(f"t{i}",) for i in range(1, 11) for _ in range(90 // i)]
    f2 = [(f"t{i}",) for i in range(3, 15) for _ in range(140 // i)]
    spark.createDataFrame(f1, "token string").coalesce(1).write.mode("append").parquet(src)
    _t.sleep(1.1)
    spark.createDataFrame(f2, "token string").coalesce(1).write.mode("append").parquet(src)
    store = f"{tmp_path}/hh_store"
    sdf = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    width = 8
    stream_heavy_hitters_ingest(sdf, store, "token", width=width)
    rows = spark.read.parquet(store).collect()
    assert len(rows) <= width + 1
    n = next(r["est"] for r in rows if r["item"] is None)
    ests = {r["item"]: r["est"] for r in rows if r["item"] is not None}
    exact: dict = {}
    for tok, in f1 + f2:
        exact[tok] = exact.get(tok, 0) + 1
    assert n == len(f1) + len(f2)
    slack = n / (width + 1)
    for tok, cnt in exact.items():
        if cnt > slack:
            assert tok in ests
    for tok, est in ests.items():
        assert est <= exact[tok] <= est + slack


# ------------------------------------------------------------------ CMS ----
def test_cms_estimate_bounds_and_exactness(spark):
    """est >= true always (one-sided), and with width >> distinct items
    the estimate is exact."""
    import pyspark.sql.functions as F

    from seafan_spark.sketches import cms_build, cms_estimate

    rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5
    df = spark.createDataFrame(rows, "item string")
    for portable in (False, True):
        sk = cms_build(df, "item", depth=4, width=512, portable=portable)
        est = cms_estimate(
            sk, df.select("item").distinct(), "item",
            depth=4, width=512, portable=portable,
        )
        got = {r["item"]: r["est"] for r in est.collect()}
        assert got == {"a": 50, "b": 20, "c": 5}, (portable, got)


def test_cms_collisions_overestimate_only(spark):
    """Tiny width forces collisions: estimates may exceed truth but never
    undercount, and the min-over-depth keeps error one-sided."""
    from seafan_spark.sketches import cms_build, cms_estimate

    rows = [(f"k{i % 37}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "item string")
    sk = cms_build(df, "item", depth=3, width=8, portable=True)
    est = cms_estimate(
        sk, df.select("item").distinct(), "item", depth=3, width=8, portable=True
    )
    true = {f"k{i}": (1000 // 37 + (1 if i < 1000 % 37 else 0)) for i in range(37)}
    for r in est.collect():
        assert r["est"] >= true[r["item"]], r


def test_cms_merge_equals_union_build(spark):
    """CMS(A) ++ CMS(B) must equal CMS(A union B) cell-for-cell —
    the property that makes incremental refresh and map-side rollups
    lossless."""
    from seafan_spark.sketches import cms_build, cms_merge

    a = spark.createDataFrame([("x",)] * 10 + [("y",)] * 3, "item string")
    b = spark.createDataFrame([("y",)] * 7 + [("z",)] * 2, "item string")
    merged = cms_merge(
        cms_build(a, "item", depth=3, width=16, portable=True),
        cms_build(b, "item", depth=3, width=16, portable=True),
    )
    direct = cms_build(a.unionByName(b), "item", depth=3, width=16, portable=True)
    mm = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    dd = {(r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert mm == dd


def test_cms_grouped_sketches_independent(spark):
    from seafan_spark.sketches import cms_build, cms_estimate

    rows = [("g1", "a")] * 5 + [("g2", "a")] * 9
    df = spark.createDataFrame(rows, "k string, item string")
    sk = cms_build(df, "item", keys=["k"], depth=2, width=32, portable=True)
    est = cms_estimate(
        sk, df.select("k", "item").distinct(), "item", keys=["k"],
        depth=2, width=32, portable=True,
    )
    got = {(r["k"], r["item"]): r["est"] for r in est.collect()}
    assert got == {("g1", "a"): 5, ("g2", "a"): 9}


def test_stream_cms_ingest_equals_batch(spark, tmp_path):
    """Incrementally-maintained CMS store == one-shot cms_build over
    everything ingested, cell for cell — the mergeability contract that
    makes the store answer frequency questions without rescanning
    history."""
    from seafan_spark.sketches import cms_build, cms_estimate
    from seafan_spark.streaming import stream_cms_ingest

    src = tmp_path / "cms_src"
    src.mkdir()
    store = str(tmp_path / "cms_store")
    rows = [(f"u{i % 9}",) for i in range(120)]
    for i in range(0, 120, 40):
        spark.createDataFrame(rows[i : i + 40], "item string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"p{i}"))

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    stream_cms_ingest(stream, store, "item", depth=3, width=16, portable=True)

    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(store).collect()
    }
    batch = spark.createDataFrame(rows, "item string")
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(batch, "item", depth=3, width=16, portable=True).collect()
    }
    assert got == want
    # and the store answers estimates with the one-sided bound intact
    est = cms_estimate(
        spark.read.parquet(store), batch.select("item").distinct(), "item",
        depth=3, width=16, portable=True,
    )
    for r in est.collect():
        assert r["est"] >= 120 // 9
