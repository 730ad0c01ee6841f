"""N-gram LM scorer (llmops.lm): count correctness, smoothing math,
outlier separation, reference-corpus mode, and degenerate docs."""

import math

import pytest
from pyspark.sql import functions as F

from seafan_spark.llmops.lm import (
    lm_bigram_counts,
    lm_score_docs,
    lm_unigram_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat"),
            (3, "zq"),
            (4, ""),
            (5, None),
        ],
        ["doc_id", "text"],
    )


def test_counts(docs):
    uni = {r["w"]: r["c"] for r in lm_unigram_counts(docs).collect()}
    assert uni == {"the": 3, "cat": 2, "sat": 1, "on": 1, "mat": 1, "zq": 1}
    big = {(r["w1"], r["w2"]): r["c"] for r in lm_bigram_counts(docs).collect()}
    assert big[("the", "cat")] == 2 and big[("on", "the")] == 1
    assert sum(big.values()) == 6  # 5 pairs from doc 1 + 1 from doc 2


def test_laplace_score_by_hand(docs):
    got = {r["doc_id"]: r for r in lm_score_docs(docs, "doc_id").collect()}
    # doc 2 = one bigram (the, cat): (2 + 0.1) / (3 + 0.1 * 7)
    assert got[2]["n_bigrams"] == 1
    assert math.isclose(got[2]["avg_logprob"], math.log(2.1 / 3.7), rel_tol=1e-12)
    # degenerate docs: no bigrams, NULL score (not penalized)
    for d in (3, 4, 5):
        assert got[d]["n_bigrams"] == 0 and got[d]["avg_logprob"] is None


def test_outlier_scores_lower(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((99, "xq zzv qqj wvx blorp snarf"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # self-scoring: outlier still ranks last (its own counts soften the
    # gap — add-alpha gives its bigrams c=1)
    scored = {r["doc_id"]: r["avg_logprob"] for r in lm_score_docs(df, "doc_id").collect()}
    natural = [v for k, v in scored.items() if k != 99]
    assert scored[99] < min(natural)
    # reference mode (trained on the natural docs only): wide separation
    ref = df.filter(F.col("doc_id") != 99)
    scored2 = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm_score_docs(
            df,
            "doc_id",
            unigrams=lm_unigram_counts(ref),
            bigrams=lm_bigram_counts(ref),
        ).collect()
    }
    natural2 = [v for k, v in scored2.items() if k != 99]
    assert scored2[99] < min(natural2) - 1.0  # clearly separated tail


def test_reference_corpus_mode(spark, docs):
    """Scoring new docs against counts trained elsewhere: unseen tokens
    get the reserved-slot mass, never an error or NULL blowup."""
    uni = lm_unigram_counts(docs)
    big = lm_bigram_counts(docs)
    new = spark.createDataFrame([(10, "the cat"), (11, "totally unseen words")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm_score_docs(new, "doc_id", unigrams=uni, bigrams=big).collect()}
    assert math.isclose(got[10]["avg_logprob"], math.log(2.1 / 3.7), rel_tol=1e-12)
    # fully unseen bigram + unseen context: (0 + 0.1) / (0 + 0.1 * 7)
    assert math.isclose(got[11]["avg_logprob"], math.log(0.1 / 0.7), rel_tol=1e-12)
    assert got[11]["n_bigrams"] == 2


def test_model_broadcast_in_plan(docs):
    plan = (
        lm_score_docs(docs, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # count tables join broadcast-side
