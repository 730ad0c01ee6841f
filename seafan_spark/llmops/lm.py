"""N-gram language-model quality scoring (the "perplexity filter").

The standard large-corpus quality gate (CCNet / Gopher / RefinedWeb
lineage): train a cheap n-gram LM on a reference corpus, score every
candidate document by its mean token log-likelihood, and drop the tails
(gibberish scores far below the corpus mode; boilerplate repeats far
above). This module is that filter as pure Spark SQL relational algebra —
counts are aggregations, probabilities are joins, the score is a per-doc
mean — so there is no model artifact to ship: the "model" IS two small
DataFrames (unigram + bigram counts) that broadcast-join against the
corpus being scored.

Scale shape (100 TB): training is one explode pass over the reference
corpus with map-side partial aggregation into at most |vocab| and
|vocab|^2-bounded (in practice corpus-bigram-bounded) count tables;
scoring joins the exploded candidate bigrams against those tables on
token equi-keys — broadcastable whenever the reference vocabulary is
bounded (it is: counts tables grow with distinct n-grams, not corpus
size), after which scoring is shuffle-free except the final per-doc mean.

Smoothing is Laplace (add-``alpha``) over a vocabulary of size V+1 (one
slot reserved for unseen tokens):

    p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * (V + 1))

deliberately simple and exactly reproducible in ANSI SQL, which is what
makes the DuckDB oracle able to verify scores value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seafan_spark.llmops.text import norm_text_col

DEFAULT_ALPHA = 0.1


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of the normalized text (empty text -> empty
    array, so blank docs score NULL, not a phantom token)."""
    t = norm_text_col(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def lm_unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token -> count over the corpus: ``(w, c)``. One explode +
    map-side-combined aggregation; output is vocabulary-sized."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )


def lm_bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent token pair -> count: ``(w1, w2, c)``. Pairs come from
    zipping the token array with its own tail (JVM-side, no UDF); docs
    with fewer than two tokens contribute nothing."""
    toks = tokens_col(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )


def _token_pair_relation(
    df: DataFrame, text_col: str, id_col: str | None = None
) -> DataFrame:
    """ONE tokenize+explode pass serving unigram counts, bigram counts
    AND per-doc scoring (round-10): rows ``([_id,] w1, w2)`` with one
    row per TOKEN — ``w2`` is the following token, NULL at the
    document's last token (``arrays_zip`` pads the shorter tail slice).
    ``w1`` alone reproduces the token stream (the unigram domain) and
    the ``w2 IS NOT NULL`` subset is exactly the adjacent-pair stream
    (the bigram domain), so consumers that previously each re-ran the
    regex normalization + tokenization over the full corpus (train
    unigrams, train bigrams, score) share one pass. Materialized lazily
    (``localCheckpoint``): the first consuming action computes and
    stores it — roughly the tokenized corpus's own size, a fair trade
    for two saved full-text passes at any scale."""
    toks = tokens_col(F.col(text_col))
    zipped = F.arrays_zip(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    ids = [F.col(id_col).alias("_id")] if id_col else []
    d = df.select(*ids, F.explode(zipped).alias("p")).select(
        *(["_id"] if id_col else []),
        F.col("p.0").alias("w1"),
        F.col("p.1").alias("w2"),
    )
    return d.localCheckpoint(eager=False)


def _counts_from_pairs(rel: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(unigram, bigram) count tables off a :func:`_token_pair_relation`
    — identical values to :func:`lm_unigram_counts` /
    :func:`lm_bigram_counts` without their separate corpus passes."""
    unigrams = rel.groupBy(F.col("w1").alias("w")).agg(F.count("*").alias("c"))
    bigrams = (
        rel.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    return unigrams, bigrams


def lm_score_docs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
    alpha: float = DEFAULT_ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """Mean bigram log-likelihood per document:
    ``(id, n_bigrams, avg_logprob)``.

    ``unigrams``/``bigrams`` default to counts trained on ``df`` itself
    (self-scoring — the usual "find the corpus's own outliers" mode); pass
    counts trained on a held-out reference corpus for the filter-new-data
    mode. ``broadcast_model=True`` hints both count tables as broadcast
    sides (they are vocabulary-sized, not corpus-sized); disable only if
    the reference vocabulary is genuinely huge, in which case the joins
    fall back to shuffle equi-joins on the token keys.

    Docs with fewer than 2 tokens have no bigrams: ``n_bigrams = 0`` and
    NULL ``avg_logprob`` (explicitly not penalized — filter on n_bigrams
    separately)."""
    if unigrams is None and bigrams is None:
        # self-scoring: ONE tokenize+explode pass (lazily checkpointed)
        # serves unigram training, bigram training and scoring — the
        # three separate full-text passes this mode used to pay
        rel = _token_pair_relation(df, text_col, id_col)
        unigrams, bigrams = _counts_from_pairs(rel)
        doc_pairs = rel.filter(F.col("w2").isNotNull())
    else:
        if unigrams is None:
            unigrams = lm_unigram_counts(df, text_col)
        if bigrams is None:
            bigrams = lm_bigram_counts(df, text_col)
        toks = tokens_col(F.col(text_col))
        pairs = F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        )
        doc_pairs = df.select(
            F.col(id_col).alias("_id"), F.explode(pairs).alias("p")
        ).select("_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    if broadcast_model:
        unigrams = F.broadcast(unigrams)
        bigrams = F.broadcast(bigrams)
    # V+1: one reserved slot so unseen tokens get nonzero mass
    vocab1 = unigrams.agg((F.count("*") + 1).cast("double").alias("_v1"))

    scored = (
        doc_pairs.join(bigrams, ["w1", "w2"], "left")
        .withColumnRenamed("c", "c12")
        .join(unigrams.withColumnRenamed("w", "w1"), ["w1"], "left")
        .withColumnRenamed("c", "c1")
        .crossJoin(F.broadcast(vocab1))
        .select(
            "_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("_v1"))
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count("*").alias("n_bigrams"), F.avg("_lp").alias("avg_logprob")
    )
    # re-attach zero-bigram docs with an explicit NULL score
    all_ids = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        all_ids.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )


# ----------------------------------------------------------------- DSIR ----
def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    alpha: float = DEFAULT_ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight (Xie et al. 2023, Data
    Selection via Importance Resampling): ``log w(x) = log p_target(x)
    - log p_raw(x)``, both bigram LMs with Laplace smoothing — the
    target model trained on the reference corpus, the raw model on the
    candidate corpus itself.  Documents that "look like the target
    distribution relative to the raw pool" get high weight.

    Returns ``(id, n_bigrams, log_w)``; docs with fewer than 2 tokens
    have no bigrams and NULL ``log_w``.

    Scale shape: the candidate corpus explodes into bigrams ONCE; both
    models (four vocabulary-sized count tables) broadcast-join onto
    that single pass, and the per-doc reduction is one groupBy — the
    same shuffle budget as one lm_score_docs call despite scoring
    under two models.
    """
    # ONE tokenize+explode pass per corpus (round-10; was two count
    # passes per model + a third scoring pass over the candidate corpus)
    rel_t = _token_pair_relation(target, text_col)
    t_uni, t_bi = _counts_from_pairs(rel_t)
    rel_c = _token_pair_relation(corpus, text_col, id_col)
    r_uni, r_bi = _counts_from_pairs(rel_c)
    doc_pairs = rel_c.filter(F.col("w2").isNotNull())
    if broadcast_model:
        # vocabulary-sized tables; disable only for a vocabulary too big
        # to broadcast (joins fall back to token-key shuffles — same
        # convention as lm_score_docs)
        t_uni, t_bi = F.broadcast(t_uni), F.broadcast(t_bi)
        r_uni, r_bi = F.broadcast(r_uni), F.broadcast(r_bi)
    t_v1 = t_uni.agg((F.count("*") + 1).cast("double").alias("_tv1"))
    r_v1 = r_uni.agg((F.count("*") + 1).cast("double").alias("_rv1"))

    a = F.lit(alpha)
    scored = (
        doc_pairs.join(
            t_bi.withColumnRenamed("c", "_tc12"), ["w1", "w2"], "left"
        )
        .join(
            t_uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "_tc1"),
            ["w1"],
            "left",
        )
        .join(
            r_bi.withColumnRenamed("c", "_rc12"), ["w1", "w2"], "left"
        )
        .join(
            r_uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "_rc1"),
            ["w1"],
            "left",
        )
        .crossJoin(F.broadcast(t_v1))
        .crossJoin(F.broadcast(r_v1))
        .select(
            "_id",
            (
                F.log(
                    (F.coalesce(F.col("_tc12"), F.lit(0)) + a)
                    / (F.coalesce(F.col("_tc1"), F.lit(0)) + a * F.col("_tv1"))
                )
                - F.log(
                    (F.coalesce(F.col("_rc12"), F.lit(0)) + a)
                    / (F.coalesce(F.col("_rc1"), F.lit(0)) + a * F.col("_rv1"))
                )
            ).alias("_dlp"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("_dlp").alias("log_w")
    )
    all_ids = corpus.select(F.col(id_col).alias("_id")).distinct()
    return all_ids.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "log_w",
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 1000,
    alpha: float = DEFAULT_ALPHA,
    salt: str = "dsir",
    broadcast_model: bool = True,
) -> DataFrame:
    """DSIR selection: keep the ``k`` candidate documents drawn
    WITHOUT replacement with probability proportional to their
    importance weight — the Gumbel-top-k trick (key = ``log_w`` +
    Gumbel noise; the top-k keys ARE such a sample), with the noise
    derived from the deterministic md5 hash bucket so the draw is
    reproducible across runs, engines, and task retries (same rationale
    as sampling.py — ``rand()`` resamples under retries).

    Returns ``(id, n_bigrams, log_w, sel_key)`` for the selected docs.
    Zero-bigram docs (NULL ``log_w``) are excluded.

    Scale shape: dsir_log_weights' single explode pass, then ONE
    ORDER-BY-LIMIT top-k (TakeOrderedAndProject: per-partition partial
    top-k, driver merge bounded by k).  For k beyond driver comfort,
    pre-filter on a log_w quantile threshold and sample the survivors.
    """
    from seafan_spark.sampling import hash_bucket_col

    w = dsir_log_weights(corpus, target, id_col, text_col, alpha, broadcast_model)
    u = (hash_bucket_col(F.col(id_col), salt) + F.lit(0.5)) / F.lit(1_000_000.0)
    gumbel = -F.log(-F.log(u))
    return (
        w.filter(F.col("log_w").isNotNull())
        .withColumn("sel_key", F.col("log_w") + gumbel)
        .orderBy(F.col("sel_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
