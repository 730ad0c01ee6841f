"""Deduplication operators — exact and near-duplicate, shuffle-conscious.

Candidate generation never goes O(n^2): exact dedup is a hash groupBy;
MinHash/SimHash generate candidates by banding (equi-join on small band
keys); n-gram Jaccard joins on shared (frequency-capped) n-grams. All
signature math is JVM higher-order functions — no Python in the row path.

Cluster assignment uses min-id label propagation over candidate edges —
a bounded number of self-joins (connected components converge in
O(log diameter) iterations; near-dup clusters are shallow in practice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from seafan_spark.llmops.text import fingerprint_col, shingles_col, word_ngrams_col
from seafan_spark.pipeline import Pipeline


# ---------------------------------------------------------------- exact ----
def exact_dedup(pipe: Pipeline, text_col: str, id_col: str) -> Pipeline:
    """Exact dedup on the normalized-text fingerprint: adds

    - ``fp``       md5 fingerprint
    - ``dup_count`` group size
    - ``is_dup``   1.0 for every row except the group's min-id keeper

    One shuffle (window by fingerprint)."""
    d = pipe.df.withColumn("fp", fingerprint_col(F.col(text_col)))
    w = Window.partitionBy("fp")
    wo = Window.partitionBy("fp").orderBy(F.col(id_col))
    d = (
        d.withColumn("dup_count", F.count(F.lit(1)).over(w))
        .withColumn("_rn", F.row_number().over(wo))
        .withColumn("is_dup", (F.col("_rn") > 1).cast("double"))
        .drop("_rn")
    )
    return pipe._derive(d)


def drop_exact_dups(pipe: Pipeline, text_col: str, id_col: str) -> Pipeline:
    """Keep one (min-id) row per distinct normalized text."""
    marked = exact_dedup(pipe, text_col, id_col)
    return marked.filter(F.col("is_dup") == 0.0)


# -------------------------------------------------------------- minhash ----
def minhash_signature_col(text: Column, num_hashes: int = 64, shingle_k: int = 5) -> Column:
    """MinHash signature: for each seed h, min over character shingles of
    xxhash64(shingle, h). Array of ``num_hashes`` longs, all JVM-side."""
    sh = shingles_col(text, k=shingle_k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, h=h: F.xxhash64(s, F.lit(h))))
            for h in range(num_hashes)
        ]
    )


def minhash_pairs(
    pipe: Pipeline,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding, verified by
    signature agreement.

    signature -> ``bands`` bands of ``num_hashes/bands`` rows; docs sharing
    any band bucket become candidates (equi-join on (band, bucket) — the
    only shuffle); est_jaccard = fraction of matching signature positions;
    pairs below ``threshold`` are dropped.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sig = pipe.df.select(
        F.col(id_col).alias("_id"),
        minhash_signature_col(F.col(text_col), num_hashes, shingle_k).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice("_sig", b * rows + 1, rows), lambda v: v.cast("string")))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "_sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "band", "bucket")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "band", "bucket")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    est = matches.cast("double") / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_clusters(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Connected components over duplicate pairs by min-id label
    propagation: (id, cluster) where cluster is the component's min id.
    Each iteration is one join + aggregate; stops when labels fix."""
    edges = pairs.select("id_a", "id_b")
    sym = edges.union(edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
    labels = (
        sym.select(F.col("id_a").alias("id"), F.col("id_b"))
        .groupBy("id")
        .agg(F.least(F.min("id_b"), F.min("id")).alias("cluster"))
        .withColumn("cluster", F.least("cluster", "id"))
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.id_b == labels.id)
            .select(sym.id_a.alias("id"), F.col("cluster"))
        )
        new = (
            labels.select("id", "cluster")
            .union(neigh)
            .groupBy("id")
            .agg(F.min("cluster").alias("cluster"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
        labels = labels.localCheckpoint(eager=True)
    return labels


# -------------------------------------------------------------- simhash ----
def simhash_bits_col(text: Column, bits: int = 64, shingle_k: int = 5) -> Column:
    """SimHash over character shingles: per bit, the sign of the vote sum
    (+1/-1 per shingle's hash bit). Returns array<int> of 0/1 of length
    ``bits`` — kept unpacked for cheap banding/hamming math."""
    sh = shingles_col(text, k=shingle_k)
    votes = F.aggregate(
        sh,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda i: (F.pmod(F.xxhash64(s, i), F.lit(2)) * 2 - 1).cast("long"),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.transform(votes, lambda v: (v > 0).cast("int"))


def hamming_distance_col(a: Column, b: Column) -> Column:
    """Hamming distance between two bit arrays."""
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda v: v))


def simhash_pairs(
    pipe: Pipeline,
    id_col: str,
    text_col: str,
    bits: int = 64,
    chunks: int = 8,
    max_hamming: int = 6,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup pairs: by pigeonhole, any pair within ``max_hamming`` of a
    ``bits``-bit simhash agrees exactly on at least one of ``chunks``
    equal-width chunks (chunks > max_hamming guarantees recall 1.0) —
    candidates are an equi-join on (chunk, chunk-bits), verified by true
    hamming distance."""
    width = bits // chunks
    sig = pipe.df.select(
        F.col(id_col).alias("_id"),
        simhash_bits_col(F.col(text_col), bits, shingle_k).alias("_sh"),
    )
    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.concat_ws("", F.transform(F.slice("_sh", c * width + 1, width), lambda v: v.cast("string"))).alias("key"),
                ),
            )
        ).alias("cb"),
    ).select("_id", "_sh", "cb.chunk", "cb.key")
    a = banded.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "chunk", "key")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "chunk", "key")
    cand = (
        a.join(b, on=["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming_distance_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------- n-gram jaccard ----
def ngram_jaccard_pairs(
    pipe: Pipeline,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
) -> DataFrame:
    """EXACT word-n-gram Jaccard near-dup pairs.

    (id, ngram) exploded -> n-grams seen in more than ``max_df`` docs are
    dropped (stop-grams: they generate quadratic candidates and carry no
    signal) -> self-join on ngram -> per-pair intersection counts ->
    jaccard = inter / (|A| + |B| - inter). Shuffles on ngram then on the
    pair key; both partial-aggregated map-side.
    """
    base = pipe.df.select(
        F.col(id_col).alias("_id"),
        word_ngrams_col(F.col(text_col), n).alias("_gr"),
    ).withColumn("_n", F.size("_gr"))
    sizes = base.select("_id", "_n")
    ex = base.select("_id", F.explode("_gr").alias("g"))
    df_cap = ex.groupBy("g").count().filter(F.col("count") <= max_df).select("g")
    ex = ex.join(F.broadcast(df_cap), "g")
    a = ex.select(F.col("_id").alias("id_a"), "g")
    b = ex.select(F.col("_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# ------------------------------------------------- embedding near-dup ----
def embedding_neardup_pairs(
    pipe: Pipeline,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicates: random-hyperplane LSH buckets
    (sign bits of seeded pseudo-random projections) generate candidates;
    exact cosine verifies. One equi-join on the bucket key."""
    from seafan_spark.llmops.similarity import cosine_col, hyperplane_bucket_col

    d = pipe.df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_bucket_col(F.col(vec_col), planes=planes, seed=seed).alias("_bkt"),
    )
    a = d.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "_bkt")
    b = d.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "_bkt")
    return (
        a.join(b, "_bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
