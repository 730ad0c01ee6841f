"""Embedding similarity search.

- ``cosine_col``: pure-JVM cosine between two array<numeric> columns
  (zip_with dot product + aggregate norms — no UDF, vectorizable).
- ``ann_brute_topk``: exact baseline — broadcast the (small) query set
  against the corpus, window top-k. One pass over the corpus, no shuffle
  of the corpus itself beyond the top-k aggregation.
- ``hyperplane_bucket_col`` + ``ann_lsh_topk``: the scale path — seeded
  pseudo-random hyperplane sign bits bucket the corpus; queries only score
  against their own bucket (recall < 1, tunable via ``planes``; multi-probe
  by flipping bits is the standard extension).

Hyperplane and JL projections use deterministic ±1 sign weights generated
driver-side (seeded Mersenne Twister) and inlined as plan literals: no
stored model, identical across executors/runs, and — because the weights
are plain literals, not engine hash functions — any engine given the same
weight table (``jl_sign_weights`` / ``hyperplane_weights``) reproduces the
results exactly, which is how the DuckDB oracle checks these paths.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seafan_spark.pipeline import Pipeline


def _sign_matrix(rows: int, cols: int, seed_key: str) -> list[list[float]]:
    rng = random.Random(seed_key)
    return [[1.0 if rng.random() < 0.5 else -1.0 for _ in range(cols)] for _ in range(rows)]


def jl_sign_weights(in_dim: int, out_dim: int, seed: int = 42) -> list[list[float]]:
    """The JL projection's ±1 weight matrix (out_dim x in_dim) — exposed so
    external twins (e.g. a SQL oracle) can inline identical weights."""
    return _sign_matrix(out_dim, in_dim, f"jl:{in_dim}:{out_dim}:{seed}")


def hyperplane_weights(planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """The LSH hyperplane ±1 weight matrix (planes x dim)."""
    return _sign_matrix(planes, dim, f"hp:{planes}:{dim}:{seed}")


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def ann_brute_topk(
    pipe: Pipeline,
    id_col: str,
    vec_col: str,
    queries: DataFrame | None = None,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` defaults to the corpus itself (all-pairs top-k). The query
    side is broadcast — this is the baseline for small/medium query sets;
    for query sets too big to broadcast, use ann_lsh_topk.

    Returns (q_id, neighbor_id, cosine, rank), rank 1-based, ties broken
    by neighbor id.
    """
    corpus = pipe.df.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nv"))
    if queries is None:
        q = pipe.df.select(F.col(id_col).alias(query_id), F.col(vec_col).alias(query_vec))
    else:
        q = queries
    joined = corpus.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("_nid") != F.col(query_id))
    scored = joined.withColumn("cosine", cosine_col(F.col(query_vec), F.col("_nv")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("_nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id).alias("q_id"),
            F.col("_nid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def hyperplane_bucket_col(vec: Column, dim: int, planes: int = 16, seed: int = 42) -> Column:
    """LSH bucket key: sign bits of ``planes`` pseudo-random ±1-weighted
    projections (``hyperplane_weights``, inlined literals — the whole
    O(planes x dim) contraction is codegen'd JVM arithmetic, no hash calls
    in the row loop, no stored model)."""
    ws = hyperplane_weights(planes, dim, seed)

    def proj(p: int) -> Column:
        terms = F.zip_with(
            vec,
            F.array(*[F.lit(w) for w in ws[p]]),
            lambda x, w: x.cast("double") * w,
        )
        return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)

    bits = [F.when(proj(p) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in range(planes)]
    return F.concat(*bits)


def l2_normalize_col(vec: Column) -> Column:
    """Unit-L2-normalized copy of an array<numeric> column (zero vectors
    pass through unchanged). Pure JVM higher-order functions."""
    nrm = F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return F.when(nrm == 0.0, vec.cast("array<double>")).otherwise(
        F.transform(vec, lambda x: x.cast("double") / nrm)
    )


def mean_pool_col(vecs: Column) -> Column:
    """Element-wise mean of an array<array<numeric>> column (token- or
    chunk-embedding pooling). Empty input -> NULL."""
    n = F.size(vecs)
    summed = F.aggregate(
        F.slice(vecs, 2, F.greatest(n - 1, F.lit(0))),
        F.element_at(vecs, 1).cast("array<double>"),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x.cast("double")),
    )
    return F.when(n == 0, F.lit(None)).otherwise(
        F.transform(summed, lambda x: x / n.cast("double"))
    )


def random_projection_col(
    vec: Column, in_dim: int, out_dim: int, seed: int = 42
) -> Column:
    """Johnson-Lindenstrauss random projection to ``out_dim`` using
    driver-generated ±1 sign weights (``jl_sign_weights``, inlined
    literals) — no stored model, reproducible across runs AND engines,
    and the whole O(in_dim x out_dim) contraction stays JVM-side
    (codegen), no UDF, no shuffle. Output scaled by 1/sqrt(out_dim) so
    expected norms are preserved (sign-weight JL variant, Achlioptas
    2003)."""
    scale = 1.0 / (out_dim ** 0.5)
    ws = jl_sign_weights(in_dim, out_dim, seed)
    comps = []
    for j in range(out_dim):
        terms = F.zip_with(
            vec,
            F.array(*[F.lit(w) for w in ws[j]]),
            lambda x, w: x.cast("double") * w,
        )
        comps.append(F.aggregate(terms, F.lit(0.0), lambda a, x: a + x) * F.lit(scale))
    return F.array(*comps)


def ann_ivf_topk(
    pipe: Pipeline,
    id_col: str,
    vec_col: str,
    queries: DataFrame | None = None,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer, exact cosine
    inside the ``n_probe`` nearest cells per query.

    The scale path alongside ann_lsh_topk, trading a small training job
    for data-adaptive cells (LSH cells are data-oblivious):

    - train MLlib KMeans on the corpus (distributed, one pass per iter);
    - assign every corpus vector its cell id JVM-side (model.transform);
      the corpus is shuffled ONCE by cell in the candidate join, never
      all-pairs;
    - the query side is small/broadcastable: its top ``n_probe`` cells come
      from a driver-side numpy argsort over the (n_centroids x dim)
      centroid matrix, then explode -> broadcast equi-join on cell id;
    - exact cosine + window top-k inside candidates only. Expected cost
      n_probe/n_centroids of brute force; recall grows with n_probe.

    Returns (q_id, neighbor_id, cosine, rank) like ann_brute_topk.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = pipe.df.sparkSession
    corpus = pipe.df.select(
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_nv"),
        array_to_vector(F.col(vec_col)).alias("_mlv"),
    )
    km = KMeans(k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="_mlv",
                predictionCol="_cell")
    model = km.fit(corpus)
    assigned = model.transform(corpus).select("_nid", "_nv", "_cell")

    cents = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    if queries is None:
        q = pipe.df.select(F.col(id_col).alias(query_id), F.col(vec_col).alias(query_vec))
    else:
        q = queries
    qrows = q.collect()  # query side is small by contract (like brute's broadcast)
    n_probe = min(n_probe, len(cents))
    cn = np.linalg.norm(cents, axis=1) + 1e-12
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[query_vec], dtype="float64")
        sims = (cents @ qv) / (cn * (np.linalg.norm(qv) + 1e-12))
        for cell in np.argsort(-sims)[:n_probe]:
            probe_rows.append((r[query_id], [float(x) for x in qv], int(cell)))
    if not probe_rows:
        raise ValueError("ann_ivf_topk: empty query set")
    qdf = spark.createDataFrame(probe_rows, schema=[query_id, query_vec, "_cell"])
    cand = assigned.join(F.broadcast(qdf), "_cell").filter(
        F.col("_nid") != F.col(query_id)
    )
    scored = cand.withColumn("cosine", cosine_col(F.col(query_vec), F.col("_nv")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col("_nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id).alias("q_id"),
            F.col("_nid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def ann_lsh_topk(
    pipe: Pipeline,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k: bucket by hyperplane signature, exact
    cosine within each bucket. The join key is the bucket — no cross
    product across buckets. Expected bucket size n/2^planes controls cost."""
    df = pipe.df
    dim = len(df.select(vec_col).first()[0])
    d = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_bucket_col(F.col(vec_col), dim, planes, seed).alias("_bkt"),
    )
    a = d.select(F.col("_id").alias("q_id"), F.col("_v").alias("qv"), "_bkt")
    b = d.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("nv"), "_bkt")
    scored = (
        a.join(b, "_bkt")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), F.col("rank").cast("bigint").alias("rank"))
    )
