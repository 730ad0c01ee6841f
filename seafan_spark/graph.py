"""Graph analytics over edge-list DataFrames — Spark-first power
iteration, no graph library.

The reference has no graph surface; these are north-star extensions for
corpus-graph work: link/citation centrality, near-dup-graph centrality
(compose ``llmops.dedup.minhash_pairs`` edges into :func:`pagerank` to
pick the most *central* copy instead of the highest-scored one), and
bipartite interaction graphs (customer-order, doc-term).

Scale shape: one iteration = one equi-join of the rank relation onto
the edge list (shuffle on the edge key, AQE-skew-safe) + one groupBy;
the rank relation is node-sized, the edge list is scanned per
iteration.  Ranks are localCheckpointed every few iterations so the
plan stays flat instead of growing a join tower (the same
checkpoint-the-loop rule as exprlang's Loop and minhash_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seafan_spark.session import unpersist_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    dangling: str = "drop",
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list: returns (node, rank) after
    ``iters`` power iterations of

        r(v) = (1-d)/N + d * sum_{u->v} r(u)/outdeg(u)   [+ dangling]

    ``dangling="redistribute"`` adds the classic uniform redistribution
    of rank held by sink nodes (one scalar aggregate per iteration);
    ``"drop"`` (default) lets sink mass leak — rankings are unchanged
    for most uses and every step stays a pure join/groupBy pipeline a
    SQL twin can replay verbatim.

    Duplicate (src, dst) rows count once (the edge list is
    ``distinct``-ed); nodes are the union of both endpoint sets, so
    isolated destinations still receive the teleport term.
    """
    if dangling not in ("drop", "redistribute"):
        raise ValueError("pagerank: dangling must be 'drop' or 'redistribute'")
    from pyspark.sql import Window

    # out-degree is static across iterations: bake it into the edge
    # relation as a window count over the distinct edges (round-10 —
    # was a separate groupBy relation joined back EVERY iteration, one
    # full extra join per power step). The loop relations are PERSISTED
    # (not localCheckpointed, round-11): a checkpoint reports
    # UnknownPartitioning, so every power iteration re-exchanged the
    # edge list AND the node list; a cached InMemoryRelation keeps its
    # child's hash partitioning visible to the planner, so the edge
    # side of the per-iteration join (the out-degree window's own
    # exchange hash-partitions on _s, the join key) and the node
    # side (distinct output is hash-partitioned on node) never
    # re-shuffle — one Exchange per iteration (the contribution
    # groupBy) instead of three.
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .withColumn(
            "_deg",
            F.count(F.lit(1)).over(
                Window.partitionBy("_s").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .persist()  # scanned every iteration
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    outdeg = e.select("_s").distinct()

    d = F.lit(float(damping))
    base = F.lit((1.0 - float(damping)) / n)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev_ck = None
    for it in range(int(iters)):
        contrib = (
            ranks.join(e, ranks["node"] == e["_s"])
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        new = nodes.join(contrib, "node", "left").select(
            "node",
            (base + d * F.coalesce(F.col("_in"), F.lit(0.0))).alias("rank"),
        )
        if dangling == "redistribute":
            dang = (
                ranks.join(outdeg, ranks["node"] == outdeg["_s"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            new = new.crossJoin(F.broadcast(dang)).select(
                "node",
                (F.col("rank") + d * F.col("_dm") / F.lit(float(n))).alias("rank"),
            )
        ranks = new
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
            # the superseded checkpoint's blocks are dead once the new one
            # is materialized — iterations hold ONE rank snapshot, not
            # iters/checkpoint_every of them
            unpersist_checkpoint(prev_ck)
            prev_ck = ranks
    # materialize the final ranks as their own (node-sized) checkpoint so
    # every loop intermediate — edge list included — can be freed NOW:
    # residue is O(1) blocks per call instead of O(iters), reclaimed fully
    # by session.cleanup() between queries
    final = ranks.localCheckpoint(eager=True)
    unpersist_checkpoint(prev_ck)
    e.unpersist()
    nodes.unpersist()
    return final


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree over a distinct edge list: (node,
    out_deg, in_deg) — one groupBy per direction, full-outer merged."""
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
    )
    out = e.groupBy(F.col("_s").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    inn = e.groupBy(F.col("_d").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        out.join(inn, "node", "full")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
