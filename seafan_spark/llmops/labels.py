"""Label-quality analysis for annotated training data.

Preference/classification corpora (RLHF comparisons, toxicity labels,
quality ratings) are only as good as their annotations. These operators
measure annotator reliability with the standard chance-corrected
agreement statistics — pairwise Cohen's kappa (find the outlier
annotator) and Fleiss' kappa (one corpus-level number) — as pure
relational compositions: every stage is a groupBy over (annotator, label)
cardinality or a self-join keyed on the item id, so the work scales with
items x annotators-per-item, never with corpus text. No counterpart in
the reference (no labeling surface there); both have exact SQL twins.

Input is the long annotation format: one row per (item, annotator, label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seafan_spark.rounding import round_col


def _df(x) -> DataFrame:
    return getattr(x, "df", x)


def annotator_agreement(
    annotations,
    item_col: str = "item_id",
    annotator_col: str = "annotator",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """Pairwise Cohen's kappa for every annotator pair (Cohen 1960).

    For a pair (a, b) over their co-annotated items: observed agreement
    ``p_o`` = fraction of items with equal labels; chance agreement
    ``p_e = sum_l p_a(l) * p_b(l)`` with marginals computed on the same
    co-annotated items; ``kappa = (p_o - p_e) / (1 - p_e)`` (NULL when
    ``p_e = 1`` — degenerate constant labels carry no signal).

    Shape: one self-equi-join on the item id pairs up co-annotations
    (co-located for an item-bucketed store); everything after operates on
    per-(pair) and per-(pair, label) aggregates — at most
    ``A^2 * L`` rows for A annotators and L labels, broadcast-sized even
    for crowdsourcing-scale annotator pools. Returns one row per pair:
    ``(annotator_a, annotator_b, n_items, p_o, p_e, kappa)``.
    """
    d = _df(annotations).select(
        F.col(item_col).alias("_item"),
        F.col(annotator_col).alias("_ann"),
        F.col(label_col).cast("string").alias("_lab"),
    )
    a = d.select(
        "_item", F.col("_ann").alias("annotator_a"), F.col("_lab").alias("_la")
    )
    b = d.select(
        "_item", F.col("_ann").alias("annotator_b"), F.col("_lab").alias("_lb")
    )
    pairs = a.join(b, "_item").filter(F.col("annotator_a") < F.col("annotator_b"))
    keys = ["annotator_a", "annotator_b"]
    totals = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg((F.col("_la") == F.col("_lb")).cast("double")).alias("_po"),
    )
    ca = pairs.groupBy(*keys, F.col("_la").alias("_l")).agg(
        F.count(F.lit(1)).alias("_ca")
    )
    cb = pairs.groupBy(*keys, F.col("_lb").alias("_l")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    # quadratic count terms in DOUBLE: ca*cb and n^2 overflow int64 once a
    # pair co-annotates >3e9 items; products of counts stay exactly
    # representable (< 2^53) far beyond any real annotator workload, so
    # the twin SQL (same casts) still bit-matches
    pe = (
        ca.join(cb, [*keys, "_l"])
        .groupBy(*keys)
        .agg(
            F.sum(F.col("_ca").cast("double") * F.col("_cb").cast("double")).alias(
                "_ab"
            )
        )
    )
    p_e = F.col("_ab") / (
        F.col("n_items").cast("double") * F.col("n_items").cast("double")
    )
    out = totals.join(pe, keys).select(
        *keys,
        F.col("n_items").cast("bigint").alias("n_items"),
        round_col(F.col("_po"), decimals).alias("p_o"),
        round_col(p_e, decimals).alias("p_e"),
        round_col(
            F.when(p_e < 1.0, (F.col("_po") - p_e) / (1.0 - p_e)),
            decimals,
        ).alias("kappa"),
    )
    return out.orderBy(*keys)


def fleiss_kappa(
    annotations,
    item_col: str = "item_id",
    annotator_col: str = "annotator",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — corpus-level chance-corrected
    agreement for a fixed number of ratings per item.

    Per item i and label j, with ``n`` ratings per item and ``n_ij``
    votes: ``P_i = (sum_j n_ij^2 - n) / (n (n-1))``; ``P_bar`` is the
    item mean, ``P_e = sum_j p_j^2`` with ``p_j`` the global label
    share, and ``kappa = (P_bar - P_e) / (1 - P_e)``.

    Raises if items differ in rating count (the statistic is undefined
    there — use :func:`annotator_agreement` instead). Two aggregation
    passes over (item, label) counts with map-side combine; output is a
    single row ``(n_items, n_raters, p_bar, p_e, kappa)``.
    """
    d = _df(annotations).select(
        F.col(item_col).alias("_item"),
        F.col(annotator_col).alias("_ann"),
        F.col(label_col).cast("string").alias("_lab"),
    )
    votes = d.groupBy("_item", "_lab").agg(F.count(F.lit(1)).alias("_nij"))
    per_item = votes.groupBy("_item").agg(
        F.sum("_nij").alias("_n"),
        F.sum(F.col("_nij") * F.col("_nij")).alias("_sq"),
    )
    nvals = [r["_n"] for r in per_item.select("_n").distinct().limit(2).collect()]
    if len(nvals) != 1:
        raise ValueError(
            f"fleiss_kappa: ratings per item must be constant, saw {sorted(nvals)}"
        )
    n = int(nvals[0])
    if n < 2:
        raise ValueError("fleiss_kappa: need at least 2 ratings per item")
    # p_bar as (sum_i sq_i - N*n) / (N*n*(n-1)): ONE division over exact
    # integer sums, so the double is bit-identical across engines and
    # summation orders (a mean of per-item k/6 rationals would not be)
    pbar_df = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            (F.sum("_sq") - F.count(F.lit(1)) * n)
            / (F.count(F.lit(1)) * n * (n - 1))
        ).alias("p_bar"),
    )
    # p_j shares need the grand total; sum_j cj^2 / (sum_j cj)^2 folds
    # both into ONE aggregate over the tiny per-label frame
    lab_counts = votes.groupBy("_lab").agg(F.sum("_nij").alias("_cj"))
    cj = F.col("_cj").cast("double")  # cj^2 overflows int64 past ~3e9 ratings
    pe_row = lab_counts.agg(
        (F.sum(cj * cj) / (F.sum(cj) * F.sum(cj))).alias("p_e")
    )
    out = pbar_df.crossJoin(F.broadcast(pe_row)).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.lit(n).cast("int").alias("n_raters"),
        round_col(F.col("p_bar"), decimals).alias("p_bar"),
        round_col(F.col("p_e"), decimals).alias("p_e"),
        round_col(
            F.when(
                F.col("p_e") < 1.0,
                (F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")),
            ),
            decimals,
        ).alias("kappa"),
    )
    return out
