"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark SQL).

The 100 TB pattern this module exists for: COUNT(DISTINCT x) over arbitrary
slices of a petabyte fact table is a full-shuffle query every time it's
asked. A *sketch table* inverts the cost: one scan builds a tiny
``binary`` HLL sketch per fine-grained group (e.g. per day x segment), and
every later question — distinct users last quarter, per segment, overall —
is answered by unioning a few kilobytes of sketches, never rescanning the
facts. Sketch union is associative/commutative, so rollups compose with
map-side partial aggregation and incremental refresh (today's partition
re-sketched, the rest untouched).

North-star operator (no reference analogue): the reference engine
(seafan) has no approximate-distinct surface at all; Spark ships the
DataSketches HLL functions natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), so the whole module stays
JVM-side — no UDFs, codegen throughout.

Accuracy: relative standard error ~= 1.04 / sqrt(2^lg_k); the default
lg_k=12 gives ~1.6% RSE in ~2.5 KB per sketch. Estimates are
deterministic for a given input set and lg_k (the sketch state is a pure
function of the inserted hash set), which is what lets the driver query
assert a tolerance band as a hash-checkable boolean.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def hll_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group — the
    build-once artifact. One scan, map-side partial aggregation (HLL
    union is the combiner), shuffle carries only partial sketch states
    (~2.5 KB each at lg_k=12), never raw values."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union fine-grained sketches up to coarser groups (``group_cols`` may
    be empty for a grand total). Input is the sketch table, so this query
    touches kilobytes regardless of the fact table's size."""
    agg = F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def hll_estimate(sketch: Column | str) -> Column:
    """Distinct-count estimate of a sketch column (bigint)."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c).alias("estimate")


def hll_overlap(
    sketch_a: Column | str,
    sketch_b: Column | str,
) -> Column:
    """Estimated |A ∩ B| of two sketch columns by inclusion-exclusion:
    |A| + |B| - |A ∪ B|, all three terms read from the sketches — the
    corpus-overlap question ("how many of this week's users/docs did we
    already see?") answered without touching either corpus. Error
    compounds across the three estimates (still ~1%-scale at lg_k=12)
    and can go slightly negative for near-disjoint sets; clamped at 0."""
    a = F.col(sketch_a) if isinstance(sketch_a, str) else sketch_a
    b = F.col(sketch_b) if isinstance(sketch_b, str) else sketch_b
    union = F.hll_union(a, b, True)
    inter = (
        F.hll_sketch_estimate(a)
        + F.hll_sketch_estimate(b)
        - F.hll_sketch_estimate(union)
    )
    return F.greatest(inter, F.lit(0)).alias("overlap")


def distinct_over_slices(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """End-to-end demo of the sketch-table pattern: build per-``fine_cols``
    sketches, roll them up to ``coarse_cols``, return estimates. At scale
    the sketch table would be persisted (parquet ``binary`` column) and
    only the rollup re-run per question; ``coarse_cols`` must be a subset
    of ``fine_cols`` for the rollup to be meaningful."""
    missing = [c for c in coarse_cols if c not in fine_cols]
    if missing:
        raise ValueError(f"coarse_cols not in fine_cols: {missing}")
    fine = hll_sketch_table(df, fine_cols, value_col, lg_k)
    coarse = hll_rollup(fine, coarse_cols)
    return coarse.select(
        *coarse_cols, hll_estimate("sketch").alias("estimate")
    )
