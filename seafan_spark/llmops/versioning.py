"""Corpus snapshot comparison — what changed between two versions.

Training corpora are rebuilt continuously (recrawls, re-filters, license
takedowns); before retraining on snapshot B you want to know exactly
what moved since snapshot A: documents added, removed, and rewritten.
``snapshot_diff`` answers that with one fingerprint comparison.

Scale: each side is first projected to ``(id, fingerprint)`` — the md5
of the text (or a caller-supplied fingerprint column, e.g. one already
persisted by the dedup store) — so the full text NEVER shuffles; the
full-outer join moves two slim columns per side. For id-bucketed
corpora the join is co-located with zero shuffle (bucketing.py); the
optional status filter prunes before anything downstream runs.

The reference has no versioning layer; this is a north-star extension
(its closest analogue is re-running the whole pipeline and eyeballing
row counts).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seafan_spark.pipeline import as_df as _df

#: diff statuses, in output order
STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_fingerprints(df, id_col: str, text_col: str = "text") -> DataFrame:
    """Project a snapshot to ``(id, fp)`` — md5 text fingerprints, the
    same portable digest the exact-dedup path uses, so a persisted dedup
    fingerprint store can be reused directly as a diff side."""
    d = _df(df)
    return d.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp"))


def snapshot_diff(
    old,
    new,
    id_col: str = "id",
    fp_col: str = "fp",
    include: Sequence[str] = ("added", "removed", "changed"),
) -> DataFrame:
    """Diff two ``(id, fingerprint)`` snapshot projections.

    Returns ``(id, status, old_fp, new_fp)`` where status is ``added``
    (id only in ``new``), ``removed`` (only in ``old``), ``changed``
    (both, fingerprints differ) or ``unchanged``; ``include`` filters the
    statuses emitted (default drops the unchanged bulk — at 100 TB that
    is almost everything, and dropping it here lets the filter sit
    directly on the join output before any downstream shuffle).

    Feed the sides through :func:`snapshot_fingerprints` (or reuse a
    persisted fingerprint/dedup store). One full-outer join on id over
    two-column inputs; co-located (zero-shuffle) when both sides are
    bucketed by id.
    """
    bad = set(include) - set(STATUSES)
    if bad:
        raise ValueError(f"snapshot_diff: unknown statuses {sorted(bad)}")
    o = _df(old).select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("old_fp")
    )
    n = _df(new).select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("new_fp")
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select("id", status.alias("status"), "old_fp", "new_fp")
    if set(include) != set(STATUSES):
        out = out.filter(F.col("status").isin(list(include)))
    return out


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """One row per status with document counts — the retrain-or-not
    dashboard number. Runs map-side partial aggregation over the slim
    diff output."""
    return diff.groupBy("status").agg(F.count("*").alias("docs"))
