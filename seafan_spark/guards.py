"""Row-count guards for deliberate small-data compatibility paths.

A few operators intentionally centralize data (positional subset/row over a
global row number, expression-language ``index()``'s per-row gather, the
exact all-pairs cosine oracle path). They are correct but must not be
pointed at a 100 TB table by accident — each calls :func:`assert_small`
first so misuse fails loudly with a pointer to the scale path instead of
OOMing a task or the driver.

The ceiling is configurable via the ``SEAFAN_SMALL_DATA_LIMIT`` env var.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

def _default_limit() -> int:
    # read per call: the env var is documented as a runtime override, so a
    # value set after import must be honored
    return int(os.environ.get("SEAFAN_SMALL_DATA_LIMIT", "2000000"))


class SmallDataLimitError(ValueError):
    pass


def _default_group_limit() -> int:
    return int(os.environ.get("SEAFAN_COLLAPSED_GROUP_LIMIT", "2000000"))


def assert_bounded_groups(
    df: DataFrame,
    keys,
    op: str,
    limit: int | None = None,
    scale_hint: str = "",
) -> int:
    """Raise if any ``keys`` cell of ``df`` exceeds the collapsed-relation
    row ceiling; returns the max cell size (total count when ``keys`` is
    empty).

    The survival/CUSUM family runs ordered windows PER GROUP over a
    collapsed (group, distinct time) relation — correct at any corpus
    size ONLY while that relation stays bounded by time cardinality. A
    continuous duration column (microsecond floats) silently defeats the
    collapse: each group's window becomes subject-cardinality on a single
    task. This guard prices one aggregate over the already-collapsed
    relation (group-cardinality output) and fails loudly with the
    'bucket first' guidance instead. Ceiling via
    ``SEAFAN_COLLAPSED_GROUP_LIMIT`` (default 2e6 rows per group).
    """
    from pyspark.sql import functions as F

    cap = _default_group_limit() if limit is None else limit
    keys = list(keys)
    if keys:
        mx = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("_m"))
            .collect()[0]["_m"]
        )
        mx = int(mx or 0)
    else:
        mx = df.count()
    if mx > cap:
        hint = f" {scale_hint}" if scale_hint else ""
        raise SmallDataLimitError(
            f"{op}: a group's collapsed relation has {mx} rows, above the "
            f"{cap} per-group ceiling (set SEAFAN_COLLAPSED_GROUP_LIMIT "
            f"to override).{hint}"
        )
    return mx


def assert_small(
    df: DataFrame, op: str, limit: int | None = None, scale_hint: str = ""
) -> int:
    """Raise if ``df`` exceeds the small-data row ceiling; returns the count.

    Costs one count() action — negligible next to the centralized work the
    guarded operator is about to do, and infinitely cheaper than the OOM.
    """
    cap = _default_limit() if limit is None else limit
    n = df.count()
    if n > cap:
        hint = f" {scale_hint}" if scale_hint else ""
        raise SmallDataLimitError(
            f"{op}: {n} rows exceeds the small-data limit {cap} "
            f"(set SEAFAN_SMALL_DATA_LIMIT to override).{hint}"
        )
    return n
