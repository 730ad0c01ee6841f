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


#: session-lifetime memo for :func:`assert_bounded_groups` — keyed by the
#: analyzed plan's semantic hash so composed operators (survival_km →
#: rmst/km_confidence over the same input) don't re-pay the eager guard
#: aggregate per wrapper (round-9 ADVICE). Bounded FIFO.
_BOUNDED_MEMO: dict[tuple, int] = {}
_BOUNDED_MEMO_MAX = 256


def assert_bounded_groups(
    df: DataFrame,
    keys,
    op: str,
    limit: int | None = None,
    scale_hint: str = "",
    unique_col: str | None = None,
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

    Operators whose per-group cost is QUADRATIC in the cell size (pair
    self-joins — ``mann_kendall``) must pass an explicit ``limit``: the
    default ceiling prices O(B log B) windows, not O(B²) joins.

    ``unique_col``: when set, the same aggregate also checks that the
    column is UNIQUE within each group (count == count_distinct) —
    the one-row-per-order-value contract whose silent violation would
    otherwise yield a wrong answer rather than a slow one (e.g.
    Mann-Kendall drops equal-order pairs from S while still counting
    the rows in n and Var(S)). No extra job: one grouped pass either way.
    """
    from pyspark.sql import functions as F

    cap = _default_group_limit() if limit is None else limit
    keys = list(keys)
    # memoize on (session, analyzed-plan semantic hash, keys, cap): a
    # PASSING guard for the same lineage never re-runs (derived operators
    # compose for free); failures are never cached, and a changed plan
    # hashes differently. Best-effort — any JVM hiccup just recomputes.
    memo_key = None
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
        memo_key = (id(df.sparkSession), h, tuple(keys), cap, unique_col)
    except Exception:
        pass
    if memo_key is not None and memo_key in _BOUNDED_MEMO:
        return _BOUNDED_MEMO[memo_key]
    aggs = [F.count(F.lit(1)).alias("_n")]
    if unique_col is not None:
        aggs.append(F.count_distinct(F.col(unique_col)).alias("_nd"))
    cells = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    finals = [F.max("_n").alias("_m")]
    if unique_col is not None:
        finals.append(
            F.max(F.col("_n") - F.col("_nd")).alias("_dup")
        )
    row = cells.agg(*finals).collect()[0]
    mx = int(row["_m"] or 0)
    if unique_col is not None and int(row["_dup"] or 0) > 0:
        hint = f" {scale_hint}" if scale_hint else ""
        raise SmallDataLimitError(
            f"{op}: duplicate {unique_col!r} values within a group — the "
            f"operator requires one row per {unique_col!r} per group; "
            f"aggregate the series first.{hint}"
        )
    if mx > cap:
        hint = f" {scale_hint}" if scale_hint else ""
        raise SmallDataLimitError(
            f"{op}: a group's collapsed relation has {mx} rows, above the "
            f"{cap} per-group ceiling (set SEAFAN_COLLAPSED_GROUP_LIMIT "
            f"to override).{hint}"
        )
    if memo_key is not None:
        _BOUNDED_MEMO[memo_key] = mx
        while len(_BOUNDED_MEMO) > _BOUNDED_MEMO_MAX:
            _BOUNDED_MEMO.pop(next(iter(_BOUNDED_MEMO)))
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
