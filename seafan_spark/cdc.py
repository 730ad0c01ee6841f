"""Changelog / table-maintenance operators: CDC apply and SCD2 history.

A 100 TB corpus or feature store is maintained, not rebuilt: upstream
systems emit keyed change events (upserts and deletes) and the engine
must fold them into the current snapshot — the ``MERGE INTO`` of
Delta/Hudi/Iceberg — and, for audit/temporal queries, keep the full
validity history of every key (Kimball's slowly-changing-dimension
type 2). The reference has no maintenance layer (its pipelines are
rebuild-from-source); these are north-star extensions built on plain
DataFrame algebra so Catalyst owns the physical plan.

Scale story, shared by all three operators:

- the changelog is compacted FIRST (latest row per key — a window that
  Catalyst executes with a map-side WindowGroupLimit partial top-1, so
  a hot key's rows collapse per map task before the shuffle);
- the snapshot then joins the compacted changes on the key: one shuffle
  of each side at most, zero shuffle for the snapshot when it is
  bucketed by the key (bucketing.py) — the big side NEVER shuffles on
  anything but its key and is never exploded;
- deletes ride the same join (filter after), so apply is one pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from seafan_spark.pipeline import as_df as _df


def _delete_col(op_col: str | None, delete_op: str) -> Column:
    if op_col is None:
        return F.lit(False)
    return F.col(op_col) == F.lit(delete_op)


def latest_state(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Compact a keyed changelog to its current state: the latest row per
    key wins (ts desc, remaining-column tiebreak for determinism on ts
    ties); a key whose latest row is a delete disappears.

    The per-key top-1 is a window Catalyst runs with a map-side
    WindowGroupLimit, so hot keys are pruned before the single shuffle.
    Output schema = input schema minus ``op_col``.
    """
    d = _df(changes)
    keys = list(key_cols)
    rest = [c for c in d.columns if c not in keys and c != ts_col and c != op_col]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc_nulls_last() for c in rest]
    )
    latest = (
        d.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    latest = latest.filter(~_delete_col(op_col, delete_op))
    return latest.drop(op_col) if op_col is not None else latest


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """MERGE a changelog into a snapshot — Delta/Hudi ``MERGE INTO``
    semantics as one join:

    - per key, the LATEST change (by ``ts_col``) decides: a delete
      removes the key, anything else upserts the change's payload;
    - keys with no change keep their snapshot row untouched;
    - keys only in the changelog are inserted (unless their latest
      change is a delete).

    The changelog is compacted to one row per key BEFORE the join (see
    latest_state), so the snapshot — the 100 TB side — joins exactly
    once on its key and never shuffles at all when bucketed by it.
    Output schema = snapshot schema; the changes must carry the same
    payload columns (checked).
    """
    snap = _df(snapshot)
    keys = list(key_cols)
    payload = [c for c in snap.columns if c not in keys]
    d = _df(changes)
    missing = [c for c in snap.columns if c not in d.columns]
    if missing:
        raise ValueError(f"apply_changes: changes lack snapshot columns {missing}")
    # keep the delete marker through compaction: a key whose latest change
    # is a delete must KILL the snapshot row, not vanish from the join
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(),
        *[
            F.col(c).desc_nulls_last()
            for c in d.columns
            if c not in keys and c != ts_col and c != op_col
        ],
    )
    top = d.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    top = top.select(
        *keys,
        _delete_col(op_col, delete_op).alias("_del"),
        *[F.col(c).alias(f"_ch_{c}") for c in payload],
    )
    joined = snap.alias("s").join(top.alias("c"), keys, "full_outer")
    out = joined.filter((F.col("_del").isNull()) | (~F.col("_del")))
    # change side wins where present: _del is non-null exactly on changed keys
    merged = [
        F.when(F.col("_del").isNotNull(), F.col(f"_ch_{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in payload
    ]
    return out.select(*keys, *merged)


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    compress: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a keyed changelog into
    validity intervals ``(key, attrs, valid_from, valid_to)`` — one row
    per distinct state, ``valid_to`` NULL for the current state.

    ``compress=True`` (default) first drops rows whose attributes equal
    the key's previous row (no-op changes emit no interval — standard
    SCD2 change compression via one lag comparison).

    Two windows over the SAME (key, ts) partitioning — Catalyst plans a
    single sort+shuffle reused by both; the big table shuffles once.
    """
    d = _df(changes)
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    if compress:
        same = F.lit(True)
        for c in attrs:
            same = same & F.col(c).eqNullSafe(F.lag(c).over(w))
        # eqNullSafe(NULL, NULL) is TRUE, so a first row whose attrs are
        # NULL would self-compare equal to the missing predecessor — pin
        # the first row per key explicitly via lag(ts) IS NULL
        first = F.lag(ts_col).over(w).isNull()
        d = d.withColumn("_same", same & ~first).filter(~F.col("_same")).drop("_same")
    return (
        d.withColumn("_valid_to", F.lead(ts_col).over(w))
        .select(
            *keys,
            *attrs,
            F.col(ts_col).alias("valid_from"),
            F.col("_valid_to").alias("valid_to"),
        )
    )
