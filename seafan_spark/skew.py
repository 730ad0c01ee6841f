"""Skew mitigation: salted joins and two-stage salted aggregation.

AQE's skew-join handling splits oversized sort-merge partitions, but two
hot-key cases still serialize on one task: (a) a single key value whose
right-side match set must meet every left row (AQE can split the left
scan but each split still joins the same right rows), and (b) a groupBy
where one key holds most of the data and the final merge of that key
lands on one reducer. Salting is the portable fix: spread ONE logical
key over ``salt`` physical keys, then undo it.

Both operators are deterministic (salt comes from a row hash, not
rand()) so task retries and re-runs reproduce byte-identical results —
the same policy as sampling.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seafan_spark.rounding import round_col


from seafan_spark.pipeline import as_df as _df  # shared unwrap contract


def salted_join(
    left,
    right,
    on: str | Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join where the LEFT side's hot keys are spread across
    ``salt`` sub-keys and the (smaller) RIGHT side is replicated once
    per sub-key: join runs on (key..., salt), so a key holding 50% of
    the left rows occupies ``salt`` parallel tasks instead of one.

    Semantics == ``left.join(right, on, how)`` for ``inner``/``left``
    (each left row joins exactly one right replica). Right-side
    replication costs |R| x salt shuffle rows — use when R is the small
    side and AQE alone leaves a straggler.
    """
    if salt < 1:
        raise ValueError("salted_join: salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join: only inner/left joins preserve semantics under "
            "left-side salting (right/outer would need right-side salting)"
        )
    ldf, rdf = _df(left), _df(right)
    keys = [on] if isinstance(on, str) else list(on)

    # deterministic per-row salt: hash of the whole left row (stable under
    # retries; identical duplicate rows share a salt, which only matters
    # if the duplicates themselves are the skew)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in ldf.columns]), F.lit(salt))
    l2 = ldf.withColumn("_salt", lsalt.cast("int"))
    r2 = rdf.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l2.join(r2, keys + ["_salt"], how).drop("_salt")


def salted_groupby(
    df,
    keys: str | Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 32,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial-aggregate on
    (keys..., salt), then merge partials on keys. Spark's map-side
    partial aggregation already does this per input partition; the
    explicit salted stage ADDITIONALLY parallelizes the reduce of a hot
    key across ``salt`` reducers, leaving only ``salt`` pre-merged rows
    for the final task.

    ``aggs`` maps output name -> (fn, column) with fn in
    {count, sum, min, max, avg} (the algebraic set that re-aggregates
    losslessly; avg decomposes to sum/count).
    """
    if salt < 1:
        raise ValueError("salted_groupby: salt must be >= 1")
    d = _df(df)
    keylist = [keys] if isinstance(keys, str) else list(keys)
    allowed = {"count", "sum", "min", "max", "avg"}
    for name, (fn, _c) in aggs.items():
        if fn not in allowed:
            raise ValueError(f"salted_groupby: {name}: fn must be one of {sorted(allowed)}")

    srow = F.pmod(F.xxhash64(*[F.col(c) for c in d.columns]), F.lit(salt))
    d1 = d.withColumn("_salt", srow.cast("int"))

    partials: list[Column] = []
    finals: list[Column] = []
    for name, (fn, c) in aggs.items():
        if fn == "count":
            partials.append(F.count(F.col(c)).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").cast("long").alias(name))
        elif fn == "sum":
            partials.append(F.sum(F.col(c)).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            partials.append(F.min(F.col(c)).alias(f"_p_{name}"))
            finals.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            partials.append(F.max(F.col(c)).alias(f"_p_{name}"))
            finals.append(F.max(f"_p_{name}").alias(name))
        elif fn == "avg":
            partials.append(F.sum(F.col(c)).alias(f"_ps_{name}"))
            partials.append(F.count(F.col(c)).alias(f"_pc_{name}"))
            finals.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )
    stage1 = d1.groupBy(*keylist, "_salt").agg(*partials)
    return stage1.groupBy(*keylist).agg(*finals)


def skew_report(
    df,
    keys: Sequence[str] | str,
    top: int = 10,
) -> DataFrame:
    """Key-distribution diagnosis — decide WHETHER to salt before paying
    for it: per-key row counts for the ``top`` heaviest keys, each with
    its share of all rows and the ratio to a perfectly uniform key
    (count * n_distinct / total — the factor by which that key's reducer
    outweighs the average). One groupBy + one tiny scalar join.

    Returns (key columns..., n, share, skew_ratio) ordered heaviest
    first. skew_ratio >> 1 on the head key = salt that key
    (skew.salted_join / salted_groupby) or lean on AQE skew handling.
    """
    d = _df(df)
    key_list = [keys] if isinstance(keys, str) else list(keys)
    counts = d.groupBy(*key_list).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *key_list,
            F.col("n"),
            round_col(F.col("n") / F.col("_total"), 6).alias("share"),
            round_col(F.col("n") * F.col("_nkeys") / F.col("_total"), 4).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n").desc(), *key_list)
        .limit(top)
    )
