"""Group iteration — the reference's group-by surface.

Reference: ``Slice`` (slicer.go:37-186) iterates the levels of a
categorical field (or quartile buckets of a continuous field), yielding one
row-filter per group, with a minimum-count gate and an optional restrict
list. Combined with summary functions this is how seafan does grouped
aggregation.

Spark-native form: ``df.groupBy(...)`` — use :func:`seafan_spark.agg.group_by`
for real aggregation work (one shuffle, map-side partials). The iterator
below reproduces the reference's *iteration* API for segment-wise
diagnostics: each yielded group is a lazily filtered Pipeline; the only
eager work is one small groupBy().count() to enumerate levels.

Scale note: iterating G groups issues G filtered jobs — fine for the
diagnostic use case (G is segment-count small). For per-group analytics over
many groups, use group_by / window partitions instead.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from seafan_spark.ftypes import FRole
from seafan_spark.pipeline import Pipeline


def slicer_and(s1: Column, s2: Column) -> Column:
    """Conjunction of predicates (SlicerAnd, slicer.go:73-78)."""
    return s1 & s2


def slicer_or(s1: Column, s2: Column) -> Column:
    """Disjunction of predicates (SlicerOr, slicer.go:81-84)."""
    return s1 | s2


class Slice:
    """Iterate groups of ``feat``: categorical levels, or quartile buckets
    of a continuous field (NewSlice/Iter/MakeSlicer, slicer.go:37-186).

    Usage::

        for value, sub_pipe in Slice("x2", 0, pipe).groups():
            ...  # sub_pipe is the rows where x2 == value
    """

    def __init__(
        self,
        feat: str,
        min_cnt: int,
        pipe: Pipeline,
        restrict: Sequence[Any] | None = None,
    ):
        if feat not in pipe.df.columns:
            raise KeyError(f"slice: no field {feat}")
        self.feat = feat
        self.min_cnt = min_cnt
        self.pipe = pipe
        self.restrict = list(restrict) if restrict else None
        ft = pipe.fts.get(feat)
        self.is_cat = ft is not None and ft.role == FRole.CAT
        self._edges: list[float] | None = None

    def _levels(self) -> list[Any]:
        d = self.pipe.df.groupBy(self.feat).count()
        if self.min_cnt > 0:
            d = d.filter(F.col("count") > self.min_cnt)
        vals = [r[0] for r in d.collect() if r[0] is not None]
        if self.restrict is not None:
            vals = [v for v in vals if v in self.restrict]
        return sorted(vals)

    def _quartile_predicates(self) -> list[tuple[Any, Column]]:
        """Continuous features iterate quartile buckets (slicer.go:113-151)."""
        row = self.pipe.df.agg(
            F.percentile_approx(F.col(self.feat), [0.0, 0.25, 0.5, 0.75, 1.0], 10000).alias("q")
        ).collect()[0]
        q = row["q"]
        c = F.col(self.feat)
        preds: list[tuple[Any, Column]] = []
        for i in range(4):
            lo, hi = q[i], q[i + 1]
            cond = (
                (c >= F.lit(lo)) & (c < F.lit(hi))
                if i < 3
                else (c >= F.lit(lo)) & (c <= F.lit(hi))
            )
            preds.append(((lo, hi), cond))
        return preds

    def groups(self) -> Iterator[tuple[Any, Pipeline]]:
        """Yield (group-value, sub-pipeline) pairs, ascending group order."""
        if self.is_cat:
            for v in self._levels():
                yield v, self.pipe.filter(F.col(self.feat) == F.lit(v))
        else:
            for bounds, pred in self._quartile_predicates():
                sub = self.pipe.filter(pred)
                if self.min_cnt > 0 and sub.df.limit(self.min_cnt + 1).count() <= self.min_cnt:
                    continue
                yield bounds, sub

    def predicates(self) -> Iterator[tuple[Any, Column]]:
        """Yield (group-value, boolean Column) without materializing
        sub-pipelines (MakeSlicer analogue)."""
        if self.is_cat:
            for v in self._levels():
                yield v, F.col(self.feat) == F.lit(v)
        else:
            yield from self._quartile_predicates()
