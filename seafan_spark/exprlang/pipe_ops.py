"""AddToPipe and Loop — attaching expression results to pipelines.

Reference: AddToPipe (parser.go:1703-1758) length-reconciles (scalars
replicate to all rows; a 1-row pipeline broadcasts up to a longer result via
one2Many, parser.go:1661-1691), resolves FREither roles from the result
type, drops an existing column of the same name, then re-encodes. Loop
(parser.go:1776-1804) iteratively re-evaluates with a pinned loop variable.

Here scalars broadcast for free (a window aggregate is a column); the only
one2Many case that can lengthen a pipeline is a top-level ``range(a,b)``
generator, handled explicitly. Loop grows the logical plan linearly, so we
localCheckpoint periodically to keep Catalyst analysis time bounded.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from seafan_spark.exprlang.compiler import Ctx, CompileError, TypedCol, _compile
from seafan_spark.exprlang.parser import Node, parse
from seafan_spark.ftypes import FRole, FType
from seafan_spark.pipeline import Pipeline
from seafan_spark.sources import RID

_CHECKPOINT_EVERY = 10


def _result_role(tc: TypedCol) -> FRole:
    if tc.role is not None:
        return tc.role
    if tc.kind in ("str", "date", "qlit"):
        return FRole.CAT
    return FRole.CTS


def add_to_pipe(
    pipe: Pipeline,
    expression: str,
    name: str,
    partition_by: Sequence[str] | None = None,
    strict: bool = True,
) -> Pipeline:
    """Evaluate ``expression`` and attach it as field ``name``."""
    node = parse(expression)

    # one2Many: a top-level range(a,b) with constant bounds on a 1-row
    # pipeline replaces the pipeline with the generated sequence
    # (parser_test.go:836-858)
    if node.kind == "func" and node.value == "range":
        a, b = node.children
        if a.kind == "num" and b.kind == "num" and pipe.row_count() == 1:
            start, end = int(float(a.value)), int(float(b.value))
            if start == end:
                raise CompileError("range: empty range")
            step = 1 if end > start else -1
            spark = pipe.spark
            gen = spark.range(0, abs(end - start)).select(
                (F.lit(start) + F.lit(step) * F.col("id")).cast("double").alias(name),
                F.col("id").alias(RID),
            )
            base = pipe.df.drop(*[c for c in pipe.df.columns if c.startswith("_")])
            if name in base.columns:
                base = base.drop(name)
            d = gen.crossJoin(F.broadcast(base))
            out = pipe._derive(d, order_spec=[(RID, True)])
            fts = out.fts.copy()
            fts.add(FType(name=name, role=FRole.CTS))
            out.fts = fts
            return out

    ctx = Ctx(pipe, partition_by=partition_by, env=None, strict=strict)
    tc = _compile(node, ctx)
    # withColumn replaces an existing column in place and may still
    # reference its old value (drop-if-exists, parser.go:1745-1748);
    # ctx.frame() attaches any staged whole-pipe aggregates (broadcast
    # 1-row joins — the scale path for unpartitioned summaries)
    d = ctx.frame().withColumn(name, tc.col)
    helpers = ctx.placeholder_names()
    if helpers:
        d = d.drop(*helpers)
    fts = pipe.fts.copy()
    if name in fts:
        fts.drop(name)
    role = _result_role(tc)
    fts.add(FType(name=name, role=role))
    out = pipe._derive(d, fts=fts)
    out.order_spec = list(pipe.order_spec)
    return out


def loop(
    pipe: Pipeline,
    loop_var: str,
    start: int,
    end: int,
    assignments: list[tuple[str, str]],
    strict: bool = True,
) -> Pipeline:
    """Iterative re-evaluation (Loop, parser.go:1776-1804): for each value
    of ``loop_var`` in [start, end), evaluate each (expression, assign-name)
    in order — later expressions see earlier assignments of the same
    iteration. Plan growth is bounded with periodic localCheckpoint."""
    cur = pipe
    it = 0
    for x in range(start, end):
        for expression, assign in assignments:
            node = parse(expression)
            ctx = Ctx(cur, env={loop_var: float(x)}, strict=strict)
            tc = _compile(node, ctx)
            # withColumn overwrites in place; the expression may reference
            # the field's previous value (e.g. "c+x" assigned to c)
            d = ctx.frame().withColumn(assign, tc.col)
            helpers = ctx.placeholder_names()
            if helpers:
                d = d.drop(*helpers)
            fts = cur.fts.copy()
            fts.add(FType(name=assign, role=_result_role(tc)))
            cur = cur._derive(d, fts=fts)
        it += 1
        if it % _CHECKPOINT_EVERY == 0:
            cur.df = cur.df.localCheckpoint(eager=False)
    return cur
