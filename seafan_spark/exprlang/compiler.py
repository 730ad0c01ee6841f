"""Compile expression ASTs to unevaluated pyspark Columns.

This replaces the reference's eager row-at-a-time Evaluate
(parser.go:1589-1629) with a compile step: every node becomes a Column
expression, so the whole tree executes JVM-side inside whole-stage codegen —
no Python in the row path, no materialization per node.

Type/semantic contracts (verified against the reference's test corpus,
parser_test.go:669-969):

- numbers are float64; comparisons & logicals return float 0/1; logical
  inputs are "true iff > 0"; ``if(cond,a,b)`` picks a iff cond > 0;
- arithmetic on string/date operands is a (compile-time) error; comparisons
  on equal kinds are allowed; quoted literals resolve to string or date by
  context (``date=='3/1/2023'``);
- division by zero errors at runtime (Spark ANSI mode, matching
  parser.go:1563-1566); ``log(x<=0)`` errors via an explicit guard;
- summary functions produce a scalar broadcast over rows. With partition
  keys they compile to window aggregates over
  ``Window.partitionBy(*partition_by)`` (per-group, parallel by key); with
  no keys (whole-table, the reference behavior) they are STAGED: one
  parallel partial aggregation to a 1-row frame, broadcast-joined back
  (``attach_scalar_aggs``) — never a window over an empty partitioning,
  which would funnel all rows through a single task;
- order-dependent functions (lag/row/cume*/prod*/index/npv) ride the
  pipeline's order spec (SURVEY §2.7 "_rid contract").

Known reference divergences (documented in SURVEY §7):
- ``mad`` here is sum|y-yhat| per its doc comment; the reference's dispatch
  bug computes SSE for both (parser.go:766-767);
- ``median``/``corr`` are declared-but-dead in the reference
  (parser.go:779-782); implemented here for real;
- ``dateDiff(...,'day'/'hour')`` uses calendar-day/hour arithmetic; the
  reference's 'day' branch has an int32-nanosecond truncation bug
  (parser.go:908-910).
"""

from __future__ import annotations

import datetime as _dt
import math
import re as _re
from dataclasses import dataclass, replace
from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from seafan_spark.exprlang.parser import Node, parse
from seafan_spark.ftypes import FRole
from seafan_spark.pipeline import Pipeline


class CompileError(ValueError):
    pass


class MissingFieldError(CompileError):
    pass


@dataclass
class TypedCol:
    """A compiled column + its expression-language kind.

    kind: 'num' | 'str' | 'date' | 'qlit' (undecided quoted literal)
    scalar: length-1 result (constant or summary aggregate)
    int_like: integer-valued numeric (affects toString formatting)
    role: set by ``cat()`` to force FRCat on AddToPipe
    """

    col: Column
    kind: str
    scalar: bool = False
    int_like: bool = False
    role: FRole | None = None
    qval: str | None = None
    #: set by compile_expression: the compilation context, needed to
    #: attach staged summary/running-op placeholder columns (use
    #: ``tc.ctx.frame()`` as the frame and drop
    #: ``tc.ctx.placeholder_names()`` afterwards)
    ctx: Any | None = None


def _parse_date_literal(text: str) -> _dt.date:
    """Date literals: CCYYMMDD or M/D/CCYY (parser.go:71)."""
    t = text.strip()
    if "/" in t:
        return _dt.datetime.strptime(t, "%m/%d/%Y").date()
    if len(t) == 8 and t.isdigit():
        return _dt.datetime.strptime(t, "%Y%m%d").date()
    raise CompileError(f"cannot parse date literal {text!r}")


class Ctx:
    """Compilation context: the pipeline, optional partition keys for
    summary/window functions, and loop-variable bindings."""

    def __init__(
        self,
        pipe: Pipeline,
        partition_by: Sequence[str] | None = None,
        env: dict[str, float] | None = None,
        strict: bool = True,
    ):
        self.pipe = pipe
        self.partition_by = list(partition_by or [])
        self.env = env or {}
        self.strict = strict
        # whole-pipe scalar aggregates staged during compilation:
        # (placeholder name, un-aliased agg Column); consumers attach them
        # via attach_scalar_aggs / frame()
        self.pending_aggs: list[tuple[str, Column]] = []
        # global order-dependent requests (row number / running sum / lag)
        # staged during compilation when no partition keys are given:
        # (placeholder name, kind, value Column) — materialized by frame()
        # via rank.attach_running_ops (range repartition + carry-ins), so
        # no expression ever windows over an unpartitioned global order
        self.pending_windows: list[tuple[str, str, Column | None]] = []

    def order_window(self) -> Window:
        """Partitioned order window (callers must hold partition keys —
        the unpartitioned global path goes through the staged running
        ops instead; see running())."""
        cols = self.pipe._order_columns()
        return Window.partitionBy(*self.partition_by).orderBy(*cols)

    def agg_window(self) -> Window:
        if self.partition_by:
            return Window.partitionBy(*self.partition_by)
        return Window.partitionBy()

    def running(self, kind: str, col: Column | None = None) -> Column:
        """Stage a global order-dependent request ('rownum' | 'sum' |
        'lag') and return its placeholder column. The scale path for
        unpartitioned window functions: rank.attach_running_ops computes
        all staged requests in one range shuffle with per-partition
        carry-ins — the whole table never funnels through one task."""
        self.pipe._ensure_rid()
        name = f"__win_{len(self.pending_windows)}"
        self.pending_windows.append((name, kind, col))
        return F.col(name)

    def row_index(self) -> Column:
        if self.partition_by:
            return (F.row_number().over(self.order_window()) - F.lit(1)).cast("double")
        return (self.running("rownum") - F.lit(1)).cast("double")

    def scalar_agg(self, col: Column) -> Column:
        """Stage a whole-pipe scalar aggregate and return its placeholder.

        The scale path for unpartitioned summaries: a parallel partial
        aggregation to ONE row, broadcast-joined back onto every row —
        instead of an aggregate windowed over an empty partitioning,
        which funnels the entire dataset through a single task."""
        name = f"__sagg_{len(self.pending_aggs)}"
        self.pending_aggs.append((name, col))
        return F.col(name)

    def placeholder_names(self) -> list[str]:
        """Names of every staged helper column (scalar aggregates +
        running ops) — callers that keep the frame drop these."""
        return [n for n, _ in self.pending_aggs] + [
            n for n, _, _ in self.pending_windows
        ]

    def frame(self) -> DataFrame:
        """The pipeline frame with all staged columns attached — scalar
        aggregates (broadcast 1-row joins) and global running ops (range
        repartition + carry-ins), interleaved in dependency waves so each
        staged expression sees the placeholders it references."""
        from seafan_spark.rank import attach_running_ops

        df = self.pipe.df
        saggs = list(self.pending_aggs)
        wins = list(self.pending_windows)
        while saggs or wins:
            have = set(df.columns)

            def ready(c: Column | None) -> bool:
                if c is None:
                    return True
                return set(_PLACEHOLDER_RE.findall(str(c))) <= have

            sagg_wave = [(n, c) for n, c in saggs if ready(c)]
            win_wave = [(n, k, c) for n, k, c in wins if ready(c)]
            if not sagg_wave and not win_wave:  # defensive: break cycles
                sagg_wave, win_wave = saggs[:1], []
            if sagg_wave:
                df = attach_scalar_aggs(df, sagg_wave)
                done = {n for n, _ in sagg_wave}
                saggs = [(n, c) for n, c in saggs if n not in done]
            if win_wave:
                self.pipe._ensure_rid()
                df = attach_running_ops(df, list(self.pipe.order_spec), win_wave)
                done = {n for n, _, _ in win_wave}
                wins = [(n, k, c) for n, k, c in wins if n not in done]
        return df

    def compile(self, node: Node) -> TypedCol:
        return _compile(node, self)


_SAGG_RE = _re.compile(r"__sagg_\d+")
#: any staged helper column (scalar aggregate or global running op)
_PLACEHOLDER_RE = _re.compile(r"__(?:sagg|win)_\d+")


def attach_scalar_aggs(
    df: DataFrame, pending: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Attach staged whole-pipe aggregates as broadcast one-row joins.

    Aggregates are grouped into waves: everything whose inputs are plain
    columns computes in ONE parallel ``df.agg`` (partial aggregation,
    map-side combine), then joins back via ``crossJoin(broadcast(...))``
    — a 1-row build side, so the nested-loop join is O(rows). An
    aggregate referencing an earlier placeholder (nested summaries)
    lands in a later wave."""
    remaining = list(pending)
    while remaining:
        have = set(df.columns)
        wave = [
            (n, c) for n, c in remaining if set(_SAGG_RE.findall(str(c))) <= have
        ]
        if not wave:  # defensive: break potential cycles one at a time
            wave = remaining[:1]
        row = df.agg(*[c.alias(n) for n, c in wave])
        df = df.crossJoin(F.broadcast(row))
        done = {n for n, _ in wave}
        remaining = [(n, c) for n, c in remaining if n not in done]
    return df


def _field_kind(pipe: Pipeline, name: str) -> str:
    dt = dict(pipe.df.dtypes)[name]
    if dt == "string":
        return "str"
    if dt in ("date", "timestamp", "timestamp_ntz"):
        return "date"
    if dt.startswith(("array", "map", "struct", "binary")):
        raise CompileError(f"field {name} has non-scalar type {dt}")
    return "num"


def _resolve_pair(a: TypedCol, b: TypedCol, what: str) -> tuple[TypedCol, TypedCol, str]:
    """Unify two operand kinds; quoted literals adopt the other side's kind
    (how ``date=='3/1/2023'`` works). Mismatched kinds error (consistent,
    parser.go:1475-1499)."""
    if a.kind == "qlit" and b.kind == "qlit":
        a, b = _as_kind(a, "str"), _as_kind(b, "str")
    elif a.kind == "qlit":
        a = _as_kind(a, b.kind)
    elif b.kind == "qlit":
        b = _as_kind(b, a.kind)
    if a.kind != b.kind:
        raise CompileError(f"{what}: mixed kinds {a.kind} vs {b.kind}")
    return a, b, a.kind


def _as_kind(tc: TypedCol, kind: str) -> TypedCol:
    if tc.kind == kind:
        return tc
    if tc.kind == "qlit":
        if kind == "date":
            return TypedCol(F.lit(_parse_date_literal(tc.qval)), "date", scalar=True)
        if kind == "str":
            return TypedCol(F.lit(tc.qval), "str", scalar=True)
        if kind == "num":
            raise CompileError(f"string literal {tc.qval!r} used in numeric context")
    raise CompileError(f"cannot coerce {tc.kind} to {kind}")


def _require_num(tc: TypedCol, what: str) -> TypedCol:
    if tc.kind == "qlit":
        raise CompileError(f"{what}: string literal in numeric context")
    if tc.kind != "num":
        raise CompileError(f"{what}: requires numeric operand, got {tc.kind}")
    return tc


def _bool01(c: Column) -> Column:
    return c.cast("double")


def _compile(node: Node, ctx: Ctx) -> TypedCol:
    if node.kind == "num":
        return TypedCol(F.lit(float(node.value)), "num", scalar=True)
    if node.kind == "qlit":
        return TypedCol(F.lit(node.value), "qlit", scalar=True, qval=node.value)
    if node.kind == "field":
        name = node.value
        if name in ctx.env:
            return TypedCol(F.lit(float(ctx.env[name])), "num", scalar=True)
        if name not in ctx.pipe.df.columns:
            raise MissingFieldError(f"field not found: {name}")
        ft = ctx.pipe.fts.get(name)
        if ft is not None and ft.role in (FRole.ONE_HOT, FRole.EMBED):
            raise CompileError(f"one-hot/embedding field {name} not usable in expressions")
        kind = _field_kind(ctx.pipe, name)
        col = F.col(name)
        int_like = dict(ctx.pipe.df.dtypes)[name] in ("tinyint", "smallint", "int", "bigint")
        if kind == "num":
            col = col.cast("double")
        return TypedCol(col, kind, int_like=int_like)
    if node.kind == "neg":
        child = _require_num(_compile(node.children[0], ctx), "unary minus")
        return replace(child, col=-child.col, int_like=False)
    if node.kind == "op":
        return _compile_op(node, ctx)
    if node.kind == "func":
        return _compile_func(node, ctx)
    raise CompileError(f"unknown node kind {node.kind}")


_CMP = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def _compile_op(node: Node, ctx: Ctx) -> TypedCol:
    op = node.value
    a = _compile(node.children[0], ctx)
    b = _compile(node.children[1], ctx)
    scalar = a.scalar and b.scalar
    if op in ("+", "-", "*", "/", "^"):
        a = _require_num(a, f"operator {op}")
        b = _require_num(b, f"operator {op}")
        if op == "+":
            col = a.col + b.col
        elif op == "-":
            col = a.col - b.col
        elif op == "*":
            col = a.col * b.col
        elif op == "/":
            col = a.col / b.col  # ANSI: division by zero errors (parser.go:1563-1566)
        else:
            col = F.pow(a.col, b.col)
        return TypedCol(col, "num", scalar=scalar)
    if op in _CMP:
        a, b, _ = _resolve_pair(a, b, f"comparison {op}")
        return TypedCol(_bool01(_CMP[op](a.col, b.col)), "num", scalar=scalar)
    if op in ("&&", "||"):
        a = _require_num(a, op)
        b = _require_num(b, op)
        at, bt = a.col > F.lit(0.0), b.col > F.lit(0.0)
        col = (at & bt) if op == "&&" else (at | bt)
        return TypedCol(_bool01(col), "num", scalar=scalar)
    raise CompileError(f"unknown operator {op}")


# --------------------------------------------------------------------------
# function registry: name -> (arity or (min,max), builder)
# Catalog mirrors the reference's closed set (strings/functions.txt:1-71).
# --------------------------------------------------------------------------

Builder = Callable[[Ctx, list[Node]], TypedCol]
_REGISTRY: dict[str, tuple[int, Builder]] = {}


def _register(name: str, arity: int):
    def deco(fn: Builder):
        _REGISTRY[name] = (arity, fn)
        return fn

    return deco


def _args(ctx: Ctx, nodes: list[Node]) -> list[TypedCol]:
    return [_compile(n, ctx) for n in nodes]


def _num_args(ctx: Ctx, nodes: list[Node], what: str) -> list[TypedCol]:
    return [_require_num(_compile(n, ctx), what) for n in nodes]


@_register("log", 1)
def _f_log(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "log")
    col = F.when(
        x.col <= F.lit(0.0), F.raise_error(F.lit("log: argument <= 0"))
    ).otherwise(F.log(x.col))
    if not ctx.strict:
        col = F.log(x.col)
    return TypedCol(col, "num", scalar=x.scalar)


@_register("exp", 1)
def _f_exp(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "exp")
    return TypedCol(F.exp(x.col), "num", scalar=x.scalar)


@_register("abs", 1)
def _f_abs(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "abs")
    return TypedCol(F.abs(x.col), "num", scalar=x.scalar, int_like=x.int_like)


@_register("pow", 2)
def _f_pow(ctx, nodes):
    x, y = _num_args(ctx, nodes, "pow")
    return TypedCol(F.pow(x.col, y.col), "num", scalar=x.scalar and y.scalar)


@_register("if", 3)
def _f_if(ctx, nodes):
    cond = _require_num(_compile(nodes[0], ctx), "if condition")
    a, b = _compile(nodes[1], ctx), _compile(nodes[2], ctx)
    a, b, kind = _resolve_pair(a, b, "if branches")
    col = F.when(cond.col > F.lit(0.0), a.col).otherwise(b.col)
    return TypedCol(col, kind, scalar=cond.scalar and a.scalar and b.scalar)


@_register("maxE", 2)
def _f_maxe(ctx, nodes):
    a, b = _args(ctx, nodes)
    a, b, kind = _resolve_pair(a, b, "maxE")
    return TypedCol(F.greatest(a.col, b.col), kind, scalar=a.scalar and b.scalar)


@_register("minE", 2)
def _f_mine(ctx, nodes):
    a, b = _args(ctx, nodes)
    a, b, kind = _resolve_pair(a, b, "minE")
    return TypedCol(F.least(a.col, b.col), kind, scalar=a.scalar and b.scalar)


# ---- order-dependent row functions (SURVEY §2.7) --------------------------


@_register("lag", 2)
def _f_lag(ctx, nodes):
    x = _compile(nodes[0], ctx)
    miss = _compile(nodes[1], ctx)
    if ctx.partition_by:
        lagged = F.lag(x.col, 1).over(ctx.order_window())
    else:
        lagged = ctx.running("lag", x.col)
    # first-row fill coerced to x's kind (data.go:531-550; lag(D,3) on a
    # string column fills "3.00" — float-to-string uses %.2f)
    if x.kind == "str" and miss.kind == "num":
        fill = F.format_string("%d", miss.col.cast("bigint")) if miss.int_like else F.format_string("%.2f", miss.col)
    else:
        fill = _as_kind(miss, x.kind).col if miss.kind != x.kind else miss.col
    return TypedCol(F.coalesce(lagged, fill), x.kind, int_like=x.int_like)


@_register("row", 1)
def _f_row(ctx, nodes):
    _args(ctx, nodes)  # argument defines length only
    return TypedCol(ctx.row_index(), "num", int_like=True)


def _frame_before(ctx: Ctx):
    return ctx.order_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)


def _frame_after(ctx: Ctx):
    return ctx.order_window().rowsBetween(Window.currentRow, Window.unboundedFollowing)


def _running_before_sum(ctx: Ctx, x: Column) -> Column:
    """Inclusive running sum under the global order — staged (no
    unpartitioned window)."""
    return ctx.running("sum", x)


def _running_after_sum(ctx: Ctx, x: Column) -> Column:
    """Inclusive running sum over the current row and everything after it,
    derived from the staged before-sum + the staged whole-pipe total:
    after = total - before_excl, guarded so an all-null suffix yields NULL
    (SQL aggregate semantics), matching a window over the after-frame."""
    contrib = F.coalesce(x, F.lit(0.0))
    before = _running_before_sum(ctx, x)
    before_cnt = ctx.running("sum", x.isNotNull().cast("long"))
    total = ctx.scalar_agg(F.sum(x))
    total_cnt = ctx.scalar_agg(F.count(x))
    after_cnt = total_cnt - before_cnt + x.isNotNull().cast("long")
    return F.when(
        after_cnt > 0,
        F.coalesce(total, F.lit(0.0)) - F.coalesce(before, F.lit(0.0)) + contrib,
    )


@_register("cumeBefore", 1)
def _f_cume_before(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "cume")
    if ctx.partition_by:
        return TypedCol(F.sum(x.col).over(_frame_before(ctx)), "num")
    return TypedCol(_running_before_sum(ctx, x.col), "num")


@_register("cumeAfter", 1)
def _f_cume_after(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "cume")
    if ctx.partition_by:
        return TypedCol(F.sum(x.col).over(_frame_after(ctx)), "num")
    return TypedCol(_running_after_sum(ctx, x.col), "num")


@_register("countBefore", 1)
def _f_count_before(ctx, nodes):
    x = _compile(nodes[0], ctx)
    if ctx.partition_by:
        col = F.count(x.col).over(_frame_before(ctx))
    else:
        col = ctx.running("sum", x.col.isNotNull().cast("long"))
    return TypedCol(col.cast("double"), "num", int_like=True)


@_register("countAfter", 1)
def _f_count_after(ctx, nodes):
    x = _compile(nodes[0], ctx)
    if ctx.partition_by:
        col = F.count(x.col).over(_frame_after(ctx))
    else:
        nn = x.col.isNotNull().cast("long")
        col = ctx.scalar_agg(F.count(x.col)) - ctx.running("sum", nn) + nn
    return TypedCol(col.cast("double"), "num", int_like=True)


def _product_parts(x: Column) -> tuple[Column, Column, Column]:
    """(zero-indicator, negative-indicator, log-magnitude) of one value —
    the decomposition that turns a running product into running SUMS
    (data.go:337-357 loops; log-space is the scalable form). All three are
    non-null for any input."""
    zero = F.when(x == 0.0, 1).otherwise(0).cast("long")
    neg = F.when(x < 0.0, 1).otherwise(0).cast("long")
    logmag = F.when(x != 0.0, F.log(F.abs(x))).otherwise(F.lit(0.0))
    return zero, neg, logmag


def _product_from_parts(zeros: Column, negs: Column, logsum: Column) -> Column:
    return F.when(zeros > 0, F.lit(0.0)).otherwise(
        F.exp(logsum) * F.pow(F.lit(-1.0), negs.cast("double"))
    )


def _windowed_product(x: Column, frame) -> Column:
    """Running product over a partitioned window frame."""
    zero, neg, logmag = _product_parts(x)
    zeros = F.sum(zero).over(frame)
    negs = F.sum(neg).over(frame)
    logsum = F.sum(logmag).over(frame)
    return _product_from_parts(zeros, negs, logsum)


def _running_product(ctx: Ctx, x: Column, after: bool) -> Column:
    """Global running product via three staged running sums (+ staged
    totals for the after-direction)."""
    zero, neg, logmag = _product_parts(x)
    parts = []
    for c in (zero, neg, logmag):
        before = ctx.running("sum", c)
        if after:
            parts.append(ctx.scalar_agg(F.sum(c)) - before + c)
        else:
            parts.append(before)
    return _product_from_parts(*parts)


@_register("prodBefore", 1)
def _f_prod_before(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "prodBefore")
    if ctx.partition_by:
        return TypedCol(_windowed_product(x.col, _frame_before(ctx)), "num")
    return TypedCol(_running_product(ctx, x.col, after=False), "num")


@_register("prodAfter", 1)
def _f_prod_after(ctx, nodes):
    (x,) = _num_args(ctx, nodes, "prodAfter")
    if ctx.partition_by:
        return TypedCol(_windowed_product(x.col, _frame_after(ctx)), "num")
    return TypedCol(_running_product(ctx, x.col, after=True), "num")


@_register("index", 2)
def _f_index(ctx, nodes):
    """Gather x at positions idx (data.go:641-660). Collects the ordered
    column into a per-row array — positional compat op, HARD small-data
    path (guarded: the per-row array is O(rows) memory each)."""
    from seafan_spark.guards import assert_small

    assert_small(
        ctx.pipe.df, "index()", limit=1_000_000,
        scale_hint="index() materializes the whole column per row; join on a key instead.",
    )
    x = _compile(nodes[0], ctx)
    idx = _require_num(_compile(nodes[1], ctx), "index positions")
    full = ctx.order_window().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # struct wrapper: collect_list silently DROPS null elements, which
    # would shift every position after a null; a struct is never null
    arr = F.collect_list(F.struct(x.col.alias("v"))).over(full)
    col = F.element_at(arr, (idx.col.cast("int") + F.lit(1)))["v"]
    return TypedCol(col, x.kind, int_like=x.int_like)


@_register("range", 2)
def _f_range(ctx, nodes):
    """a..b exclusive, direction-aware (ranger, parser.go:682-723), as a
    function of row position."""
    a, b = _num_args(ctx, nodes, "range")
    sign = F.when(b.col >= a.col, F.lit(1.0)).otherwise(F.lit(-1.0))
    return TypedCol(a.col + sign * ctx.row_index(), "num", int_like=True)


@_register("exist", 2)
def _f_exist(ctx, nodes):
    """If arg0 references a missing field, substitute fallback
    (parser.go:1595-1601) — here a compile-time check."""
    try:
        return _compile(nodes[0], ctx)
    except MissingFieldError:
        return _compile(nodes[1], ctx)


# ---- summary functions (scalar, broadcast; parser.go:726-792) -------------


def _summary(ctx, nodes, agg, what, keep_kind=False):
    args = _args(ctx, nodes)
    if not keep_kind:
        args = [_require_num(a, what) for a in args]
    raw = agg(*[a.col for a in args])
    if ctx.partition_by:
        col = raw.over(ctx.agg_window())  # per-group: parallel by key
    else:
        col = ctx.scalar_agg(raw)  # whole-pipe: staged broadcast agg
    kind = args[0].kind if keep_kind else "num"
    # with partition keys the aggregate is a PER-ROW window value, not a
    # length-1 scalar (evaluate/limit(1) paths depend on this flag)
    return TypedCol(col, kind, scalar=not ctx.partition_by)


@_register("sum", 1)
def _f_sum(ctx, nodes):
    return _summary(ctx, nodes, F.sum, "sum")


@_register("mean", 1)
def _f_mean(ctx, nodes):
    return _summary(ctx, nodes, F.avg, "mean")


@_register("std", 1)
def _f_std(ctx, nodes):
    return _summary(ctx, nodes, F.stddev_samp, "std")


@_register("median", 1)
def _f_median(ctx, nodes):
    # declared-but-dead in the reference (parser.go:781-782); real here
    return _summary(ctx, nodes, F.median, "median")


@_register("max", 1)
def _f_max(ctx, nodes):
    return _summary(ctx, nodes, F.max, "max", keep_kind=True)


@_register("min", 1)
def _f_min(ctx, nodes):
    return _summary(ctx, nodes, F.min, "min", keep_kind=True)


@_register("count", 1)
def _f_count(ctx, nodes):
    tc = _summary(ctx, nodes, F.count, "count", keep_kind=True)
    return TypedCol(tc.col.cast("double"), "num", scalar=tc.scalar, int_like=True)


@_register("corr", 2)
def _f_corr(ctx, nodes):
    return _summary(ctx, nodes, F.corr, "corr")


def _scalar_or_windowed(ctx, raw: Column) -> Column:
    if ctx.partition_by:
        return raw.over(ctx.agg_window())
    return ctx.scalar_agg(raw)


@_register("sse", 2)
def _f_sse(ctx, nodes):
    y, yhat = _num_args(ctx, nodes, "sse")
    col = _scalar_or_windowed(ctx, F.sum(F.pow(y.col - yhat.col, F.lit(2.0))))
    return TypedCol(col, "num", scalar=not ctx.partition_by)


@_register("mad", 2)
def _f_mad(ctx, nodes):
    # per the doc comment (parser.go:123): sum |y - yhat|; the reference's
    # dispatch bug computes SSE instead (parser.go:766-767) — we follow docs
    y, yhat = _num_args(ctx, nodes, "mad")
    col = _scalar_or_windowed(ctx, F.sum(F.abs(y.col - yhat.col)))
    return TypedCol(col, "num", scalar=not ctx.partition_by)


@_register("r2", 2)
def _f_r2(ctx, nodes):
    y, yhat = _num_args(ctx, nodes, "r2")
    sse = _scalar_or_windowed(ctx, F.sum(F.pow(y.col - yhat.col, F.lit(2.0))))
    n = _scalar_or_windowed(ctx, F.count(y.col)).cast("double")
    vary = _scalar_or_windowed(ctx, F.var_samp(y.col))
    col = F.lit(1.0) - sse / ((n - F.lit(1.0)) * vary)
    return TypedCol(col, "num", scalar=not ctx.partition_by)


@_register("npv", 2)
def _f_npv(ctx, nodes):
    """NPV with first flow undiscounted (parser.go:553-569): scalar rate
    discounts geometrically; vector rate uses (1+r_i)^-i per period."""
    rate, cf = _num_args(ctx, nodes, "npv")
    i = ctx.row_index()
    disc = F.pow(F.lit(1.0) / (F.lit(1.0) + rate.col), i)
    col = _scalar_or_windowed(ctx, F.sum(cf.col * disc))
    return TypedCol(col, "num", scalar=not ctx.partition_by)


@_register("irr", 2)
def _f_irr(ctx, nodes):
    """Root-find npv(r, cashflows) = cost (parser.go:615-658). Iterative —
    evaluated eagerly driver-side on the collected flows (the reference uses
    Nelder-Mead; we bisect, same 1e-4 relative tolerance)."""
    if ctx.partition_by:
        raise CompileError("irr: per-group IRR not supported in expressions; use agg.irr_by")
    cost_tc, cf_tc = _num_args(ctx, nodes, "irr")
    from seafan_spark.guards import assert_small

    assert_small(
        ctx.pipe.df, "irr()", limit=1_000_000,
        scale_hint="irr collects the full cashflow vector to the driver; "
        "aggregate or use agg.irr_by for per-group IRR.",
    )
    # materialize the order column BEFORE capturing the frame: _order_columns
    # mutates pipe.df, and a frame captured first would lack _rid
    ctx.pipe._ensure_rid()
    rows = (
        ctx.frame().select(cost_tc.col.alias("__cost"), cf_tc.col.alias("__cf"))
        .orderBy(*ctx.pipe._order_columns())
        .collect()
    )
    if not rows:
        raise CompileError("irr: empty pipeline")
    cost = float(rows[0]["__cost"])
    flows = [float(r["__cf"]) for r in rows]
    val = _solve_irr(cost, flows)
    return TypedCol(F.lit(val), "num", scalar=True)


def _solve_irr(cost: float, flows: list[float], tol: float = 1e-4) -> float:
    def f(r: float) -> float:
        # guard against float overflow/underflow of (1+r)^i at the bracket
        # edges for long cashflow vectors
        tot = 0.0
        for i, c in enumerate(flows):
            try:
                d = (1.0 + r) ** i
            except OverflowError:
                d = float("inf")
            if d == 0.0:
                return float("inf") if c >= 0 else float("-inf")
            tot += c / d
        return tot - cost

    lo, hi = -0.9999, 1e4
    flo, fhi = f(lo), f(hi)
    if flo * fhi > 0:
        raise CompileError("irr failed: no sign change in bracket")
    for _ in range(200):
        mid = (lo + hi) / 2.0
        fm = f(mid)
        if flo * fm <= 0:
            hi, fhi = mid, fm
        else:
            lo, flo = mid, fm
    r = (lo + hi) / 2.0
    if abs(f(r)) > abs(tol * cost) + tol:
        raise CompileError("irr failed to converge")
    return r


# ---- casts / formatting ---------------------------------------------------


@_register("toString", 1)
def _f_tostring(ctx, nodes):
    (x,) = _args(ctx, nodes)
    if x.kind == "num":
        # float -> "%.2f"; integer-valued -> "%d" (parser_test.go:822-834)
        col = (
            F.format_string("%d", x.col.cast("bigint"))
            if x.int_like
            else F.format_string("%.2f", x.col)
        )
    elif x.kind == "date":
        # M/D/YYYY without leading zeros ("2/28/2023")
        col = F.concat(
            F.month(x.col).cast("string"),
            F.lit("/"),
            F.dayofmonth(x.col).cast("string"),
            F.lit("/"),
            F.year(x.col).cast("string"),
        )
    else:
        col = _as_kind(x, "str").col if x.kind == "qlit" else x.col
    return TypedCol(col, "str", scalar=x.scalar)


@_register("toDate", 1)
def _f_todate(ctx, nodes):
    (x,) = _args(ctx, nodes)
    if x.kind == "qlit":
        return _as_kind(x, "date")
    if x.kind == "date":
        return x
    if x.kind != "str":
        raise CompileError("toDate: requires a string")
    t = F.trim(x.col)
    col = F.coalesce(F.try_to_date(t, "yyyyMMdd"), F.try_to_date(t, "M/d/yyyy"))
    if ctx.strict:
        col = F.when(col.isNull() & x.col.isNotNull(), F.raise_error(F.lit("toDate: unparseable date"))).otherwise(col)
    return TypedCol(col, "date", scalar=x.scalar)


@_register("toFloatDP", 1)
def _f_tofloatdp(ctx, nodes):
    (x,) = _args(ctx, nodes)
    col = (_as_kind(x, "str").col if x.kind == "qlit" else x.col).cast("double")
    return TypedCol(col, "num", scalar=x.scalar)


@_register("toFloatSP", 1)
def _f_tofloatsp(ctx, nodes):
    (x,) = _args(ctx, nodes)
    col = (_as_kind(x, "str").col if x.kind == "qlit" else x.col).cast("float").cast("double")
    return TypedCol(col, "num", scalar=x.scalar)


@_register("toInt", 1)
def _f_toint(ctx, nodes):
    (x,) = _args(ctx, nodes)
    col = (_as_kind(x, "str").col if x.kind == "qlit" else x.col).cast("int")
    return TypedCol(col.cast("double"), "num", scalar=x.scalar, int_like=True)


@_register("cat", 1)
def _f_cat(ctx, nodes):
    """Cast to int32 category codes and flip role to FRCat
    (parser.go:1317-1329, test parser_test.go:807-818)."""
    (x,) = _args(ctx, nodes)
    if x.kind in ("str", "date"):
        return replace(x, role=FRole.CAT)
    col = x.col.cast("int").cast("double")
    return TypedCol(col, "num", scalar=x.scalar, int_like=True, role=FRole.CAT)


# ---- dates ----------------------------------------------------------------


def _date_arg(ctx, node, what) -> TypedCol:
    tc = _compile(node, ctx)
    if tc.kind == "qlit":
        tc = _as_kind(tc, "date")
    if tc.kind != "date":
        raise CompileError(f"{what}: requires a date argument")
    return tc


@_register("year", 1)
def _f_year(ctx, nodes):
    d = _date_arg(ctx, nodes[0], "year")
    return TypedCol(F.year(d.col).cast("double"), "num", int_like=True)


@_register("month", 1)
def _f_month(ctx, nodes):
    d = _date_arg(ctx, nodes[0], "month")
    return TypedCol(F.month(d.col).cast("double"), "num", int_like=True)


@_register("day", 1)
def _f_day(ctx, nodes):
    d = _date_arg(ctx, nodes[0], "day")
    return TypedCol(F.dayofmonth(d.col).cast("double"), "num", int_like=True)


@_register("dateAdd", 2)
def _f_dateadd(ctx, nodes):
    """dateAdd(d, months) — adds MONTHS (parser.go:1134-1171)."""
    d = _date_arg(ctx, nodes[0], "dateAdd")
    m = _require_num(_compile(nodes[1], ctx), "dateAdd months")
    return TypedCol(F.add_months(d.col, m.col.cast("int")), "date")


@_register("dateDiff", 3)
def _f_datediff(ctx, nodes):
    """dateDiff(d1, d2, unit) = d1 - d2 in unit ∈ hour/day/month/year
    (parser.go:871-925): month = 12Δy + Δm; year = Δy."""
    d1 = _date_arg(ctx, nodes[0], "dateDiff")
    d2 = _date_arg(ctx, nodes[1], "dateDiff")
    unit_tc = _compile(nodes[2], ctx)
    if unit_tc.qval is None:
        raise CompileError("dateDiff: unit must be a quoted literal")
    unit = unit_tc.qval
    if unit == "hour":
        col = ((F.unix_timestamp(d1.col) - F.unix_timestamp(d2.col)) / F.lit(3600)).cast("long")
    elif unit == "day":
        col = F.datediff(d1.col, d2.col)
    elif unit == "month":
        col = (F.year(d1.col) * 12 + F.month(d1.col)) - (F.year(d2.col) * 12 + F.month(d2.col))
    elif unit == "year":
        col = F.year(d1.col) - F.year(d2.col)
    else:
        raise CompileError(f"dateDiff: unknown unit {unit!r}")
    return TypedCol(col.cast("double"), "num", int_like=True)


@_register("toLastDayOfMonth", 1)
def _f_lastday(ctx, nodes):
    d = _date_arg(ctx, nodes[0], "toLastDayOfMonth")
    return TypedCol(F.last_day(d.col), "date")


@_register("toFirstDayOfMonth", 1)
def _f_firstday(ctx, nodes):
    d = _date_arg(ctx, nodes[0], "toFirstDayOfMonth")
    return TypedCol(F.trunc(d.col, "MM"), "date")


@_register("nowDate", 0)
def _f_nowdate(ctx, nodes):
    return TypedCol(F.current_date(), "date", scalar=True)


@_register("nowTime", 0)
def _f_nowtime(ctx, nodes):
    return TypedCol(
        F.date_format(F.current_timestamp(), "HH:mm:ss"), "str", scalar=True
    )


# ---- strings --------------------------------------------------------------


def _str_arg(ctx, node, what) -> TypedCol:
    tc = _compile(node, ctx)
    if tc.kind == "qlit":
        tc = _as_kind(tc, "str")
    if tc.kind != "str":
        raise CompileError(f"{what}: requires a string argument")
    return tc


@_register("substr", 3)
def _f_substr(ctx, nodes):
    """1-based, length-clamped substring (parser.go:928-976) — matches
    Spark's substring semantics directly."""
    s = _str_arg(ctx, nodes[0], "substr")
    start = _require_num(_compile(nodes[1], ctx), "substr start")
    length = _require_num(_compile(nodes[2], ctx), "substr length")
    col = s.col.substr(start.col.cast("int"), length.col.cast("int"))
    return TypedCol(col, "str")


@_register("strPos", 2)
def _f_strpos(ctx, nodes):
    """1-based position of needle, -1 if absent (parser.go:1090-1131);
    Spark's instr returns 0 for absent — shimmed."""
    s = _str_arg(ctx, nodes[0], "strPos")
    t = _str_arg(ctx, nodes[1], "strPos")
    pos = F.instr(s.col, t.col)
    col = F.when(pos == 0, F.lit(-1)).otherwise(pos).cast("double")
    return TypedCol(col, "num", int_like=True)


@_register("strCount", 2)
def _f_strcount(ctx, nodes):
    """Non-overlapping occurrence count (parser.go:979-1029) via
    length-difference — pure JVM expressions, no UDF."""
    s = _str_arg(ctx, nodes[0], "strCount")
    t = _str_arg(ctx, nodes[1], "strCount")
    col = (
        (F.length(s.col) - F.length(F.replace(s.col, t.col, F.lit(""))))
        / F.length(t.col)
    ).cast("double")
    return TypedCol(col, "num", int_like=True)


@_register("strLen", 1)
def _f_strlen(ctx, nodes):
    s = _str_arg(ctx, nodes[0], "strLen")
    return TypedCol(F.length(s.col).cast("double"), "num", int_like=True)


# ---- side-effect summary functions ----------------------------------------


@_register("print", 2)
def _f_print(ctx, nodes):
    """Eager driver-side print of the first n values (parser.go:572-599)."""
    x = _compile(nodes[0], ctx)
    n_tc = _require_num(_compile(nodes[1], ctx), "print")
    ctx.pipe._ensure_rid()  # before frame(): _order_columns mutates pipe.df
    rows = ctx.frame().select(x.col.alias("__v")).orderBy(*ctx.pipe._order_columns())
    n_rows = rows.limit(1000).collect()
    try:
        n = int(float(n_tc.col._jc.toString()))  # only literal counts supported
    except Exception:
        n = 0
    n = len(n_rows) if n == 0 else min(n, len(n_rows))
    for i in range(n):
        print(f"{i}: {n_rows[i]['__v']}")
    return TypedCol(F.lit(1.0), "num", scalar=True)


@_register("printIf", 3)
def _f_printif(ctx, nodes):
    cond = _require_num(_compile(nodes[2], ctx), "printIf")
    row = ctx.frame().select((cond.col > 0).alias("__c")).limit(1).collect()
    if row and row[0]["__c"]:
        return _f_print(ctx, nodes[:2])
    return TypedCol(F.lit(0.0), "num", scalar=True)


# ---- plotting side effects (parser.go:1844-1997) --------------------------
# Traces accumulate in seafan_spark.plots' module figure; render() writes
# plotly JSON + HTML. Values are collected driver-side in pipeline order,
# capped at plots.MAX_POINTS — plots are human-scale; aggregate first.


def _literal_str(node: Node, what: str) -> str:
    if node.kind != "qlit":
        raise CompileError(f"{what}: expected a quoted literal argument")
    return str(node.value)


def _collect_values(ctx: Ctx, node: Node, what: str) -> list:
    from seafan_spark import plots

    tc = _require_num(_compile(node, ctx), what)
    ctx.pipe._ensure_rid()  # before frame(): _order_columns mutates pipe.df
    rows = (
        ctx.frame().select(tc.col.alias("__v"))
        .orderBy(*ctx.pipe._order_columns())
        .limit(plots.MAX_POINTS)
        .collect()
    )
    return [r["__v"] for r in rows]


def _plot_ok() -> TypedCol:
    return TypedCol(F.lit(1.0), "num", scalar=True)


@_register("plotXY", 4)
def _f_plotxy(ctx, nodes):
    from seafan_spark import plots

    xs = _collect_values(ctx, nodes[0], "plotXY")
    ys = _collect_values(ctx, nodes[1], "plotXY")
    try:
        plots.add_xy(xs, ys, _literal_str(nodes[2], "plotXY"), _literal_str(nodes[3], "plotXY"))
    except ValueError as e:
        raise CompileError(str(e)) from e
    return _plot_ok()


@_register("plotLine", 3)
def _f_plotline(ctx, nodes):
    from seafan_spark import plots

    ys = _collect_values(ctx, nodes[0], "plotLine")
    try:
        plots.add_line(ys, _literal_str(nodes[1], "plotLine"), _literal_str(nodes[2], "plotLine"))
    except ValueError as e:
        raise CompileError(str(e)) from e
    return _plot_ok()


@_register("histogram", 3)
def _f_histogram(ctx, nodes):
    from seafan_spark import plots

    xs = _collect_values(ctx, nodes[0], "histogram")
    try:
        plots.add_histogram(xs, _literal_str(nodes[1], "histogram"), _literal_str(nodes[2], "histogram"))
    except ValueError as e:
        raise CompileError(str(e)) from e
    return _plot_ok()


@_register("setPlotDim", 2)
def _f_setplotdim(ctx, nodes):
    from seafan_spark import plots

    dims = []
    for n in nodes:
        if n.kind != "num":
            raise CompileError("setPlotDim: expects numeric literals")
        dims.append(float(n.value))
    try:
        plots.set_plot_dim(*dims)
    except ValueError as e:
        raise CompileError(str(e)) from e
    return _plot_ok()


@_register("newPlot", 0)
def _f_newplot(ctx, nodes):
    from seafan_spark import plots

    plots.new_plot()
    return _plot_ok()


@_register("render", 4)
def _f_render(ctx, nodes):
    from seafan_spark import plots

    args = [_literal_str(n, "render") for n in nodes]
    plots.render(*args)
    return _plot_ok()


def _compile_func(node: Node, ctx: Ctx) -> TypedCol:
    name = node.value
    if name not in _REGISTRY:
        raise CompileError(f"unknown function {name!r}")
    arity, builder = _REGISTRY[name]
    if len(node.children) != arity:
        raise CompileError(
            f"{name}: expected {arity} argument(s), got {len(node.children)}"
        )
    return builder(ctx, node.children)


# --------------------------------------------------------------------------


def compile_expression(
    pipe: Pipeline,
    expression: str,
    partition_by: Sequence[str] | None = None,
    env: dict[str, float] | None = None,
    strict: bool = True,
) -> TypedCol:
    """Parse + compile an expression against a pipeline. Returns the
    TypedCol (unevaluated) with its ``ctx`` attached: expressions
    containing summaries or global window functions stage placeholder
    columns — select ``tc.col`` against ``tc.ctx.frame()`` (then drop
    ``tc.ctx.placeholder_names()``), not against the raw pipe.df."""
    node = parse(expression)
    ctx = Ctx(pipe, partition_by=partition_by, env=env, strict=strict)
    tc = _compile(node, ctx)
    return replace(tc, ctx=ctx)


def evaluate(
    pipe: Pipeline,
    expression: str,
    partition_by: Sequence[str] | None = None,
) -> list[Any]:
    """Evaluate an expression and return its values in pipeline order
    (scalar results return a single-element list) — the test/diagnostic
    analogue of the reference's Evaluate."""
    node = parse(expression)
    ctx = Ctx(pipe, partition_by=partition_by)
    tc = _compile(node, ctx)
    # materialize the order column BEFORE capturing the frame (the orderBy
    # below references it; frame() snapshots pipe.df)
    pipe._ensure_rid()
    base = ctx.frame()
    if tc.scalar:
        row = base.select(tc.col.alias("__v")).limit(1).collect()
        return [row[0]["__v"]] if row else []
    # order columns may have been materialized during compile (window fns)
    pipe._ensure_rid()
    d = base.withColumn("__v", tc.col).orderBy(*pipe._order_columns()).select("__v")
    return [r["__v"] for r in d.collect()]
