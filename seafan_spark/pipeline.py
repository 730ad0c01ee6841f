"""The Pipeline wrapper: a DataFrame + FTypes metadata + row-order spec.

Reference: the ``Pipeline`` interface (pipeline.go:19-47) and its relational
operators over GData (gdata.go). Every method here is a thin declarative
layer over the DataFrame API — Catalyst picks the physical plan (broadcast vs
sort-merge joins, pushdown, pruning); we add only the reference's semantic
shims (default-fill joins, left-wins column dedup, positional ops, stable
category codes).

Scale notes
-----------
- All operators stay lazy; nothing collects unless the caller asks.
- ``where``/``keep``/``drop``/``sort`` compile to filter/select/orderBy and
  are pushed into the scan by Catalyst where possible.
- Positional ops (``subset``/``row``) need a dense global row number — an
  intentional small-data compatibility path; at scale filter on a key.
- ``join`` lets AQE pick broadcast vs shuffle; pass ``broadcast_right=True``
  to force the hint for known-small dimensions.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seafan_spark.ftypes import FParam, FRole, FType, FTypes
from seafan_spark.sources import RID, default_ftypes, infer_role

# order spec entry: (column_name, ascending)
OrderSpec = list[tuple[str, bool]]

_EPOCH = _dt.date(1970, 1, 1)


class JoinError(ValueError):
    pass


def _default_fill_value(dtype: T.DataType, ft: FType | None) -> Any:
    """Missing-side fill for joins: FParam.Default else 0 / "" / 1970-01-01
    (gdata.go:1322-1344, doc gdata.go:1156-1167)."""
    if ft is not None and ft.fp.default is not None:
        return ft.fp.default
    if isinstance(dtype, T.StringType):
        return ""
    if isinstance(dtype, T.DateType):
        return _EPOCH
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime(1970, 1, 1)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return 0.0
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return 0
    return None


def as_df(x) -> "DataFrame":
    """Accept a Pipeline or a DataFrame and return the DataFrame — the
    one shared duck-typing contract for operator entry points."""
    return getattr(x, "df", x)


class Pipeline:
    """A lazily evaluated table: DataFrame + field metadata + order spec."""

    def __init__(
        self,
        df: DataFrame,
        fts: FTypes | None = None,
        keep_raw: bool = True,
        order_cols: Sequence[str] | None = None,
        sort_field: str | None = None,
        sort_ascending: bool = True,
    ):
        self.df = df
        self.fts = fts if fts is not None else default_ftypes(df)
        self.keep_raw = keep_raw
        if order_cols:
            self.order_spec: OrderSpec = [(c, True) for c in order_cols]
        elif RID in df.columns:
            self.order_spec = [(RID, True)]
        else:
            self.order_spec = []
        self.sort_field = sort_field
        self.sort_ascending = sort_ascending

    # ------------------------------------------------------------------ core
    @property
    def spark(self):
        return self.df.sparkSession

    def field_list(self) -> list[str]:
        """User-visible fields (internal order/helper columns hidden)."""
        return [c for c in self.df.columns if not c.startswith("_")]

    def get_ftype(self, name: str) -> FType | None:
        return self.fts.get(name)

    def row_count(self) -> int:
        return self.df.count()

    def is_sorted(self) -> bool:
        return self.sort_field is not None

    def _derive(
        self,
        df: DataFrame,
        fts: FTypes | None = None,
        order_spec: OrderSpec | None = None,
        sort_field: str | None = None,
        sort_ascending: bool = True,
    ) -> "Pipeline":
        out = Pipeline.__new__(Pipeline)
        out.df = df
        out.fts = fts if fts is not None else self.fts.copy()
        out.keep_raw = self.keep_raw
        out.order_spec = order_spec if order_spec is not None else list(self.order_spec)
        out.sort_field = sort_field
        out.sort_ascending = sort_ascending
        return out

    # ------------------------------------------------------------- ordering
    def _ensure_rid(self) -> None:
        """Materialize the ingest-order column on first use.

        Added lazily (not at read time): a nondeterministic
        ``monotonically_increasing_id`` projection between the scan and
        subsequent filters would block predicate pushdown into parquet.
        """
        if not self.order_spec:
            if RID not in self.df.columns:
                self.df = self.df.withColumn(RID, F.monotonically_increasing_id())
            self.order_spec = [(RID, True)]

    def _order_columns(self) -> list[Column]:
        self._ensure_rid()
        return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in self.order_spec]

    def order_window(self) -> Window:
        """Window ordered by the pipeline's row order — the substrate for
        lag/row/cume* (SURVEY §2.7). Unpartitioned by design to replicate the
        reference's whole-table ordering; partitioned variants live on the
        expression/agg APIs for scale."""
        return Window.orderBy(*self._order_columns())

    def ordered_df(self) -> DataFrame:
        """DataFrame sorted into pipeline order (for export/collect)."""
        if not self.order_spec:
            return self.df
        return self.df.orderBy(*self._order_columns())

    def with_row_number(self, name: str = "_rownum") -> DataFrame:
        """Attach a dense 0-based position column (global window; compat path)."""
        w = self.order_window()
        return self.df.withColumn(name, F.row_number().over(w) - F.lit(1))

    # ----------------------------------------------------------- projection
    def keep(self, fields: Sequence[str]) -> "Pipeline":
        """Project to listed fields, order preserved (gdata.go:633-649)."""
        missing = [f for f in fields if f not in self.df.columns]
        if missing:
            raise KeyError(f"keep: fields not in pipeline: {missing}")
        cols = list(fields) + [c for c in self.df.columns if c.startswith("_")]
        return self._derive(self.df.select(*cols), fts=self.fts.subset(list(fields)))

    def drop(self, *fields: str) -> "Pipeline":
        """Drop fields (gdata.go:611-630)."""
        for f_ in fields:
            if f_ not in self.df.columns:
                raise KeyError(f"drop: no field {f_}")
        fts = self.fts.copy()
        for f_ in fields:
            fts.drop(f_)
        return self._derive(self.df.drop(*fields), fts=fts)

    # ------------------------------------------------------------ selection
    def where(self, field: str, equal_to: Iterable[Any], strict: bool = False) -> "Pipeline":
        """Keep rows where ``field`` is in ``equal_to`` (gdata.go:897-969).

        The reference errors when zero rows survive; that needs an action, so
        it is opt-in via ``strict=True`` to keep the default path lazy.
        """
        values = list(equal_to)
        out = self._derive(self.df.filter(F.col(field).isin(values)))
        if strict and out.df.limit(1).count() == 0:
            raise ValueError(f"where: no rows matched {field} in {values}")
        return out

    def filter(self, cond: Column) -> "Pipeline":
        """General predicate filter (the scalable form of Slice,
        gdata.go:306-419 — predicates are Column exprs, not row closures)."""
        return self._derive(self.df.filter(cond))

    def subset(self, rows: Sequence[int]) -> "Pipeline":
        """Keep rows by 0-based position in pipeline order (gdata.go:852-895).

        Positional — requires the dense global row number (compat path;
        guarded so a 100 TB table fails loudly instead of single-task
        sorting — filter on a key column at scale)."""
        from seafan_spark.guards import assert_small

        assert_small(self.df, "subset", scale_hint="Filter on a key column at scale.")
        d = self.with_row_number("_pos")
        out = d.filter(F.col("_pos").isin(list(rows))).drop("_pos")
        return self._derive(out)

    def row(self, take: int) -> "Pipeline":
        """Single-row pipeline at position ``take`` (gdata.go:818-849)."""
        return self.subset([take])

    # ------------------------------------------------------------- ordering ops
    def sort(self, field: str, ascending: bool = True) -> "Pipeline":
        """Whole-table sort on one field (gdata.go:470-493). Sorting a
        one-hot field sorts its source field (gdata.go:476-479)."""
        ft = self.fts.get(field)
        key = ft.from_field if ft is not None and ft.role in (FRole.ONE_HOT, FRole.EMBED) and ft.from_field else field
        spec: OrderSpec = [(key, ascending)] + [(c, a) for c, a in self.order_spec if c != key]
        return self._derive(
            self.df, order_spec=spec, sort_field=key, sort_ascending=ascending
        )

    def shuffle(self, seed: int = 0) -> "Pipeline":
        """Deterministic pseudo-random permutation (gdata.go:506-510).

        Uses a hash of the current order columns — reproducible across
        recomputation (unlike rand()), no data movement until an op needs
        the order."""
        self._ensure_rid()
        cols = [F.col(c) for c, _ in self.order_spec]
        d = self.df.withColumn("_shuf", F.xxhash64(*cols, F.lit(seed)))
        spec: OrderSpec = [("_shuf", True)] + self.order_spec
        return self._derive(d, order_spec=spec, sort_field=None)

    # ----------------------------------------------------------------- join
    def join(
        self,
        right: "Pipeline",
        on_field: str | Sequence[str],
        how: str = "inner",
        broadcast_right: bool = False,
    ) -> "Pipeline":
        """Equi join with the reference's semantics (gdata.go:1168-1296);
        the reference is single-key, a key LIST is the composite-key
        scale generalization:

        - keys must exist under the same name on both sides, same type,
          float keys rejected (joinCheck, gdata.go:1486-1500);
        - right's copies of duplicate non-key fields are dropped — left wins
          (gdata.go:1216-1224);
        - one-hot/embed derived fields are dropped (gdata.go:1165-1167);
        - missing-side values fill with FParam.default else 0/""/1970-01-01
          (getMiss, gdata.go:1322-1344) — defaults, not NULLs;
        - output ordered by the key (the reference sort-merges; Catalyst
          picks broadcast/SMJ, we only record the order contract).

        ``how`` in {inner, left, right, outer}.
        """
        how = {"full": "outer"}.get(how, how)
        if how not in ("inner", "left", "right", "outer"):
            raise JoinError(f"join: unknown join type {how!r}")
        keys = [on_field] if isinstance(on_field, str) else list(on_field)
        if not keys:
            raise JoinError("join: need at least one key")
        for key in keys:
            for side, p in (("left", self), ("right", right)):
                if key not in p.df.columns:
                    raise JoinError(f"join: {side} side missing key {key!r}")
            lt = dict(self.df.dtypes)[key]
            rt = dict(right.df.dtypes)[key]
            if lt in ("float", "double") or rt in ("float", "double"):
                raise JoinError("join: float keys are not allowed")
            if lt != rt:
                raise JoinError(f"join: key type mismatch {lt} vs {rt}")
        on_field = keys[0]  # single-key paths below use the first key

        def strip(p: "Pipeline") -> DataFrame:
            d = p.df
            drops = [c for c in d.columns if c.startswith("_")]
            for ft in p.fts:
                if ft.role in (FRole.ONE_HOT, FRole.EMBED) and ft.name in d.columns:
                    drops.append(ft.name)
            return d.drop(*drops) if drops else d

        ld, rd = strip(self), strip(right)
        dup = [c for c in rd.columns if c not in keys and c in ld.columns]
        rd = rd.drop(*dup) if dup else rd
        if broadcast_right:
            rd = F.broadcast(rd)
        joined = ld.join(rd, on=keys, how=how)

        left_cols = [c for c in ld.columns if c not in keys]
        right_cols = [c for c in rd.columns if c not in keys]
        fill_left = how in ("right", "outer")
        fill_right = how in ("left", "outer")
        if fill_left or fill_right:
            dtypes = {f.name: f.dataType for f in joined.schema.fields}
            exprs = []
            for c in joined.columns:
                src = None
                if fill_right and c in right_cols:
                    src = right
                elif fill_left and c in left_cols:
                    src = self
                if src is None:
                    exprs.append(F.col(c))
                    continue
                fill = _default_fill_value(dtypes[c], src.fts.get(c))
                if fill is None:
                    exprs.append(F.col(c))
                else:
                    exprs.append(F.coalesce(F.col(c), F.lit(fill)).alias(c))
            joined = joined.select(*exprs)

        fts = FTypes()
        for name in joined.columns:
            if name.startswith("_"):
                continue
            src_ft = self.fts.get(name) or right.fts.get(name)
            if src_ft is not None:
                fts.add(src_ft)
            else:
                fts.add(FType(name=name, role=infer_role(dict(zip(joined.schema.names, [f.dataType for f in joined.schema.fields]))[name])))
        return self._derive(
            joined,
            fts=fts,
            order_spec=[(on_field, True)],
            sort_field=on_field,
            sort_ascending=True,
        )

    # ---------------------------------------------------------------- union
    def append(self, other: "Pipeline") -> "Pipeline":
        """Vertical union by name (Append, pipeline.go:429-464): ``other``
        must carry at least this pipeline's fields; its extras are dropped.
        Row order: self's rows then other's.

        Each side keeps its OWN order columns, renamed side-locally and
        null-filled on the opposite side: the union orders by (segment,
        left-order..., right-order...), where the inactive side's columns
        are constant NULL and don't disturb the sort. This composes under
        chaining — a previous append's segment column is just another
        left-order column here, never overwritten (overwriting it
        collapsed chained appends' ordering)."""
        mine = self.field_list()
        missing = [c for c in mine if c not in other.df.columns]
        if missing:
            raise ValueError(f"append: right side missing fields {missing}")
        self._ensure_rid()
        other._ensure_rid()
        # unique tag so chained appends never collide on helper names
        tag = 0
        existing = set(self.df.columns) | set(other.df.columns)
        while f"_seg{tag}" in existing or any(
            c.startswith((f"_apl{tag}_", f"_apr{tag}_")) for c in existing
        ):
            tag += 1
        seg = f"_seg{tag}"
        lnames = [(f"_apl{tag}_{i}", c, asc) for i, (c, asc) in enumerate(self.order_spec)]
        rnames = [(f"_apr{tag}_{i}", c, asc) for i, (c, asc) in enumerate(other.order_spec)]
        ltypes = {c: self.df.schema[c].dataType for _, c, _ in lnames}
        rtypes = {c: other.df.schema[c].dataType for _, c, _ in rnames}
        lsel = self.df.select(
            *mine,
            F.lit(0).alias(seg),
            *[F.col(c).alias(n) for n, c, _ in lnames],
            *[F.lit(None).cast(rtypes[c]).alias(n) for n, c, _ in rnames],
        )
        rsel = other.df.select(
            *mine,
            F.lit(1).alias(seg),
            *[F.lit(None).cast(ltypes[c]).alias(n) for n, c, _ in lnames],
            *[F.col(c).alias(n) for n, c, _ in rnames],
        )
        out = lsel.unionByName(rsel)
        spec: OrderSpec = (
            [(seg, True)]
            + [(n, asc) for n, _, asc in lnames]
            + [(n, asc) for n, _, asc in rnames]
        )
        return self._derive(out, order_spec=spec, sort_field=None)

    def rename(self, mapping: dict[str, str]) -> "Pipeline":
        """Rename fields (convenience for key alignment before join —
        the reference requires identical key names on both sides)."""
        d = self.df
        fts = self.fts.copy()
        spec = list(self.order_spec)
        for old, new in mapping.items():
            if old not in d.columns:
                raise KeyError(f"rename: no field {old}")
            d = d.withColumnRenamed(old, new)
            ft = fts.get(old)
            if ft is not None:
                fts.drop(old)
                ft.name = new
                fts.add(ft)
            spec = [(new if c == old else c, a) for c, a in spec]
        out = self._derive(d, fts=fts, order_spec=spec)
        return out

    # ------------------------------------------------------------- metadata ops
    def with_column(self, name: str, col: Column, role: FRole | None = None) -> "Pipeline":
        """Attach a computed column with role bookkeeping."""
        d = self.df.withColumn(name, col)
        fts = self.fts.copy()
        if role is None:
            role = infer_role(d.schema[name].dataType)
        fts.add(FType(name=name, role=role))
        return self._derive(d, fts=fts)

    def add_expression(self, expression: str, name: str) -> "Pipeline":
        """Evaluate a seafan-grammar expression and attach it as ``name``
        (Expr2Tree→Evaluate→AddToPipe, parser.go:200-268, 1589-1629,
        1703-1758 — here compiled to an unevaluated Column)."""
        from seafan_spark.exprlang import add_to_pipe

        return add_to_pipe(self, expression, name)

    # -------------------------------------------------------------- describe
    def describe(self, fields: Sequence[str] | None = None, top_k: int = 10) -> dict[str, Any]:
        """Per-field stats (Describe, gdata.go:44-56; Desc, data.go:154-204):
        continuous -> n/mean/std/quantiles[0,.1,.25,.5,.75,.9,1];
        categorical -> top-k level counts. One pass per kind."""
        from seafan_spark.agg import describe as _describe

        return _describe(self, fields=fields, top_k=top_k)

    # ------------------------------------------------------------- execution
    def to_pandas(self):
        return self.ordered_df().drop(*[c for c in self.df.columns if c.startswith("_")]).toPandas()

    def collect_field(self, name: str, allow_large: bool = False) -> list[Any]:
        """Collect one column in pipeline order (test/diagnostic helper).

        This is a deliberate driver materialization (the reference's
        GData column getters, gdata.go:470-493, are in-memory slices);
        above the small-data ceiling it raises instead of OOMing the
        driver — pass ``allow_large=True`` (or raise
        ``SEAFAN_SMALL_DATA_LIMIT``) to opt out, or use ``iter_rows`` /
        the parquet sink for bulk export.
        """
        sel = self.ordered_df().select(name)
        if not allow_large:
            from seafan_spark.guards import assert_small

            assert_small(
                self.df, "collect_field",
                scale_hint="Use iter_rows() or a sink for bulk export, "
                "or collect_field(..., allow_large=True).",
            )
        return [r[0] for r in sel.collect()]

    def iter_rows(self, prefetch: bool = True):
        """Row-wise reader in pipeline order (GData's GetRow role,
        gdata.go:470-493): yields Rows one at a time WITHOUT collecting
        the pipeline — ``toLocalIterator`` streams one partition at a
        time to the driver, so peak driver memory is one partition, not
        the dataset. For bulk export prefer the parquet sink; this is
        the escape hatch for row-at-a-time consumers."""
        clean = self.ordered_df().drop(
            *[c for c in self.df.columns if c.startswith("_")]
        )
        return clean.toLocalIterator(prefetchPartitions=prefetch)

    def spread(self, *keys: str) -> "Pipeline":
        """Ensure at least default-parallelism partitions before CPU-heavy
        per-row column work (regex, shingling). A single small parquet file
        reads as ONE partition, serializing everything downstream; on a
        real cluster with many input splits this is a no-op (decided from
        the scan's file listing — no plan->RDD probe)."""
        from seafan_spark.partitions import spread_if_narrow

        target = self.spark.sparkContext.defaultParallelism
        d = spread_if_narrow(self.df, target, *keys)
        return self if d is self.df else self._derive(d)

    def cache(self) -> "Pipeline":
        self.df = self.df.cache()
        return self

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)


def append(pipe1: Pipeline, pipe2: Pipeline) -> Pipeline:
    """Module-level Append (pipeline.go:429-464)."""
    return pipe1.append(pipe2)
