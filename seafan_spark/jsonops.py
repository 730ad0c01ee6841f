"""Semi-structured (JSON) column operators.

Event logs and web-crawl metadata land as JSON strings; a pipeline
needs them as typed columns before anything relational can happen.
Three layers, all JVM-side in the row path:

- :func:`extract_json_fields` — explicit path extraction
  (``get_json_object`` + cast), for when the caller knows the fields.
- :func:`infer_json_schema` — driver-side schema inference over a
  DETERMINISTIC content-hash sample (the codebook pattern: a schema is
  a statistic of the corpus, so a bounded sample fixes it independent
  of scale and only the sampled strings ever cross the driver).
- :func:`flatten_json` — ``from_json`` with the inferred (or given)
  schema, top-level fields expanded to real columns; one projection,
  no shuffle, no Python row path.

The reference has no JSON surface (its ``props``-style payloads stay
opaque strings); this follows Spark's native semi-structured toolkit.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _df(x) -> DataFrame:
    return getattr(x, "df", x)


# ---------------------------------------------------------- inference ----
def _type_of(value) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, dict):
        return T.StructType(
            [
                T.StructField(k, _type_of(v), True)
                for k, v in sorted(value.items())
            ]
        )
    if isinstance(value, list):
        elem: T.DataType = T.StringType()
        merged = None
        for v in value:
            merged = _type_of(v) if merged is None else _merge(merged, _type_of(v))
        return T.ArrayType(merged if merged is not None else elem, True)
    return T.StringType()  # null / unknown: widest safe scalar


def _merge(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widen two observed types: equal wins; long+double -> double;
    struct fields union-merge; array merges element types; any other
    conflict degrades to string (never lossy at read time)."""
    if a == b:
        return a
    nums = {T.LongType(), T.DoubleType()}
    if a in nums and b in nums:
        return T.DoubleType()
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: dict[str, T.DataType] = {f.name: f.dataType for f in a.fields}
        for f in b.fields:
            fields[f.name] = (
                _merge(fields[f.name], f.dataType) if f.name in fields else f.dataType
            )
        return T.StructType(
            [T.StructField(n, t, True) for n, t in sorted(fields.items())]
        )
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_merge(a.elementType, b.elementType), True)
    return T.StringType()


def infer_json_schema(
    df,
    col: str,
    sample_cap: int = 1024,
) -> T.StructType:
    """Infer a Spark ``StructType`` for a JSON-string column from a
    deterministic sample of at most ``sample_cap`` distinct non-null
    values (content-hash ranked, so the result is reproducible across
    runs, partitionings, and engines). Raises when no sampled value is
    a JSON object — top-level scalars/arrays have no column mapping;
    extract them with :func:`extract_json_fields` instead."""
    d = _df(df)
    sample = [
        r["_j"]
        for r in (
            d.select(F.col(col).alias("_j"))
            .filter(F.col("_j").isNotNull())
            .distinct()
            .orderBy(F.md5(F.col("_j")))
            .limit(sample_cap)
            .collect()
        )
    ]
    merged: T.DataType | None = None
    seen_obj = False
    for s in sample:
        try:
            v = json.loads(s)
        except (ValueError, TypeError):
            continue
        if not isinstance(v, dict):
            continue
        seen_obj = True
        t = _type_of(v)
        merged = t if merged is None else _merge(merged, t)
    if not seen_obj or not isinstance(merged, T.StructType):
        raise ValueError(
            f"infer_json_schema: no JSON objects found in column {col!r} sample"
        )
    return merged


# --------------------------------------------------------- extraction ----
def json_field_col(col: Column | str, path: str, dtype: str = "string") -> Column:
    """One JSON field as a typed Column: ``get_json_object`` (JVM
    JsonPath, codegen-friendly) + cast. ``path`` without a leading
    ``$`` is treated as a top-level key."""
    c = F.col(col) if isinstance(col, str) else col
    p = path if path.startswith("$") else f"$.{path}"
    out = F.get_json_object(c, p)
    return out if dtype == "string" else out.cast(dtype)


def extract_json_fields(
    df,
    col: str,
    fields: list[tuple[str, str]] | list[tuple[str, str, str]],
    keep_source: bool = True,
) -> DataFrame:
    """Append typed columns extracted from a JSON-string column.

    ``fields`` is a list of ``(path, type)`` or ``(path, type, alias)``;
    the default alias is the path's last key segment. Malformed JSON or
    missing paths yield NULL (never an error) — the tolerant semantics
    batch pipelines need. Pure projection: no shuffle, Catalyst prunes
    it like any other column expression."""
    d = _df(df)
    # extract on the FULL frame first, then drop the source: projecting the
    # source away up front would make every json_field_col reference an
    # unresolvable column (keep_source=False raised UNRESOLVED_COLUMN)
    out = d
    for spec in fields:
        path, dtype = spec[0], spec[1]
        alias = spec[2] if len(spec) > 2 else path.split(".")[-1].lstrip("$")
        out = out.withColumn(alias, json_field_col(F.col(col), path, dtype))
    return out if keep_source else out.drop(col)


def flatten_json(
    df,
    col: str,
    schema: T.StructType | None = None,
    prefix: str = "",
    drop_source: bool = True,
    sample_cap: int = 1024,
) -> DataFrame:
    """Parse a JSON-string column with ``from_json`` and expand its
    top-level fields into real (optionally prefixed) columns. With no
    ``schema``, :func:`infer_json_schema` supplies one from a bounded
    deterministic sample. Nested objects stay as structs (prunable,
    addressable with dot syntax); call again on a struct-cast-to-json
    only if full recursion is genuinely needed."""
    d = _df(df)
    sch = schema if schema is not None else infer_json_schema(d, col, sample_cap)
    parsed = d.withColumn("__flat", F.from_json(F.col(col), sch))
    keep = [c for c in d.columns if not (drop_source and c == col)]
    out = parsed.select(
        *keep,
        *[
            F.col(f"__flat.{f.name}").alias(f"{prefix}{f.name}")
            for f in sch.fields
        ],
    )
    return out
