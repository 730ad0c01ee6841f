"""JSON operators: deterministic schema inference, typed extraction,
flattening — tolerant NULL semantics for malformed payloads."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seafan_spark.jsonops import (
    extract_json_fields,
    flatten_json,
    infer_json_schema,
    json_field_col,
)


def test_infer_schema_merges_types(spark):
    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "c": {"d": true}}',),
        ('{"b": 7, "e": [1, 2]}',),  # b conflicts string/int -> string
        ("not json at all",),  # skipped, not fatal
        (None,),
    ]
    df = spark.createDataFrame(rows, "j: string")
    sch = infer_json_schema(df, "j")
    by_name = {f.name: f.dataType for f in sch.fields}
    assert by_name["a"] == T.DoubleType()  # long + double widens
    assert by_name["b"] == T.StringType()  # conflict degrades to string
    assert by_name["c"] == T.StructType([T.StructField("d", T.BooleanType(), True)])
    assert by_name["e"] == T.ArrayType(T.LongType(), True)


def test_infer_schema_no_objects_raises(spark):
    df = spark.createDataFrame([("[1,2]",), ("42",)], "j: string")
    with pytest.raises(ValueError, match="no JSON objects"):
        infer_json_schema(df, "j")


def test_extract_fields_tolerant(spark):
    rows = [
        (0, '{"k": 10, "tag": "a", "nest": {"v": 1.5}}'),
        (1, '{"tag": "b"}'),  # k missing -> NULL
        (2, "{{broken"),  # malformed -> NULL
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id: int, props: string")
    out = extract_json_fields(
        df,
        "props",
        [("k", "bigint"), ("tag", "string"), ("nest.v", "double", "nv")],
    )
    got = {r["id"]: (r["k"], r["tag"], r["nv"]) for r in out.collect()}
    assert got[0] == (10, "a", 1.5)
    assert got[1] == (None, "b", None)
    assert got[2] == (None, None, None)
    assert got[3] == (None, None, None)
    assert "props" in out.columns  # keep_source default


def test_extract_fields_drop_source(spark):
    """keep_source=False extracts from the full frame THEN drops the
    source column (round-5 ADVICE: the old projection-first order made
    every field reference UNRESOLVED_COLUMN)."""
    rows = [(0, '{"k": 10, "tag": "a"}'), (1, '{"tag": "b"}')]
    df = spark.createDataFrame(rows, "id: int, props: string")
    out = extract_json_fields(
        df, "props", [("k", "bigint"), ("tag", "string")], keep_source=False
    )
    assert "props" not in out.columns
    got = {r["id"]: (r["k"], r["tag"]) for r in out.collect()}
    assert got == {0: (10, "a"), 1: (None, "b")}


def test_flatten_json_inferred(spark):
    rows = [(i, f'{{"k": {i * 3}, "s": "v{i}"}}') for i in range(20)]
    df = spark.createDataFrame(rows, "id: int, props: string")
    out = flatten_json(df, "props", prefix="p_")
    assert set(out.columns) == {"id", "p_k", "p_s"}
    got = {r["id"]: (r["p_k"], r["p_s"]) for r in out.collect()}
    assert got[7] == (21, "v7")
    # explicit schema path, source kept
    sch = T.StructType([T.StructField("k", T.LongType(), True)])
    out2 = flatten_json(df, "props", schema=sch, drop_source=False)
    assert set(out2.columns) == {"id", "props", "k"}


def test_json_field_col_jsonpath(spark):
    df = spark.createDataFrame([('{"a": {"b": [5, 6]}}',)], "j: string")
    r = df.select(
        json_field_col("j", "$.a.b[1]", "int").alias("x"),
        json_field_col("j", "a.b[0]", "int").alias("y"),  # $ implied
    ).collect()[0]
    assert (r["x"], r["y"]) == (6, 5)
