"""Source/sink coverage: sql_to_pipe, parquet sink, catalog table sink,
print/printIf side-effect functions."""

from pyspark.sql import functions as F

from seafan_spark.exprlang import add_to_pipe
from seafan_spark.sources import (
    parquet_to_pipe,
    pipe_to_parquet,
    pipe_to_table,
    sql_to_pipe,
    vec_to_pipe,
)

SF = "/root/testdata/sf0.001"


def test_sql_to_pipe(spark):
    spark.read.parquet(f"{SF}/nation.parquet").createOrReplaceTempView("v_nation")
    p = sql_to_pipe(spark, "SELECT n_nationkey, n_name FROM v_nation WHERE n_nationkey < 5")
    assert p.row_count() == 5
    assert p.get_ftype("n_name").role.value == "FRCat"
    assert p.get_ftype("n_nationkey").role.value == "FRCts"


def test_pipe_to_parquet_round_trip(spark, tmp_path):
    p = parquet_to_pipe(spark, f"{SF}/region.parquet")
    out = str(tmp_path / "region_out")
    pipe_to_parquet(p, out)
    back = parquet_to_pipe(spark, out)
    a = sorted(tuple(r) for r in p.df.collect())
    b = sorted(tuple(r) for r in back.df.collect())
    assert a == b


def test_pipe_to_table_round_trip(spark):
    p = parquet_to_pipe(spark, f"{SF}/region.parquet")
    pipe_to_table(p, "t_region_io")
    back = sql_to_pipe(spark, "SELECT * FROM t_region_io")
    assert back.row_count() == p.row_count()
    spark.sql("DROP TABLE t_region_io")


def test_print_fns(spark, capsys):
    p = vec_to_pipe(spark, {"c": [3.0, 1.0, 2.0]})
    p2 = add_to_pipe(p, "print(c, 2)", "pr")
    assert p2.df.select("pr").distinct().collect()[0]["pr"] == 1.0
    outp = capsys.readouterr().out
    assert "0: 3.0" in outp and "1: 1.0" in outp and "2:" not in outp
    # printIf with false condition prints nothing, returns 0
    p3 = add_to_pipe(p, "printIf(c, 2, 1>2)", "pr2")
    assert p3.df.select("pr2").distinct().collect()[0]["pr2"] == 0.0
    assert capsys.readouterr().out == ""


def test_json_round_trip(spark, tmp_path):
    from seafan_spark.sources import json_to_pipe, pipe_to_json, vec_to_pipe

    p = vec_to_pipe(spark, {"a": [1.0, 2.0, 3.0], "b": ["x", "y", "z"]})
    path = str(tmp_path / "j")
    pipe_to_json(p, path)
    back = json_to_pipe(spark, path)
    got = {(r["a"], r["b"]) for r in back.df.collect()}
    assert got == {(1.0, "x"), (2.0, "y"), (3.0, "z")}
    # explicit schema skips inference
    back2 = json_to_pipe(spark, path, schema="a double, b string")
    assert back2.df.schema.simpleString() == "struct<a:double,b:string>"


def test_orc_round_trip(spark, tmp_path):
    from seafan_spark.sources import orc_to_pipe, pipe_to_orc, vec_to_pipe

    p = vec_to_pipe(spark, {"a": [1.0, 2.0], "b": ["x", "y"]})
    path = str(tmp_path / "o")
    pipe_to_orc(p, path)
    back = orc_to_pipe(spark, path)
    assert {(r["a"], r["b"]) for r in back.df.collect()} == {(1.0, "x"), (2.0, "y")}


def test_partitioned_parquet_write_and_pruning(spark, tmp_path):
    """pipe_to_parquet_partitioned: hive layout on disk, and a filter on
    the partition column reaches the scan as a PartitionFilter (whole
    directories pruned, not row groups)."""
    import os

    from pyspark.sql import functions as F

    from seafan_spark.sources import parquet_to_pipe, pipe_to_parquet_partitioned

    p = parquet_to_pipe(spark, "/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_part")
    pipe_to_parquet_partitioned(p, out, "source")

    dirs = sorted(d for d in os.listdir(out) if d.startswith("source="))
    n_sources = p.df.select("source").distinct().count()
    assert len(dirs) == n_sources

    # each partition directory holds ONE file (repartition-by-key wrote
    # it from the owning tasks — no per-task sliver files)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(out).filter(F.col("source") == "src1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "source" in plan.split("PartitionFilters")[1][:80]
    assert back.count() == p.df.filter(F.col("source") == "src1").count()
