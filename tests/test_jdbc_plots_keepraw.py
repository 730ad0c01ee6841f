"""JDBC source/sink (Derby embedded), plot emission, keep_raw behavior."""

import json
import os

import pytest

from seafan_spark.encode import append_cat, make_one_hot
from seafan_spark.exprlang import add_to_pipe
from seafan_spark.ftypes import FRole
from seafan_spark.sources import jdbc_to_pipe, pipe_to_jdbc, vec_to_pipe

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip(spark):
    url = "jdbc:derby:memory:seafandb;create=true"
    p = vec_to_pipe(spark, {"k": [1, 2, 3], "v": ["a", "b", "c"]})
    pipe_to_jdbc(p, url, "t1", driver=DERBY)
    q = jdbc_to_pipe(spark, url, table="t1", driver=DERBY)
    rows = {(r["k"], r["v"]) for r in q.df.collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}
    # role inference per ch.go:163-171: numeric -> CTS, string -> CAT
    assert q.get_ftype("k").role == FRole.CTS
    assert q.get_ftype("v").role == FRole.CAT


def test_jdbc_partitioned_read(spark):
    url = "jdbc:derby:memory:seafandb2;create=true"
    p = vec_to_pipe(spark, {"k": list(range(10)), "w": [float(i) * 2 for i in range(10)]})
    pipe_to_jdbc(p, url, "t2", driver=DERBY)
    q = jdbc_to_pipe(
        spark, url, table="t2", driver=DERBY,
        partition_column="k", lower_bound=0, upper_bound=10, num_partitions=3,
    )
    assert q.df.rdd.getNumPartitions() == 3
    assert q.row_count() == 10


def test_jdbc_arg_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_to_pipe(spark, "jdbc:derby:memory:x", table="a", query="select 1")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_to_pipe(spark, "jdbc:derby:memory:x")


def test_plot_render(spark, tmp_path):
    from seafan_spark import plots

    p = vec_to_pipe(spark, {"x": [1.0, 2.0, 3.0], "y": [2.0, 4.0, 6.0]})
    p = add_to_pipe(p, "newPlot()", "np")
    p = add_to_pipe(p, "plotXY(x, y, 'line', 'red')", "p1")
    p = add_to_pipe(p, "histogram(y, 'blue', 'percent')", "p2")
    out = str(tmp_path / "fig")
    p = add_to_pipe(p, f"render('{out}', 'T', 'X', 'Y')", "p3")
    # side-effect functions return 1.0 rows
    assert p.collect_field("p3") == [1.0, 1.0, 1.0]
    fig = json.load(open(out + ".json"))
    assert [t["type"] for t in fig["data"]] == ["scatter", "histogram"]
    assert fig["data"][0]["x"] == [1.0, 2.0, 3.0]
    assert fig["data"][0]["y"] == [2.0, 4.0, 6.0]
    assert fig["layout"]["title"]["text"] == "T"
    assert os.path.exists(out + ".html")
    plots.new_plot()


def test_plot_validation(spark):
    from seafan_spark.exprlang.compiler import CompileError

    p = vec_to_pipe(spark, {"x": [1.0, 2.0]})
    with pytest.raises(CompileError, match="line type"):
        add_to_pipe(p, "plotXY(x, x, 'dots', 'red')", "e1")
    with pytest.raises(CompileError, match="not supported"):
        add_to_pipe(p, "plotLine(x, 'line', 'magenta')", "e2")
    with pytest.raises(CompileError, match="normalization"):
        add_to_pipe(p, "histogram(x, 'red', 'nope')", "e3")
    with pytest.raises(CompileError, match="width"):
        add_to_pipe(p, "setPlotDim(50, 500)", "e4")


def test_keep_raw_modes(spark):
    data = {"seg": ["a", "b", "a", "c"], "val": [1.0, 2.0, 3.0, 4.0]}
    # keep_raw=True (default): raw column stays next to the code
    p = vec_to_pipe(spark, data)
    e = append_cat(p, "seg", materialize_code=True)
    assert "seg" in e.df.columns and "seg__code" in e.df.columns
    # keep_raw=False: raw drops once encoded; dictionary lives in the FType
    p2 = vec_to_pipe(spark, data)
    p2.keep_raw = False
    e2 = append_cat(p2, "seg", materialize_code=True)
    assert "seg" not in e2.df.columns and "seg__code" in e2.df.columns
    assert e2.get_ftype("seg").fp.levels == {"a": 0, "b": 1, "c": 2}
    # one-hot with keep_raw=False drops the source categorical
    p3 = vec_to_pipe(spark, data)
    e3 = append_cat(p3, "seg")
    e3.keep_raw = False
    oh = make_one_hot(e3, "seg", "seg_oh")
    assert "seg" not in oh.df.columns and "seg_oh" in oh.df.columns
