"""Marginal diagnostic, XY interpolation, CSV source/sink round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from seafan_spark.pipeline import Pipeline
from seafan_spark.sources import csv_to_pipe, parquet_to_pipe, pipe_to_csv
from seafan_spark.xy import XY

SF = "/root/testdata/sf0.001"


def test_marginal_linear_model(spark):
    from seafan_spark.diags import marginal
    from seafan_spark.model import fit, parse_modspec

    p = parquet_to_pipe(spark, f"{SF}/lineitem.parquet")
    ms = parse_modspec(
        ["Input(l_quantity+l_discount)", "FC(size:1, activation:linear)", "Target(l_extendedprice)"]
    )
    fr = fit(p, ms, max_iter=25)
    t = marginal(fr, p, "l_quantity", n_seg=4, n_sweep=4, take=200)
    rows = t.collect()
    # 4 segments x 4 sweep values
    assert {r["fit_seg"] for r in rows} == {1, 2, 3, 4}
    assert len(rows) == 16
    # mean_fit must be strictly monotone in the sweep value, in the
    # direction of the model's l_quantity coefficient
    sign = 1.0 if float(fr.model.coefficients[0]) > 0 else -1.0
    for seg in range(1, 5):
        seq = [r["mean_fit"] for r in sorted(rows, key=lambda r: r["x_value"]) if r["fit_seg"] == seg]
        assert all(sign * (b - a) > 0 for a, b in zip(seq, seq[1:]))


def test_marginal_categorical(spark):
    from seafan_spark.diags import marginal
    from seafan_spark.model import fit, parse_modspec

    p = parquet_to_pipe(spark, f"{SF}/lineitem.parquet")
    ms = parse_modspec(
        ["Input(l_quantity)", "FC(size:1, activation:linear)", "Target(l_extendedprice)"]
    )
    fr = fit(p, ms, max_iter=10)
    t = marginal(fr, p, "l_returnflag", take=100, max_cats=3)
    rows = t.collect()
    assert {r["x_value"] for r in rows} <= {"A", "N", "R"}
    assert len(rows) == 4 * 3


def test_xy_interp_reference_semantics():
    xy = XY(x=[1.0, 2.0, 4.0], y=[10.0, 20.0, 40.0])
    out = xy.interp([0.0, 1.0, 3.0, 4.0, 9.0])
    assert out.y == [10.0, 10.0, 30.0, 40.0, 40.0]
    # unsorted input is sorted first
    xy2 = XY(x=[4.0, 1.0, 2.0], y=[40.0, 10.0, 20.0])
    assert xy2.interp([3.0]).y == [30.0]


def test_xy_length_mismatch():
    with pytest.raises(ValueError):
        XY(x=[1.0], y=[])


def test_csv_round_trip(spark, tmp_path):
    p = parquet_to_pipe(spark, f"{SF}/nation.parquet")
    out = str(tmp_path / "nation_csv")
    pipe_to_csv(p, out)
    back = csv_to_pipe(spark, out)
    a = sorted([tuple(r) for r in p.df.select("n_nationkey", "n_name").collect()])
    b = sorted([tuple(r) for r in back.df.select("n_nationkey", "n_name").collect()])
    assert a == b
    assert back.get_ftype("n_name").role.value == "FRCat"
