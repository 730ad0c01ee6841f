"""Per-group IRR (agg.irr_by): planted groups with closed-form rates."""

import math

import pytest

from seafan_spark.agg import irr_by
from seafan_spark.sources import vec_to_pipe


def test_irr_by_planted_groups(spark):
    # npv(r) = f0 + f1/(1+r) + f2/(1+r)^2 ... = cost
    # g=1: 110/(1+r) = 100          -> r = 0.10
    # g=2: 144/(1+r)^2 = 100        -> r = 0.20
    # g=3: 50 + 60/(1+r) = 100      -> r = 0.20
    data = {
        "g": [1, 1, 2, 2, 2, 3, 3],
        "flow": [0.0, 110.0, 0.0, 0.0, 144.0, 50.0, 60.0],
        "cost": [100.0] * 7,
    }
    p = vec_to_pipe(spark, data)
    out = {r["g"]: r["rate"] for r in irr_by(p, ["g"], "flow", cost_col="cost").collect()}
    assert math.isclose(out[1], 0.10, abs_tol=1e-3)
    assert math.isclose(out[2], 0.20, abs_tol=1e-3)
    assert math.isclose(out[3], 0.20, abs_tol=1e-3)


def test_irr_by_fixed_cost_and_nan(spark):
    data = {
        "g": [1, 1, 2, 2],
        "flow": [0.0, 121.0, 0.0, -10.0],  # g=2: no root (npv always < cost)
    }
    p = vec_to_pipe(spark, data)
    out = {r["g"]: r["rate"] for r in irr_by(p, ["g"], "flow", cost=110.0).collect()}
    assert math.isclose(out[1], 0.10, abs_tol=1e-3)
    assert out[2] is None or math.isnan(out[2])


def test_irr_by_matches_scalar_irr(spark):
    """Grouped solver agrees with the expression-language whole-table irr."""
    from seafan_spark.exprlang import add_to_pipe

    flows = [0.0, 30.0, 40.0, 50.0]
    p = vec_to_pipe(spark, {"g": [1] * 4, "flow": flows})
    grouped = irr_by(p, ["g"], "flow", cost=100.0).collect()[0]["rate"]
    p2 = vec_to_pipe(spark, {"flow": flows})
    p2 = add_to_pipe(p2, "irr(100, flow)", "rate")
    scalar = p2.df.select("rate").limit(1).collect()[0]["rate"]
    assert math.isclose(grouped, scalar, abs_tol=2e-4)


def test_irr_by_arg_validation(spark):
    p = vec_to_pipe(spark, {"g": [1], "flow": [1.0]})
    with pytest.raises(ValueError, match="exactly one"):
        irr_by(p, ["g"], "flow")
    with pytest.raises(ValueError, match="exactly one"):
        irr_by(p, ["g"], "flow", cost=1.0, cost_col="flow")


def test_irr_bisect_planted_and_distributed(spark):
    """Fixed-step distributed bisection (agg.irr_bisect): known root,
    bracket validation, and agreement with irr_by's adaptive solver."""
    from seafan_spark.agg import irr_bisect

    # 110/(1+r) = 100 -> r = 0.10 ; flows need an order column
    p = vec_to_pipe(spark, {"i": [0, 1], "flow": [0.0, 110.0]})
    r = irr_bisect(p.df, "flow", ["i"], cost=100.0, lo=0.0, hi=4.0, steps=40)
    assert math.isclose(r, 0.10, abs_tol=1e-4)

    # default cost = sum/2: same planted shape as q_irr's bracketing
    p2 = vec_to_pipe(
        spark, {"i": list(range(6)), "flow": [10.0, 40.0, 40.0, 40.0, 40.0, 30.0]}
    )
    from pyspark.sql import functions as F

    r2 = irr_bisect(p2.df, "flow", ["i"], steps=40)
    out = irr_by(p2.with_column("g", F.lit(1)), ["g"], "flow", cost=100.0).collect()
    assert math.isclose(r2, out[0]["rate"], abs_tol=1e-3)

    # no sign change in the bracket -> loud error, not a silent rate
    p3 = vec_to_pipe(spark, {"i": [0], "flow": [-10.0]})
    with pytest.raises(ValueError, match="no sign change"):
        irr_bisect(p3.df, "flow", ["i"], cost=100.0)
