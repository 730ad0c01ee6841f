"""Temporal joins: asof_join (backward/forward/tolerance, ties, NULL
left-join rows) and range_join (bucket-join equivalence to a naive
inequality join), cross-checked against a DuckDB ASOF JOIN oracle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from seafan_spark.temporal import asof_join, range_join


L_ROWS = [  # (k, t, lv)
    (1, 10.0, "a"),
    (1, 20.0, "b"),
    (2, 5.0, "c"),
    (3, 7.0, "d"),
]
R_ROWS = [  # (k, t, rv)
    (1, 9.0, "x"),
    (1, 10.0, "y"),
    (1, 15.0, "z"),
    (2, 6.0, "w"),
]


@pytest.fixture(scope="module")
def lr(spark):
    l = spark.createDataFrame(L_ROWS, ["k", "t", "lv"])
    r = spark.createDataFrame(R_ROWS, ["k", "t", "rv"])
    return l, r


def _rows(df, cols):
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def test_asof_backward_matches_duckdb(lr):
    l, r = lr
    got = asof_join(l, r, on="k", left_time="t", direction="backward")
    # right's t collides with left's t -> suffixed
    assert set(got.columns) == {"k", "t", "lv", "t_r", "rv"}
    want = duckdb.sql(
        """
        SELECT l.k, l.t, l.lv, r.t AS t_r, r.rv
        FROM (VALUES (1,10.0,'a'),(1,20.0,'b'),(2,5.0,'c'),(3,7.0,'d')) l(k,t,lv)
        ASOF LEFT JOIN (VALUES (1,9.0,'x'),(1,10.0,'y'),(1,15.0,'z'),(2,6.0,'w')) r(k,t,rv)
        ON l.k = r.k AND l.t >= r.t
        """
    ).fetchall()
    want = sorted(
        (k, float(t), lv, None if tr is None else float(tr), rv)
        for (k, t, lv, tr, rv) in want
    )
    assert _rows(got, ["k", "t", "lv", "t_r", "rv"]) == want


def test_asof_forward_matches_duckdb(lr):
    l, r = lr
    got = asof_join(l, r, on="k", left_time="t", direction="forward")
    want = duckdb.sql(
        """
        SELECT l.k, l.t, l.lv, r.t AS t_r, r.rv
        FROM (VALUES (1,10.0,'a'),(1,20.0,'b'),(2,5.0,'c'),(3,7.0,'d')) l(k,t,lv)
        ASOF LEFT JOIN (VALUES (1,9.0,'x'),(1,10.0,'y'),(1,15.0,'z'),(2,6.0,'w')) r(k,t,rv)
        ON l.k = r.k AND l.t <= r.t
        """
    ).fetchall()
    want = sorted(
        (k, float(t), lv, None if tr is None else float(tr), rv)
        for (k, t, lv, tr, rv) in want
    )
    assert _rows(got, ["k", "t", "lv", "t_r", "rv"]) == want


def test_asof_tolerance(lr):
    l, r = lr
    got = asof_join(l, r, on="k", left_time="t", direction="backward", tolerance=2)
    rows = {(row["k"], row["t"]): row["t_r"] for row in got.collect()}
    assert rows[(1, 10.0)] == 10.0  # gap 0 <= 2 kept
    assert rows[(1, 20.0)] is None  # nearest is 15.0, gap 5 > 2 dropped
    assert rows[(2, 5.0)] is None


def test_asof_multi_key_and_distinct_time_names(spark):
    l = spark.createDataFrame(
        [(1, "u", 10.0, 100), (1, "v", 10.0, 200)], ["k", "g", "lt", "payload"]
    )
    r = spark.createDataFrame(
        [(1, "u", 8.0, "m1"), (1, "v", 9.5, "m2"), (1, "v", 11.0, "m3")],
        ["k", "g", "rt", "tag"],
    )
    got = asof_join(l, r, on=["k", "g"], left_time="lt", right_time="rt")
    rows = {(row["k"], row["g"]): (row["rt"], row["tag"]) for row in got.collect()}
    assert rows[(1, "u")] == (8.0, "m1")
    assert rows[(1, "v")] == (9.5, "m2")


def test_asof_no_shuffle_explosion_plan(lr):
    """The physical plan must contain no nested-loop / cartesian join —
    the whole as-of is one window over one exchange."""
    l, r = lr
    plan = asof_join(l, r, on="k", left_time="t")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Window" in plan


def test_range_join_equals_naive(spark):
    import random

    rng = random.Random(7)
    l = spark.createDataFrame(
        [(rng.randrange(5), float(rng.randrange(100)), i) for i in range(80)],
        ["k", "t", "lid"],
    )
    r = spark.createDataFrame(
        [(rng.randrange(5), float(rng.randrange(100)), i) for i in range(80)],
        ["k", "t", "rid"],
    )
    got = _rows(
        range_join(l, r, on="k", left_time="t", before=3, after=7),
        ["k", "lid", "rid"],
    )
    naive = _rows(
        l.join(r.withColumnRenamed("t", "t_r"), "k").filter(
            (F.col("t_r") >= F.col("t") - 3) & (F.col("t_r") <= F.col("t") + 7)
        ),
        ["k", "lid", "rid"],
    )
    assert got == naive and len(got) > 0


def test_range_join_no_dup_pairs(spark):
    """Each right row lives in exactly one bucket: overlap never duplicates."""
    l = spark.createDataFrame([(1, 50.0, 0)], ["k", "t", "lid"])
    r = spark.createDataFrame([(1, 50.0 + d, d) for d in range(-5, 6)], ["k", "t", "rid"])
    got = range_join(l, r, on="k", left_time="t", before=5, after=5, bucket=3)
    assert got.count() == got.dropDuplicates(["lid", "rid"]).count() == 11


def test_epoch_us_rejects_int32(spark):
    from seafan_spark.temporal import epoch_us_col

    df = spark.createDataFrame([(1,)], "ts int")
    with pytest.raises(TypeError, match="32-bit"):
        epoch_us_col(df, "ts")


def test_range_join_exact_buckets_at_nano_scale(spark):
    from seafan_spark.temporal import range_join

    # epoch-nano magnitudes exceed double's 53-bit mantissa: bucket math
    # must stay exact (decimal division), matches stay correct and tight
    base = 1_700_000_000_000_000_000
    l = spark.createDataFrame([(1, base + 5)], "k long, ts long")
    r = spark.createDataFrame(
        [(1, base + 3), (1, base + 8), (1, base - 200)], "k long, ts long"
    )
    out = range_join(l, r, on="k", left_time="ts", before=5, after=5, bucket=3)
    got = sorted(r["ts_r"] for r in out.collect())
    assert got == [base + 3, base + 8]


# --------------------------------------------------------- pattern search


def test_ts_topk_matches_vs_bruteforce(spark):
    """Sliding-window ED matches a numpy brute force, including an exact
    planted pattern (dist 0) and ordering/tiebreaks."""
    import numpy as np

    from seafan_spark.temporal import ts_topk_matches

    rng = np.random.default_rng(7)
    q = [1.0, 3.0, 2.0, 5.0]
    rows, series = [], {}
    for u in range(6):
        vals = list(np.round(rng.uniform(0, 8, size=25), 3))
        if u == 2:
            vals[10:14] = q  # planted exact match at start=11
        series[u] = vals
        rows += [(u, t, float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = ts_topk_matches(df, "user_id", ["ts"], "value", q, k=8).collect()

    brute = []
    for u, vals in series.items():
        for s in range(len(vals) - len(q) + 1):
            d = float(np.sqrt(sum((vals[s + i] - q[i]) ** 2 for i in range(len(q)))))
            brute.append((d, u, s + 1))
    brute.sort()
    expect = [(u, s, d) for d, u, s in brute[:8]]
    assert [(r["user_id"], r["start"]) for r in got] == [(u, s) for u, s, _ in expect]
    for r, (_, _, d) in zip(got, expect):
        assert abs(r["dist"] - d) < 1e-9
    assert (got[0]["user_id"], got[0]["start"], got[0]["dist"]) == (2, 11, 0.0)


def test_ts_topk_znorm_finds_scaled_pattern(spark):
    """Series z-normalization makes an amplitude-scaled copy of the
    pattern the best match."""
    from seafan_spark.temporal import ts_topk_matches

    base = [0.0, 2.0, 1.0, 3.0, 0.5, 2.5, 1.5, 0.2, 2.2, 1.2]
    rows = [(1, t, v) for t, v in enumerate(base)]
    rows += [(2, t, v * 10 + 50) for t, v in enumerate(base)]  # scaled+shifted
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    q = base[3:7]
    # without znorm the scaled series is far away
    raw = ts_topk_matches(df, "user_id", ["ts"], "value", q, k=1).collect()
    assert raw[0]["user_id"] == 1
    # with znorm both series' pattern positions score identically; the
    # query gets z-normed implicitly by normalizing... (query is in raw
    # units of series 1; normalize series -> compare against the znormed
    # query values of series 1's stats)
    import statistics

    mu, sd = statistics.mean(base), statistics.stdev(base)
    qz = [(v - mu) / sd for v in q]
    zn = ts_topk_matches(df, "user_id", ["ts"], "value", qz, k=2, znorm="series").collect()
    assert {r["user_id"] for r in zn} == {1, 2}
    assert all(r["start"] == 4 for r in zn)
    assert all(abs(r["dist"]) < 1e-9 for r in zn)


def test_ts_topk_window_znorm_shape_match(spark):
    """UCR per-window z-norm: a window matching the pattern's SHAPE at a
    different local level/amplitude scores ~0; raw mode does not find
    it. Verified against a numpy per-window reference."""
    import numpy as np

    from seafan_spark.temporal import ts_topk_matches

    rng = np.random.default_rng(3)
    q = [1.0, 4.0, 2.0, 6.0]
    rows, series = [], {}
    for u in range(4):
        vals = list(np.round(rng.uniform(0, 5, size=20), 3))
        series[u] = vals
        rows += [(u, t, float(v)) for t, v in enumerate(vals)]
    # plant a scaled+shifted copy of q in user 9 (slope*q + shift)
    planted = [v * 7 + 100 for v in q]
    vals9 = [200.0, 210.0] + planted + [190.0, 205.0]
    series[9] = vals9
    rows += [(9, t, float(v)) for t, v in enumerate(vals9)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")

    got = ts_topk_matches(df, "user_id", ["ts"], "value", q, k=3, znorm="window").collect()
    assert (got[0]["user_id"], got[0]["start"]) == (9, 3)
    assert abs(got[0]["dist"]) < 1e-9

    # numpy reference over every window of every series
    def zn(a):
        a = np.asarray(a, dtype=float)
        sd = a.std()
        return np.zeros_like(a) if sd == 0 else (a - a.mean()) / sd

    qz = zn(q)
    brute = []
    for u, vals in series.items():
        for s0 in range(len(vals) - len(q) + 1):
            w = zn(vals[s0 : s0 + len(q)])
            brute.append((float(np.sqrt(((w - qz) ** 2).sum())), u, s0 + 1))
    brute.sort()
    assert [(r["user_id"], r["start"]) for r in got] == [
        (u, s) for _, u, s in brute[:3]
    ]
    for r, (dd, _, _) in zip(got, brute[:3]):
        assert abs(r["dist"] - dd) < 1e-9


def test_ts_topk_rejects_bad_znorm(spark):
    from seafan_spark.temporal import ts_topk_matches

    df = spark.createDataFrame([(1, 1, 1.0)], "user_id long, ts long, value double")
    with pytest.raises(ValueError, match="znorm"):
        ts_topk_matches(df, "user_id", ["ts"], "value", [1.0], znorm="bogus")


def test_rolling_agg_hand_computed(spark):
    """Trailing-window aggregates vs hand-computed values, inclusive
    [t-w, t] bounds, per-key isolation, and the shared-frame plan."""
    from pyspark.sql import functions as F

    from seafan_spark.temporal import rolling_agg

    us = 1_000_000  # 1 second in micros; ts arrives as epoch NANOS bigint
    rows = [
        (1, 0, 10.0),
        (1, 1, 20.0),   # 1s later
        (1, 2, 40.0),
        (1, 5, 80.0),   # gap: 2s-window excludes earlier rows
        (2, 1, 7.0),    # other key never mixes
    ]
    df = spark.createDataFrame(
        [(k, t * us * 1000, v) for k, t, v in rows], "k long, ts long, v double"
    )
    got = {
        (r["k"], r["ts"]): (r["n"], r["s"])
        for r in rolling_agg(
            df, ["k"], "ts", {"n": F.count(F.lit(1)), "s": F.sum("v")}, "2 seconds"
        ).collect()
    }
    key = lambda k, t: (k, t * us * 1000)  # noqa: E731
    assert got[key(1, 0)] == (1, 10.0)
    assert got[key(1, 1)] == (2, 30.0)
    assert got[key(1, 2)] == (3, 70.0)   # 0,1,2 all within 2s inclusive
    assert got[key(1, 5)] == (1, 80.0)   # 3..5 window holds only itself
    assert got[key(2, 1)] == (1, 7.0)
    # both aggregates share ONE Exchange/Sort pair
    import io, contextlib, re
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rolling_agg(
            df, ["k"], "ts", {"n": F.count(F.lit(1)), "s": F.sum("v")}, "2 seconds"
        ).explain("formatted")
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", buf.getvalue(), re.M)
    assert ops.count("Exchange") == 1 and ops.count("Sort") == 1, ops


def test_duration_us_parse():
    import pytest as _pt

    from seafan_spark.temporal import duration_us

    assert duration_us("1 hour") == 3_600_000_000
    assert duration_us("7 days") == 7 * 86_400_000_000
    assert duration_us("90 seconds") == 90_000_000
    with _pt.raises(ValueError):
        duration_us("soon")
    with _pt.raises(ValueError):
        duration_us("3 fortnights")


def test_transition_matrix(spark):
    from seafan_spark.temporal import transition_matrix

    # user 1: a -> b -> a -> b ; user 2: b -> b -> c
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "b"), (2, 2, "b"), (2, 3, "c"),
    ]
    df = spark.createDataFrame(rows, "u: int, t: int, s: string")
    got = {
        (r["state_from"], r["state_to"]): (r["n"], r["p"])
        for r in transition_matrix(df, "u", ["t"], "s").collect()
    }
    # a->b twice (user 1); b->a once, b->b once, b->c once
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")][0] == 1 and abs(got[("b", "a")][1] - 1 / 3) < 1e-6
    assert got[("b", "b")][0] == 1 and got[("b", "c")][0] == 1
    # no cross-user bigram: user 1 ends 'b', user 2 starts 'b' -> no b->b extra
    assert sum(n for n, _ in got.values()) == 5
    # probabilities row-normalize to 1
    from collections import defaultdict

    rowsum = defaultdict(float)
    for (f, _), (_, p) in got.items():
        rowsum[f] += p
    assert all(abs(v - 1.0) < 1e-5 for v in rowsum.values())


def test_page_hinkley_detects_planted_shift(spark):
    """Level shift at t=20 on a flat series: PH climbs after the shift,
    t_max at the end, alarm fires once PH crosses lam."""
    from seafan_spark.temporal import page_hinkley

    rows = [("a", float(t), 10.0 if t <= 20 else 14.0) for t in range(1, 41)]
    rows += [("b", float(t), 10.0) for t in range(1, 41)]  # flat: no alarm
    df = spark.createDataFrame(rows, "g string, t double, x double")
    out = {r["g"]: r for r in
           page_hinkley(df, "t", "x", keys=["g"], lam=10.0).collect()}
    assert out["a"]["detected"] == 1 and out["a"]["t_alarm"] is not None
    assert out["a"]["t_alarm"] > 20.0  # alarms after the shift
    assert out["b"]["detected"] == 0 and out["b"]["t_alarm"] is None
    assert out["a"]["ph_max"] > out["b"]["ph_max"]
    # python reference for group a
    xs = [10.0 if t <= 20 else 14.0 for t in range(1, 41)]
    mu = sum(xs) / len(xs)
    m = ph = mn = 0.0
    best = -1.0
    cum = 0.0
    for x in xs:
        cum += x - mu
        mn = min(mn, cum)
        best = max(best, round(cum - mn, 6))
    assert out["a"]["ph_max"] == pytest.approx(best, abs=1e-9)


def test_page_hinkley_decrease_side_and_guards(spark):
    from seafan_spark.temporal import page_hinkley

    rows = [("a", float(t), 10.0 if t <= 20 else 6.0) for t in range(1, 41)]
    df = spark.createDataFrame(rows, "g string, t double, x double")
    inc = page_hinkley(df, "t", "x", keys=["g"], side="inc", lam=10.0).collect()[0]
    dec = page_hinkley(df, "t", "x", keys=["g"], side="dec", lam=10.0).collect()[0]
    assert dec["detected"] == 1 and inc["ph_max"] < dec["ph_max"]
    with pytest.raises(ValueError, match="side"):
        page_hinkley(df, "t", "x", side="up")
