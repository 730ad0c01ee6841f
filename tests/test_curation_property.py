"""Property tests for the round-5 curation operators: each checked
against a pure-Python reference implementation on randomized inputs
(hypothesis drives the generators; examples kept modest because every
example is a Spark job)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["a", "b", "c", "d"]


@st.composite
def line_corpus(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for _ in range(n_docs):
        n_lines = draw(st.integers(0, 5))
        lines = [
            " ".join(
                draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=3))
            )
            for _ in range(n_lines)
        ]
        docs.append("\n".join(lines))
    return docs


def _ref_drop_common(docs, min_count):
    counts = Counter()
    for t in docs:
        counts.update(t.split("\n"))
    common = {l for l, c in counts.items() if c >= min_count}
    out = []
    for t in docs:
        lines = t.split("\n")
        kept = [l for l in lines if l not in common]
        out.append((len(lines), len(lines) - len(kept), "\n".join(kept)))
    return out


@PROP
@given(docs=line_corpus(), min_count=st.integers(2, 4))
def test_drop_common_lines_matches_reference(spark, docs, min_count):
    from seafan_spark.llmops.dedup import drop_common_lines
    from seafan_spark.sources import vec_to_pipe

    p = vec_to_pipe(spark, {"id": list(range(len(docs))), "t": docs})
    got = {
        r["id"]: (r["n_lines"], r["n_dropped"], r["text_clean"])
        for r in drop_common_lines(p, "id", "t", min_count=min_count).df.collect()
    }
    want = _ref_drop_common(docs, min_count)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)


@st.composite
def interval_tables(draw):
    n = draw(st.integers(1, 12))
    rows = []
    for i in range(n):
        k = draw(st.integers(0, 2))
        s = draw(st.integers(0, 60))
        e = s + draw(st.integers(0, 25))
        rows.append((i, k, s, e))
    return rows


@PROP
@given(l=interval_tables(), r=interval_tables(), bucket=st.integers(1, 30))
def test_interval_join_matches_reference(spark, l, r, bucket):
    from seafan_spark.temporal import interval_join

    ldf = spark.createDataFrame(l, "lid long, k long, ls long, le long")
    rdf = spark.createDataFrame(
        [(i + 100, k, s, e) for (i, k, s, e) in r],
        "rid long, k long, rs long, re long",
    )
    got = sorted(
        (x["lid"], x["rid"])
        for x in interval_join(
            ldf, rdf, on="k", left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket=bucket,
        ).collect()
    )
    want = sorted(
        (li, ri + 100)
        for (li, lk, ls, le) in l
        for (ri, rk, rs, re) in r
        if lk == rk and ls <= re and rs <= le
    )
    assert got == want


@st.composite
def baskets(draw):
    n = draw(st.integers(1, 10))
    rows = []
    for k in range(n):
        items = draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=4))
        rows.extend((k, i) for i in items)
    return rows


def _ref_rules(rows, min_support, max_basket):
    from itertools import combinations

    b = {}
    for k, i in rows:
        b.setdefault(k, set()).add(i)
    b = {k: v for k, v in b.items() if len(v) <= max_basket}
    nb = len(b)
    items = Counter()
    pairs = Counter()
    for v in b.values():
        items.update(v)
        pairs.update(combinations(sorted(v), 2))
    out = {}
    for (x, y), c in pairs.items():
        if c < min_support * nb:
            continue
        lift = c * nb / (items[x] * items[y])
        out[(x, y)] = (c, c / nb, c / items[x], lift)
        out[(y, x)] = (c, c / nb, c / items[y], lift)
    return out


@PROP
@given(rows=baskets(), min_support=st.sampled_from([0.0, 0.2, 0.5]))
def test_association_rules_match_reference(spark, rows, min_support):
    from seafan_spark.agg import association_rules

    df = spark.createDataFrame(rows, "k long, i string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["pair_n"],
            r["support"],
            r["confidence"],
            r["lift"],
        )
        for r in association_rules(
            df, "k", "i", min_support=min_support, k=1000
        ).collect()
    }
    want = _ref_rules(rows, min_support, 64)
    assert set(got) == set(want)
    for key in want:
        for g, w in zip(got[key], want[key]):
            assert g == pytest.approx(w, rel=1e-12), (key, got[key], want[key])


@st.composite
def fd_table(draw):
    n = draw(st.integers(1, 20))
    return [
        (draw(st.integers(0, 3)), draw(st.sampled_from(WORDS)))
        for _ in range(n)
    ]


@PROP
@given(rows=fd_table())
def test_fd_report_matches_reference(spark, rows):
    from seafan_spark.agg import fd_report

    df = spark.createDataFrame(rows, "a long, b string")
    got = fd_report(df, [("a", "b")]).collect()[0]

    groups = {}
    for a, b in rows:
        groups.setdefault(a, Counter())[b] += 1
    keep = sum(max(c.values()) for c in groups.values())
    n = len(rows)
    assert got["n_rows"] == n
    assert got["n_groups"] == len(groups)
    assert got["violating_groups"] == sum(1 for c in groups.values() if len(c) > 1)
    assert got["g3_rate"] == pytest.approx(1 - keep / n, rel=1e-12)


@PROP
@given(
    vals=st.lists(
        st.floats(0.1, 100.0, allow_nan=False), min_size=2, max_size=15
    )
)
def test_calibrate_matches_reference(spark, vals):
    from seafan_spark.sampling import calibrate_scores_by_group

    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, s double"
    )
    got = sorted(
        (r["s"], r["score_pct"])
        for r in calibrate_scores_by_group(df, "g", "s").collect()
    )
    n = len(vals)
    sv = sorted(vals)
    for v, pct in got:
        rank = sv.index(v)  # first index of the tie group = rank - 1
        assert pct == pytest.approx(rank / (n - 1), rel=1e-12)


# ------------------------------------------ round-10b property tests ----

@st.composite
def ewma_case(draw):
    n = draw(st.integers(2, 40))
    xs = [
        round(draw(st.floats(-50, 50, allow_nan=False)), 3) for _ in range(n)
    ]
    alpha = round(draw(st.floats(0.02, 0.98)), 3)
    block = draw(st.sampled_from([2, 3, 7, 256]))
    return xs, alpha, block


@PROP
@given(ewma_case())
def test_ewma_property_vs_sequential(spark, case):
    """The banded block scan equals the literal recurrence for any
    series/alpha/block size — the decomposition (blocked rescaling +
    banded carry join) must be invisible in the result."""
    from seafan_spark.temporal import ewma_by

    xs, alpha, block = case
    df = spark.createDataFrame(
        [("g", i, x) for i, x in enumerate(xs)], "k string, t int, x double"
    )
    got = {
        r["t"]: r["ewma"]
        for r in ewma_by(df, "t", "x", keys=["k"], alpha=alpha, block=block)
        .collect()
    }
    s = xs[0]
    for i, x in enumerate(xs):
        if i > 0:
            s = alpha * x + (1.0 - alpha) * s
        assert got[i] == pytest.approx(s, abs=5e-6), (i, alpha, block)


@st.composite
def wq_case(draw):
    n = draw(st.integers(1, 40))
    rows = [
        (
            round(draw(st.floats(0, 100, allow_nan=False)), 2),
            float(draw(st.integers(1, 9))),
        )
        for _ in range(n)
    ]
    qs = sorted(
        set(round(draw(st.floats(0, 1)), 2) for _ in range(draw(st.integers(1, 4))))
    )
    return rows, qs


@PROP
@given(wq_case())
def test_weighted_quantiles_property_vs_reference(spark, case):
    """The distributed crossing test equals the sequential weighted
    inverse-ECDF walk for any weights/probabilities, including q=0/1
    and repeated values."""
    from seafan_spark.agg import weighted_quantiles_by

    rows, qs = case
    df = spark.createDataFrame(
        [("g", v, w) for v, w in rows], "k string, v double, w double"
    )
    got = {
        r["q"]: r["value"]
        for r in weighted_quantiles_by(
            df, "v", "w", qs=qs, keys=["k"]
        ).collect()
    }
    svs = sorted(rows)
    tw = sum(w for _, w in svs)
    for q in qs:
        cw, pick = 0.0, None
        for v, w in svs:
            cw += w
            if cw >= q * tw:
                pick = v
                break
        assert got[q] == pytest.approx(pick), (q, rows)
