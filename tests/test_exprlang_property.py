"""Property-based expression-language check: random expression trees are
rendered two ways (minimally-parenthesized via precedence rules, and
fully parenthesized), evaluated by Spark through the full
parse -> compile -> Column path, and compared against an independent
Python reference interpreter implementing the language semantics
(comparisons return 0/1, logicals are 'true iff > 0', if picks by
cond > 0). Catches precedence/associativity/codegen drift the fixed
corpus can't."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seafan_spark.exprlang import evaluate
from seafan_spark.sources import vec_to_pipe

ROWS = {"c": [1.0, 2.0, -0.5], "D": [3.0, 10.0, 0.25]}

# precedence levels mirror the reference grammar (parser.py):
# 0: || 1: && 2: comparisons 3: +- 4: */ 5: ^ (right-assoc), unary minus
_BINOPS = [
    ("||", 0), ("&&", 1),
    ("==", 2), ("!=", 2), (">", 2), ("<", 2), (">=", 2), ("<=", 2),
    ("+", 3), ("-", 3), ("*", 4),
]


class Lit:
    def __init__(self, v):
        self.v = float(v)

    def render(self, _parent_prec=0):
        return repr(self.v) if self.v >= 0 else f"({self.v!r})"

    def render_full(self):
        return self.render()

    def eval(self, row):
        return self.v


class Col:
    def __init__(self, name):
        self.name = name

    def render(self, _parent_prec=0):
        return self.name

    def render_full(self):
        return self.name

    def eval(self, row):
        return row[self.name]


class Neg:
    PREC = 5

    def __init__(self, x):
        self.x = x

    def render(self, parent_prec=0):
        inner = self.x.render(self.PREC)
        s = f"-{inner}"
        return f"({s})" if parent_prec > self.PREC else s

    def render_full(self):
        return f"(-({self.x.render_full()}))"

    def eval(self, row):
        return -self.x.eval(row)


class Bin:
    def __init__(self, op, prec, a, b):
        self.op, self.prec, self.a, self.b = op, prec, a, b

    def render(self, parent_prec=0):
        # left-assoc: left child renders at own prec, right child one tighter
        s = f"{self.a.render(self.prec)} {self.op} {self.b.render(self.prec + 1)}"
        return f"({s})" if parent_prec > self.prec else s

    def render_full(self):
        return f"({self.a.render_full()} {self.op} {self.b.render_full()})"

    def eval(self, row):
        x, y = self.a.eval(row), self.b.eval(row)
        if self.op == "+":
            return x + y
        if self.op == "-":
            return x - y
        if self.op == "*":
            return x * y
        if self.op == "||":
            return 1.0 if (x > 0 or y > 0) else 0.0
        if self.op == "&&":
            return 1.0 if (x > 0 and y > 0) else 0.0
        cmp = {
            "==": x == y, "!=": x != y, ">": x > y,
            "<": x < y, ">=": x >= y, "<=": x <= y,
        }[self.op]
        return 1.0 if cmp else 0.0


class If:
    def __init__(self, c, a, b):
        self.c, self.a, self.b = c, a, b

    def render(self, _parent_prec=0):
        return f"if({self.c.render(0)},{self.a.render(0)},{self.b.render(0)})"

    def render_full(self):
        return f"if({self.c.render_full()},{self.a.render_full()},{self.b.render_full()})"

    def eval(self, row):
        return self.a.eval(row) if self.c.eval(row) > 0 else self.b.eval(row)


def _exprs():
    leaves = st.one_of(
        st.sampled_from([Col("c"), Col("D")]),
        st.integers(min_value=-3, max_value=5).map(Lit),
    )

    def extend(children):
        return st.one_of(
            st.tuples(st.sampled_from(_BINOPS), children, children).map(
                lambda t: Bin(t[0][0], t[0][1], t[1], t[2])
            ),
            children.map(Neg),
            st.tuples(children, children, children).map(lambda t: If(*t)),
        )

    return st.recursive(leaves, extend, max_leaves=12)


def _has_col(t) -> bool:
    if isinstance(t, Col):
        return True
    kids = [getattr(t, a) for a in ("x", "a", "b", "c") if hasattr(t, a)]
    return any(_has_col(k) for k in kids if not isinstance(k, (str, float)))


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(tree=_exprs())
def test_random_expressions_match_reference(spark, tree):
    pipe = vec_to_pipe(spark, ROWS)
    want = [
        tree.eval({k: v[i] for k, v in ROWS.items()})
        for i in range(len(ROWS["c"]))
    ]
    if not _has_col(tree):
        # pure-constant expressions are scalars in the language: length-1
        want = want[:1]
    for rendering in (tree.render(0), tree.render_full()):
        got = evaluate(pipe, rendering)
        assert len(got) == len(want), rendering
        for g, w in zip(got, want):
            assert g == pytest.approx(w, abs=1e-9), (rendering, got, want)
