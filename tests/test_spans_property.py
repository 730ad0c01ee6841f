"""Property-based checks for substring-span cutting and heavy hitters:
random inputs vs independent Python reference implementations. One Spark
job per example batch keeps the suite fast — each property collects its
random cases into a single DataFrame."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _py_cut(text: str, spans: list[tuple[int, int]]) -> str:
    """Reference cut: drop every 1-based [start, start+len-1] character,
    keep the rest in order (overlaps/adjacency handled by the set)."""
    drop = set()
    for s, ln in spans:
        drop.update(range(s, s + ln))
    return "".join(ch for i, ch in enumerate(text, start=1) if i not in drop)


def test_cut_spans_random_intervals_match_reference(spark):
    """cut_duplicated_spans with explicit spans == character-set cut for
    random overlapping/adjacent/nested interval soups."""
    from seafan_spark.llmops.dedup import cut_duplicated_spans

    rnd = random.Random(77)
    alphabet = "abcdefghij"
    docs, span_rows, expected = [], [], {}
    for doc_id in range(40):
        n = rnd.randint(1, 60)
        text = "".join(rnd.choice(alphabet) for _ in range(n))
        k = rnd.randint(0, 5)
        spans = []
        for _ in range(k):
            s = rnd.randint(1, n)
            ln = rnd.randint(1, n - s + 1)
            spans.append((s, ln))
        docs.append((doc_id, text))
        span_rows += [(doc_id, s, ln) for s, ln in spans]
        expected[doc_id] = _py_cut(text, spans)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    sp = spark.createDataFrame(
        span_rows or [(0, 1, 0)], "doc_id long, start long, span_len long"
    )
    if not span_rows:
        sp = sp.limit(0)
    got = {
        r["doc_id"]: r["clean_text"]
        for r in cut_duplicated_spans(d, "doc_id", "text", spans=sp).collect()
    }
    assert got == expected


def test_duplicated_spans_match_reference(spark):
    """duplicated_spans == a brute-force Python reference (all k-grams,
    cross-doc duplicate selection, island merge) on random docs with
    planted shared blocks."""
    from seafan_spark.llmops.dedup import duplicated_spans

    rnd = random.Random(88)
    K, MINLEN = 5, 8
    blocks = ["SHAREDBLOCKONE", "ANOTHERSHAREDRUN"]
    docs = []
    for doc_id in range(30):
        parts = []
        for _ in range(rnd.randint(1, 4)):
            parts.append(
                "".join(rnd.choice("uvwxyz") for _ in range(rnd.randint(3, 12)))
            )
            if rnd.random() < 0.5:
                parts.append(rnd.choice(blocks))
        docs.append((doc_id, "".join(parts)))

    # python reference
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for i, t in docs:
        for p in range(len(t) - K + 1):
            gram_docs[t[p : p + K]].add(i)
    expected = set()
    for i, t in docs:
        dup_pos = sorted(
            p + 1
            for p in range(len(t) - K + 1)
            if len(gram_docs[t[p : p + K]]) >= 2
        )
        run = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                span = run[-1] + K - 1 - run[0] + 1
                if span >= MINLEN:
                    expected.add((i, run[0], span))
                run = []
            if p is not None:
                run.append(p)
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["start"], r["span_len"])
        for r in duplicated_spans(d, "doc_id", "text", min_len=MINLEN, gram_k=K).collect()
    }
    assert got == expected


def test_heavy_hitters_random_vs_exact(spark):
    """heavy_hitters == exact groupBy top-k whenever the certificate
    accepts, across random zipf-ish draws and partitionings."""
    from seafan_spark.sketches import heavy_hitters

    rnd = random.Random(99)
    for trial in range(3):
        rows = []
        for i in range(1, rnd.randint(15, 40)):
            rows += [(f"w{i:03d}",)] * max(1, int(500 / i ** rnd.uniform(0.8, 1.5)))
        df = spark.createDataFrame(rows, "token string").repartition(
            rnd.choice([2, 5, 9])
        )
        k = rnd.choice([3, 7, 12])
        try:
            got = heavy_hitters(df, "token", k=k, width=128).collect()
        except ValueError:
            continue  # certificate refused: allowed, just not this draw
        exact = (
            df.groupBy("token")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token").asc())
            .limit(k)
            .collect()
        )
        assert [(r["item"], r["cnt"]) for r in got] == [
            (r["token"], r["cnt"]) for r in exact
        ], f"trial {trial}"
