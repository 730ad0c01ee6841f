"""Synthesize the scaling corpus (round-6 VERDICT #1): a ~10x replica of
/root/testdata/sf0.1 with the SAME schemas and generator shape as
TESTDATA.md's tables, written OUTSIDE the read-only testdata tree
(default /tmp/seafan_scaling/sf1).

Design goals — the corpus must scale the right things and ONLY them:

- documents: fresh token-resampled texts per replica (per-lang
  vocabularies and the doc-length distribution are measured from the
  source corpus), with planted exact-dup (~1/200) and near-dup (~1/60)
  rates mirroring the source. Naive text replication would multiply
  every dup group by the replica count and blow candidate-pair counts
  up QUADRATICALLY — manufacturing exactly the super-linear term the
  scaling curve is supposed to detect (or falsely indict).
- embeddings: fresh Gaussian vectors at the measured global std, labels
  uniform; planted near-dup pairs (1/100) via copy+small-noise.
- events: key-shifted replicas (event_id/user_id offsets keep per-user
  event counts constant — state per user must not grow with corpus
  size), timestamps jittered inside the same 30-day window (event
  DENSITY grows, the window doesn't — matching how a bigger corpus of
  the same period behaves).
- lineitem/orders: key-shifted replicas (l_orderkey/o_orderkey move
  together so the join degree per order is unchanged).
- region/nation/customer/supplier/part: copied unchanged (dimensions
  don't grow 10x when facts do).

Deterministic: --seed (default 7) drives every choice.

Usage: python scripts/make_scaling_corpus.py [--mult 10]
           [--src /root/testdata/sf0.1] [--out /tmp/seafan_scaling/sf1]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import numpy as np
import pandas as pd


def _read(src: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(src, f"{name}.parquet"))


def _write(out: str, name: str, df: pd.DataFrame) -> None:
    df.to_parquet(os.path.join(out, f"{name}.parquet"), index=False)


def gen_documents(src: str, out: str, mult: int, rng: np.random.Generator) -> None:
    base = _read(src, "documents")
    n = len(base)
    # measured generator shape: per-lang vocabulary + token-count pool
    vocab: dict[str, list[str]] = {}
    lengths: dict[str, list[int]] = {}
    for lang, grp in base.groupby("lang"):
        toks = set()
        lens = []
        for t in grp["text"]:
            words = re.sub(r"\s+", " ", str(t).strip().lower()).split(" ")
            toks.update(words)
            lens.append(len(words))
        vocab[lang] = sorted(toks)
        lengths[lang] = lens
    langs = base["lang"].to_numpy()
    sources = base["source"].to_numpy()
    parts = [base]
    for r in range(1, mult):
        texts: list[str] = []
        for i in range(n):
            lang = langs[i]
            v, ls = vocab[lang], lengths[lang]
            if i % 200 == 100 and i >= 2:
                texts.append(texts[i - 2])  # planted exact dup
                continue
            if i % 60 == 30 and i >= 1:
                # planted near dup: previous doc with 2 token substitutions
                words = texts[i - 1].split(" ")
                for pos in rng.integers(0, len(words), size=2):
                    words[pos] = v[int(rng.integers(0, len(v)))]
                texts.append(" ".join(words))
                continue
            ln = ls[int(rng.integers(0, len(ls)))]
            texts.append(" ".join(v[j] for j in rng.integers(0, len(v), size=ln)))
        rep = pd.DataFrame(
            {
                "doc_id": base["doc_id"].to_numpy() + r * n,
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": [len(t) for t in texts],
            }
        )
        parts.append(rep)
    _write(out, "documents", pd.concat(parts, ignore_index=True))


def gen_embeddings(src: str, out: str, mult: int, rng: np.random.Generator) -> None:
    base = _read(src, "embeddings")
    n = len(base)
    M = np.stack([np.asarray(v, dtype=np.float32) for v in base["embedding"]])
    std = float(M.std())
    dim = M.shape[1]
    labels = base["label"].to_numpy()
    parts = [base]
    for r in range(1, mult):
        V = rng.normal(0.0, std, size=(n, dim)).astype(np.float32)
        near = np.arange(n) % 100 == 50
        V[near] = V[np.maximum(np.flatnonzero(near) - 1, 0)] + rng.normal(
            0.0, 0.01 * std, size=(near.sum(), dim)
        ).astype(np.float32)
        rep = pd.DataFrame(
            {
                "vec_id": base["vec_id"].to_numpy() + r * n,
                "embedding": list(V),
                "label": labels,
            }
        )
        parts.append(rep)
    _write(out, "embeddings", pd.concat(parts, ignore_index=True))


def gen_events(src: str, out: str, mult: int, rng: np.random.Generator) -> None:
    base = _read(src, "events")
    n = len(base)
    n_users = int(base["user_id"].max()) + 1
    parts = [base]
    for r in range(1, mult):
        rep = base.copy()
        rep["event_id"] = rep["event_id"] + r * n
        rep["user_id"] = rep["user_id"] + r * n_users
        # jitter inside the same window: density grows, the window doesn't.
        # keep microsecond resolution — the timedelta addition upcasts to
        # ns, and Spark reads parquet timestamp(ns) as LONG, breaking every
        # downstream to_date/window (measured: 10x ERR on the events
        # queries)
        rep["ts"] = (
            rep["ts"]
            + pd.to_timedelta(
                rng.integers(-20_000_000, 20_000_000, size=n), unit="us"
            )
        ).astype("datetime64[us]")
        rep["value"] = (rep["value"] * (1.0 + rng.normal(0, 0.02, size=n))).round(2)
        parts.append(rep)
    ev = pd.concat(parts, ignore_index=True)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    _write(out, "events", ev)


def gen_tpch(src: str, out: str, mult: int) -> None:
    orders = _read(src, "orders")
    lineitem = _read(src, "lineitem")
    span = int(orders["o_orderkey"].max()) + 1
    o_parts, l_parts = [orders], [lineitem]
    for r in range(1, mult):
        o = orders.copy()
        o["o_orderkey"] = o["o_orderkey"] + r * span
        o_parts.append(o)
        li = lineitem.copy()
        li["l_orderkey"] = li["l_orderkey"] + r * span
        l_parts.append(li)
    _write(out, "orders", pd.concat(o_parts, ignore_index=True))
    _write(out, "lineitem", pd.concat(l_parts, ignore_index=True))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/seafan_scaling/sf1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    gen_documents(args.src, args.out, args.mult, rng)
    gen_embeddings(args.src, args.out, args.mult, rng)
    gen_events(args.src, args.out, args.mult, rng)
    gen_tpch(args.src, args.out, args.mult)
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(
            os.path.join(args.src, f"{t}.parquet"),
            os.path.join(args.out, f"{t}.parquet"),
        )
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        df = pd.read_parquet(os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: {len(df)} rows")


if __name__ == "__main__":
    main()
