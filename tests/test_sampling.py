"""Deterministic sampling / splitting / packing: cross-engine hash
parity vs DuckDB, fraction accuracy, retry-stability, packing bounds."""

import duckdb
import pytest
from pyspark.sql import functions as F

from seafan_spark.sampling import (
    _BUCKETS,
    deterministic_sample,
    hash_bucket_col,
    pack_sequences,
    stratified_sample,
    train_val_test_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "k")


def test_bucket_matches_duckdb(spark, ids):
    got = {
        r["k"]: r["b"]
        for r in ids.select("k", hash_bucket_col(F.col("k"), "s1").alias("b"))
        .limit(50)
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"""
            SELECT k, CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || 's1'), 1, 8))
                           AS UBIGINT) % {_BUCKETS} AS b
            FROM range(50) t(k)
            """
        ).fetchall()
    )
    for k, b in want.items():
        assert got[k] == b


def test_sample_fraction_and_determinism(ids):
    s1 = deterministic_sample(ids, "k", 0.25, salt="x")
    s2 = deterministic_sample(ids.repartition(7), "k", 0.25, salt="x")
    rows1 = sorted(r["k"] for r in s1.collect())
    rows2 = sorted(r["k"] for r in s2.collect())
    assert rows1 == rows2  # partitioning-independent
    assert 0.20 < len(rows1) / 2000 < 0.30  # ~fraction
    # monotone: a 10% sample is a subset of the 25% sample (same salt)
    s3 = sorted(r["k"] for r in deterministic_sample(ids, "k", 0.10, salt="x").collect())
    assert set(s3) <= set(rows1)


def test_split_partition_and_weights(ids):
    d = train_val_test_split(ids, "k", weights=(0.8, 0.1, 0.1), salt="sp")
    counts = {r["split"]: r["n"] for r in d.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 2000
    assert counts["train"] > 1400 and counts["val"] < 350 and counts["test"] < 350


def test_stratified_sample(spark):
    rows = [(i, "web" if i % 2 else "books") for i in range(2000)]
    d = spark.createDataFrame(rows, ["k", "src"])
    s = stratified_sample(d, "k", "src", {"books": 1.0, "web": 0.1})
    c = {r["src"]: r["n"] for r in s.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert c["books"] == 1000  # keep-all stratum is exact
    assert 40 < c.get("web", 0) < 220
    # unlisted strata default to dropped
    s0 = stratified_sample(d, "k", "src", {"books": 1.0})
    assert s0.filter(F.col("src") == "web").count() == 0


def test_pack_sequences_bounds(spark):
    import random

    rng = random.Random(3)
    d = spark.createDataFrame(
        [(i, rng.randrange(50, 400)) for i in range(3000)], ["doc", "toks"]
    )
    packed = pack_sequences(d, "doc", "toks", budget=2048, shards=8)
    assert packed.count() == 3000  # no row lost
    agg = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("toks").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    max_item = 400
    # every bin except possibly a shard's last is >= budget - max_item;
    # no bin exceeds budget + max_item (streaming-packing bound)
    per_shard_last = {}
    for r in agg:
        assert r["tot"] < 2048 + max_item
        per_shard_last[r["shard"]] = max(per_shard_last.get(r["shard"], -1), r["bin"])
    for r in agg:
        if r["bin"] < per_shard_last[r["shard"]]:
            assert r["tot"] + max_item >= 2048
    # deterministic across partitionings
    p2 = pack_sequences(d.repartition(13), "doc", "toks", budget=2048, shards=8)
    assert sorted(map(tuple, packed.select("doc", "shard", "bin").collect())) == sorted(
        map(tuple, p2.select("doc", "shard", "bin").collect())
    )


def test_oversize_row_gets_own_bin(spark):
    d = spark.createDataFrame([(1, 5000), (2, 10), (3, 10)], ["doc", "toks"])
    packed = pack_sequences(d, "doc", "toks", budget=100, shards=1)
    bins = {r["doc"]: r["bin"] for r in packed.collect()}
    assert len(set(bins.values())) >= 2  # the 5000-token row can't share forever


def test_mix_sources_budget(spark):
    from seafan_spark.sampling import mix_sources

    rows = []
    for i in range(400):
        src = "web" if i % 2 == 0 else ("books" if i % 4 == 1 else "code")
        rows.append((i, src, 100))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # web: 200 docs/20k chars, books: 100/10k, code: 100/10k
    out = mix_sources(
        df, "doc_id", "source", "n_chars",
        {"web": 1.0, "books": 1.0}, budget=12_000,
    ).collect()
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + r["n_chars"]
    # zero/absent weight -> dropped entirely
    assert "code" not in by_src
    # web target 6k of 20k (~30%), books target 6k of 10k (~60%):
    # hash sampling is approximate; generous bounds
    assert 3_000 < by_src["web"] < 9_000
    assert 4_000 < by_src["books"] < 8_000
    # a source smaller than its share keeps everything (fraction capped)
    out2 = mix_sources(
        df, "doc_id", "source", "n_chars", {"books": 1.0}, budget=1_000_000
    )
    assert out2.count() == 100
    # deterministic across invocations
    a = {r["doc_id"] for r in out}
    b = {
        r["doc_id"]
        for r in mix_sources(
            df, "doc_id", "source", "n_chars",
            {"web": 1.0, "books": 1.0}, budget=12_000,
        ).collect()
    }
    assert a == b


def test_leakage_safe_split_clusters_stay_together(spark):
    """Every member of a dup component gets the component key's label;
    docs absent from the cluster table split exactly like a plain
    per-id train_val_test_split."""
    from seafan_spark.sampling import leakage_safe_split, train_val_test_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    # components {0,1,2}->0, {10,150}->10; everything else singleton
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (150, 10)], "id long, cluster long"
    )
    out = leakage_safe_split(docs, "doc_id", clusters, salt="t").collect()
    lab = {r["doc_id"]: r["split"] for r in out}
    assert len(lab) == 200
    assert lab[0] == lab[1] == lab[2]
    assert lab[10] == lab[150]
    # singletons match the per-id split keyed on the same salt
    plain = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(docs, "doc_id", salt="t").collect()
    }
    clustered = {0, 1, 2, 10, 150}
    for i in set(lab) - clustered:
        assert lab[i] == plain[i]
    # component label == the plain label of its min-id representative
    assert lab[0] == plain[0]
    assert lab[10] == plain[10]


def test_temperature_weights_limits():
    from seafan_spark.sampling import temperature_weights

    totals = {"web": 8000.0, "books": 1500.0, "code": 500.0}
    # alpha=1: natural shares
    w1 = temperature_weights(totals, 1.0)
    assert abs(w1["web"] - 0.8) < 1e-12 and abs(w1["code"] - 0.05) < 1e-12
    # alpha=0: uniform
    w0 = temperature_weights(totals, 0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in w0.values())
    # alpha=0.5: small sources upweighted vs natural, order preserved
    wh = temperature_weights(totals, 0.5)
    assert wh["code"] > w1["code"] and wh["web"] < w1["web"]
    assert wh["web"] > wh["books"] > wh["code"]
    assert abs(sum(wh.values()) - 1.0) < 1e-12
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(totals, -0.1)
    with pytest.raises(ValueError, match="sum > 0"):
        temperature_weights({"a": 0.0})


def test_temperature_mix_shifts_composition(spark):
    """Lower alpha moves kept-size shares toward uniform relative to the
    natural mixture, under the same budget."""
    from seafan_spark.sampling import temperature_mix

    rows = (
        [(i, "web", 100) for i in range(400)]
        + [(i + 1000, "books", 100) for i in range(80)]
        + [(i + 2000, "code", 100) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, sz long")

    def shares(alpha):
        out = temperature_mix(df, "doc_id", "source", "sz", budget=20_000, alpha=alpha)
        got = {
            r["source"]: r["t"]
            for r in out.groupBy("source").agg(F.sum("sz").alias("t")).collect()
        }
        tot = sum(got.values())
        return {s: got.get(s, 0) / tot for s in ("web", "books", "code")}

    nat, cool = shares(1.0), shares(0.3)
    # hash sampling is approximate: assert direction, not exact values
    assert cool["code"] > nat["code"]
    assert cool["web"] < nat["web"]
    # determinism
    a = {r["doc_id"] for r in temperature_mix(df, "doc_id", "source", "sz", 20_000, 0.3).collect()}
    b = {r["doc_id"] for r in temperature_mix(df, "doc_id", "source", "sz", 20_000, 0.3).collect()}
    assert a == b


def test_leakage_safe_split_dedups_assignment_rows(spark):
    """A duplicate id in the cluster table must not fan out corpus rows;
    the min cluster wins deterministically."""
    from seafan_spark.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i, "t") for i in range(10)], "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(3, 1), (3, 0), (4, 4)], "id long, cluster long"
    )
    out = leakage_safe_split(docs, "doc_id", clusters, salt="dd").collect()
    assert len(out) == 10  # no fan-out
    lab = {r["doc_id"]: r["split"] for r in out}
    # doc 3 keyed on cluster 0 (min), i.e. same label as doc 0's own key
    ref = leakage_safe_split(
        docs, "doc_id", spark.createDataFrame([(3, 0)], "id long, cluster long"),
        salt="dd",
    ).collect()
    assert lab[3] == {r["doc_id"]: r["split"] for r in ref}[3]


def test_weighted_sample_per_group_basics(spark):
    from seafan_spark.sampling import weighted_sample_per_group

    rows = [("g", i, 1.0 if i % 2 else 5.0) for i in range(40)]
    rows += [("g", 100, None), ("g", 101, 0.0), ("g", 102, -3.0)]  # excluded
    rows += [("tiny", 200, 2.0)]  # group smaller than k
    df = spark.createDataFrame(rows, "grp string, id long, w double")
    got = weighted_sample_per_group(df, ["grp"], "id", "w", k=5, salt="t").collect()
    g = [r for r in got if r["grp"] == "g"]
    assert len(g) == 5 and [r["rank"] for r in sorted(g, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    assert all(r["id"] < 100 for r in g)  # null/zero/negative weights never win
    t = [r for r in got if r["grp"] == "tiny"]
    assert len(t) == 1 and t[0]["rank"] == 1
    # deterministic: identical rerun
    again = weighted_sample_per_group(df, ["grp"], "id", "w", k=5, salt="t").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_weighted_sample_favors_heavy_rows(spark):
    """A-ES inclusion probability grows with weight: across many
    replicated groups, a weight-20 row beats 9 weight-1 rows for the
    single slot far more often than 1/10 of the time."""
    from seafan_spark.sampling import weighted_sample_per_group

    rows = []
    for g in range(300):
        for i in range(10):
            rows.append((g, g * 100 + i, 20.0 if i == 0 else 1.0))
    df = spark.createDataFrame(rows, "grp long, id long, w double")
    won = weighted_sample_per_group(df, ["grp"], "id", "w", k=1, salt="p").collect()
    heavy_wins = sum(1 for r in won if r["id"] % 100 == 0)
    # expected inclusion ~ 20/29; uniform would be 30. Far apart.
    assert heavy_wins > 150, heavy_wins


def test_kfold_split_exact_balance(spark):
    from seafan_spark.sampling import kfold_split

    rows = [(i, "a" if i % 3 else "b") for i in range(101)]
    df = spark.createDataFrame(rows, "id: int, grp: string")
    out = kfold_split(df, "id", 4, stratify_by="grp", exact=True)
    sizes = {}
    for r in out.groupBy("grp", "fold").count().collect():
        sizes.setdefault(r["grp"], {})[r["fold"]] = r["count"]
    for g, by_fold in sizes.items():
        assert set(by_fold) == {0, 1, 2, 3}
        assert max(by_fold.values()) - min(by_fold.values()) <= 1, (g, by_fold)
    # deterministic: same assignment on recompute
    a = {r["id"]: r["fold"] for r in out.collect()}
    b = {r["id"]: r["fold"] for r in kfold_split(df, "id", 4, stratify_by="grp", exact=True).collect()}
    assert a == b
    # salt changes the assignment
    c = {r["id"]: r["fold"] for r in kfold_split(df, "id", 4, stratify_by="grp", salt="x", exact=True).collect()}
    assert a != c


def test_kfold_split_hash_mode(spark):
    from seafan_spark.sampling import kfold_split
    import pytest as _pytest

    df = spark.createDataFrame([(i,) for i in range(2000)], "id: int")
    out = kfold_split(df, "id", 5)
    counts = {r["fold"]: r["count"] for r in out.groupBy("fold").count().collect()}
    assert set(counts) == set(range(5))
    # binomial tolerance: each fold within 20% of n/k
    assert all(abs(v - 400) < 80 for v in counts.values())
    # no shuffle in the default mode: plan has no Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with _pytest.raises(ValueError, match="k must be"):
        kfold_split(df, "id", 1)
