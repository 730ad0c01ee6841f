"""Streaming operators: the batch plan is the oracle for the stream plan —
same function, two input modes, identical results (availableNow drains the
whole source in one run)."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.streaming import (
    read_events_stream,
    run_to_memory,
    running_totals_stream,
    sessionize,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


def rows(df, keys):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(str(x) for x in t))


def aggs():
    return {"n": F.count(F.lit(1)), "sum_value": F.round(F.sum("value"), 4)}


@pytest.fixture(scope="module")
def batch(spark):
    return spark.read.parquet(EVENTS)


def test_tumbling_stream_matches_batch(spark, batch):
    want = tumbling_agg(batch, aggs(), window="1 hour", keys=["event_type"])
    sdf = tumbling_agg(
        read_events_stream(spark, EVENTS), aggs(), window="1 hour", keys=["event_type"]
    )
    got = run_to_memory(sdf, "t_tumble", output_mode="complete")
    assert rows(got, None) == rows(want, None)
    assert want.count() > 0


def test_sliding_stream_matches_batch(spark, batch):
    want = sliding_agg(batch, aggs(), window="1 hour", slide="30 minutes")
    sdf = sliding_agg(
        read_events_stream(spark, EVENTS), aggs(), window="1 hour", slide="30 minutes"
    )
    got = run_to_memory(sdf, "t_slide", output_mode="complete")
    assert rows(got, None) == rows(want, None)
    # every event lands in window/slide = 2 windows
    n_events = batch.count()
    total = want.agg(F.sum("n")).collect()[0][0]
    assert total == 2 * n_events


def test_sessionize_stream_matches_batch(spark, batch):
    want = sessionize(batch, aggs(), gap="10 minutes", keys=["user_id"])
    sdf = sessionize(
        read_events_stream(spark, EVENTS),
        aggs(),
        gap="10 minutes",
        keys=["user_id"],
        watermark="0 seconds",
    )
    got = run_to_memory(sdf, "t_sess", output_mode="complete")
    assert rows(got, None) == rows(want, None)


def test_stream_join_matches_batch(spark, batch):
    from seafan_spark.streaming import stream_join

    def build(l_src, r_src):
        l = l_src.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        r = r_src.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", "ts"
        )
        j = stream_join(l, r, on="user_id", before="1 hour", after="0 seconds")
        return j.select("event_id", "user_id", "click_id")

    want = build(batch, batch)
    sdf = build(read_events_stream(spark, EVENTS), read_events_stream(spark, EVENTS))
    got = run_to_memory(sdf, "t_sjoin", output_mode="append")
    assert rows(got, None) == rows(want, None)
    assert want.count() > 0


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base, 1.0),
            (1, base + dt.timedelta(minutes=5), 1.0),  # merges (gap 10m)
            (1, base + dt.timedelta(minutes=20), 1.0),  # 15m > gap -> new session
            (2, base, 1.0),
        ],
        "user_id bigint, ts timestamp, value double",
    )
    out = sessionize(df, {"n": F.count(F.lit(1))}, gap="10 minutes", keys=["user_id"])
    got = {(r["user_id"], r["n"]) for r in out.collect()}
    assert got == {(1, 2), (1, 1), (2, 1)}
    # session end = last event + gap
    first = out.filter((F.col("user_id") == 1) & (F.col("n") == 2)).collect()[0]
    assert first["window_end"] - first["window_start"] == 5 * 60 + 10 * 60


def test_running_totals_stream_matches_batch_groupby(spark, batch):
    sdf = running_totals_stream(read_events_stream(spark, EVENTS))
    got = run_to_memory(sdf, "t_state", output_mode="update")
    # update mode re-emits a key per trigger; keep the last emission per key
    got = got.groupBy("user_id").agg(
        F.max("n").alias("n"), F.max("total").alias("total")
    )
    want = batch.groupBy("user_id").agg(
        F.count("value").alias("n"), F.round(F.sum("value"), 6).alias("total")
    )
    assert rows(got, None) == rows(want, None)


def test_stream_dedup(spark, batch):
    sdf = stream_dedup(read_events_stream(spark, EVENTS), ["user_id", "event_type"])
    got = run_to_memory(sdf, "t_dedup", output_mode="append")
    assert got.count() == batch.dropDuplicates(["user_id", "event_type"]).count()


def test_stream_enrich_matches_batch(spark, batch):
    from seafan_spark.streaming import stream_enrich

    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.5), ("purchase", 10.0)],
        "event_type string, weight double",
    )

    def build(src):
        e = stream_enrich(src.select("event_id", "event_type"), dim, on="event_type")
        return e.select("event_id", "weight")

    want = build(batch)
    got = run_to_memory(build(read_events_stream(spark, EVENTS)), "t_enrich",
                        output_mode="append")
    assert rows(got, None) == rows(want, None)
    # left join: known types enriched, unknown types carried with NULL
    assert want.filter(F.col("weight").isNotNull()).count() > 0
    assert want.count() == batch.count()


def test_running_totals_state_reentry():
    # GroupState.get is a property; the fold must work when state EXISTS
    # (second micro-batch / restart) — regression for state.get() crash
    import pandas as pd

    from seafan_spark.streaming import _running_totals_fn

    class StubState:
        exists = True
        get = (2, 10.0)

        def update(self, v):
            self.updated = v

    st = StubState()
    out = list(_running_totals_fn((7,), iter([pd.DataFrame({"value": [1.0, 2.0]})]), st))
    assert st.updated == (4, 13.0)
    assert out[0]["n"][0] == 4 and out[0]["total"][0] == 13.0


def test_running_totals_string_key(spark, batch):
    from seafan_spark.streaming import read_events_stream, run_to_memory, running_totals_stream

    sdf = running_totals_stream(
        read_events_stream(spark, EVENTS), key="event_type", value="value"
    )
    got = run_to_memory(sdf, "t_rt_str", output_mode="update")
    want = {
        (r["event_type"], r["n"])
        for r in batch.groupBy("event_type").agg(
            F.count("value").alias("n")
        ).collect()
    }
    have = {(r["user_id"], r["n"]) for r in got.collect()}
    assert want <= have  # every key's final totals present


# ---------------------------------------------------------------------------
# streaming near-dup ingestion against a persisted signature store
# ---------------------------------------------------------------------------


def _dup_docs(spark, tmpdir):
    """Two source files -> two micro-batches. Planted dups: (1, 2) inside
    file 1; doc 103 in file 2 duplicates doc 3 from file 1 (cross-batch,
    against the store)."""
    import time as _t

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    # disjoint vocabularies per doc: no accidental near-dups
    uniq = lambda i: " ".join(f"tok{i}x{j}q" for j in range(40))  # noqa: E731
    f1 = [(1, base + " twin one"), (2, base + " twin one"), (3, uniq(3)), (4, uniq(44)), (5, uniq(555))]
    f2 = [(101, uniq(1010)), (102, uniq(2022)), (103, uniq(3))]
    src = f"{tmpdir}/docs"
    spark.createDataFrame(f1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _t.sleep(1.1)  # distinct mtimes -> file 1 forms the first micro-batch
    spark.createDataFrame(f2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    return src, f1 + f2


def test_stream_dedup_ingest_matches_batch(spark, tmp_path):
    from seafan_spark.llmops.dedup import minhash_pairs_incremental
    from seafan_spark.streaming import stream_dedup_ingest

    src, all_rows = _dup_docs(spark, str(tmp_path))
    store, pairs_out = f"{tmp_path}/store", f"{tmp_path}/pairs"
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_dedup_ingest(
        sdf, store, pairs_out, num_hashes=32, bands=4, threshold=0.5
    )
    got = sorted(
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_out).collect()
    )
    assert got == [(1, 2), (3, 103)]
    # the store holds one signature per ingested doc
    sig = spark.read.parquet(store)
    assert sig.count() == len(all_rows)
    assert sorted(r["_id"] for r in sig.collect()) == sorted(r[0] for r in all_rows)
    # batch twin: one incremental pass of everything against an empty store
    batch = spark.read.parquet(src)
    want = minhash_pairs_incremental(
        batch,
        spark.createDataFrame([], sig.schema),
        "doc_id",
        "text",
        num_hashes=32,
        bands=4,
        threshold=0.5,
        check_store=False,
    )
    assert sorted((r["id_a"], r["id_b"]) for r in want.collect()) == got


def test_stream_dedup_ingest_keep_first(spark, tmp_path):
    from seafan_spark.streaming import stream_dedup_ingest

    src, _ = _dup_docs(spark, str(tmp_path))
    store, pairs_out = f"{tmp_path}/store", f"{tmp_path}/pairs"
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_dedup_ingest(
        sdf, store, pairs_out, num_hashes=32, bands=4, threshold=0.5, keep_dups=False
    )
    kept = sorted(r["_id"] for r in spark.read.parquet(store).collect())
    # dup ids 2 (of 1) and 103 (of 3) are kept OUT of the store
    assert kept == [1, 3, 4, 5, 101, 102]


def test_stream_dedup_ingest_keep_first_smaller_new_id(spark, tmp_path):
    """Keep-FIRST, not keep-lowest-id: a new doc whose id is SMALLER than
    its store match is still the later arrival and must stay out of the
    store. The old id_b-only rule let it slip in (round-3 ADVICE item 3)."""
    import time as _t

    from seafan_spark.streaming import stream_dedup_ingest

    uniq = lambda i: " ".join(f"tok{i}x{j}q" for j in range(40))  # noqa: E731
    src = f"{tmp_path}/docs"
    # batch 1: doc 50 ingested first
    spark.createDataFrame([(50, uniq(9)), (60, uniq(77))], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    _t.sleep(1.1)
    # batch 2: doc 7 duplicates stored doc 50 (7 < 50) and doc 8 is clean
    spark.createDataFrame([(7, uniq(9)), (8, uniq(88))], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    store, pairs_out = f"{tmp_path}/store", f"{tmp_path}/pairs"
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_dedup_ingest(
        sdf, store, pairs_out, num_hashes=32, bands=4, threshold=0.5, keep_dups=False
    )
    got = sorted((r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_out).collect())
    assert got == [(7, 50)]
    kept = sorted(r["_id"] for r in spark.read.parquet(store).collect())
    assert kept == [8, 50, 60]  # the store copy (50) wins; 7 stays out


def test_stream_upsert_ingest_matches_batch(spark, tmp_path):
    """Store state == cdc.latest_state over everything ingested, with
    keys updated, inserted, and deleted across micro-batches."""
    from seafan_spark.cdc import latest_state
    from seafan_spark.streaming import stream_upsert_ingest, upsert_store_state

    src = f"{tmp_path}/changes"
    b1 = [(1, 10, "a", "upsert"), (2, 10, "b", "upsert"), (3, 10, "c", "upsert")]
    b2 = [(2, 20, "B", "upsert"), (3, 20, "c", "delete"), (4, 20, "d", "upsert")]
    schema = "k long, ts long, v string, op string"
    import time as _t

    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    _t.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    store = f"{tmp_path}/store"
    sdf = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    stream_upsert_ingest(sdf, store, ["k"], "ts", op_col="op")
    got = sorted(
        (r["k"], r["ts"], r["v"]) for r in upsert_store_state(spark, store).collect()
    )
    assert got == [(1, 10, "a"), (2, 20, "B"), (4, 20, "d")]
    # batch twin over the union of all batches
    want = sorted(
        (r["k"], r["ts"], r["v"])
        for r in latest_state(
            spark.read.parquet(src), ["k"], "ts", op_col="op"
        ).collect()
    )
    assert got == want


def test_stream_upsert_ingest_out_of_order_batches(spark, tmp_path):
    """Tombstones make the store order-independent: a LATE batch carrying
    an OLDER upsert for a newer-deleted key must not resurrect it, and an
    older update must not clobber a newer one."""
    from seafan_spark.streaming import stream_upsert_ingest, upsert_store_state

    src = f"{tmp_path}/changes"
    schema = "k long, ts long, v string, op string"
    import time as _t

    # batch 1 holds the LATER events; batch 2 arrives late with older ones
    b1 = [(1, 30, "x", "delete"), (2, 30, "NEW", "upsert")]
    b2 = [(1, 10, "ghost", "upsert"), (2, 10, "OLD", "upsert"), (3, 10, "z", "upsert")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    _t.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    store = f"{tmp_path}/store"
    sdf = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    stream_upsert_ingest(sdf, store, ["k"], "ts", op_col="op")
    got = sorted(
        (r["k"], r["ts"], r["v"]) for r in upsert_store_state(spark, store).collect()
    )
    # key 1: delete@30 beats upsert@10 (no resurrection); key 2: NEW@30
    # survives OLD@10; key 3: plain insert
    assert got == [(2, 30, "NEW"), (3, 10, "z")]
