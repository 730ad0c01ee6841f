"""Structured Streaming operators over the events stream.

The reference has no streaming surface at all (SURVEY §2.12) — this module
is north-star extension territory, designed Spark-first:

- every windowing operator here is **mode-agnostic**: it takes a DataFrame
  that may be a batch read or a ``readStream`` and emits the same logical
  plan, so the batch twin *is* the correctness oracle for the stream;
- event time rides a real column (``ts``), never arrival order; late data
  is bounded with ``withWatermark`` so state stores stay finite at scale;
- the only stateful custom operator (per-key running totals) uses
  ``applyInPandasWithState`` — Arrow-batched, partitioned by key, state
  size O(distinct keys), never O(rows).

At 100 TB / 1000 executors: tumbling/sliding/session aggregations shuffle
once on (key, window) with partial aggregation map-side; watermarks bound
the state store; ``maxFilesPerTrigger`` paces source ingestion.
"""

from __future__ import annotations

import tempfile
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_TIME = "_event_time"


def ensure_event_time(df: DataFrame, ts_col: str = "ts", out: str = EVENT_TIME) -> DataFrame:
    """Attach a TimestampType event-time column.

    Handles a native timestamp, TIMESTAMP_NTZ (parquet micros with
    isAdjustedToUTC=false), and the bigint-nanoseconds form produced by
    ``spark.sql.legacy.parquet.nanosAsLong`` — all converted to the same
    UTC instant DuckDB/pandas see (``temporal.epoch_us_col``).
    """
    from seafan_spark.temporal import epoch_us_col

    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.TimestampType):
        c = F.col(ts_col)
    else:
        # bigint nanos or TIMESTAMP_NTZ -> exact epoch-micros (TZ-free,
        # wall time treated as UTC like DuckDB/pandas) -> instant
        c = F.timestamp_micros(epoch_us_col(df, ts_col))
    return df.withColumn(out, c)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over parquet. ``schema`` defaults to the batch
    footer schema (streaming file sources require an explicit schema).

    The streaming file source wants a *directory* to monitor; a path to a
    single ``<table>.parquet`` file is rewritten to its parent directory
    plus a ``pathGlobFilter``, so the testdata layout (one file per table
    in a shared dir) streams cleanly."""
    import os

    from seafan_spark.sources import read_parquet

    if schema is None:
        # read_parquet also sets the nanosAsLong conf the stream read needs
        schema = read_parquet(spark, path).schema
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def _finish_window(grouped, aggs: dict[str, Column], keys: Sequence[str]) -> DataFrame:
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.unix_timestamp(F.col("_w.start")).alias("window_start"),
        F.unix_timestamp(F.col("_w.end")).alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def tumbling_agg(
    df: DataFrame,
    aggs: dict[str, Column],
    window: str = "1 hour",
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation. Works identically on a batch
    DataFrame (oracle path) and a streaming one (pass ``watermark`` for
    append-mode emission). Window bounds come out as epoch-second bigints —
    timezone-unambiguous on both engines."""
    d = ensure_event_time(df, ts_col)
    if watermark is not None and d.isStreaming:
        d = d.withWatermark(EVENT_TIME, watermark)
    g = d.groupBy(F.window(EVENT_TIME, window).alias("_w"), *keys)
    return _finish_window(g, aggs, keys)


def sliding_agg(
    df: DataFrame,
    aggs: dict[str, Column],
    window: str = "1 hour",
    slide: str = "15 minutes",
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows; each event lands in
    window/slide overlapping windows."""
    d = ensure_event_time(df, ts_col)
    if watermark is not None and d.isStreaming:
        d = d.withWatermark(EVENT_TIME, watermark)
    g = d.groupBy(F.window(EVENT_TIME, window, slide).alias("_w"), *keys)
    return _finish_window(g, aggs, keys)


def sessionize(
    df: DataFrame,
    aggs: dict[str, Column],
    gap: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: a session extends while consecutive events per key
    arrive within ``gap``; session end = last event + gap
    (``F.session_window`` semantics — a new session starts when the
    inter-event gap is >= ``gap``)."""
    d = ensure_event_time(df, ts_col)
    if watermark is not None and d.isStreaming:
        d = d.withWatermark(EVENT_TIME, watermark)
    g = d.groupBy(F.session_window(F.col(EVENT_TIME), gap).alias("_w"), *keys)
    return _finish_window(g, aggs, keys)


def stream_dedup(
    df: DataFrame,
    subset: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon
    (``dropDuplicatesWithinWatermark``): state is bounded by the watermark,
    so this holds at unbounded stream length."""
    d = ensure_event_time(df, ts_col)
    if d.isStreaming:
        d = d.withWatermark(EVENT_TIME, watermark)
        return d.dropDuplicatesWithinWatermark(list(subset))
    return d.dropDuplicates(list(subset))


def stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    ts_col: str = "ts",
    before: str = "1 hour",
    after: str = "0 seconds",
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Event-time interval join, mode-agnostic: right rows with event
    time in ``[left - before, left + after]`` per key.

    Streaming mode is a real stream-stream inner join: both sides get
    watermarks, and the explicit time-range predicate is what lets Spark
    bound the join state store (right rows expire once the left
    watermark passes ``right + before``). Batch mode emits the same
    logical plan — an equi-join on the key with a range condition — so
    the batch result is the stream's correctness oracle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = ensure_event_time(left, ts_col, "_lt")
    r = ensure_event_time(right, ts_col, "_rt")
    if l.isStreaming:
        l = l.withWatermark("_lt", watermark)
    if r.isStreaming:
        r = r.withWatermark("_rt", watermark)
    # rename the right side's keys and colliding columns: the time-range
    # predicate must live IN the join condition (Spark derives the
    # state-expiry watermark from it; a post-filter would leave the
    # stream-stream state unbounded), so the join is by expression
    for c in right.columns:
        if c in keys:
            r = r.withColumnRenamed(c, c + "__rk")
        elif c in left.columns:
            r = r.withColumnRenamed(c, c + suffix)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(k + "__rk"))
    cond = cond & F.col("_rt").between(
        F.col("_lt") - F.expr(f"INTERVAL {before}"),
        F.col("_lt") + F.expr(f"INTERVAL {after}"),
    )
    out = l.join(r, cond, "inner")
    return out.drop("_lt", "_rt", *[k + "__rk" for k in keys])


# ------------------------------------------------------------------------
# Custom stateful operator: per-key running totals
# ------------------------------------------------------------------------

_STATE_SCHEMA = "n BIGINT, total DOUBLE"
_RUNNING_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _running_totals_fn(key, pdf_iter, state):
    """Fold each Arrow batch for one key into (count, sum) state and emit
    the updated running totals once per trigger."""
    # GroupState.get is a PROPERTY in pyspark (calling it would invoke the
    # state tuple itself and crash on the second trigger for any key)
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += int(pdf["value"].count())
        total += float(pdf["value"].sum())
    state.update((n, total))
    import pandas as pd

    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [round(total, 6)]})


def running_totals_stream(df: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """Per-key cumulative (count, sum) maintained in the state store —
    the canonical ``applyInPandasWithState`` shape: grouped by key,
    Arrow-batched input, O(keys) state. Batch equivalent:
    ``df.groupBy(key).agg(count, sum)``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # the output key field's type follows the input key column (a
    # hardcoded LongType would fail at Arrow conversion for string keys)
    out_schema = T.StructType(
        [
            T.StructField("user_id", df.schema[key].dataType),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    return (
        df.select(F.col(key).alias("user_id"), F.col(value).alias("value"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming plan to completion (``availableNow`` trigger —
    process everything currently in the source, then stop) into an
    in-memory table and return it as a DataFrame. Test/dev harness; real
    deployments point writeStream at kafka/parquet/delta instead."""
    import shutil

    ckpt = tempfile.mkdtemp(prefix="seafan_stream_ckpt_")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"stream {name} did not finish in {timeout_sec}s")
        # the memory sink holds the rows; the checkpoint is transient state
        return sdf.sparkSession.table(name)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def stream_dedup_ingest(
    stream_docs: DataFrame,
    store_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.5,
    portable: bool = False,
    keep_dups: bool = True,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming near-duplicate ingestion against a persisted MinHash
    signature store (``foreachBatch`` + ``llmops.dedup``).

    Per micro-batch: shingle/sign ONLY the arriving documents, band them
    against the parquet signature store at ``store_path`` (store docs are
    never re-shingled), append the discovered pairs (new-vs-store and
    new-vs-new, ``id_a < id_b``) to ``pairs_path``, and append the new
    signatures to the store so later batches dedupe against them. With
    ``keep_dups=False`` a new document already matched to an earlier one
    is NOT added to the store (keep-first ingestion policy).

    Why ``foreachBatch`` and not a streaming state store: the dedup state
    is the whole corpus's signature table — O(corpus) and queryable by
    band join, which is exactly what a parquet table is for; streaming
    state stores are for per-key state that fits executors. At scale the
    same loop runs with the store bucketed by band key.

    Delivery note: parquet appends are at-least-once under micro-batch
    retries — production deployments should write both sinks through a
    transactional table format (or key the append on ``batch_id``) for
    exactly-once; this harness targets the ``availableNow`` test/dev
    shape. Runs the query to completion (availableNow) and returns."""
    import shutil

    from seafan_spark.llmops.dedup import (
        minhash_pairs_incremental,
        minhash_signatures,
    )

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_dedup_ckpt_")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new_sig = minhash_signatures(
            batch_df, id_col, text_col, num_hashes, shingle_k, portable
        ).localCheckpoint(eager=True)
        try:
            store = spark.read.parquet(store_path)
        except Exception:  # first batch: no store yet
            store = spark.createDataFrame([], new_sig.schema)
        pairs = minhash_pairs_incremental(
            batch_df,
            store,
            id_col,
            text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
            portable=portable,
            check_store=False,  # the store is our own append lineage
            new_sig=new_sig,
        ).localCheckpoint(eager=True)
        pairs.write.mode("append").parquet(pairs_path)
        to_add = new_sig
        if not keep_dups:
            # keep-first: a new doc that matched anything earlier stays out
            # of the store. "Earlier" = ANY stored doc (the store copy wins
            # regardless of id order — a new doc with a SMALLER id than its
            # store match is still the later arrival), or a lower-id doc in
            # this same batch. Taking only id_b would implement
            # keep-lowest-id and let the new side of a (new, store) pair
            # with new_id < store_id slip into the store.
            #
            # Scale shape: pairs hold ONLY new-vs-store and new-vs-new
            # sides, so "partner is in the store" == "partner is not in
            # this batch" — resolved against the batch's own (small,
            # broadcast) id set, NEVER by scanning the O(corpus) store.
            new_ids = new_sig.select(F.col("_id").alias("_other"))
            sided = pairs.select(
                F.col("id_a").alias("_id"), F.col("id_b").alias("_other")
            ).union(
                pairs.select(F.col("id_b").alias("_id"), F.col("id_a").alias("_other"))
            )
            vs_store = sided.join(F.broadcast(new_ids), "_other", "left_anti").select("_id")
            within_batch = pairs.select(F.col("id_b").alias("_id"))
            dup_new = vs_store.union(within_batch).distinct()
            to_add = to_add.join(F.broadcast(dup_new), "_id", "left_anti")
        # re-ingested ids keep their original store row (append-only).
        # NOTE the store is the BIG side here, so no broadcast hint — the
        # anti-join shuffles on _id (AQE may still broadcast a small store)
        if store.isEmpty():
            to_add.write.mode("append").parquet(store_path)
        else:
            to_add.join(store.select("_id"), "_id", "left_anti").write.mode(
                "append"
            ).parquet(store_path)

    try:
        q = (
            stream_docs.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"dedup ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def stream_embed_ingest(
    stream_vecs: DataFrame,
    store_path: str,
    pairs_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    planes: int = 16,
    seed: int = 42,
    probe_bits: int = 1,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming embedding near-duplicate ingestion against a persisted
    vector store — the ANN twin of :func:`stream_dedup_ingest`. Per
    micro-batch: normalize + hyperplane-bucket ONLY the arriving vectors,
    join them (with multi-probe flips) against the store's persisted
    bucket keys, append discovered pairs (new-vs-store and new-vs-new) to
    ``pairs_path``, and append the prepared rows to the store so later
    batches match against them. Store rows are never re-normalized or
    re-bucketed. Same at-least-once append caveat as the dedup ingest."""
    import shutil

    from seafan_spark.llmops.dedup import (
        embedding_neardup_incremental,
        embedding_store_prepare,
    )

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_embed_ckpt_")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prepared = embedding_store_prepare(
            batch_df, id_col, vec_col, dim, planes, seed
        ).localCheckpoint(eager=True)
        try:
            store = spark.read.parquet(store_path)
        except Exception:  # first batch: no store yet (append-mode sink)
            store = spark.createDataFrame([], prepared.schema)
        pairs = embedding_neardup_incremental(
            batch_df,
            store,
            id_col,
            vec_col,
            dim,
            threshold=threshold,
            planes=planes,
            seed=seed,
            probe_bits=probe_bits,
            new_prepared=prepared,
        ).localCheckpoint(eager=True)
        pairs.write.mode("append").parquet(pairs_path)
        # re-ingested ids keep their original store row (append-only)
        if store.isEmpty():
            prepared.write.mode("append").parquet(store_path)
        else:
            prepared.join(store.select("_id"), "_id", "left_anti").write.mode(
                "append"
            ).parquet(store_path)

    try:
        q = (
            stream_vecs.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"embed ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def stream_sketch_ingest(
    stream_df: DataFrame,
    store_path: str,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming maintenance of a mergeable histogram sketch table
    (``foreachBatch`` + ``histogram``): per micro-batch, sketch ONLY the
    arriving rows (one scan of the batch), merge with the persisted
    sketch table at ``store_path`` (kilobytes — counts add, extrema
    combine), and rewrite the store. Because the merge is exact, the
    store always equals the sketch of every row ingested so far, so any
    later quantile/histogram question over the full history reads sketch
    rows, never re-scanning the stream's accumulated facts.

    Same state-shape rationale as :func:`stream_dedup_ingest`: the state
    is a queryable TABLE (group x bucket), which is what parquet is for —
    not per-key executor state. The merged result is localCheckpointed
    before the overwrite so the store is never read and rewritten in the
    same job. Overwrite-per-batch is idempotent under micro-batch retries
    for a re-run of the SAME batch (the merge of already-merged rows with
    the same batch again would double-count — production deployments
    should key batches by ``batch_id`` in a transactional table; this
    harness targets the ``availableNow`` test/dev shape)."""
    import shutil

    from seafan_spark.histogram import histogram_rollup, histogram_sketch_table

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_sketch_ckpt_")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_hist = histogram_sketch_table(
            batch_df, group_cols, value_col, lo, hi, nbins
        )
        # distinguish "first batch, no store yet" from a real read failure:
        # this sink OVERWRITES, so treating a transient store-read error as
        # first-batch would silently replace the whole history with one
        # batch's sketch (the append-mode dedup ingest above can afford a
        # loose except; this one cannot)
        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(store_path)
            merged = histogram_rollup(
                store.unionByName(batch_hist), group_cols
            )
        except AnalysisException as ex:
            if "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = batch_hist
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(store_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"sketch ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def stream_heavy_hitters_ingest(
    stream_df: DataFrame,
    store_path: str,
    item_col: str,
    width: int = 4096,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming maintenance of a Misra–Gries heavy-hitter summary
    (``foreachBatch`` + ``sketches``): per micro-batch, summarize ONLY
    the arriving rows (one bounded-memory pass), merge with the
    persisted summary at ``store_path`` (<= width+1 slim rows —
    estimates add, one decrement re-compresses), and rewrite the store.

    The mergeable-summaries bound survives every merge: against the
    ALL-TIME item count n, any item with true count > n/(width+1) is in
    the store and its estimate undercounts by at most n/(width+1) — so
    "what tokens/domains/urls dominate the stream so far" is answered by
    reading kilobytes (``sketches.heavy_hitters_from_summary``), never
    re-scanning the accumulated stream. Same strict first-batch handling
    as :func:`stream_sketch_ingest`: this sink overwrites, so only a
    PATH_NOT_FOUND counts as "no store yet"."""
    import shutil

    from seafan_spark.sketches import merge_mg_summaries, misra_gries_summary

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_hh_ckpt_")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sum = misra_gries_summary(batch_df, item_col, width)
        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(store_path)
            merged = merge_mg_summaries(store, batch_sum, width)
        except AnalysisException as ex:
            if "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = batch_sum
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(store_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"heavy-hitter ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def stream_upsert_ingest(
    stream_changes: DataFrame,
    store_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming MERGE-INTO maintenance of a current-state table
    (``foreachBatch`` + ``cdc``): per micro-batch, compact the arriving
    changes to their latest row per key and fold them into the snapshot
    store at ``store_path`` — the streaming twin of ``cdc.apply_changes``.

    Out-of-order tolerance via TOMBSTONES: the store keeps deleted keys
    as rows flagged ``_del`` (with the delete's event time) instead of
    physically removing them, and a change only wins against the stored
    row when its event time is >= the stored one. A late-arriving older
    upsert therefore cannot resurrect a newer delete, and the store state
    equals ``cdc.latest_state`` over ALL changes ingested so far for ANY
    batch partitioning and arrival order (exact when ``ts_col`` is unique
    per key — cross-batch ties resolve in favor of the arriving change;
    pytest proves shuffled-batch == one-shot-batch). Read the visible
    state back with :func:`upsert_store_state`.

    Same state-shape rationale as the other ingest loops: the state is a
    queryable keyed TABLE (what parquet is for), not per-key executor
    state; at scale the store is key-bucketed so the per-batch merge join
    is co-located. The merged store is localCheckpointed before the
    overwrite so it is never read and rewritten in the same job;
    overwrite-per-batch has the same at-least-once caveat as
    :func:`stream_sketch_ingest`."""
    import shutil

    from seafan_spark.cdc import latest_state

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_upsert_ckpt_")
    keys = list(key_cols)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # compact the batch KEEPING deletes as flagged rows (latest_state
        # would drop them; the store needs the tombstone + its ts)
        flagged = batch_df.withColumn(
            "_del",
            (F.col(op_col) == F.lit(delete_op)) if op_col else F.lit(False),
        )
        if op_col:
            flagged = flagged.drop(op_col)
        top = latest_state(flagged, keys, ts_col)
        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(store_path)
            # one full-outer join per batch; arriving change wins iff its
            # event time >= the stored row's (late old changes lose)
            s = store.alias("s")
            c = top.alias("c")
            payload = [col for col in store.columns if col not in keys]
            take_change = F.col(f"c.{ts_col}").isNotNull() & (
                F.col(f"s.{ts_col}").isNull()
                | (F.col(f"c.{ts_col}") >= F.col(f"s.{ts_col}"))
            )
            merged = s.join(c, keys, "full_outer").select(
                *keys,
                *[
                    F.when(take_change, F.col(f"c.{col}"))
                    .otherwise(F.col(f"s.{col}"))
                    .alias(col)
                    for col in payload
                ],
            )
        except AnalysisException as ex:
            if "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = top
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(store_path)

    try:
        q = (
            stream_changes.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"upsert ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def upsert_store_state(spark: SparkSession, store_path: str) -> DataFrame:
    """Visible current state of a :func:`stream_upsert_ingest` store:
    tombstoned keys filtered out, the ``_del`` flag dropped — the exact
    schema and content of ``cdc.latest_state`` over everything ingested."""
    store = spark.read.parquet(store_path)
    return store.filter(~F.col("_del")).drop("_del")


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    suffix: str = "_d",
) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) fact against
    a static dimension table, dimension side broadcast — the standard
    lookup-enrichment shape. No watermark or state store involved: the
    static side is re-read per micro-batch (picking up slowly-changing
    dimension updates between triggers), and the broadcast keeps the
    stream side from ever shuffling. Mode-agnostic: a batch ``stream``
    emits the identical plan, so the batch twin is the stream's
    correctness oracle."""
    keys = [on] if isinstance(on, str) else list(on)
    d = dim
    for c in dim.columns:
        if c not in keys and c in stream.columns:
            d = d.withColumnRenamed(c, c + suffix)
    return stream.join(F.broadcast(d), on=keys, how=how)


def stream_line_counts_ingest(
    stream_df: DataFrame,
    store_path: str,
    text_col: str = "text",
    sep: str = "\n",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming maintenance of the corpus line-frequency store behind
    :func:`seafan_spark.llmops.dedup.drop_common_lines` (CCNet
    boilerplate removal): per micro-batch, count ONLY the arriving
    documents' lines (explode + groupBy of the batch), merge by summing
    into the persisted (line_hash, c) table at ``store_path``, rewrite.
    Counts add, so the store always equals the line counts of every
    document ingested so far — the boilerplate set for cleaning any
    future batch is one filter over this table, never a corpus rescan.

    State shape: a queryable TABLE of (md5 line hash, count) —
    vocabulary-of-lines sized, not corpus sized; same overwrite/
    idempotency caveats as :func:`stream_sketch_ingest`."""
    import shutil

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_lines_ckpt_")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        parts = F.split(F.col(text_col), "\\Q" + sep + "\\E", -1)
        batch_counts = (
            batch_df.select(F.explode(parts).alias("_line"))
            .groupBy(F.md5(F.col("_line")).alias("_lh"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(store_path)
            merged = (
                store.unionByName(batch_counts)
                .groupBy("_lh")
                .agg(F.sum("c").alias("c"))
            )
        except AnalysisException as ex:
            if "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = batch_counts
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(store_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"line-count ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def stream_seasonal_ingest(
    stream_df: DataFrame,
    store_path: str,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour_of_week",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming maintenance of the seasonal-baseline store behind
    ``temporal.seasonal_residuals``: per micro-batch, compute the
    arriving rows' (keys, bucket, n, s, s2) moments and MERGE by
    summing into the persisted store — moments add exactly, so the
    store always equals the batch moments of everything ingested, and
    scoring a new window against history is one broadcast join of
    ``temporal.profile_from_moments(store)``.

    Same state shape and overwrite/idempotency caveats as
    :func:`stream_sketch_ingest` (a |keys| x cells TABLE, kilobytes
    per key)."""
    import shutil

    from seafan_spark.temporal import seasonal_moments

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_seasonal_ckpt_")
    key_list = list(keys)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_m = seasonal_moments(batch_df, key_list, ts_col, value_col, bucket)
        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(store_path)
            merged = (
                store.unionByName(batch_m)
                .groupBy(*key_list, "bucket")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("s").alias("s"),
                    F.sum("s2").alias("s2"),
                )
            )
        except AnalysisException as ex:
            if "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = batch_m
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(store_path)

    try:
        q = (
            stream_df.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"seasonal ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)


def stream_cms_ingest(
    stream_df: DataFrame,
    store_path: str,
    item_col: str,
    keys: Sequence[str] = (),
    depth: int = 4,
    width: int = 1024,
    portable: bool = False,
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> None:
    """Streaming maintenance of a count-min sketch store
    (:func:`sketches.cms_build` cells): per micro-batch, sketch ONLY the
    arriving rows and MERGE by summing cells into the persisted store —
    CMS cells add exactly (the same mergeability as the seasonal-moment
    store above), so the store always equals ``cms_build`` over
    everything ever ingested, and point-frequency questions
    (:func:`sketches.cms_estimate`) are answered from the kilobyte store
    without rescanning history. depth/width/portable must match across
    the store's lifetime (cells from different geometries don't merge).

    Same state shape and overwrite/idempotency caveats as
    :func:`stream_sketch_ingest`: state is a
    <= groups x depth x width cell TABLE, never a streaming state
    store."""
    import shutil

    from seafan_spark.session import unpersist_checkpoint
    from seafan_spark.sketches import cms_build, cms_merge

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="seafan_cms_ckpt_")
    key_list = list(keys)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_cells = cms_build(
            batch_df, item_col, keys=key_list,
            depth=depth, width=width, portable=portable,
        )
        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(store_path)
            merged = cms_merge(store, batch_cells, keys=key_list)
        except AnalysisException as ex:
            if "PATH_NOT_FOUND" not in str(ex):
                raise
            merged = batch_cells
        # materialize BEFORE the overwrite (the plan reads the same path),
        # then free the scratch blocks once the write lands
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(store_path)
        unpersist_checkpoint(merged)

    try:
        q = (
            stream_df.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"cms ingest did not finish in {timeout_sec}s")
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
