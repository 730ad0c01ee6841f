"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2),
each built through the seafan_spark engine API (Pipeline / expression
language / encode / agg), not raw Spark SQL — so the correctness gate
exercises the engine itself.
``oracle_sql()`` — DuckDB twins. Aggregate outputs are rounded (2dp money,
6dp ratios) on BOTH sides so order-of-accumulation float noise cannot flip
the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seafan_spark.agg import group_by, top_k
from seafan_spark.encode import append_cat, cat_code_col, fit_levels, fit_normalize, normalized_col
from seafan_spark.exprlang import add_to_pipe
from seafan_spark.ftypes import FParam, FType, FRole
from seafan_spark.pipeline import Pipeline
from seafan_spark.sources import parquet_to_pipe


def _pipe(spark: SparkSession, sf_dir: str, table: str, order_cols=None) -> Pipeline:
    return parquet_to_pipe(spark, f"{sf_dir}/{table}.parquet", order_cols=order_cols)


# --------------------------------------------------------------------------
# queries — each (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def q_where_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline.where + keep (gdata.go:897-969, 633-649)."""
    p = _pipe(spark, sf_dir, "lineitem")
    p = p.where("l_returnflag", ["A", "R"]).keep(
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
    )
    return p.df.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (agg.group_by)."""
    p = _pipe(spark, sf_dir, "lineitem")
    p = add_to_pipe(p, "l_extendedprice*(1-l_discount)", "disc_price")
    out = group_by(
        p,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.round(F.sum("l_quantity"), 2),
            "sum_base_price": F.round(F.sum("l_extendedprice"), 2),
            "sum_disc_price": F.round(F.sum("disc_price"), 2),
            "avg_disc": F.round(F.avg("l_discount"), 6),
            "count_order": F.count(F.lit(1)),
        },
    )
    return out


def q_expr_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression language: if / comparison 0-1 semantics / arithmetic."""
    p = _pipe(spark, sf_dir, "lineitem")
    p = add_to_pipe(
        p, "if(l_discount>0.05, l_extendedprice*(1-l_discount), l_extendedprice)", "net_price"
    )
    p = add_to_pipe(p, "(l_quantity>25) + (l_tax>=0.04)", "flags")
    return p.df.select(
        "l_orderkey",
        "l_linenumber",
        F.round("net_price", 4).alias("net_price"),
        F.col("flags").cast("double").alias("flags"),
    )


def q_expr_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-column summary functions (EvalSFunction, parser.go:726-792)."""
    p = _pipe(spark, sf_dir, "lineitem")
    for expr, name in [
        ("sum(l_quantity)", "sum_qty"),
        ("mean(l_extendedprice)", "mean_price"),
        ("std(l_discount)", "std_disc"),
        ("max(l_shipdate)", "max_ship"),
        ("count(l_orderkey)", "n"),
    ]:
        p = add_to_pipe(p, expr, name)
    return (
        p.df.select(
            F.round("sum_qty", 2).alias("sum_qty"),
            F.round("mean_price", 4).alias("mean_price"),
            F.round("std_disc", 6).alias("std_disc"),
            F.col("max_ship").alias("max_ship"),
            F.col("n").cast("bigint").alias("n"),
        )
        .limit(1)
    )


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key inner join, left-wins semantics (gdata.go:1168-1296)."""
    orders = _pipe(spark, sf_dir, "orders")
    cust = _pipe(spark, sf_dir, "customer").rename({"c_custkey": "o_custkey"})
    j = orders.join(cust, "o_custkey", "inner", broadcast_right=True)
    return j.df.select(
        "o_orderkey",
        "o_custkey",
        "c_mktsegment",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q_join_left_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join with seafan default-fill: missing side gets defaults, not
    NULLs (getMiss, gdata.go:1322-1344)."""
    cust = _pipe(spark, sf_dir, "customer")
    orders = _pipe(spark, sf_dir, "orders").rename({"o_custkey": "c_custkey"})
    j = cust.join(orders.keep(["c_custkey", "o_totalprice", "o_orderstatus"]), "c_custkey", "left")
    out = j.df.select(
        "c_custkey",
        "c_name",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderstatus",
    )
    return out


def q_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region ⋈ nation ⋈ customer rollup (broadcast dims)."""
    region = _pipe(spark, sf_dir, "region").rename({"r_regionkey": "n_regionkey"})
    nation = _pipe(spark, sf_dir, "nation")
    cust = _pipe(spark, sf_dir, "customer").rename({"c_nationkey": "n_nationkey"})
    n_r = nation.join(region, "n_regionkey", "inner", broadcast_right=True)
    c_n_r = cust.join(n_r, "n_nationkey", "inner", broadcast_right=True)
    return group_by(
        c_n_r,
        ["r_name"],
        {"n_cust": F.count(F.lit(1)), "acctbal": F.round(F.sum("c_acctbal"), 2)},
    )


def q_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical union by name (Append, pipeline.go:429-464)."""
    li = _pipe(spark, sf_dir, "lineitem")
    a = li.where("l_returnflag", ["A"]).keep(["l_orderkey", "l_linenumber", "l_quantity"])
    r = li.where("l_returnflag", ["R"]).keep(["l_orderkey", "l_linenumber", "l_quantity"])
    return a.append(r).df.select("l_orderkey", "l_linenumber", "l_quantity")


def q_expr_datefns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions: year/month/day, dateAdd, dateDiff, month boundaries."""
    p = _pipe(spark, sf_dir, "orders")
    for expr, name in [
        ("year(o_orderdate)", "yr"),
        ("month(o_orderdate)", "mo"),
        ("day(o_orderdate)", "dy"),
        ("dateAdd(o_orderdate, 3)", "plus3m"),
        ("dateDiff(toLastDayOfMonth(o_orderdate), toFirstDayOfMonth(o_orderdate), 'day')", "mdays"),
    ]:
        p = add_to_pipe(p, expr, name)
    return p.df.select(
        "o_orderkey",
        F.col("yr").cast("bigint").alias("yr"),
        F.col("mo").cast("bigint").alias("mo"),
        F.col("dy").cast("bigint").alias("dy"),
        F.col("plus3m").cast("date").alias("plus3m"),
        F.col("mdays").cast("bigint").alias("mdays"),
    )


def q_expr_strfns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: strLen, substr, strPos, strCount."""
    p = _pipe(spark, sf_dir, "customer")
    for expr, name in [
        ("strLen(c_name)", "name_len"),
        ("substr(c_name, 1, 8)", "name_head"),
        ("strPos(c_name, '1')", "pos1"),
        ("strCount(c_name, '0')", "zeros"),
    ]:
        p = add_to_pipe(p, expr, name)
    return p.df.select(
        "c_custkey",
        F.col("name_len").cast("bigint").alias("name_len"),
        "name_head",
        F.col("pos1").cast("bigint").alias("pos1"),
        F.col("zeros").cast("bigint").alias("zeros"),
    )


def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependent functions over an explicit order (SURVEY §2.7):
    per-user running sums/lags over events ordered by (ts, event_id) —
    partition_by is the scale generalization of seafan's global order."""
    p = _pipe(spark, sf_dir, "events", order_cols=["ts", "event_id"])
    p = add_to_pipe(p, "cumeBefore(value)", "run_sum", partition_by=["user_id"])
    p = add_to_pipe(p, "lag(value, 0)", "prev_value", partition_by=["user_id"])
    p = add_to_pipe(p, "countBefore(value)", "seq", partition_by=["user_id"])
    return p.df.select(
        "event_id",
        "user_id",
        F.round("run_sum", 4).alias("run_sum"),
        F.round("prev_value", 4).alias("prev_value"),
        F.col("seq").cast("bigint").alias("seq"),
    )


def q_encode_cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dictionary encoding, sorted-unique code order
    (AppendD/ByPtr, gdata.go:156-228, data.go:703-715)."""
    p = _pipe(spark, sf_dir, "customer")
    p = append_cat(p, "c_mktsegment", materialize_code=True)
    return p.df.select(
        "c_custkey", F.col("c_mktsegment__code").cast("int").alias("seg_code")
    )


def q_encode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score normalization with fitted params (AppendC, gdata.go:103-116)."""
    p = _pipe(spark, sf_dir, "lineitem")
    fp = fit_normalize(p, "l_quantity")
    ft = FType(name="l_quantity", role=FRole.CTS, normalized=True, fp=fp)
    return p.df.select(
        "l_orderkey",
        "l_linenumber",
        F.round(normalized_col(ft), 6).alias("q_z"),
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k levels by count (Levels.TopK, data.go:815-837)."""
    p = _pipe(spark, sf_dir, "events")
    return top_k(p, "event_type", 3)


def q_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + positional row() (gdata.go:470-493; parser row function)."""
    p = _pipe(spark, sf_dir, "customer", order_cols=["c_acctbal", "c_custkey"])
    p = p.sort("c_acctbal", ascending=True)
    p = add_to_pipe(p, "row(c_custkey)", "rank0")
    return p.df.select("c_custkey", F.col("rank0").cast("bigint").alias("rank0"))


def q_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile diagnostic (Decile, diags.go:354-473) as a table."""
    from seafan_spark.diags import decile_table

    p = _pipe(spark, sf_dir, "lineitem")
    p = p.with_column("obs", (F.col("l_quantity") > 25).cast("double"))
    t = decile_table(p, "l_extendedprice", "obs", tiebreak=["l_orderkey", "l_linenumber"])
    return t.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.round("mean_fit", 4).alias("mean_fit"),
        F.round("mean_obs", 6).alias("mean_obs"),
        F.col("n").cast("bigint").alias("n"),
    )


def q_assess_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assess + R2 diagnostics (diags.go:476-529, 734-754) — one lazy
    aggregation pass, one output row."""
    from seafan_spark.diags import assess_r2_df

    p = _pipe(spark, sf_dir, "lineitem")
    p = p.with_column("obs", (F.col("l_quantity") > 25).cast("double"))
    p = p.with_column("fit", F.col("l_quantity") / F.lit(50.0))
    t = assess_r2_df(p, "fit", "obs", cutoff=0.5)
    return t.select(
        F.col("n"),
        F.round("precision", 6).alias("prec"),
        F.round("recall", 6).alias("recall"),
        F.round("accuracy", 6).alias("accuracy"),
        F.round("r2", 4).alias("r2"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token count, char count, punct ratio, avg token len
    (llmops.text — pure JVM expressions)."""
    from seafan_spark.llmops import text as tx

    p = _pipe(spark, sf_dir, "documents").spread("doc_id")
    t = F.col("text")
    return p.df.select(
        "doc_id",
        tx.token_count_col(t).cast("bigint").alias("n_tokens"),
        tx.char_count_col(t).cast("bigint").alias("n_chars2"),
        F.round(tx.punct_ratio_col(t), 6).alias("punct_ratio"),
        F.round(tx.avg_token_len_col(t), 6).alias("avg_tok_len"),
    )


def q_text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + stopword language-ID heuristic (llmops.text)."""
    from seafan_spark.llmops import text as tx

    p = _pipe(spark, sf_dir, "documents").spread("doc_id")
    d = tx.add_text_features(p.df, "text")
    return d.select("doc_id", "quality", "pred_lang")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 fingerprint + group size + keeper flag
    (llmops.dedup.exact_dedup)."""
    from seafan_spark.llmops.dedup import exact_dedup

    p = _pipe(spark, sf_dir, "documents")
    d = exact_dedup(p, "text", "doc_id")
    return d.df.select(
        "doc_id", "fp", F.col("dup_count").cast("bigint").alias("dup_count"), "is_dup"
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 5
    (llmops.similarity.ann_brute_topk)."""
    from seafan_spark.llmops.similarity import ann_brute_topk

    p = _pipe(spark, sf_dir, "embeddings")
    q = p.df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ann_brute_topk(p, "vec_id", "embedding", queries=q, k=5)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (llmops.dedup.minhash_pairs).
    Hash-based — no SQL oracle; the driver records a rows-only check."""
    from seafan_spark.llmops.dedup import minhash_pairs

    p = _pipe(spark, sf_dir, "documents")
    return minhash_pairs(p, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (llmops.dedup.simhash_pairs).
    Hash-based — rows-only check."""
    from seafan_spark.llmops.dedup import simhash_pairs

    p = _pipe(spark, sf_dir, "documents")
    # 64-bit sig, 4 chunks of 16 bits: pigeonhole-complete for hamming<=3
    # with 65k-value band keys (no coarse-bucket candidate blowup)
    return simhash_pairs(p, "doc_id", "text", bits=64, chunks=4, max_hamming=3)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "where_keep": q_where_keep,
    "groupby_agg": q_groupby_agg,
    "expr_if": q_expr_if,
    "expr_summary": q_expr_summary,
    "join_inner": q_join_inner,
    "join_left_default": q_join_left_default,
    "join_3way": q_join_3way,
    "append": q_append,
    "expr_datefns": q_expr_datefns,
    "expr_strfns": q_expr_strfns,
    "window_cume": q_window_cume,
    "encode_cat": q_encode_cat,
    "encode_normalize": q_encode_normalize,
    "topk": q_topk,
    "sort_rank": q_sort_rank,
    "decile": q_decile,
    "assess_r2": q_assess_r2,
    "text_stats": q_text_stats,
    "text_quality_lang": q_text_quality_lang,
    "dedup_exact": q_dedup_exact,
    "ann_topk": q_ann_topk,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
}

ORACLES: dict[str, str] = {
    "where_keep": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem WHERE l_returnflag IN ('A','R')
    """,
    "groupby_agg": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "expr_if": """
        SELECT l_orderkey, l_linenumber,
               ROUND(CASE WHEN l_discount > 0.05
                     THEN l_extendedprice*(1-l_discount)
                     ELSE l_extendedprice END, 4) AS net_price,
               CAST((l_quantity > 25) AS DOUBLE) + CAST((l_tax >= 0.04) AS DOUBLE) AS flags
        FROM lineitem
    """,
    "expr_summary": """
        SELECT ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(AVG(l_extendedprice), 4) AS mean_price,
               ROUND(STDDEV_SAMP(l_discount), 6) AS std_disc,
               MAX(l_shipdate) AS max_ship,
               COUNT(l_orderkey) AS n
        FROM lineitem
    """,
    "join_inner": """
        SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment,
               ROUND(o.o_totalprice, 2) AS o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "join_left_default": """
        SELECT c.c_custkey, c.c_name,
               ROUND(COALESCE(o.o_totalprice, 0.0), 2) AS o_totalprice,
               COALESCE(o.o_orderstatus, '') AS o_orderstatus
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    "join_3way": """
        SELECT r.r_name, COUNT(*) AS n_cust,
               ROUND(SUM(c.c_acctbal), 2) AS acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "append": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'A'
        UNION ALL
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'R'
    """,
    "expr_datefns": """
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
               CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
               CAST(DAY(o_orderdate) AS BIGINT) AS dy,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
               CAST(DATEDIFF('day', CAST(DATE_TRUNC('month', o_orderdate) AS DATE),
                             CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE)) AS BIGINT) AS mdays
        FROM orders
    """,
    "expr_strfns": """
        SELECT c_custkey,
               CAST(LENGTH(c_name) AS BIGINT) AS name_len,
               SUBSTR(c_name, 1, 8) AS name_head,
               CAST(CASE WHEN STRPOS(c_name, '1') = 0 THEN -1
                    ELSE STRPOS(c_name, '1') END AS BIGINT) AS pos1,
               CAST((LENGTH(c_name) - LENGTH(REPLACE(c_name, '0', ''))) AS BIGINT) AS zeros
        FROM customer
    """,
    "window_cume": """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER w_cume, 4) AS run_sum,
               ROUND(COALESCE(LAG(value, 1) OVER w_ord, 0.0), 4) AS prev_value,
               CAST(COUNT(value) OVER w_cume AS BIGINT) AS seq
        FROM events
        WINDOW w_ord AS (PARTITION BY user_id ORDER BY ts, event_id),
               w_cume AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "encode_cat": """
        SELECT c_custkey,
               CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER) AS seg_code
        FROM customer
    """,
    "encode_normalize": """
        SELECT l_orderkey, l_linenumber,
               ROUND((l_quantity - AVG(l_quantity) OVER ()) /
                     (STDDEV_SAMP(l_quantity) OVER ()), 6) AS q_z
        FROM lineitem
    """,
    "topk": """
        SELECT event_type, COUNT(*) AS count
        FROM events GROUP BY event_type
        ORDER BY count DESC, event_type ASC LIMIT 3
    """,
    "sort_rank": """
        SELECT c_custkey,
               CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS BIGINT) AS rank0
        FROM customer
    """,
    "decile": """
        WITH ranked AS (
            SELECT l_extendedprice AS fit,
                   CAST(l_quantity > 25 AS DOUBLE) AS obs,
                   NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) - 1 AS bucket
            FROM lineitem
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               ROUND(AVG(fit), 4) AS mean_fit,
               ROUND(AVG(obs), 6) AS mean_obs,
               COUNT(*) AS n
        FROM ranked GROUP BY bucket
    """,
    "assess_r2": """
        WITH t AS (
            SELECT CAST(l_quantity > 25 AS DOUBLE) AS obs, l_quantity/50.0 AS fit
            FROM lineitem
        ), s AS (
            SELECT COUNT(*) AS n,
                   SUM(CASE WHEN fit > 0.5 AND obs > 0.999 THEN 1 ELSE 0 END) AS tp,
                   SUM(CASE WHEN fit <= 0.5 AND obs <= 0.999 THEN 1 ELSE 0 END) AS tn,
                   SUM(CASE WHEN obs > 0.999 THEN 1 ELSE 0 END) AS obs_tot,
                   SUM(CASE WHEN fit > 0.5 THEN 1 ELSE 0 END) AS pred_tot,
                   SUM((obs-fit)*(obs-fit)) AS sse,
                   VAR_SAMP(obs) AS vy
            FROM t
        )
        SELECT n,
               ROUND(CAST(tp AS DOUBLE)/pred_tot, 6) AS prec,
               ROUND(CAST(tp AS DOUBLE)/obs_tot, 6) AS recall,
               ROUND(CAST(tp+tn AS DOUBLE)/n, 6) AS accuracy,
               ROUND(100*(1 - sse/((n-1)*vy)), 4) AS r2
        FROM s
    """,
    "text_stats": """
        WITH t AS (
            SELECT doc_id, text, TRIM(text) AS tt FROM documents
        )
        SELECT doc_id,
               CAST(CASE WHEN LENGTH(tt) = 0 THEN 0
                    ELSE LEN(REGEXP_SPLIT_TO_ARRAY(tt, '\\s+')) END AS BIGINT) AS n_tokens,
               CAST(LENGTH(text) AS BIGINT) AS n_chars2,
               ROUND(CASE WHEN LENGTH(text) = 0 THEN 0.0
                     ELSE CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                          '[.,;:!?''"()\\[\\]{}\\-]', '', 'g')) AS DOUBLE) / LENGTH(text)
                     END, 6) AS punct_ratio,
               ROUND(CASE WHEN (CASE WHEN LENGTH(tt)=0 THEN 0
                                ELSE LEN(REGEXP_SPLIT_TO_ARRAY(tt, '\\s+')) END) = 0 THEN 0.0
                     ELSE CAST(LENGTH(REGEXP_REPLACE(tt, '\\s+', '', 'g')) AS DOUBLE)
                          / (CASE WHEN LENGTH(tt)=0 THEN 0
                             ELSE LEN(REGEXP_SPLIT_TO_ARRAY(tt, '\\s+')) END)
                     END, 6) AS avg_tok_len
        FROM t
    """,
    "text_quality_lang": """
        WITH t AS (
            SELECT doc_id, text, TRIM(text) AS tt,
                   STR_SPLIT(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'), ' ') AS toks_l
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(CASE WHEN LENGTH(tt)=0 THEN 0
                        ELSE LEN(REGEXP_SPLIT_TO_ARRAY(tt, '\\s+')) END AS DOUBLE) AS toks,
                   CASE WHEN LENGTH(text)=0 THEN 0.0
                        ELSE CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                             '[.,;:!?''"()\\[\\]{}\\-]', '', 'g')) AS DOUBLE)/LENGTH(text)
                   END AS pr,
                   CASE WHEN (CASE WHEN LENGTH(tt)=0 THEN 0
                              ELSE LEN(REGEXP_SPLIT_TO_ARRAY(tt, '\\s+')) END) = 0 THEN 0.0
                        ELSE CAST(LENGTH(REGEXP_REPLACE(tt, '\\s+', '', 'g')) AS DOUBLE)
                             / (CASE WHEN LENGTH(tt)=0 THEN 0
                                ELSE LEN(REGEXP_SPLIT_TO_ARRAY(tt, '\\s+')) END)
                   END AS awl,
                   LEN(LIST_FILTER(toks_l, x -> x IN ('der','die','und','das','ist'))) AS h_de,
                   LEN(LIST_FILTER(toks_l, x -> x IN ('the','and','of','to','in'))) AS h_en,
                   LEN(LIST_FILTER(toks_l, x -> x IN ('el','la','que','los','una'))) AS h_es,
                   LEN(LIST_FILTER(toks_l, x -> x IN ('le','les','des','est','une'))) AS h_fr,
                   LEN(LIST_FILTER(toks_l, x -> x IN ('de','shi','zai','le','he'))) AS h_zh
            FROM t
        )
        SELECT doc_id,
               ROUND(0.4*LEAST(toks, 100.0)/100.0
                   + 0.3*(1.0 - LEAST(pr*4, 1.0))
                   + 0.3*LEAST(GREATEST((awl-2)/6.0, 0.0), 1.0), 6) AS quality,
               CASE WHEN GREATEST(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                    WHEN h_de >= GREATEST(h_en, h_es, h_fr, h_zh) THEN 'de'
                    WHEN h_en >= GREATEST(h_es, h_fr, h_zh) THEN 'en'
                    WHEN h_es >= GREATEST(h_fr, h_zh) THEN 'es'
                    WHEN h_fr >= h_zh THEN 'fr'
                    ELSE 'zh' END AS pred_lang
        FROM m
    """,
    "dedup_exact": """
        WITH f AS (
            SELECT doc_id,
                   MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        )
        SELECT doc_id, fp,
               COUNT(*) OVER (PARTITION BY fp) AS dup_count,
               CAST(ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) > 1 AS DOUBLE) AS is_dup
        FROM f
    """,
    "ann_topk": """
        WITH q AS (
            SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 5
        ), c AS (
            SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings
        ), s AS (
            SELECT q_id, nid, list_cosine_similarity(qv, nv) AS cos
            FROM q CROSS JOIN c WHERE nid != q_id
        ), r AS (
            SELECT q_id, nid, cos,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, nid ASC) AS rnk
            FROM s
        )
        SELECT q_id, nid AS neighbor_id, ROUND(cos, 6) AS cosine,
               CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= 5
    """,
}


# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_groupby_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
