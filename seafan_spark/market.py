"""Commercial / market analytics battery (round 10, beyond the
reference): basket affinity, revenue concentration, digit-distribution
fraud screening, and multi-touch attribution.

These are the revenue-side read-outs a lakehouse analytics engine runs
over order/event logs — the natural companions of the experimentation
battery (``causal``) and the monitoring battery (``temporal``):

- :func:`association_rules` — frequent-pair mining with support /
  confidence / lift (Agrawal & Srikant 1994's A-priori read-out at the
  pair level, the relational 80% case);
- :func:`gini_by` — the Gini concentration coefficient per segment
  (how concentrated is revenue over customers?);
- :func:`lorenz_deciles` — the Lorenz curve the Gini integrates,
  discretized to NTILE buckets (bottom-decile share, top-decile share);
- :func:`benford_screen` — first-significant-digit distribution vs
  Benford's law with a chi-square statistic per segment (the classic
  bulk fraud / data-entry screen);
- :func:`attribution_touch` — first-touch / last-touch / linear credit
  per channel over per-user event journeys.

Determinism contract (the stats-battery rules): counts and
decimal-scaled sums are exact integers; every division is a single
IEEE op on exact inputs; any fold over doubles runs as an ORDERED
running sum on a bounded relation (identical left-to-right association
in Spark and DuckDB). Rank-based formulas use total orders with id
tiebreaks.

All public functions accept a Pipeline or a DataFrame (``getattr(df,
"df", df)``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df,
    basket_col: str,
    item_col: str,
    keys: Sequence[str] = (),
    min_support: float = 0.0,
    max_basket_items: int = 10_000,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows: for every
    ordered pair (a -> b) of items that co-occur in a basket,

        support(a,b)  = n_ab / n_baskets
        confidence(a->b) = n_ab / n_a
        lift(a->b)    = confidence / (n_b / n_baskets)

    — the A-priori read-out at the pair level (Agrawal & Srikant 1994);
    higher-order itemsets compose by re-running over derived baskets.
    Items are counted ONCE per basket (distinct), the standard market-
    basket convention. Returns (keys..., item_a, item_b, n_ab, n_a,
    n_b, n_baskets, support, confidence, lift), both directions of each
    pair, filtered to ``support >= min_support``.

    Scale shape: the only quadratic step is the WITHIN-BASKET pair
    self-join, shuffle-co-located on basket id (a high-cardinality
    key), so cost is sum over baskets of B_i^2 with B_i = distinct
    items per basket — priced by the ``max_basket_items`` pair budget
    through the same guard as ``mann_kendall`` (a runaway basket —
    e.g. basket = day instead of order — fails loudly BEFORE the join).
    Counts are one map-side-partial groupBy each; the final divisions
    are single IEEE ops on exact integers, so the DuckDB twin
    bit-matches.
    """
    keys = list(keys)
    d = getattr(df, "df", df)
    base = (
        d.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(*keys, F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    from seafan_spark.guards import assert_bounded_groups

    assert_bounded_groups(
        base, [*keys, "_b"], "association_rules",
        limit=int(max_basket_items),
        scale_hint="The within-basket pair join prices B^2 per basket — "
        "a basket this large is usually a mis-keyed basket column "
        "(max_basket_items overrides).",
    )
    n_baskets = base.select(*keys, "_b").distinct().groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_counts = base.groupBy(*keys, "_i").agg(F.count(F.lit(1)).alias("_n_item"))
    left = base.select(*keys, "_b", F.col("_i").alias("item_a"))
    right = base.select(*keys, "_b", F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, on=[*keys, "_b"])
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy(*keys, "item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = item_counts.select(
        *keys, F.col("_i").alias("item_a"), F.col("_n_item").alias("n_a")
    )
    nb = item_counts.select(
        *keys, F.col("_i").alias("item_b"), F.col("_n_item").alias("n_b")
    )
    out = (
        pairs.join(na, on=[*keys, "item_a"])
        .join(nb, on=[*keys, "item_b"])
        .join(n_baskets, on=keys) if keys
        else pairs.join(na, on=["item_a"]).join(nb, on=["item_b"]).crossJoin(n_baskets)
    )
    support = F.col("n_ab").cast("double") / F.col("n_baskets").cast("double")
    confidence = F.col("n_ab").cast("double") / F.col("n_a").cast("double")
    lift = confidence / (F.col("n_b").cast("double") / F.col("n_baskets").cast("double"))
    return out.select(
        *keys,
        "item_a",
        "item_b",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_baskets").cast("long").alias("n_baskets"),
        support.alias("support"),
        confidence.alias("confidence"),
        lift.alias("lift"),
    ).filter(F.col("support") >= F.lit(float(min_support)))


def gini_by(
    df,
    value_col: str,
    id_col: str,
    keys: Sequence[str] = (),
    value_decimals: int = 2,
) -> DataFrame:
    """Gini concentration coefficient per segment — how unequal is the
    distribution of ``value`` (revenue per customer, tokens per doc)?
    The rank formula over values sorted ASCENDING (Sen 1973's standard
    estimator):

        G = (2 · Σ_i i·x_(i)) / (n · Σ x) − (n + 1)/n

    0 = perfectly equal, →1 = one unit holds everything. Ties in x are
    harmless: permuting equal values across their rank positions leaves
    Σ i·x_(i) unchanged, so the (value, id) total order is only needed
    for the rank ARITHMETIC to be well-defined, not for the result.
    Negative values are rejected (the estimator's domain). Returns
    (keys..., n, total, gini).

    Determinism: values are scaled to integers at ``value_decimals``
    (decimal money is exact there), so Σ i·x and Σ x are exact integer
    aggregates (decimal(38,0) — no FP order sensitivity); G is then two
    IEEE ops on exact operands, bit-identical in the DuckDB twin.

    Scale shape: the per-key rank comes from
    :func:`seafan_spark.rank.keyed_running_scan` (range repartition +
    broadcast offsets — no key cell on a single task), then ONE
    map-side-partial groupBy. The scan materializes one range shuffle;
    everything after is corpus-parallel.
    """
    keys = list(keys)
    d = getattr(df, "df", df)
    v = F.col(value_col).cast("double")
    base = d.filter(v.isNotNull() & F.col(id_col).isNotNull()).select(
        *keys, F.col(id_col).alias("_id"), v.alias("_v")
    )
    from seafan_spark.rank import keyed_running_scan

    scaled = F.round(F.col("_v") * F.lit(float(10 ** value_decimals))).cast(
        "decimal(20,0)"
    )
    ranked = keyed_running_scan(
        base, keys, [("_v", True), ("_id", True)],
        rownum_out="_rk", total_out="_n",
    ).withColumn("_sv", scaled)
    # decimal(20,0) x decimal(12,0) -> decimal(33,0); SUM widens to 38 —
    # exact integer aggregation, no FP order sensitivity
    g = ranked.groupBy(*keys).agg(
        F.max("_n").alias("n"),
        F.sum("_sv").alias("_sum_v"),
        F.sum(F.col("_sv") * F.col("_rk").cast("decimal(12,0)")).alias("_sum_iv"),
        F.min("_v").alias("_min_v"),
    )
    n = F.col("n").cast("double")
    total = F.col("_sum_v").cast("double") / F.lit(float(10 ** value_decimals))
    gini = F.when(
        (F.col("_min_v") >= 0) & (F.col("_sum_v") > 0),
        (F.lit(2.0) * F.col("_sum_iv").cast("double"))
        / (n * F.col("_sum_v").cast("double"))
        - (n + F.lit(1.0)) / n,
    )
    return g.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        total.alias("total"),
        gini.alias("gini"),
    )


def lorenz_deciles(
    df,
    value_col: str,
    id_col: str,
    keys: Sequence[str] = (),
    n_buckets: int = 10,
    value_decimals: int = 2,
) -> DataFrame:
    """Discretized Lorenz curve per segment: units sorted by ``value``
    ASCENDING, cut into ``n_buckets`` NTILE buckets, reporting each
    bucket's own share and the CUMULATIVE share of total value — the
    curve :func:`gini_by` integrates (bottom-decile share, top-decile
    share are the standard concentration read-outs). Returns
    (keys..., bucket, n, bucket_value, cum_value, cum_share), buckets
    ascending so the last row is (n_total, total, 1.0).

    Determinism: the cut is the closed-form NTILE over the
    (value, id) total order; values scale to exact integers at
    ``value_decimals`` so every sum is exact; shares are single IEEE
    divisions.

    Scale shape: :func:`seafan_spark.rank.keyed_running_scan` +
    :func:`seafan_spark.rank.ntile_from_rank` (no key cell on one
    task), one groupBy to the B-row relation, then ordered windows over
    those B rows per key.
    """
    if n_buckets < 1:
        raise ValueError("lorenz_deciles: n_buckets must be >= 1")
    keys = list(keys)
    d = getattr(df, "df", df)
    v = F.col(value_col).cast("double")
    base = d.filter(v.isNotNull() & F.col(id_col).isNotNull()).select(
        *keys, F.col(id_col).alias("_id"), v.alias("_v")
    )
    from seafan_spark.rank import keyed_running_scan, ntile_from_rank

    scaled = F.round(F.col("_v") * F.lit(float(10 ** value_decimals))).cast(
        "decimal(20,0)"
    )
    ranked = keyed_running_scan(
        base, keys, [("_v", True), ("_id", True)],
        rownum_out="_rk", total_out="_n",
    ).withColumn("_sv", scaled)
    bucket = ntile_from_rank(F.col("_rk"), F.col("_n"), int(n_buckets))
    g = (
        ranked.withColumn("_bk", bucket)
        .groupBy(*keys, "_bk")
        .agg(F.count(F.lit(1)).alias("_bn"), F.sum("_sv").alias("_bv"))
    )
    wall = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(0))
    word = wall.orderBy(F.col("_bk").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    span = wall.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cumv = F.sum("_bv").over(word)
    totv = F.sum("_bv").over(span)
    unscale = F.lit(float(10 ** value_decimals))
    return g.select(
        *keys,
        F.col("_bk").alias("bucket"),
        F.col("_bn").cast("long").alias("n"),
        (F.col("_bv").cast("double") / unscale).alias("bucket_value"),
        (cumv.cast("double") / unscale).alias("cum_value"),
        F.when(
            totv > 0, cumv.cast("double") / totv.cast("double")
        ).alias("cum_share"),
    )


#: Benford expected first-digit probabilities log10(1 + 1/d) — emitted as
#: exact repr literals so both engines compare against the same doubles
#: (no libm log10 in either plan).
_BENFORD_P = {
    1: 0.30102999566398114, 2: 0.17609125905568124, 3: 0.12493873660829985,
    4: 0.09691001300805639, 5: 0.07918124604762478, 6: 0.06694678963061318,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


def benford_screen(
    df,
    value_col: str,
    keys: Sequence[str] = (),
    value_decimals: int = 2,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (Newcomb
    1881 / Benford 1938), the classic bulk screen for fabricated or
    mis-entered amounts: per segment, the observed share of each first
    digit 1-9 and the chi-square statistic

        chi2 = n · Σ_d (p_obs(d) − p_benford(d))² / p_benford(d)

    (compare against the chi²₈ critical value 15.507 at 5%). Returns
    one row per (keys, digit): (keys..., digit, n_digit, n, share,
    expected, chi2) with ``chi2`` repeated per group (the 9-row shape
    plots directly). Zero values are excluded (no first digit);
    negatives use their magnitude.

    Determinism: the first digit is taken from the DECIMAL STRING of
    the integer-scaled magnitude (``round(|x|·10^dec)`` as BIGINT →
    first char), not from log10 arithmetic — both engines print
    integers identically, while ``floor(log10(x))`` is 1-ulp fragile at
    powers of ten. Expected shares are pinned repr literals (no libm).
    The chi2 fold is an ordered running sum over the 9-row digit
    relation.

    Scale shape: one map-side-partial groupBy to (keys x 9), then
    windows over those 9 rows per key. Nothing else.
    """
    keys = list(keys)
    d = getattr(df, "df", df)
    v = F.col(value_col).cast("double")
    mag = F.round(F.abs(v) * F.lit(float(10 ** value_decimals))).cast("bigint")
    digit = F.substring(mag.cast("string"), 1, 1).cast("int")
    base = d.filter(v.isNotNull()).select(*keys, mag.alias("_m"), digit.alias("_d"))
    base = base.filter(F.col("_m") > 0)
    g = base.groupBy(*keys, "_d").agg(F.count(F.lit(1)).alias("n_digit"))
    wall = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(0))
    span = wall.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_P.items() for x in kv]
        ),
        F.col("_d"),
    )
    # staged projections: window results feed later windows as plain
    # columns (nested window expressions are illegal in one projection)
    g = g.withColumn("_n", F.sum("n_digit").over(span))
    g = g.withColumn(
        "_share", F.col("n_digit").cast("double") / F.col("_n").cast("double")
    ).withColumn("_exp", expected)
    term = (F.col("_share") - F.col("_exp")) * (
        F.col("_share") - F.col("_exp")
    ) / F.col("_exp")
    # ordered fold over the 9-row relation -> deterministic association
    word = wall.orderBy(F.col("_d").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    g = g.withColumn("_run", F.sum(term).over(word))
    g = g.withColumn(
        "chi2", F.col("_n").cast("double") * F.max("_run").over(span)
    )
    return g.select(
        *keys,
        F.col("_d").alias("digit"),
        F.col("n_digit").cast("long").alias("n_digit"),
        F.col("_n").cast("long").alias("n"),
        F.col("_share").alias("share"),
        F.col("_exp").alias("expected"),
        "chi2",
    )


def attribution_touch(
    df,
    user_col: str,
    channel_col: str,
    order_col: str,
    id_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Multi-touch attribution over per-user event journeys: each user's
    ordered touches (``order_col`` with ``id_col`` tiebreak) carry ONE
    unit of conversion credit, assigned three standard ways at once —

    - ``first_touch``: the journey's first channel gets 1;
    - ``last_touch``: the last channel gets 1;
    - ``linear``: every touch gets 1/n_touches.

    Returns (keys..., channel, n_touches, first_touch, last_touch,
    linear) — credit totals per channel; each credit column sums to the
    number of users per key cell.

    Determinism: first/last credits are integer counts. Linear credit
    folds EXACTLY: touches aggregate to (channel, journey-length n,
    touches-in-journey k) cells with integer counts, and credit =
    Σ cnt·k/n runs as an ordered running sum over that bounded cell
    relation (order (n, k)) — identical association cross-engine, no
    corpus-sized double sum.

    Scale shape: user-partitioned windows (user id is high-cardinality
    — journeys never concentrate on one task), one groupBy to
    (keys, channel, n, k) cells, windows over the per-channel cell
    relation (bounded by distinct journey lengths — guarded), one final
    groupBy.
    """
    keys = list(keys)
    d = getattr(df, "df", df)
    base = d.filter(
        F.col(user_col).isNotNull()
        & F.col(channel_col).isNotNull()
        & F.col(order_col).isNotNull()
    ).select(
        *keys,
        F.col(user_col).alias("_u"),
        F.col(channel_col).alias("_c"),
        F.col(order_col).alias("_t"),
        F.col(id_col).alias("_id"),
    )
    wu = Window.partitionBy(*keys, "_u")
    wo = wu.orderBy(F.col("_t").asc(), F.col("_id").asc())
    span = wu.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    marked = base.select(
        *keys,
        "_c",
        (F.row_number().over(wo) == 1).cast("int").alias("_first"),
        (F.row_number().over(
            wu.orderBy(F.col("_t").desc(), F.col("_id").desc())
        ) == 1).cast("int").alias("_last"),
        F.count(F.lit(1)).over(span).alias("_n"),
    )
    cells = marked.groupBy(*keys, "_c", "_n").agg(
        F.count(F.lit(1)).alias("_k_total"),
        F.sum("_first").alias("_f"),
        F.sum("_last").alias("_l"),
    )
    from seafan_spark.guards import assert_bounded_groups

    assert_bounded_groups(
        cells, [*keys, "_c"], "attribution_touch",
        scale_hint="The linear-credit fold runs per (channel, distinct "
        "journey-length) cell — bucket order_col if journeys have "
        "unbounded distinct lengths.",
    )
    wc = Window.partitionBy(*keys, "_c")
    wrun = wc.orderBy(F.col("_n").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    spanc = wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lin_term = F.col("_k_total").cast("double") / F.col("_n").cast("double")
    # staged: the ordered linear fold lands as a column before the
    # spanning max reads it (no nested window expressions)
    staged = cells.withColumn("_lin_run", F.sum(lin_term).over(wrun))
    out = staged.select(
        *keys,
        F.col("_c").alias("channel"),
        F.sum("_k_total").over(spanc).cast("long").alias("n_touches"),
        F.sum("_f").over(spanc).cast("long").alias("first_touch"),
        F.sum("_l").over(spanc).cast("long").alias("last_touch"),
        F.max("_lin_run").over(spanc).alias("linear"),
        F.row_number().over(wc.orderBy(F.col("_n").asc())).alias("_rn"),
    )
    return out.filter(F.col("_rn") == 1).drop("_rn")
