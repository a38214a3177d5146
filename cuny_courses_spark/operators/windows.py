"""§2 E — Window functions.

Reference correspondence: the signature "keep the latest-effective row per
key" pattern (transfer rules supersede by effective date, SURVEY §2 E) is
``row_number() OVER (PARTITION BY key ORDER BY eff DESC) = 1``; the rest of
the family generalizes it (ranks, running/sliding frames, lag/lead,
distribution functions).

Scale: every window here partitions by a key (custkey / user_id / priority
class), so state is bounded per partition and the plan is one shuffle on the
partition key + per-partition sort — no global sort, no driver collection.
Running/sliding sums go through DECIMAL so the sequential frame evaluation
is bit-identical to DuckDB's (common.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.common import DEC, O_r4_ratio, S_r4_ratio, fmt_date, fp, r4
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


@register(
    "q_win_latest_per_key",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(o_totalprice, 4) AS total
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
""",
)
def q_win_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — THE reference dedup pattern (argmax with
    total tiebreak on the unique key).

    Physical form: hash-agg ``max_by`` keyed on the TOTAL-order struct
    (o_orderdate, o_orderkey) — the same deterministic-argmax contract as
    the window ``row_number()==1`` form (the oracle keeps that spelling;
    outputs are identical because the key struct is a total order), but
    with map-side partial aggregation: the shuffle carries one candidate
    row per (customer × map partition) instead of every order, and no
    per-group sort exists at all. Measured 2× over the WindowGroupLimit
    window form at sf0.1 (0.36 s → 0.19 s) and ~20 % at the ×20
    amplification — this is the SURVEY §2 q_agg_minmax_by guidance
    ("prefer the hash-agg form at 100 TB when only the argmax row is
    needed") applied to the flagship latest-per-key query. The window
    machinery itself stays exercised by q_win_rank_dense /
    q_win_topk_per_group."""
    o = load(spark, sf_dir, "orders")
    top = o.groupBy("o_custkey").agg(
        F.max_by(
            F.struct("o_orderkey", "o_orderdate", "o_totalprice"),
            F.struct("o_orderdate", "o_orderkey"),
        ).alias("t")
    )
    return top.select(
        "o_custkey",
        F.col("t.o_orderkey").alias("o_orderkey"),
        fmt_date("t.o_orderdate", "order_date"),
        r4("t.o_totalprice", "total"),
    )


@register(
    "q_win_rank_dense",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
FROM orders
""",
)
def q_win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank by price within priority class (rank values are
    deterministic under ties; no tiebreak needed for the rank itself)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS total
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) <= 3
""",
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (per-group top-k without a global sort —
    the 100 TB-safe top-k: shuffle by group, per-partition heap/sort)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", r4("o_totalprice", "total"))
    )


@register(
    "q_win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
       AS running_total
FROM orders
""",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer (decimal accumulation → exact)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"), 4
        ).alias("running_total"),
    )


@register(
    "q_win_sliding_avg",
    oracle="""
SELECT user_id, event_id,
       round(CAST(sum(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
             / count(*) OVER w, 4) AS avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def q_win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    avg3 = F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return e.select("user_id", "event_id", F.round(avg3, 4).alias("avg3"))


@register(
    "q_win_lag_lead",
    oracle="""
SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap (lag) and next event type (lead) per user."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_ntile_pct",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions over account balance (unique tiebreak ⇒ no
    peer-group ambiguity in percent_rank/cume_dist)."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "q_win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_orderpriority ORDER BY o_totalprice
           RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS DOUBLE) / 100,
           4) AS near_sum
FROM orders
""",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: per-priority sum of orders within
    ±5000 of the current row's totalprice.

    The frame sum runs in exact int64 cents, not DECIMAL: Spark re-
    aggregates the whole frame per row for sliding range frames (no
    inverse-update path), so the per-add cost is multiplied by the mean
    frame width (~600 rows here) — long adds vs BigDecimal adds is 3.3 s
    → 0.35 s at sf0.1, bit-identical (2-dp contract column, fp() note in
    common.py)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 5000)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            F.sum(fp("o_totalprice")).over(w).cast("double") / 100.0, 4
        ).alias("near_sum"),
    )


@register(
    "q_win_first_last_nth",
    oracle="""
SELECT o_custkey,
       round(first_value(o_totalprice) OVER w, 4) AS first_price,
       round(last_value(o_totalprice) OVER w, 4) AS last_price,
       round(nth_value(o_totalprice, 2) OVER w, 4) AS second_price
FROM orders
WINDOW w AS (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
QUALIFY row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
""",
)
def q_win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value(2) of each customer's order
    prices in date order (total tiebreak on o_orderkey), one row per
    customer. last_value and nth_value read the FULL-partition frame —
    the default running frame silently returns the current row for
    last_value, the classic window-frame bug; single-order customers get
    NULL second_price on both sides."""
    o = load(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(*order_cols)
    return (
        o.select(
            "o_custkey",
            r4(F.first("o_totalprice").over(w_full), "first_price"),
            r4(F.last("o_totalprice").over(w_full), "last_price"),
            r4(F.nth_value("o_totalprice", 2).over(w_full), "second_price"),
            F.row_number().over(w_rank).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "q_win_distinct_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       count(DISTINCT o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_prios
FROM orders
""",
)
def q_win_distinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window frame — per customer, how many
    distinct order priorities seen so far in date order.

    Spark does not support DISTINCT aggregates over windows; the idiomatic
    rewrite is ``size(collect_set(...))`` over the same frame — exact, and
    bounded state because the set holds only distinct values (here ≤ 5
    priorities; for high-cardinality columns the scale form swaps in an
    HLL sketch column with a tolerance contract). DuckDB runs the native
    windowed DISTINCT; both count sets, so results agree exactly."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("long")
        .alias("n_prios"),
    )


@register(
    "q_win_funnel_steps",
    oracle="""
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_view,
       (SELECT count(*) FROM s2) AS n_view_click,
       (SELECT count(*) FROM s3) AS n_view_click_purchase
""",
)
def q_win_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis — view → click → purchase, each step strictly
    after the previous one's FIRST occurrence per user (the
    MATCH_RECOGNIZE-shaped sequence query Spark lacks natively, SURVEY §4;
    the rewrite is stepwise conditional argmin).

    Plan shape: one keyed aggregation per funnel step, each joined back to
    the (user-keyed, already-shuffled) previous step — per step one
    map-side-partial aggregation + one same-key join, so at 100 TB the
    user-hash partitioning is REUSED across all three steps instead of
    re-shuffling the event log (events shuffle once on user_id; AQE keeps
    the step frames co-partitioned). The final counts collapse to one row.
    """
    e = load(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_view_click"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return c1.crossJoin(c2).crossJoin(c3)


@register(
    "q_win_ohlc_resample",
    oracle="""
WITH ordered AS (
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS bar,
           value, ts, event_id,
           row_number() OVER (
               PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY ts ASC, event_id ASC) AS rn_a,
           row_number() OVER (
               PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT event_type, bar,
       round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
       count(*) AS n_ticks
FROM ordered
GROUP BY event_type, bar
""",
)
def q_win_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC resampling: daily open/high/low/close bars of
    `value` per event_type — the financial/telemetry downsampling primitive
    (complements q_stream_tumbling's count/sum with ORDER-dependent
    endpoints). Open/close are pinned by a total order (ts, event_id) so
    same-timestamp ticks can't make the bar nondeterministic; high/low are
    plain extremes; rounding only on output (the values pass through, no
    arithmetic).

    Plan shape: ONE shuffle on (event_type, day) shared by the two window
    passes and the final aggregate — grouping on the raw day value (not
    its formatted label) keeps the aggregate's required distribution equal
    to the windows' partitioning, so Catalyst plans a single exchange,
    two in-partition sorts (asc/desc), and an exchange-free grouped
    reduce (plan-asserted). At 100 TB the single shuffle moves each tick
    once; bar count (types × days) stays tiny."""
    e = load(spark, sf_dir, "events")
    # Materialize the bar key once, then partition windows and groupBy on
    # the SAME attribute — if the windows partition on the raw expression
    # Catalyst gives them a fresh internal projection (_w0) and can't see
    # it equals the aggregate's key, planning a second shuffle.
    base = e.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    o = base.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    # Group on the raw day value the windows partitioned by — not its
    # formatted string — so the aggregate's required distribution is
    # already satisfied and no second Exchange is planned (asserted in
    # tests/test_plans.py); the bar label is formatted after the reduce.
    return (
        o.groupBy("event_type", "day")
        .agg(
            F.round(
                F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4
            ).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(
                F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4
            ).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("bar"),
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )


@register(
    "q_win_share_of_total",
    oracle="""
WITH rev AS (
    SELECT n_name, r_name,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
)
SELECT n_name, r_name,
       round(CAST(bal AS DOUBLE) / 100.0, 4) AS nation_bal,
       round(CAST(bal AS DOUBLE)
             / CAST(sum(bal) OVER (PARTITION BY r_name) AS DOUBLE), 4)
           AS share_of_region
FROM rev
""",
)
def q_win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (ratio_to_report): each nation's account-balance share
    within its region — grouped aggregate followed by a window sum over the
    PARTIAL results. The scale point: the window runs over the ~|nations|
    aggregated rows, never the raw fact table, so the second pass is free;
    sums are exact cents integers, and the share divides two doubles
    derived from identical integers (4 dp stable both engines)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(fp("c_acctbal").cast("decimal(38,0)"))
            .cast("long")
            .alias("bal")
        )
    )
    w = Window.partitionBy("r_name")
    return rev.select(
        "n_name",
        "r_name",
        F.round(F.col("bal").cast("double") / 100.0, 4).alias("nation_bal"),
        F.round(
            F.col("bal").cast("double")
            / F.sum("bal").over(w).cast("double"),
            4,
        ).alias("share_of_region"),
    )


# -------------------------------------------------- q_win_time_range_frame


@register(
    "q_win_time_range_frame",
    oracle="""
SELECT event_id,
       CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 300000000 PRECEDING AND 300000000 FOLLOWING)
           AS BIGINT) AS n_nearby,
       min(event_id) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 300000000 PRECEDING AND 300000000 FOLLOWING)
           AS first_nearby
FROM events
""",
)
def q_win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, how many events (and the
    earliest event id) fall within ±5 minutes of each event — the sliding
    temporal-context primitive (burst detection, local density) in BATCH
    form; the streaming twin is the sliding window (q_stream_sliding).

    Framed on exact int64 epoch MICROseconds on both engines
    (`unix_micros` ≡ DuckDB `epoch_us`) — a seconds-granularity
    `unix_timestamp` would truncate fractional timestamps and disagree on
    frame boundaries; µs integers make the frame edge exact. Tied
    timestamps are RANGE peers, so every aggregate here is
    peer-order-independent by construction. One exchange on user_id; the
    frame scan is bounded by temporal density, not partition size."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, 300_000_000)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_nearby"),
        F.min("event_id").over(w).alias("first_nearby"),
    )


# -------------------------------------------------- q_win_median_sliding


@register(
    "q_win_median_sliding",
    oracle="""
SELECT event_id,
       round(median(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
FROM events
""",
)
def q_win_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding exact median: per user, the continuous-interpolation median
    of the last 5 event values — the robust smoother (sensor denoising,
    spike rejection) that a sliding MEAN can't give. Spark ``percentile``
    as a window aggregate ≡ DuckDB ``median`` (both lerp the two middle
    doubles with identical IEEE ops — the q_agg_stats-proven identity), and
    the ROWS frame is made total by the (ts, event_id) tiebreak so both
    engines see the same 5 rows. Scale: one exchange on user_id + a
    per-partition sort; frame state is 5 values per row — O(1) memory, no
    global sort, the same plan shape at any data size."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return e.select(
        "event_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 4).alias("med5"),
    )


# ------------------------------------------------------- q_win_cume_pct


@register(
    "q_win_cume_pct",
    oracle=f"""
WITH r AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(rank() OVER wp AS BIGINT) AS rk,
           CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
           CAST(count(*) OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cnum
    FROM orders
    WINDOW wp AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
)
SELECT o_orderkey, o_orderpriority,
       CASE WHEN n = 1 THEN 0.0
            ELSE {O_r4_ratio('(rk - 1) * 10000', 'n - 1')} END AS pct_rank,
       {O_r4_ratio('cnum * 10000', 'n')} AS cume
FROM r
""",
)
def q_win_cume_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions: each order's percent_rank and cume_dist of
    total price within its priority class — the CDF position primitive
    (price-percentile badging, fraud percentile cuts). Both are TIE-AWARE
    (rank / peer-count based), so per-row output is independent of
    intra-tie row order. Emitted through the EXACT integer half-up form
    (common.S_r4_ratio) rather than round(percent_rank(), 4): the built-in
    yields small-denominator rationals ((r−1)/(n−1), peers/n) whose exact
    .xxxx5 boundary values are where Spark's and DuckDB's double rounding
    disagree (the q_ts_ewma seam) — the integer identity
    ``(2·num + den) div (2·den)`` has no boundary to disagree on. Scale:
    one exchange on the priority key + per-partition sort; rank, the
    partition count, and the tie-inclusive running count all come out of
    that single sort pass."""
    o = load(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(wp).cast("long").alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("o_orderpriority"))
            .cast("long")
            .alias("n"),
            F.count(F.lit(1))
            .over(
                wp.rangeBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("long")
            .alias("cnum"),
        )
        .selectExpr(
            "o_orderkey",
            "o_orderpriority",
            "CASE WHEN n = 1 THEN 0.0D ELSE "
            + S_r4_ratio("(rk - 1) * 10000", "n - 1")
            + " END AS pct_rank",
            S_r4_ratio("cnum * 10000", "n") + " AS cume",
        )
    )


# ---------------------------------------------------------- q_win_streak


@register(
    "q_win_streak",
    oracle="""
WITH d AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
), g AS (
    SELECT user_id, day,
           date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
    FROM d
), s AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS streak
    FROM g GROUP BY user_id, island
)
SELECT user_id,
       max(streak) AS longest_streak,
       CAST(sum(streak) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
""",
)
def q_win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (retention/habit metrics): distinct active
    days, then ``day_index − row_number`` is constant exactly within a
    consecutive run, so one grouped count per (user, island) and a max
    recovers the streak. Day indexing is integer days since epoch on both
    engines (DATE subtraction — no timezone or DST arithmetic can split
    an island). Scale: the distinct, the window, and both groupBys all
    key on user_id — ONE exchange reused down the whole chain
    (EnsureRequirements inserts nothing after the first); state per user
    is its active-day count, never raw events."""
    e = load(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "island",
        F.datediff("day", F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    s = g.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("streak")
    )
    return s.groupBy("user_id").agg(
        F.max("streak").alias("longest_streak"),
        F.sum("streak").cast("long").alias("n_active_days"),
    )


@register(
    "q_win_cep_pattern",
    oracle="""
WITH seq AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_extract_all(s, 'vc+p')) AS BIGINT) AS n_funnel,
       CAST(CASE WHEN len(regexp_extract_all(s, 'vc+p')) > 0
                 THEN strpos(s, regexp_extract(s, 'vc+p', 0))
                 ELSE 0 END AS BIGINT) AS first_funnel_pos,
       CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS n_error_bursts,
       CAST(len(s) AS BIGINT) AS n_events
FROM seq
""",
)
def q_win_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing PATTERN MATCHING (Flink CEP /
    Trino-Oracle MATCH_RECOGNIZE, the regex-over-row-sequences operator
    Spark lacks natively): each user's event history becomes one ordered
    symbol string (one char per event type, total-ordered by ts with an
    event_id tiebreak) and row patterns run as real REGEXES against it —
    `vc+p` (view, one-or-more clicks, purchase: the quantified funnel a
    stepwise min-ts funnel like q_win_funnel_steps cannot count, because
    it needs EVERY non-overlapping occurrence, not first-occurrence
    ordering) and `ee+` (error bursts: 2+ consecutive errors). Emitted
    per user: non-overlapping match counts, the 1-based position of the
    first funnel match (MATCH_RECOGNIZE's MATCH_NUMBER/FIRST semantics),
    and the sequence length.

    Both engines scan leftmost, greedy, non-overlapping (java.util.regex
    ``find()`` ≡ DuckDB RE2 ``regexp_extract_all``; for these patterns
    leftmost-first and leftmost-longest coincide — a `c+`/`e+` run admits
    exactly one match length per start). The first-match position is
    recovered via instr/strpos on the extracted match: regex matching
    here is context-free, so the matched text's first occurrence IS the
    match site (guarded to matched users — instr(s, '') is
    engine-divergent).

    Scale: ONE shuffle on user_id (collect_list + array_sort — no
    per-user window sort pass), per-user state is the symbol string
    (one byte per event — a 10k-event user is a 10 kB value), and the
    regex scan is JVM-side whole-stage codegen over that string; at
    100 TB the plan is the same keyed exchange as any per-user
    aggregate. Order encoding uses struct sort (ts, event_id) — the
    same total-order contract as the streak/funnel family."""
    e = load(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("rec")).alias("recs"))
        .select(
            "user_id",
            F.array_join(
                F.transform("recs", lambda r: r["ch"]), ""
            ).alias("s"),
        )
    )
    n_funnel = F.size(F.expr("regexp_extract_all(s, 'vc+p', 0)"))
    return seq.select(
        "user_id",
        n_funnel.cast("long").alias("n_funnel"),
        F.when(
            n_funnel > 0,
            F.expr("instr(s, regexp_extract(s, 'vc+p', 0))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("first_funnel_pos"),
        F.size(F.expr("regexp_extract_all(s, 'ee+', 0)"))
        .cast("long")
        .alias("n_error_bursts"),
        F.length("s").cast("long").alias("n_events"),
    )


@register(
    "q_win_retention_cohorts",
    oracle="""
WITH act AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS wk
    FROM events
), cohort AS (
    SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id
)
SELECT c.cohort_wk,
       CAST(a.wk - c.cohort_wk AS BIGINT) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN cohort c USING (user_id)
GROUP BY 1, 2
""",
)
def q_win_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION MATRIX — the product-analytics staple (Amplitude/
    Mixpanel native): users grouped by their FIRST active epoch-week
    (cohort), then for each (cohort, week-offset) cell the count of
    cohort members active that week. Integer epoch-week arithmetic
    (floor-div of epoch days — no TZ/DST seam, the q_win_streak
    contract).

    Plan shape: ONE user-keyed exchange reused twice — the distinct
    (user, week) activity set, the per-user min (cohort) and the
    join-back all cluster on user_id, so EnsureRequirements inserts
    nothing between them; only the final (cohort, offset) cell
    aggregation re-keys, and it aggregates |users|·|weeks| already-
    distinct rows, not raw events. At 100 TB raw events reduce at the
    first distinct (map-side partial), per-user state is its active-week
    set, and the retention matrix is |cohorts|·|offsets| — dashboard-
    sized regardless of corpus."""
    e = load(spark, sf_dir, "events")
    act = (
        e.select(
            "user_id",
            F.floor(
                F.datediff(
                    F.to_date("ts"), F.lit("1970-01-01").cast("date")
                )
                / 7
            )
            .cast("long")
            .alias("wk"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    # r15 optimization: count(*) — NOT countDistinct — because the rows
    # entering this aggregate are already distinct per user within every
    # (cohort_wk, week_offset) cell: act is distinct on (user_id, wk), a
    # user has exactly one cohort_wk, so (user_id, wk) ↦ (cohort_wk,
    # offset, user_id) is injective. countDistinct planned as TWO
    # exchanges (partial-distinct expand on (cohort, offset, user) then
    # the cell re-agg); count(*) is one map-side-combined exchange.
    # The DuckDB twin keeps COUNT(DISTINCT) — bit-equality of the driver
    # hash is the proof the dedup is redundant. ×100 A/B: 2 Exchange →
    # 1 Exchange after the join (see plans/r15/q_win_retention_cohorts_*).
    return (
        act.join(cohort, ["user_id"])
        .groupBy(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "q_win_attribution_last_touch",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, ts, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CASE WHEN event_type IN ('view', 'click') THEN epoch_us(ts)
                END AS touch_us,
           CASE WHEN event_type IN ('view', 'click') THEN event_id
                END AS touch_id,
           CASE WHEN event_type IN ('view', 'click') THEN event_type
                END AS touch_type
    FROM events
), lasts AS (
    SELECT user_id, event_id, ts, event_type, cents,
           last_value(touch_us IGNORE NULLS) OVER w AS last_us,
           last_value(touch_id IGNORE NULLS) OVER w AS last_id,
           last_value(touch_type IGNORE NULLS) OVER w AS last_type
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, cents,
       CASE WHEN last_us IS NOT NULL
                 AND epoch_us(ts) - last_us <= 604800000000
            THEN last_type ELSE 'organic' END AS attributed,
       CASE WHEN last_us IS NOT NULL
                 AND epoch_us(ts) - last_us <= 604800000000
            THEN last_id END AS touch_id,
       CASE WHEN last_us IS NOT NULL
                 AND epoch_us(ts) - last_us <= 604800000000
            THEN epoch_us(ts) - last_us END AS gap_us
FROM lasts
WHERE event_type = 'purchase'
""",
)
def q_win_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION — the marketing-analytics staple every
    product warehouse runs nightly: each purchase is credited to the
    most recent marketing touch (view/click) by the same user within a
    7-day lookback; purchases with no qualifying touch are 'organic'.
    The touch is resolved with ``last(…, ignorenulls) OVER (ROWS …
    AND 1 PRECEDING)`` — three conditional columns (ts/id/type) that
    are null on exactly the same rows, so the three last_values pick
    one coherent touch row without a struct carry. The lookback
    compares integer MICROSECONDS on both engines (the q_win_lag_lead
    epoch identity — no date arithmetic seam); revenue rides as exact
    cents.

    Plan: ONE HashPartitioning(user_id) sort serves the whole operator
    — the window state is 3 scalars per user (the running last touch),
    the purchase filter projects after, and nothing re-shuffles. At
    100 TB this is the same shape as sessionization: linear scan per
    user partition, O(1) state, attribution output ∝ purchases only."""
    from cuny_courses_spark.common import fp

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        fp("value").alias("cents"),
    )
    is_touch = F.col("event_type").isin("view", "click")
    us = F.unix_micros("ts")
    e = e.withColumn("touch_us", F.when(is_touch, us)).withColumn(
        "touch_id", F.when(is_touch, F.col("event_id"))
    ).withColumn("touch_type", F.when(is_touch, F.col("event_type")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lasts = (
        e.withColumn("last_us", F.last("touch_us", ignorenulls=True).over(w))
        .withColumn("last_id", F.last("touch_id", ignorenulls=True).over(w))
        .withColumn(
            "last_type", F.last("touch_type", ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") == "purchase")
    )
    within = F.col("last_us").isNotNull() & (
        (us - F.col("last_us")) <= F.lit(604800000000)
    )
    return lasts.select(
        "user_id",
        "event_id",
        "cents",
        F.when(within, F.col("last_type"))
        .otherwise("organic")
        .alias("attributed"),
        F.when(within, F.col("last_id")).alias("touch_id"),
        F.when(within, us - F.col("last_us")).alias("gap_us"),
    )


@register(
    "q_win_period_over_period",
    oracle="""
WITH rev AS (
    SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, month
)
SELECT n_name, month, cents,
       lag(cents) OVER w AS prev_cents,
       cents - lag(cents) OVER w AS delta_cents,
       CASE WHEN cents > lag(cents) OVER w THEN 1
            WHEN cents < lag(cents) OVER w THEN -1
            WHEN lag(cents) OVER w IS NULL THEN NULL ELSE 0
       END AS direction,
       CASE WHEN lag(cents) OVER w > 0 THEN
            CAST((2 * (abs(cents - lag(cents) OVER w) * 10000)
                  + (lag(cents) OVER w))
                 // (2 * (lag(cents) OVER w)) AS DOUBLE) / 10000.0
       END AS pct_abs_change
FROM rev
WINDOW w AS (PARTITION BY n_name ORDER BY month)
""",
)
def q_win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERIOD-OVER-PERIOD GROWTH — the BI dashboard staple (MoM revenue
    per nation): grouped monthly revenue, previous month via lag, the
    absolute delta in exact cents, a -1/0/+1 direction, and the percent
    magnitude as the exact HALF-UP 4-dp integer ratio (S_r4_ratio on
    the ABSOLUTE delta — signed integer division truncates differently
    across engines, so sign travels separately and the ratio stays in
    the den>0, num≥0 regime the contract covers). First months emit
    NULLs, as every BI tool renders them.

    Plan: the fact reduces FIRST to |nations|·|months| grouped rows
    (map-side combined, dims broadcast), and the lag window runs over
    those partials — the q_win_share_of_total second-pass-is-free
    shape. At 100 TB the window state is one row per (nation, month):
    dashboard-sized regardless of order volume."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    # r15 optimization (guide §3.1): customer SCALES with SF, so its
    # broadcast must be gated, not pinned — the unconditional
    # F.broadcast(c) the query arrived with is wrong at 100 TB (a
    # billions-row driver collect). Same footer-stats gate as the star
    # family: broadcast while the table's parquet footer row count fits
    # _STAR_BCAST_ROWS (metadata read, zero jobs), shuffle join past it.
    # nation is bounded (25 rows forever) and stays pinned.
    from cuny_courses_spark.operators.joins import (
        _STAR_BCAST_ROWS,
        _footer_rows,
    )

    c_rows = _footer_rows(sf_dir, "customer")
    cb = F.broadcast(c) if (c_rows or 1 << 62) <= _STAR_BCAST_ROWS else c
    rev = (
        o.join(cb, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.sum(fp("o_totalprice").cast("decimal(38,0)"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("month")
    prev = F.lag("cents").over(w)
    delta = F.col("cents") - prev
    return rev.select(
        "n_name",
        "month",
        "cents",
        prev.alias("prev_cents"),
        delta.alias("delta_cents"),
        F.when(prev.isNull(), F.lit(None).cast("int"))
        .when(delta > 0, 1)
        .when(delta < 0, -1)
        .otherwise(0)
        .alias("direction"),
        F.when(
            prev > 0,
            F.expr(
                "CAST((2 * (abs(cents - lag(cents) OVER (PARTITION BY"
                " n_name ORDER BY month)) * 10000) + lag(cents) OVER"
                " (PARTITION BY n_name ORDER BY month)) div (2 *"
                " lag(cents) OVER (PARTITION BY n_name ORDER BY month))"
                " AS DOUBLE) / 10000.0"
            ),
        ).alias("pct_abs_change"),
    )
