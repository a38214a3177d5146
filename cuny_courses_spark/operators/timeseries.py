"""§2 E-ext — Batch time-series operators: sessionization and gap-fill.

Reference correspondence: the reference's session-log analytics
(event-stream grouping by inactivity gap) and its calendar-aligned report
tables (every day present, last observation carried forward) — SURVEY §2 E.
``q_stream_session`` is the streaming twin of the sessionize here; this is
the batch/backfill form that runs over historical parquet.

Determinism contract: inter-event gaps compare in integer MICROSECONDS on
both engines (Spark ``unix_micros`` after the ns→µs load truncation ≡
DuckDB ``epoch_us`` of the ns timestamp — the q_win_lag_lead-proven
identity), so the session-break predicate can never straddle a float or
sub-µs boundary. Event values are arbitrary doubles ⇒ sums go through
DECIMAL(30,6) (``dsum``), order-independent in both engines; daily totals
are rounded to 4 dp BEFORE the carry-forward so the filled value is the
exact emitted value.

Scale: both operators are one shuffle on ``user_id`` + a per-partition
sort. Session assignment is a running sum over the ordered partition
(bounded state); the downstream groupBy(user_id, session_id) reuses the
window's HashPartitioning(user_id) — partition keys are a subset of the
grouping keys, so EnsureRequirements inserts no second Exchange. The
gap-fill spine explodes at most (max_day − min_day) rows per user —
bounded by calendar length, not event count — and the LOCF window is the
same single partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.common import dsum, fmt_date, fmt_ts
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load

# 6 hours in µs: between the 25th (≈3 h) and 50th (≈7.5 h) percentile of
# inter-event gaps in the fixtures, so every SF yields a non-trivial mix of
# multi-event sessions and singletons.
_GAP_US = 6 * 3600 * 1_000_000


@register(
    "q_ts_sessionize",
    oracle=f"""
WITH g AS (
    SELECT user_id, ts, event_id, value,
           epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
), s AS (
    SELECT user_id, ts, value,
           CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {_GAP_US}
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM g
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4)
           AS total_value
FROM s GROUP BY user_id, session_id
""",
)
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization (batch): a new session starts when a
    user's gap since their previous event exceeds 6 h; emit per-session
    bounds, event count, and value total. The classic lag→flag→running-sum
    assignment; gaps compare as integer µs (see module contract)."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0)
    sess = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            fmt_ts(F.min("ts"), "session_start"),
            fmt_ts(F.max("ts"), "session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )


@register(
    "q_ts_gapfill_locf",
    oracle="""
WITH daily AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS total
    FROM events GROUP BY 1, 2
), spine AS (
    SELECT user_id,
           CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
                                       CAST(max(day) AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM daily GROUP BY user_id
)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
       last_value(d.total IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf,
       d.total IS NULL AS filled
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""",
)
def q_ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with last-observation-carried-forward: build each
    user's full daily spine between their first and last active day
    (``sequence`` + explode — never a driver loop), left-join the observed
    daily totals, and carry the last non-null total forward with
    ``last(..., ignorenulls)`` over the ordered partition. The first spine
    day is the user's min active day, so the carried value is never NULL.
    ``filled`` marks synthesized rows."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(dsum("value", "total"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        fmt_date("day", "day"),
        F.last("total", ignorenulls=True).over(w).alias("total_locf"),
        F.col("total").isNull().alias("filled"),
    )
