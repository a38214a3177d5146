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
1e6 fixed-point split-long (``vsum`` — exact DECIMAL(30,6) twin on the
≤6-dp value contract), order-independent in both engines; daily totals
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

from cuny_courses_spark.common import fmt_date, fmt_ts, vsum
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
            vsum("value", "total_value"),
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
    ).agg(vsum("value", "total"))
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


@register(
    "q_ts_ewma",
    oracle="""
WITH w AS (
    SELECT event_id,
           list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
    FROM events
), t AS (
    SELECT event_id, len(l) AS m,
           CAST(list_sum(list_transform(l, (x, i) ->
               CASE WHEN i = 1
                    THEN CAST(round(x * 100) AS BIGINT)
                         * CAST(pow(7, len(l) - 1) AS BIGINT)
                    ELSE 3 * CAST(round(x * 100) AS BIGINT)
                         * CAST(pow(10, i - 2) AS BIGINT)
                         * CAST(pow(7, len(l) - i) AS BIGINT)
               END)) AS BIGINT) AS s
    FROM w
)
SELECT event_id,
       round(CAST(CASE WHEN m <= 3 THEN s * CAST(pow(10, 3 - m) AS BIGINT)
                  ELSE (2 * s + CAST(pow(10, m - 3) AS BIGINT))
                       // (2 * CAST(pow(10, m - 3) AS BIGINT))
             END AS DOUBLE) / 10000.0, 4) AS ewma10
FROM t
""",
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3), state truncated to
    the last 10 observations per user — the streaming-friendly smoother
    (trend estimate, anomaly baseline) in batch form.

    Arithmetic is EXACT INTEGER, not a float fold: events.value is a 2-dp
    decimal by data contract (verified 0 violations at every SF), so with
    X = value·100 the closed form of the truncated recursion
    ``e_t = 0.3·x_t + 0.7·e_{t−1}`` scaled by 10^(m+1) is a sum of int64
    terms ``3·X_k·10^(k−2)·7^(m−k)`` (plus ``X_1·7^(m−1)``), bounded by
    ~6·10^13 at m = 10 — and the 4-dp result is a HALF-UP integer division
    of that exact sum. A float fold was bit-identical across engines on
    the fold itself, but its outputs land EXACTLY on x.xxxx5 boundaries
    (finite-decimal inputs ⇒ finite-decimal EWMA), where Spark's
    shortest-repr HALF_UP and DuckDB's scaled-multiply rounding disagree
    on the binary neighbors — 20 divergent rows at sf0.1. Exact integers
    remove the seam instead of narrowing it. ``pow(7,9)``/``pow(10,8)``
    are < 2^53, exact in double, cast-exact to long. Scale: one exchange
    on user_id + a per-partition sort; per-row state is the ≤10-value
    frame — O(1), identical plan at any data size."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    terms = (
        "transform(_vals, (x, i) -> CASE WHEN i = 0"
        " THEN CAST(round(x * 100) AS BIGINT)"
        "      * CAST(pow(7, size(_vals) - 1) AS BIGINT)"
        " ELSE 3 * CAST(round(x * 100) AS BIGINT)"
        "      * CAST(pow(10, i - 1) AS BIGINT)"
        "      * CAST(pow(7, size(_vals) - 1 - i) AS BIGINT) END)"
    )
    s = f"aggregate({terms}, 0L, (a, b) -> a + b)"
    r4int = (
        f"CASE WHEN size(_vals) <= 3"
        f" THEN {s} * CAST(pow(10, 3 - size(_vals)) AS BIGINT)"
        f" ELSE (2 * {s} + CAST(pow(10, size(_vals) - 3) AS BIGINT))"
        f"      div (2 * CAST(pow(10, size(_vals) - 3) AS BIGINT)) END"
    )
    return (
        e.select("event_id", F.collect_list("value").over(w).alias("_vals"))
        .select(
            "event_id",
            F.round(F.expr(r4int).cast("double") / 10000.0, 4).alias(
                "ewma10"
            ),
        )
    )


@register(
    "q_ts_interpolate_linear",
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
), ctx AS (
    SELECT s.user_id, s.day, d.total,
           last_value(d.total IGNORE NULLS) OVER wp AS prev_v,
           last_value(CASE WHEN d.total IS NOT NULL THEN s.day END
                      IGNORE NULLS) OVER wp AS prev_d,
           first_value(d.total IGNORE NULLS) OVER wn AS next_v,
           first_value(CASE WHEN d.total IS NOT NULL THEN s.day END
                       IGNORE NULLS) OVER wn AS next_d
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY s.user_id ORDER BY s.day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       CASE
           WHEN total IS NOT NULL THEN total
           WHEN prev_v IS NULL THEN next_v
           WHEN next_v IS NULL THEN prev_v
           ELSE CAST((2 * (CAST(round(prev_v * 10000) AS BIGINT)
                           * (date_diff('day', prev_d, next_d)
                              - date_diff('day', prev_d, day))
                           + CAST(round(next_v * 10000) AS BIGINT)
                             * date_diff('day', prev_d, day))
                      + date_diff('day', prev_d, next_d))
                     // (2 * date_diff('day', prev_d, next_d)) AS DOUBLE)
                / 10000.0
       END AS total_interp,
       total IS NULL AS filled
FROM ctx
""",
)
def q_ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with LINEAR interpolation: missing days take the
    straight line between the surrounding observed daily totals (LOCF's
    step function is wrong for rates/levels that drift). Same bounded
    spine as q_ts_gapfill_locf; the bracketing observation on each side
    comes from two frames over ONE sorted partition — last non-null
    before (value + its day) and first non-null after — then one lerp in
    EXACT INT64: totals are 4-dp decimals (recovered as integer
    ten-thousandths), day offsets integers, so
    ``(T_prev·(n−k) + T_next·k) / n`` rounds half-up by integer division
    (S_r4_ratio rationale — a double lerp of 4-dp values at rational
    factor k/n lands exactly on the .xxxx5 boundaries where the engines'
    ``round()`` implementations disagree; the q_ts_ewma seam).
    Edge days (no bracket on one side) degrade to nearest-observation
    fill; observed days pass through exactly. Scale: the spine is bounded
    by calendar span per user, both windows share the user_id exchange and
    ONE per-partition sort (frames differ, sort key doesn't) — no second
    shuffle, no self-join against observation pairs."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(vsum("value", "total"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("total").isNotNull(), F.col("day"))
    ctx = j.select(
        "user_id",
        "day",
        "total",
        F.last("total", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("total", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("next_d"),
    )
    lerp = F.expr(
        "CAST((2 * (CAST(round(prev_v * 10000) AS BIGINT)"
        "           * (datediff(next_d, prev_d) - datediff(day, prev_d))"
        "           + CAST(round(next_v * 10000) AS BIGINT)"
        "             * datediff(day, prev_d))"
        "      + datediff(next_d, prev_d))"
        " div (2 * datediff(next_d, prev_d)) AS DOUBLE) / 10000.0"
    )
    return ctx.select(
        "user_id",
        fmt_date("day", "day"),
        F.when(F.col("total").isNotNull(), F.col("total"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(lerp)
        .alias("total_interp"),
        F.col("total").isNull().alias("filled"),
    )


@register(
    "q_ts_downsample_lttb",
    oracle="""
WITH RECURSIVE pts AS (
    SELECT event_type,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
), idx AS (
    SELECT event_type, x, y,
           row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM pts
), ends AS (
    SELECT event_type,
           min(CASE WHEN rn = 1 THEN x END) AS fx,
           min(CASE WHEN rn = 1 THEN y END) AS fy,
           min(CASE WHEN rn = n THEN x END) AS lx,
           min(CASE WHEN rn = n THEN y END) AS ly
    FROM idx GROUP BY event_type
), buckets AS (
    SELECT event_type, ((rn - 2) * 10) // (n - 2) AS b,
           array_agg({'x': x, 'y': y} ORDER BY x) AS cands,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(count(*) AS BIGINT) AS c
    FROM idx WHERE rn > 1 AND rn < n
    GROUP BY 1, 2
), anchors AS (
    SELECT bk.event_type, bk.b, bk.cands,
           coalesce(nb.sx, e.lx) AS nsx,
           coalesce(nb.sy, e.ly) AS nsy,
           coalesce(nb.c, 1) AS nc
    FROM buckets bk
    LEFT JOIN buckets nb
           ON nb.event_type = bk.event_type AND nb.b = bk.b + 1
    JOIN ends e ON e.event_type = bk.event_type
), state(event_type, b, ax, ay, picks) AS (
    SELECT event_type, 0, fx, fy,
           CAST([] AS STRUCT(x BIGINT, y BIGINT)[])
    FROM ends
    UNION ALL
    SELECT event_type, b + 1, px,
           list_min(list_transform(
               list_filter(scored, t -> t.sc = bsc AND t.x = px),
               t -> t.y)),
           list_append(picks, {'x': px,
               'y': list_min(list_transform(
                   list_filter(scored, t -> t.sc = bsc AND t.x = px),
                   t -> t.y))})
    FROM (
        SELECT event_type, b, picks, scored,
               list_max(list_transform(scored, t -> t.sc)) AS bsc,
               list_min(list_transform(
                   list_filter(scored,
                       t -> t.sc = list_max(list_transform(scored,
                                                           u -> u.sc))),
                   t -> t.x)) AS px
        FROM (
            SELECT s.event_type, s.b, s.picks,
                   list_transform(a.cands, cd -> {
                       'x': cd.x, 'y': cd.y,
                       'sc': abs((s.ax * a.nc - a.nsx) * (cd.y - s.ay)
                                 - (s.ax - cd.x) * (a.nsy - s.ay * a.nc))
                   }) AS scored
            FROM state s
            JOIN anchors a ON a.event_type = s.event_type AND a.b = s.b
            WHERE s.b < 10
        )
    )
), sel AS (
    SELECT event_type, unnest(picks) AS p
    FROM state WHERE b = 10
), rows_out AS (
    SELECT event_type, 0 AS pos, fx AS x, fy AS y FROM ends
    UNION ALL
    SELECT s.event_type,
           row_number() OVER (PARTITION BY s.event_type
                              ORDER BY p.x) AS pos,
           p.x, p.y
    FROM sel s
    UNION ALL
    SELECT event_type, 11 AS pos, lx, ly FROM ends
)
SELECT event_type, CAST(pos AS BIGINT) AS pos,
       strftime(DATE '1970-01-01' + CAST(x AS INTEGER), '%Y-%m-%d') AS day,
       y AS cents
FROM rows_out
""",
)
def q_ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB DOWNSAMPLING (Largest-Triangle-Three-Buckets, Steinarsson —
    the visual-fidelity decimation TimescaleDB/Grafana ship natively):
    each event type's daily series (30 points) reduces to 12 — first and
    last always kept, 10 interior index-buckets each contributing the
    point forming the LARGEST TRIANGLE with the previously SELECTED
    point and the NEXT bucket's average.

    ALL-INTEGER geometry: x = epoch day, y = exact daily cents; the
    next-bucket average never divides — the area comparison is
    cross-multiplied by the bucket size (|(ax·nc − Σx)(y − ay) −
    (ax − x)(Σy − ay·nc)| — 2·area·nc, same argmax), so the sequential
    selection trajectory (each pick feeds the next bucket's triangle)
    is bit-reproducible in both engines; ties break on earliest day.
    The DuckDB twin replays the bucket walk as a recursive CTE with the
    anchor point as carried state (the BPE/MMR oracle pattern);
    requires n > 12 points per series (the fixture's 30; shorter series
    are a pass-through a real deployment would special-case).

    Scale: the dense axis at 100 TB is raw events — reduced FIRST by
    the keyed daily aggregation (map-side combined); LTTB itself runs
    on the reduced per-series frame (30 rows/group) via applyInPandas,
    sequential only within a series, parallel across series. No global
    sort, no driver state."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "events")
    pts = (
        e.select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("x"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cents").cast("long").alias("y"))
    )

    def _lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x").reset_index(drop=True)
        n = len(pdf)
        xs = pdf["x"].to_numpy(dtype=np.int64)
        ys = pdf["y"].to_numpy(dtype=np.int64)
        et = pdf["event_type"].iloc[0]
        B = 10
        assert n > B + 2, "LTTB contract: series longer than n_out"
        # interior index-buckets: point k (0-based interior) -> bucket
        # floor(k*B / (n-2)); identical to the SQL ((rn-2)*10)//(n-2).
        buckets: list[list[int]] = [[] for _ in range(B)]
        for k in range(n - 2):
            buckets[(k * B) // (n - 2)].append(k + 1)
        ax, ay = int(xs[0]), int(ys[0])
        picks = []
        for b in range(B):
            cands = buckets[b]
            if b < B - 1 and buckets[b + 1]:
                nxt = buckets[b + 1]
                nsx = int(sum(int(xs[i]) for i in nxt))
                nsy = int(sum(int(ys[i]) for i in nxt))
                nc = len(nxt)
            else:
                nsx, nsy, nc = int(xs[-1]), int(ys[-1]), 1
            best_sc, best_i = None, None
            for i in cands:
                sc = abs(
                    (ax * nc - nsx) * (int(ys[i]) - ay)
                    - (ax - int(xs[i])) * (nsy - ay * nc)
                )
                if best_sc is None or sc > best_sc or (
                    sc == best_sc and xs[i] < xs[best_i]
                ):
                    best_sc, best_i = sc, i
            picks.append(best_i)
            ax, ay = int(xs[best_i]), int(ys[best_i])
        sel = [0] + picks + [n - 1]
        return pd.DataFrame(
            {
                "event_type": et,
                "pos": np.arange(len(sel), dtype=np.int64),
                "x": xs[sel],
                "cents": ys[sel],
            }
        )

    out = pts.groupBy("event_type").applyInPandas(
        _lttb, "event_type string, pos long, x long, cents long"
    )
    return out.select(
        "event_type",
        "pos",
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("x").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "cents",
    )


@register(
    "q_ts_hampel_outliers",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, ts,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
), arrs AS (
    SELECT user_id, event_id, cents,
           list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS arr
    FROM e
), med AS (
    SELECT user_id, event_id, cents, arr, list_sort(arr)[4] AS med_cents
    FROM arrs WHERE len(arr) = 7
)
SELECT user_id, event_id, med_cents,
       list_sort(list_transform(arr, v -> abs(v - med_cents)))[4]
           AS mad_cents,
       abs(cents - med_cents) AS dev_cents,
       abs(cents - med_cents) > 3 * list_sort(
           list_transform(arr, v -> abs(v - med_cents)))[4] AS is_anomaly
FROM med
""",
)
def q_ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL FILTER — rolling robust anomaly detection (the telemetry-
    cleaning standard: flag a point whose deviation from the TRAILING
    window median exceeds 3× that window's median absolute deviation;
    mean/stddev z-scores break because the outlier inflates its own
    threshold, the median/MAD pair doesn't). Window = the 7 points
    strictly BEFORE the current row (leave-self-out, so a spike can't
    vote on itself); rows without a full 7-point history are dropped —
    a detector that scores a 2-point history is noise.

    INTEGER-EXACT throughout: values are exact cents (2-dp contract),
    a 7-element median is the 4th order statistic — an integer, no
    midpoint averaging — so median, MAD, deviation, and the 3×MAD
    comparison are all int64 arithmetic; the float sqrt/σ of a z-score
    (and its cross-engine last-ulp drift) never appears. MAD = 0
    (constant window) degrades to flag-any-deviation, identically in
    both engines.

    Plan: ONE HashPartitioning(user_id) sort carries the whole
    operator — collect_list over the bounded 7-row frame, then
    per-row O(7 log 7) JVM array expressions (sort_array + element_at
    + transform); no second shuffle, no UDF, state = 7 int64 per row.
    At 100 TB this is the shape a stream twin inherits: bounded frame,
    keyed exchange, integer state."""
    from cuny_courses_spark.common import fp

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", fp("value").alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, -1)
    )
    arr = F.collect_list("cents").over(w)
    d = (
        e.select("user_id", "event_id", "cents", arr.alias("arr"))
        .filter(F.size("arr") == 7)
        .withColumn("med_cents", F.expr("sort_array(arr)[3]"))
    )
    mad = F.expr(
        "sort_array(transform(arr, v -> abs(v - med_cents)))[3]"
    )
    dev = F.abs(F.col("cents") - F.col("med_cents"))
    return d.select(
        "user_id",
        "event_id",
        "med_cents",
        mad.alias("mad_cents"),
        dev.alias("dev_cents"),
        (dev > 3 * mad).alias("is_anomaly"),
    )
