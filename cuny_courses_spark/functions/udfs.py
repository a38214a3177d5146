"""§2 M — UDF / UDAF / UDTF surface.

Reference correspondence: the loaders' row transforms are all, in effect,
Python UDFs (SURVEY §2 M). The engine keeps Python at the edges:

- q_udf_python is the deliberately-slow row-at-a-time baseline (kept for
  parity demonstration — it serializes row by row over Py4J);
- q_udf_pandas_scalar is the same logic Arrow-vectorized (~10-100× faster
  at scale; this is the only Python pattern allowed in hot paths);
- q_udaf_pandas_grouped is applyInPandas cogrouped aggregation;
- q_udtf_explode is a Python UDTF (Spark ≥ 3.5) emitting multiple rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load

_BRAND_ORACLE = """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num
FROM part
"""


@register("q_udf_python", oracle=_BRAND_ORACLE)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: 'Brand#17' → 17 (catalog-number normalizer)."""

    # Unannotated on purpose: @udf tries pandas/arrow eval-type inference
    # when ANY hint is present, and a plain (str) -> int|None signature
    # isn't an inferable shape — it just raised a UserWarning per call
    # site (the last of the r5-verdict-#8 warning noise). No hints skips
    # inference silently; behavior (arrow-batched row UDF) is unchanged.
    @udf("bigint")
    def brand_num(s):
        if s is None or "#" not in s:
            return None
        try:
            return int(s.split("#", 1)[1])
        except ValueError:
            return None

    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", brand_num("p_brand").alias("brand_num"))


@register("q_udf_pandas_scalar", oracle=_BRAND_ORACLE)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same normalizer as an Arrow-batched pandas UDF — the scale path."""

    @pandas_udf("bigint")
    def brand_num(s: pd.Series) -> pd.Series:
        return (
            s.str.extract(r"#(\d+)$", expand=False).astype("float").astype("Int64")
        )

    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", brand_num("p_brand").alias("brand_num"))


@register(
    "q_udaf_pandas_grouped",
    oracle="""
SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median via applyInPandas (grouped-map, Arrow-batched).

    pandas ``median`` and DuckDB ``quantile_cont(0.5)`` both interpolate, so
    the oracle matches exactly. At 100 TB, each group must fit one executor's
    memory — returnflag has 3 groups, so one would pre-partition by a salt
    and merge medians approximately instead; that variant is q_agg_stats's
    ``percentile``.
    """
    li = load(spark, sf_dir, "lineitem")

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "median_qty": [round(float(pdf["l_quantity"].median()), 4)],
            }
        )

    return (
        li.select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(med, "l_returnflag string, median_qty double")
    )


@register(
    "q_udtf_explode",
    oracle="""
SELECT doc_id,
       unnest(string_split(text, ' ')) AS token,
       unnest(range(len(string_split(text, ' ')))) AS pos
FROM documents
WHERE doc_id < 20
""",
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one (token, pos) row per whitespace token of each doc."""

    @udtf(returnType="token: string, pos: bigint")
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield tok, i

    spark.udtf.register("split_tokens", SplitTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM v_docs_udtf d, LATERAL split_tokens(d.text) t
        WHERE d.doc_id < 20
        """
    )


@register(
    "q_udf_map_in_pandas",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wsum_cents
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas`` iterator transform — the whole-partition Arrow
    surface (vs pandas_udf's per-column and applyInPandas' per-group): the
    Python worker streams column batches, pre-aggregates each one, and
    emits ONE partial row per batch; the exact combine is a JVM groupBy
    over |batches| rows. This is the custom-partial-aggregation pattern
    for logic Spark can't express as an aggregate (here a qty-weighted
    cents sum, chosen because int64 partials make the fold exact and
    order-independent — the determinism contract survives batch
    boundaries by construction). Scale: Python touches each row once in
    Arrow batches (no per-row Py4J), the shuffle carries one row per
    batch, and the iterator form never materializes a partition in
    memory."""
    from collections.abc import Iterator

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cents = (b["l_extendedprice"] * 100).round().astype("int64")
            qty = b["l_quantity"].round().astype("int64")
            g = (
                pd.DataFrame(
                    {
                        "l_returnflag": b["l_returnflag"],
                        "n": 1,
                        "wsum_cents": cents * qty,
                    }
                )
                .groupby("l_returnflag", as_index=False)
                .sum()
            )
            yield g

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    parts = li.mapInPandas(
        partial, "l_returnflag string, n long, wsum_cents long"
    )
    return parts.groupBy("l_returnflag").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("wsum_cents").cast("long").alias("wsum_cents"),
    )


@register(
    "q_udf_map_in_arrow",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders
GROUP BY o_orderstatus
""",
)
def q_udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the ZERO-COPY Arrow-native whole-partition surface
    (Spark 3.3+; the fourth Python execution mode next to pandas_udf /
    applyInPandas / mapInPandas): the worker receives raw
    ``pyarrow.RecordBatch``es and computes with ``pyarrow.compute``
    kernels — no Arrow→pandas materialization, no index/copy overhead,
    the cheapest possible Python row-touch. Same custom-partial-
    aggregation contract as q_udf_map_in_pandas: one int64 partial row
    per (batch, status), exact JVM combine over |batches| rows —
    fixed-point cents keep the fold order-independent across batch
    boundaries."""
    from collections.abc import Iterator

    import pyarrow as pa

    def partial(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            cents = pc.cast(
                pc.round(pc.multiply(b.column("o_totalprice"), 100)),
                pa.int64(),
            )
            t = pa.table(
                {"o_orderstatus": b.column("o_orderstatus"), "c": cents}
            )
            g = t.group_by("o_orderstatus").aggregate(
                [("c", "count"), ("c", "sum")]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    g.column("o_orderstatus").combine_chunks(),
                    pc.cast(g.column("c_count"), pa.int64()).combine_chunks(),
                    g.column("c_sum").combine_chunks(),
                ],
                names=["o_orderstatus", "n", "c_sum"],
            )

    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    partials = o.mapInArrow(
        partial, "o_orderstatus string, n long, c_sum long"
    )
    return partials.groupBy("o_orderstatus").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("c_sum").cast("long").alias("sum_cents"),
    )


@register(
    "q_udf_apply_in_arrow",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5),
             4) AS median_cents
FROM orders
GROUP BY o_orderstatus
""",
)
def q_udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().applyInArrow`` — Spark 4's GROUPED Arrow-native UDF
    (the fifth Python execution mode, completing the M family next to
    pandas_udf / applyInPandas / mapInPandas / mapInArrow): each group
    arrives as ONE ``pyarrow.Table`` with zero pandas materialization,
    the shape for per-group logic that needs the WHOLE group and speaks
    columnar — here an exact per-status median of fixed-point cents
    (medians are the canonical can't-partial-aggregate statistic). The
    median of int64 cents has at most a .5 fraction, exactly
    representable — so numpy's linear interpolation and DuckDB's
    quantile_cont agree bit-for-bit and the hash comparison is sound.
    At 100 TB: one shuffle on the group key, each group processed
    columnar in a single worker pass; groups must fit a task (the same
    contract as any grouped-map UDF — salt or pre-aggregate when they
    don't)."""
    import numpy as np
    import pyarrow as pa

    def stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderstatus": pa.array(
                    [t.column("o_orderstatus")[0].as_py()], pa.string()
                ),
                "n": pa.array([len(cents)], pa.int64()),
                "median_cents": pa.array(
                    [float(np.median(cents))], pa.float64()
                ),
            }
        )

    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    return o.groupBy("o_orderstatus").applyInArrow(
        stats, "o_orderstatus string, n long, median_cents double"
    )


@register(
    "q_udtf_partitioned_table_arg",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       max(gap) AS max_gap_us
FROM (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events
)
GROUP BY user_id
""",
)
def q_udtf_partitioned_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC UDTF OVER A PARTITIONED TABLE ARGUMENT (Spark 4's
    ``f(TABLE(t) PARTITION BY k ORDER BY o)`` — the SQL-standard
    table-function form Flink/Oracle users expect): one UDTF INSTANCE
    per user_id partition receives that user's rows in (ts, event_id)
    order through ``eval`` and emits its summary — event count + max
    inter-event gap in integer µs — from ``terminate`` at partition
    end. This is the custom-stateful-operator seam as a SQL verb: the
    engine owns the shuffle/sort (same exchange a window would use),
    the UDTF owns only O(1) running state (prev-ts, count, max), so the
    operator survives any partition size without materializing a
    user's history. The DuckDB twin is the lag-window recompute —
    bit-equality pins the partition-boundary protocol (a row leaking
    across instances, or unordered delivery, breaks max_gap). The
    row-at-a-time Python protocol is the API-coverage point, like
    q_udf_python; the JVM-side window twin q_win_lag_lead covers the
    fast path."""
    from pyspark.sql.functions import lit

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class UserSummary:
        def __init__(self):
            self._uid = None
            self._prev = None
            self._n = 0
            self._max = None

        def eval(self, row):
            self._uid = row["user_id"]
            us = row["us"]
            self._n += 1
            if self._prev is not None:
                gap = us - self._prev
                if self._max is None or gap > self._max:
                    self._max = gap
            self._prev = us

        def terminate(self):
            if self._n:
                yield self._uid, self._n, self._max

    spark.udtf.register("ccs_user_summary", UserSummary)
    load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).createOrReplaceTempView("ccs_udtf_events")
    return spark.sql(
        "SELECT * FROM ccs_user_summary("
        "TABLE(ccs_udtf_events) PARTITION BY user_id ORDER BY (us, event_id))"
    )
