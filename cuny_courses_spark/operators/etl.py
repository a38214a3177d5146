"""§2 N — ETL / pipeline-maintenance operators.

This is the reference's own job, Sparkified (SURVEY §3.1-3.2): the
check_queries.py row-count gate, the referential-integrity audit logged
during load, the nightly rebuild-and-diff (snapshot MERGE classification),
effective-dated history, and delimited-attribute normalization.

Scale notes: the audit anti-joins broadcast the PK side when it's a dim and
shuffle-join for fact-fact edges; the snapshot diff is one full-outer join
on the natural key — the Spark-native MERGE without a table format (with
Delta/Iceberg the same classification drives a MERGE INTO; SURVEY §4 notes
the copy-on-write/merge-on-read tradeoff).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.common import O_fp, O_fpsum, fp, fpsum
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load

# (table, unique key) pairs for the rowcount gate.
_GATE = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


@register(
    "q_etl_rowcount_gate",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tname, count(*) AS n_rows, "
        f"CAST(min({k}) AS BIGINT) AS min_key, CAST(max({k}) AS BIGINT) AS max_key "
        f"FROM {t}"
        for t, k in _GATE
    ),
)
def q_etl_rowcount_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table row counts + key ranges as one unioned report — the
    reference's input-freshness/sanity gate (check_queries.py pattern)."""
    parts = []
    for t, k in _GATE:
        parts.append(
            load(spark, sf_dir, t).agg(
                F.lit(t).alias("tname"),
                F.count(F.lit(1)).alias("n_rows"),
                F.min(k).cast("long").alias("min_key"),
                F.max(k).cast("long").alias("max_key"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


# FK edges: (name, child table, child key, parent table, parent key)
_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
    ("documents->embeddings", "documents", "doc_id", "embeddings", "vec_id"),
]


@register(
    "q_etl_fk_orphans",
    oracle=" UNION ALL ".join(
        f"SELECT '{name}' AS edge, count(*) AS n_orphans FROM {c} "
        f"WHERE NOT EXISTS (SELECT 1 FROM {p} WHERE {p}.{pk} = {c}.{ck})"
        for name, c, ck, p, pk in _EDGES
    ),
)
def q_etl_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: dangling-FK counts across every edge of
    the star schema (all-zero at sf0.01 per FIXTURES; documents→embeddings
    goes non-zero at sf0.1 where the tables diverge — by design).

    r16 examined, unchanged: a bucketed-mirror variant (co-clustered
    anti-joins for the lineitem→orders and orders→customer edges)
    measured NO win at ×10 (2.21 vs 2.13 s best, interleaved laps
    overlapping) — the wall is spread across the 9-part union's job
    overhead and the unmirrored events/documents edges, not those two
    anti-joins. Rejected by measurement (OPTIMIZATION_r16.md)."""
    parts = []
    for name, c, ck, p, pk in _EDGES:
        child = load(spark, sf_dir, c)
        parent = load(spark, sf_dir, p)
        orphans = child.join(
            parent, child[ck] == parent[pk], "left_anti"
        )
        parts.append(
            orphans.agg(
                F.lit(name).alias("edge"), F.count(F.lit(1)).alias("n_orphans")
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


_O_OLD = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'"
_O_NEW = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice * 1.1, 2)
            ELSE o_totalprice END AS o_totalprice
FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
"""


@register(
    "q_etl_upsert_classify",
    oracle=f"""
SELECT CASE WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_totalprice <> o.o_totalprice THEN 'update'
            ELSE 'unchanged' END AS op,
       count(*) AS n
FROM ({_O_OLD}) o FULL JOIN ({_O_NEW}) n ON o.o_orderkey = n.o_orderkey
GROUP BY op
""",
)
def q_etl_upsert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff MERGE classification (nightly rebuild-and-diff): old
    snapshot = pre-2000 orders, new snapshot = 1996+ orders with a simulated
    price revision on every 10th key; full-outer join on the natural key →
    insert/update/delete/unchanged counts. This is the row-level-update
    answer at lake scale: classify, then rewrite only affected partitions."""
    o = load(spark, sf_dir, "orders")
    old = o.filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("p_old"))
    new = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(F.col("o_orderkey") % 10 == 0, F.round(F.col("o_totalprice") * 1.1, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("p_new"),
    )
    j = old.join(new, old.k_old == new.k_new, "full")
    op = (
        F.when(F.col("k_new").isNull(), "delete")
        .when(F.col("k_old").isNull(), "insert")
        .when(F.col("p_new") != F.col("p_old"), "update")
        .otherwise("unchanged")
    )
    return j.groupBy(op.alias("op")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_etl_scd2_ranges",
    oracle="""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       coalesce(strftime(lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d'),
           '9999-12-31') AS valid_to
FROM orders
""",
)
def q_etl_scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated history (SCD-2): each order versions its customer;
    valid_to = next version's date (open interval sentinel for the latest) —
    the latest-effective-date rule semantics generalized."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd"),
            F.lit("9999-12-31"),
        ).alias("valid_to"),
    )


@register(
    "q_etl_attribute_bridge",
    oracle="""
SELECT p_partkey,
       unnest(string_split(p_type || ' ' || p_name, ' ')) AS attr,
       unnest(range(len(string_split(p_type || ' ' || p_name, ' ')))) AS pos
FROM part
""",
)
def q_etl_attribute_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize a delimited attribute string into a bridge table
    (attributes-per-course CSV-list normalization): split + posexplode."""
    p = load(spark, sf_dir, "part")
    attrs = F.split(F.concat_ws(" ", "p_type", "p_name"), " ")
    return p.select(
        "p_partkey", F.posexplode(attrs).alias("pos", "attr")
    ).select("p_partkey", "attr", F.col("pos").cast("long").alias("pos"))


@register(
    "q_etl_csv_validation",
    oracle="""
SELECT count(*) AS n_valid,
       CAST(3 AS BIGINT) AS n_corrupt,
       count(*) AS n_expected
FROM region
""",
)
def q_etl_csv_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's check_queries.py input gate, Sparkified: read a CSV
    export carrying injected malformed rows in PERMISSIVE mode with a
    corrupt-record column and report valid/corrupt/expected counts — the
    load proceeds only when the gate passes (here the gate IS the query).

    The dirty file is deterministic: the region export plus three rows with
    a non-numeric key. Spark side: explicit schema + _corrupt_record
    (FAILFAST would abort; PERMISSIVE quarantines, the lake-ingest norm).
    The oracle (views-only, like q_scan_csv) states the expected gate
    outcome: n_valid = |region|, n_corrupt = the 3 injected rows. At scale
    this is one pass over the landing zone, no shuffle until the (tiny)
    aggregate."""
    from pathlib import Path

    from pyspark.sql import types as T

    from cuny_courses_spark.operators.scans import _io_dir

    out = Path(_io_dir(sf_dir, "region_dirty_csv"))
    out.mkdir(parents=True, exist_ok=True)
    target = out / "part.csv"
    # Cap-guarded bounded-dim read (r5 verdict #3: this was the one
    # driver-side materialization not routed through the repo's own
    # _bounded_dim rule; region is a constant 5-row table).
    from cuny_courses_spark.operators.joins import _bounded_dim

    rows = sorted(
        _bounded_dim(spark, sf_dir, "region"),
        key=lambda r: r["r_regionkey"],
    )
    with open(target, "w") as f:
        f.write("r_regionkey,r_name\n")
        for r in rows:
            f.write(f"{r['r_regionkey']},{r['r_name']}\n")
        f.write("not_a_number,BADROW1\n")
        f.write("also_bad,BADROW2\n")
        f.write("NaNkey,BADROW3\n")

    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.LongType()),
            T.StructField("r_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    dirty = spark.read.csv(
        str(target),
        schema=schema,
        header=True,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()  # SPARK-21610: corrupt-record queries need the full row read
    counts = dirty.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_valid"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
    )
    expected = load(spark, sf_dir, "region").agg(
        F.count(F.lit(1)).alias("n_expected")
    )
    return counts.crossJoin(expected)


@register(
    "q_etl_incremental_agg",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       {O_fpsum(O_fp('o_totalprice'), 2, 'sum_price')}
FROM orders
GROUP BY o_orderpriority
""",
)
def q_etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: combine the OLD snapshot's stored
    partial-aggregate state with the DELTA's partials instead of
    recomputing — the merge-on-read foundation of an incrementally
    maintained 100 TB rollup (new_state = old_state ⊕ delta_partials; only
    the delta is scanned on update). Split: pre-1997 orders are the stored
    state, 1997+ the incoming delta. Exact fixed-point partials (sum as
    decimal(38,0) int, count) make ⊕ associative with zero float drift, so
    the result is bit-identical to the full recompute — which is exactly
    what the oracle computes.
    """
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(fp("o_totalprice").cast("decimal(38,0)")).alias("_s"),
        )

    state = partials(o.filter(F.col("o_orderdate") < cutoff))
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("_n").cast("long").alias("n_orders"),
            F.round(F.sum("_s").cast("double") / 100.0, 4).alias("sum_price"),
        )
    )


@register(
    "q_etl_calendar_spine",
    oracle=f"""
WITH spine AS (
    SELECT unnest(generate_series(
        TIMESTAMP '1995-01-01', TIMESTAMP '1998-12-01', INTERVAL 1 MONTH
    )) AS month_start
), per_month AS (
    SELECT date_trunc('month', o_orderdate) AS m,
           count(*) AS n,
           CAST(round(sum({O_fp('o_totalprice')})) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY m
)
SELECT strftime(s.month_start, '%Y-%m') AS month,
       coalesce(p.n, 0) AS n_orders,
       round(coalesce(p.cents, 0) / 100.0, 4) AS sum_price
FROM spine s LEFT JOIN per_month p ON s.month_start = p.m
""",
)
def q_etl_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: a generated month spine (1995-1998) left
    joined to per-month order aggregates, so months with zero orders emit
    explicit 0 rows — the time-series densification primitive reporting
    and window-over-time logic depend on (a gap-free spine is what makes
    'sum over the last 3 months' well-defined). The spine is generated
    declaratively (``sequence`` + ``explode``), never driver-side; at any
    scale it stays tiny (one row per period) and broadcasts."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("1998-12-01").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    o = load(spark, sf_dir, "orders")
    per_month = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(fp("o_totalprice").cast("decimal(38,0)")))
            .cast("long")
            .alias("cents"),
        )
    )
    j = spine.join(per_month, spine.month_start == per_month.m, "left")
    return j.select(
        F.date_format("month_start", "yyyy-MM").alias("month"),
        F.coalesce("n", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("cents", F.lit(0)) / 100.0, 4).alias("sum_price"),
    )


@register(
    "q_etl_compact_small_files",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY day
""",
)
def q_etl_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lake-maintenance job that keeps a 100 TB
    table scannable. A fragmented landing write (64 shards here; thousands
    of per-micro-batch files in production) is rewritten into a few
    well-sized files via ``coalesce`` (narrow — no shuffle: each output
    task concatenates input shards). Correctness contract: compaction must
    be content-neutral — the per-day aggregate over the compacted copy
    hash-matches the oracle over the original table. The test additionally
    asserts the file count actually dropped (tests/test_internal.py)."""
    from pathlib import Path

    from cuny_courses_spark.common import vsum
    from cuny_courses_spark.operators.scans import _io_dir

    frag = _io_dir(sf_dir, "events_fragmented")
    compact = _io_dir(sf_dir, "events_compacted")
    e = load(spark, sf_dir, "events")
    e.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(
        compact
    )
    back = spark.read.parquet(compact)
    return back.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"), vsum("value", "sum_value"))


@register(
    "q_etl_partition_overwrite_dynamic",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CASE WHEN year(o_orderdate) = 1997
            THEN lower(o_orderstatus) ELSE o_orderstatus END AS status,
       count(*) AS n
FROM orders GROUP BY o_year, status
""",
)
def q_etl_partition_overwrite_dynamic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition overwrite — the backfill primitive: rewrite ONE
    partition of a partitioned table in place, leaving every other
    partition's files untouched (no full-table rewrite — at 100 TB a
    year's backfill must not rewrite the decade). With
    ``partitionOverwriteMode=dynamic``, an overwrite-mode write replaces
    only the partitions present in the incoming DataFrame. Here: seed the
    year-partitioned table, then backfill 1997 with a transformed copy
    (status lowercased); the readback must show 1997 transformed and all
    other years intact."""
    from cuny_courses_spark.operators.scans import _io_dir

    out = _io_dir(sf_dir, "orders_backfill")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    cols = ["o_orderkey", "o_orderstatus", "o_year"]
    o.select(cols).write.mode("overwrite").partitionBy("o_year").parquet(out)
    fixed = (
        o.filter(F.col("o_year") == 1997)
        .withColumn("o_orderstatus", F.lower("o_orderstatus"))
        .select(cols)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("o_year").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Explicit schema: a zero-file partitioned dataset (empty input) has
    # nothing to infer from (r3 verdict #6).
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_year long"
    ).parquet(out)
    return back.groupBy(
        F.col("o_year").cast("long").alias("o_year"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_etl_merge_cow",
    oracle=f"""
WITH tgt AS (
    SELECT o_orderkey, o_totalprice, year(o_orderdate) AS y
    FROM orders WHERE year(o_orderdate) <= 2000
), upd AS (
    SELECT o_orderkey,
           ((CAST(round(o_totalprice * 100) AS BIGINT) * 11 + 5) // 10)
               / 100.0 AS o_totalprice,
           year(o_orderdate) AS y
    FROM orders
    WHERE year(o_orderdate) IN (1999, 2000) AND o_orderkey % 10 = 0
), del AS (
    SELECT o_orderkey FROM orders
    WHERE year(o_orderdate) = 2000 AND o_orderkey % 10 = 5
), ins AS (
    SELECT o_orderkey, o_totalprice, year(o_orderdate) AS y
    FROM orders WHERE year(o_orderdate) = 2001
), merged AS (
    SELECT * FROM tgt
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      AND o_orderkey NOT IN (SELECT o_orderkey FROM del)
    UNION ALL SELECT * FROM upd
    UNION ALL SELECT * FROM ins
)
SELECT CAST(y AS BIGINT) AS o_year, count(*) AS n,
       {O_fpsum(O_fp('o_totalprice'), 2, 'sum_price')}
FROM merged GROUP BY y
""",
)
def q_etl_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE (r2 verdict #6): apply an upsert-classified
    changeset — updates (1999-2000 keys ≡ 0 mod 10, price +10 %), deletes
    (2000 keys ≡ 5 mod 10), inserts (all of 2001) — to a year-partitioned
    parquet table by REWRITING ONLY THE AFFECTED PARTITIONS, the
    lake-maintenance answer to row-level updates without a table format.

    Mechanics: seed the base table partitioned by o_year; derive the
    affected-partition set FROM THE CHANGESET (distinct years of
    update/delete/insert rows — 1999/2000/2001 here, while 1995-1998 files
    are never opened); build each affected partition's replacement content
    as (base rows − update keys − delete keys) ∪ updated ∪ inserted; write
    with ``partitionOverwriteMode=dynamic`` so exactly those partitions
    swap in one atomic-per-partition overwrite. The readback aggregate
    hash-matches the oracle's full logical MERGE over the source table —
    content equality of COW vs rebuild — and tests/test_internal.py
    asserts the untouched partitions' files really predate the merge. At
    100 TB this is the COW cycle every lakehouse MERGE performs: changeset
    joins are keyed shuffles, the rewrite volume scales with affected
    partitions only, and the final write is an O(#affected) metadata swap."""
    from cuny_courses_spark.operators.scans import _io_dir

    out = _io_dir(sf_dir, "orders_merge_cow")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").alias("o_year"),
    )
    target = o.filter(F.col("o_year") <= 2000)
    target.write.mode("overwrite").partitionBy("o_year").parquet(out)

    # +10 % in exact integer cents, HALF_UP ((c·11 + 5) div 10): a double
    # round(p·1.1, 2) straddles engine rounding seams on half-cent
    # boundaries; the integer image is bit-identical everywhere.
    upd = o.filter(
        F.col("o_year").isin(1999, 2000) & (F.col("o_orderkey") % 10 == 0)
    ).select(
        "o_orderkey",
        (
            ((fp("o_totalprice") * 11 + 5) / 10).cast("long").cast("double")
            / 100.0
        ).alias("o_totalprice"),
        "o_year",
    )
    dele = o.filter(
        (F.col("o_year") == 2000) & (F.col("o_orderkey") % 10 == 5)
    ).select("o_orderkey", "o_year")
    ins = o.filter(F.col("o_year") == 2001)

    affected = (
        upd.select("o_year")
        .unionByName(dele.select("o_year"))
        .unionByName(ins.select("o_year"))
        .distinct()
    )
    # Explicit schema on both read-backs: an empty source writes a
    # zero-file partitioned target, breaking inference (r3 verdict #6).
    _cow_schema = "o_orderkey long, o_totalprice double, o_year int"
    base = spark.read.schema(_cow_schema).parquet(out)
    replacement = (
        base.join(F.broadcast(affected), "o_year")
        .join(upd.select("o_orderkey"), "o_orderkey", "left_anti")
        .join(dele.select("o_orderkey"), "o_orderkey", "left_anti")
        .select("o_orderkey", "o_totalprice", "o_year")
        .unionByName(upd)
        .unionByName(ins)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        replacement.write.mode("overwrite").partitionBy("o_year").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.schema(_cow_schema).parquet(out)
    return back.groupBy(F.col("o_year").cast("long").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n"),
        fpsum(fp("o_totalprice"), 2, "sum_price"),
    )


@register(
    "q_etl_skew_audit",
    oracle="""
WITH per_key AS (
    SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS log2_bucket,
       count(*) AS n_keys,
       min(cnt) AS min_cnt,
       max(cnt) AS max_cnt,
       CAST(sum(cnt) AS BIGINT) AS sum_rows
FROM per_key
GROUP BY log2_bucket
""",
)
def q_etl_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew audit: per-key row counts bucketed into a log2 histogram —
    the pre-join diagnostic that finds heavy-hitter keys BEFORE they melt a
    shuffle at 100 TB (feeds the salting / AQE-skew-join decision, see
    q_agg_salted_skew). Two keyed aggregations, both with map-side partial
    agg; the histogram output is tiny regardless of input scale.

    The log2 bucket is computed as length(bin(cnt))−1 — pure integer/string
    arithmetic, exact at power-of-2 boundaries where a float log2 could
    round either way (both engines share the identity)."""
    e = load(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_key.groupBy(
            (F.length(F.bin("cnt")) - 1).cast("long").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("cnt").alias("min_cnt"),
            F.max("cnt").alias("max_cnt"),
            F.sum("cnt").alias("sum_rows"),
        )
    )


def _z16(x: str, y: str, div: str) -> str:
    """16-bit Morton/Z-value of two 8-bit bucket expressions, as pure
    div/mod/multiply arithmetic (identical semantics in Spark SQL—``div``—
    and DuckDB—``//``; no engine-specific bit operators)."""
    terms = []
    for i in range(8):
        p2, p4 = 1 << i, 1 << (2 * i)
        terms.append(f"((({x}) {div} {p2}) % 2) * {p4}")
        terms.append(f"((({y}) {div} {p2}) % 2) * {2 * p4}")
    return " + ".join(terms)


@register(
    "q_etl_zorder_layout",
    oracle=f"""
WITH b AS (
    SELECT o_orderkey,
           o_custkey % 256 AS xb,
           CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
               % 256 AS yb
    FROM orders
), z AS (
    SELECT xb, yb, CAST(({_z16('xb', 'yb', '//')}) // 256 AS BIGINT)
               AS file_id
    FROM b
)
SELECT file_id, count(*) AS n_rows,
       min(xb) AS min_x, max(xb) AS max_x,
       min(yb) AS min_y, max(yb) AS max_y,
       CAST(max(xb) - min(xb) + max(yb) - min(yb) AS BIGINT) AS bbox_span
FROM z GROUP BY file_id
""",
)
def q_etl_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering audit — the multi-dimensional
    layout optimization behind Delta/Iceberg OPTIMIZE ZORDER: interleave
    the bits of two query dimensions (customer bucket × order-day bucket),
    split the curve into 256 file-sized ranges, and report each range's
    bounding box. The payoff shown by `bbox_span`: z-ranges are tight in
    BOTH dimensions at once, so parquet min/max stats prune scans for
    predicates on either column — a single-column sort gives tight spans
    in one dimension and full-width spans in the other. At 100 TB this is
    `repartitionByRange(z).sortWithinPartitions(z)` before the write; here
    the audit aggregates the same assignment declaratively (one keyed agg,
    map-side partials).

    The Morton value is pure div/mod arithmetic (no engine bit operators)
    so both engines compute identical file assignments."""
    o = load(spark, sf_dir, "orders")
    b = o.select(
        (F.col("o_custkey") % 256).alias("xb"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            % 256
        ).alias("yb"),
    )
    z = b.select(
        "xb",
        "yb",
        F.expr(f"CAST(({_z16('xb', 'yb', 'div')}) div 256 AS BIGINT)").alias(
            "file_id"
        ),
    )
    return z.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("min_x"),
        F.max("xb").alias("max_x"),
        F.min("yb").alias("min_y"),
        F.max("yb").alias("max_y"),
        F.expr(
            "CAST(max(xb) - min(xb) + max(yb) - min(yb) AS BIGINT)"
        ).alias("bbox_span"),
    )


@register(
    "q_etl_dq_rules",
    oracle="""
WITH m AS (
    SELECT count(*) AS n_rows,
           count(*) - count(o_custkey) AS null_custkey,
           count(*) - count(o_totalprice) AS null_totalprice,
           count(*) - count(DISTINCT o_orderkey) AS dup_orderkey,
           count(*) FILTER (WHERE o_totalprice <= 0) AS nonpos_price,
           count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                               OR o_orderdate >= TIMESTAMP '1999-01-01')
               AS date_out_of_range,
           count(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
               AS bad_status
    FROM orders
)
SELECT rule, CAST(violations AS BIGINT) AS violations FROM (
    SELECT 'null_custkey' AS rule, null_custkey AS violations FROM m
    UNION ALL SELECT 'null_totalprice', null_totalprice FROM m
    UNION ALL SELECT 'dup_orderkey', dup_orderkey FROM m
    UNION ALL SELECT 'nonpos_price', nonpos_price FROM m
    UNION ALL SELECT 'date_out_of_range', date_out_of_range FROM m
    UNION ALL SELECT 'bad_status', bad_status FROM m
)
""",
)
def q_etl_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule audit (the Deequ pattern): completeness
    (null counts), uniqueness (key duplication), and domain/range rules
    (non-positive price, out-of-range date, unknown status) — evaluated in
    ONE scan as conditional aggregates, then unpivoted to (rule,
    violations) rows. At 100 TB this is the difference between one pass
    and six: every rule is a partial-aggregable counter, so the audit
    costs a single map-side-combined aggregation regardless of rule count;
    the unpivot is a 1-row Expand."""
    o = load(spark, sf_dir, "orders")
    m = o.agg(
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_totalprice"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "dup_orderkey"
        ),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos_price"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("1999-01-01").cast("timestamp")
                ),
                1,
            )
        ).alias("date_out_of_range"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
        ).alias("bad_status"),
    )
    return m.selectExpr(
        "stack(6, "
        "'null_custkey', null_custkey, "
        "'null_totalprice', null_totalprice, "
        "'dup_orderkey', dup_orderkey, "
        "'nonpos_price', nonpos_price, "
        "'date_out_of_range', date_out_of_range, "
        "'bad_status', bad_status) AS (rule, violations)"
    ).selectExpr("rule", "CAST(violations AS BIGINT) AS violations")


@register(
    "q_etl_snapshot_diff",
    oracle="""
WITH v1 AS (
    SELECT o_orderkey, o_orderstatus AS st,
           CAST(round(o_totalprice * 100) AS BIGINT) AS tp
    FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
), v2 AS (
    SELECT o_orderkey,
           CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                THEN 'F' ELSE o_orderstatus END AS st,
           CAST(round(o_totalprice * 100) AS BIGINT) AS tp
    FROM orders
    WHERE o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
      AND o_orderstatus <> 'P'
)
SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
            WHEN v2.o_orderkey IS NULL THEN 'removed'
            WHEN v1.st <> v2.st OR v1.tp <> v2.tp THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       count(*) AS n,
       CAST(sum(COALESCE(v1.o_orderkey, v2.o_orderkey)) AS BIGINT) AS key_sum
FROM v1 FULL JOIN v2 ON v1.o_orderkey = v2.o_orderkey
GROUP BY change_type
""",
)
def q_etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC derivation: compare two table versions by
    primary key and classify every key as added / removed / changed /
    unchanged, with counts and a key checksum per class. v1 = orders
    before 2000; v2 = a later cutoff with early orders force-finalized
    (simulated update) and 'P' rows dropped (simulated delete) — so all
    four classes are non-empty on real fixture data. One full outer join
    on the key; values compare on the exact-cents image. At 100 TB this
    is the incremental-ingest reconciliation pattern: both sides shuffle
    once on the key, AQE splits skewed keys, and the classifier is a
    narrow projection over the joined row."""
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("st1"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("tp1"),
    )
    v2 = (
        o.filter(
            (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
            & (F.col("o_orderstatus") != "P")
        )
        .select(
            F.col("o_orderkey").alias("k2"),
            F.when(
                F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"), "F"
            )
            .otherwise(F.col("o_orderstatus"))
            .alias("st2"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("tp2"),
        )
    )
    j = v1.join(v2, v1.o_orderkey == v2.k2, "full")
    change = (
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(
            (F.col("st1") != F.col("st2")) | (F.col("tp1") != F.col("tp2")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(
            change.alias("change_type"),
            F.coalesce("o_orderkey", "k2").alias("key"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("key").cast("long").alias("key_sum"),
        )
    )


# --------------------------------------------------------- q_etl_table_stats


# (column, fixed-point digits or None for raw ints) per profiled lineitem
# column — all stats land in ONE integer domain so the output schema is a
# uniform long-format table. Spark Column objects are built lazily inside
# the query (a module import must never need an active SparkContext).
_PROFILE_COLS = [
    ("l_orderkey", None),
    ("l_partkey", None),
    ("l_quantity", 0),
    ("l_extendedprice", 2),
    ("l_discount", 2),
    ("l_tax", 2),
]


def _profile_cols():
    return [
        (name, F.col(name) if d is None else fp(name, d))
        for name, d in _PROFILE_COLS
    ]


def _table_stats_oracle() -> str:
    parts = []
    for name, d in _PROFILE_COLS:
        expr = name if d is None else O_fp(name, d)
        parts.append(
            f"""
SELECT '{name}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({expr}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv,
       min({expr}) AS min_v,
       max({expr}) AS max_v
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(parts)


@register("q_etl_table_stats", oracle=_table_stats_oracle())
def q_etl_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the fact table: per column, row
    count, null count, EXACT distinct count, and min/max — the statistics
    a cost-based optimizer, data-quality monitor, or file-skipping index
    builds at ingest. Long format (one row per column), values in each
    column's exact-integer image (keys as-is, decimals in fixed-point
    cents) so the whole profile is one BIGINT-typed relation.

    r16 (guide §2.3 — the round's family-profiling pass ranked this the
    most expensive etl/lake/scan query at ×10, 2.60 s noop): the r15
    single-agg form packed all six ``count_distinct`` into one
    aggregate, which Catalyst plans via **Expand** — every input row is
    replicated 7× (one per distinct group + 1) before the partial
    aggregate, so the "ONE pass" actually pushed 7× the fact rows
    through aggregation. The per-column UNION form runs six independent
    single-distinct aggregates (each a two-level partial-distinct over
    ONE column, no Expand): 2.60 → 1.24 s best-of-5 at ×10, results
    verified identical row-for-row. At 100 TB both forms read the same
    column bytes; the union avoids the 7× row amplification and its six
    jobs can overlap (guide §2.6). Exact NDVs stay the declared
    semantics — the sketch swap (approx_count_distinct) remains the
    documented large-profile alternative."""
    li = load(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(name).alias("column_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias("n_nulls"),
            F.count_distinct(col).cast("long").alias("ndv"),
            F.min(col).cast("long").alias("min_v"),
            F.max(col).cast("long").alias("max_v"),
        )
        for name, col in _profile_cols()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@register(
    "q_etl_observe_metrics",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
            AS BIGINT) AS n_bad_status,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
           AS n_nonpositive
FROM orders
""",
)
def q_etl_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIPELINE OBSERVABILITY via the Observation API (`df.observe`):
    data-quality metrics — row count, out-of-domain statuses, nonpositive
    amounts, exact cents total — are collected ON THE SAME PASS as the
    pipeline's real work (here a per-customer distinct count), not by a
    second scan. This is the production freshness/quality-gate pattern:
    at 100 TB a dedicated metrics scan doubles the read bill, while
    observed metrics ride the AccumulatorV2 channel for free with the
    action that was running anyway. countDistinct is NOT observable
    (observers must be commutative accumulator updates), so the
    distinct count comes from the pipeline result itself — exactly the
    division of labor the API enforces. All metrics are exact integers;
    the emitted frame is the metrics row, hash-checked like any query."""
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("F", "O", "P"), 1
            ).otherwise(0)
        ).alias("n_bad_status"),
        F.sum(fp("o_totalprice")).alias("sum_cents"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("n_nonpositive"),
    )
    # the pipeline's real action: distinct customers (one job; metrics
    # piggyback on it through the accumulator channel)
    n_customers = observed.select("o_custkey").distinct().count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_bad_status"] or 0),
                int(n_customers),
                int(m["sum_cents"] or 0),
                int(m["n_nonpositive"] or 0),
            )
        ],
        "n_rows long, n_bad_status long, n_customers long,"
        " sum_cents long, n_nonpositive long",
    )


@register(
    "q_etl_hash_chain",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, ts, event_type
    FROM events
), chains AS (
    SELECT user_id,
           count(*) AS n_events,
           list_reduce(
               list_prepend('GENESIS',
                   list_transform(
                       list_sort(list(
                           [epoch_us(ts)::VARCHAR, event_id::VARCHAR,
                            event_type])),
                       r -> r[2] || ':' || r[3])),
               (acc, x) -> md5(acc || '|' || x)) AS chain_hash
    FROM e GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events, chain_hash
FROM chains
""",
)
def q_etl_hash_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAMPER-EVIDENT HASH CHAIN over an append-only event log — the
    audit-log integrity primitive (Merkle-chain verification: any
    inserted, dropped, reordered, or altered event changes every
    downstream link, so ONE hash per user certifies the whole history):
    each user's events in a canonical total order (lexicographic on the
    [µs-string, id-string, type] image — identical bytes in both
    engines, so the canon needs no numeric-sort parity) fold left-to-right
    as ``h_i = md5(h_{i-1} | event_i)`` from a GENESIS seed; the final
    link plus the event count is the user's integrity certificate. The
    fold MUST be sequential — that is the point of a chain — but it is
    sequential per user and parallel across users (the same axis
    argument as BPE/MMR/LTTB); the DuckDB twin folds the identically
    sorted list, so a single out-of-order row hash-FAILs the driver.

    Plan: ONE user-keyed exchange (groupBy collect), array_sort for the
    total order, then a JVM `aggregate` lambda fold — no UDF, state =
    one 32-char digest per user in flight. At 100 TB the chain head per
    key is exactly what a streaming twin would checkpoint; re-running
    the fold over a closed day and comparing heads IS the audit."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.aggregate(
                F.expr(
                    "transform(array_sort(collect_list(array("
                    "CAST(unix_micros(ts) AS STRING),"
                    " CAST(event_id AS STRING), event_type))),"
                    " r -> concat(r[1], ':', r[2]))"
                ),
                F.lit("GENESIS"),
                lambda acc, x: F.md5(
                    F.concat(acc, F.lit("|"), x).cast("binary")
                ),
            ).alias("chain_hash"),
        )
        .select("user_id", "n_events", "chain_hash")
    )
