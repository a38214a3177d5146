"""§2 A — Scans, sources, sinks.

Reference correspondence: all reference inputs are CUNYfirst CSV exports read
via ``csv.reader``; the sink is a Postgres rebuild + archived dumps (SURVEY
§2 A, §3.1). Here: typed CSV/JSON readers (FAILFAST, explicit schema — never
inferSchema), parquet sink partitioned by a derived column, and
partition-pruned re-reads.

Scale: partitioned writes give partition pruning on the read path — the
`q_scan_partition_pruned` plan must show PartitionFilters, not a full scan
(asserted in tests/test_plans.py). Sink round-trips write to a per-sf temp
dir; outputs depend only on table contents, so re-writes are idempotent.
"""

from __future__ import annotations

import hashlib
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.common import O_fp, O_fpsum, fmt_ts, fp, fpsum, r4
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import SCHEMAS, load


def _io_dir(sf_dir: str, name: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = Path(tempfile.gettempdir()) / "ccs_io" / key / name
    return str(d)


@register(
    "q_scan_parquet",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_returnflag
FROM lineitem
""",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + 6-column projection (ReadSchema pruning)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_returnflag",
    )


@register("q_scan_csv", oracle="SELECT r_regionkey, r_name FROM region")
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip of ``region`` with explicit schema + header, FAILFAST —
    the reference's sole input format, typed at the boundary."""
    out = _io_dir(sf_dir, "region_csv")
    load(spark, sf_dir, "region").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return spark.read.csv(
        out, schema=SCHEMAS["region"], header=True, mode="FAILFAST"
    ).select("r_regionkey", "r_name")


@register(
    "q_scan_json",
    oracle=f"""
SELECT event_id, user_id, event_type,
       round(value, 4) AS value_r,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       props
FROM events
WHERE event_id < 100
""",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round-trip of 100 events rows with explicit schema."""
    out = _io_dir(sf_dir, "events_json")
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    ev.write.mode("overwrite").json(out)
    back = spark.read.json(out, schema=SCHEMAS["events"])
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        r4("value", "value_r"),
        fmt_ts("ts", "ts_s"),
        "props",
    )


@register(
    "q_sink_parquet_partitioned",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, count(*) AS n
FROM orders GROUP BY o_year
""",
)
def q_sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders partitioned by year, re-read, count per partition —
    the nightly-rebuild sink pattern, Sparkified as a partitioned lake write."""
    out = _io_dir(sf_dir, "orders_by_year")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    # Explicit read-back schema: an empty input writes a partitioned
    # dataset with zero files, which breaks schema inference — at 100 TB
    # an empty backfill window is routine, not exceptional (r3 verdict #6).
    back = spark.read.schema(o.schema).parquet(out)
    return back.groupBy(F.col("o_year").cast("long").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_scan_orc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip of ``nation`` — the second columnar lake format the
    engine speaks natively (Spark's vectorized ORC reader, same pushdown /
    pruning machinery as parquet). Oracle reads the parquet view; values
    must survive the format round-trip bit-exactly."""
    out = _io_dir(sf_dir, "nation_orc")
    load(spark, sf_dir, "nation").write.mode("overwrite").orc(out)
    return spark.read.orc(out).select("n_nationkey", "n_name", "n_regionkey")


@register(
    "q_scan_schema_evolution",
    oracle=f"""
WITH merged AS (
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_total FROM orders
    WHERE year(o_orderdate) < 1997
    UNION ALL
    SELECT o_orderkey, o_totalprice AS o_total FROM orders
    WHERE year(o_orderdate) >= 1997
)
SELECT CAST(o_total IS NOT NULL AS BIGINT) AS has_total,
       count(*) AS n,
       {O_fpsum(O_fp('o_total'), 2, 'total')}
FROM merged GROUP BY has_total
""",
)
def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: an old batch written without ``o_total`` and a
    new batch written with it live in one dataset; ``mergeSchema=true``
    unions the file schemas and back-fills NULL for the missing column —
    how a 100 TB lake absorbs additive schema change without rewriting
    history. Aggregates by column presence so the NULL back-fill itself is
    what's checked."""
    base = Path(_io_dir(sf_dir, "orders_evolving"))
    o = load(spark, sf_dir, "orders")
    old = o.filter(F.year("o_orderdate") < 1997).select("o_orderkey")
    new = o.filter(F.year("o_orderdate") >= 1997).select(
        "o_orderkey", F.col("o_totalprice").alias("o_total")
    )
    old.write.mode("overwrite").parquet(str(base / "batch=v1"))
    new.write.mode("overwrite").parquet(str(base / "batch=v2"))
    back = spark.read.option("mergeSchema", True).parquet(
        str(base / "batch=v1"), str(base / "batch=v2")
    )
    return back.groupBy(
        F.col("o_total").isNotNull().cast("long").alias("has_total")
    ).agg(F.count(F.lit(1)).alias("n"), fpsum(fp("o_total"), 2, "total"))


@register(
    "q_scan_partition_pruned",
    oracle=f"""
SELECT count(*) AS n, {O_fpsum(O_fp('o_totalprice'), 2, 'total')}
FROM orders WHERE year(o_orderdate) = 1997
""",
)
def q_scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back exactly one year partition (static partition pruning: the
    plan's PartitionFilters excludes every other directory)."""
    out = _io_dir(sf_dir, "orders_by_year")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    # Idempotent: (re)write the partitioned copy, then prune-read one year.
    # Explicit schema on the read-back: zero-file partitioned datasets
    # (empty input) have nothing to infer from (r3 verdict #6).
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.schema(o.schema).parquet(out).filter(
        F.col("o_year") == 1997
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"), fpsum(fp("o_totalprice"), 2, "total")
    )


@register(
    "q_scan_python_datasource",
    oracle="""
SELECT CAST(id % 7 AS BIGINT) AS bucket, count(*) AS n,
       CAST(sum(id * id) AS BIGINT) AS sum_sq,
       min(concat('row-', CAST(id AS VARCHAR))) AS min_label
FROM range(10000) t(id)
GROUP BY bucket
""",
)
def q_scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python Data Source API
    (sources/pyds.py): a deterministic generator source planned as 8
    InputPartitions — each task generates only its slice (no driver
    materialization), then a normal distributed aggregate on top. The
    DuckDB oracle regenerates the same rows from range(); sf_dir is
    unused (the source is external by construction, like the REST/feed
    connectors it models)."""
    from cuny_courses_spark.sources.pyds import ensure_registered

    ensure_registered(spark)
    df = spark.read.format("seqgen").option("n", 10000).option("partitions", 8).load()
    return (
        df.groupBy((F.col("id") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("square").cast("long").alias("sum_sq"),
            F.min(F.concat(F.lit("row-"), F.col("id").cast("string"))).alias(
                "min_label"
            ),
        )
    )


@register(
    "q_scan_text_lines",
    oracle="""
SELECT count(*) AS n_lines,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(min(length(text)) AS BIGINT) AS min_chars,
       CAST(max(length(text)) AS BIGINT) AS max_chars
FROM documents
""",
)
def q_scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text round-trip: documents' text written with
    ``df.write.text`` (one line per doc — the fixture text is newline-free
    by contract) and read back with ``spark.read.text``, the raw-corpus
    ingestion format every training pipeline starts from. Aggregate
    totals, not per-line rows: text files carry no key, so line order is
    partition-dependent — the roundtrip invariant is the multiset, probed
    by order-independent counts/lengths the oracle computes off the
    original table. Completes the source matrix (parquet/CSV/JSON/ORC/
    text); at scale the reader splits on line boundaries within
    maxPartitionBytes ranges like any other splittable source."""
    out = _io_dir(sf_dir, "documents_txt")
    load(spark, sf_dir, "documents").select("text").write.mode(
        "overwrite"
    ).text(out)
    lines = spark.read.text(out)
    ln = F.length("value")
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(ln).cast("long").alias("total_chars"),
        F.min(ln).cast("long").alias("min_chars"),
        F.max(ln).cast("long").alias("max_chars"),
    )


@register(
    "q_scan_csv_compressed",
    oracle="""
SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name) AS first_name
FROM nation GROUP BY n_regionkey
""",
)
def q_scan_csv_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed CSV round-trip of ``nation`` + aggregate readback —
    compressed text landing files are the normal ingest reality. The write
    sets ``codec=gzip``; the read is the SAME typed reader as q_scan_csv
    (codec inferred from the .gz extension, schema explicit, FAILFAST).
    The scale caveat this op exists to encode: gzip is NOT splittable —
    one .gz file = one task regardless of size, so at 100 TB the ingest
    layout must be many medium .gz files (or zstd/bzip2 splittable
    codecs), never one giant archive; Spark parallelizes across FILES
    here exactly as it would on a cluster."""
    out = _io_dir(sf_dir, "nation_csv_gz")
    load(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", True
    ).option("codec", "gzip").csv(out)
    back = spark.read.csv(
        out, schema=SCHEMAS["nation"], header=True, mode="FAILFAST"
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


@register(
    "q_scan_python_datasource_stream",
    oracle="""
WITH src AS (SELECT unnest(range(0, 1000)) AS id)
SELECT id % 7 AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(id * id) AS BIGINT) AS sum_sq,
       CAST(4 AS BIGINT) AS n_data_batches
FROM src GROUP BY bucket
""",
)
def q_scan_python_datasource_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING custom connector via the Spark 4 Python Data Source API
    (``DataSourceStreamReader``, sources/pyds.py): the seqgen feed is
    consumed as a REAL micro-batched stream — offsets are row cursors,
    ``latestOffset`` advances 250 rows per trigger (a paginated API /
    shard-cursor source shape), each batch plans 4 InputPartitions so
    consumption parallelizes exactly like the batch scan, and ``commit``
    is the cursor-ack seam. The job runs under a processing-time trigger
    until the bounded feed (n=1000) drains — exactly 4 data-carrying
    micro-batches, pinned in the output — then the per-bucket aggregate
    over the sink must match DuckDB's regeneration of the same rows.
    A dropped batch, a re-read cursor range, or a partition-planning
    overlap changes n/sum_sq and hash-fails.

    Batch counting (r13, per ADVICE): ``n_data_batches`` is derived from
    the checkpoint's OFFSETS LOG, not ``recentProgress`` — progress
    entries are appended at trigger END, so a stop() right after the
    sink shows row n could race the final batch's progress record, and
    a 0-second trigger's idle entries could in principle push data
    batches out of the ~100-entry recentProgress ring. The offsets log
    has neither problem: batch i's offset file is written BEFORE the
    batch executes (so it exists whenever the sink shows the rows), one
    file per constructed batch, and a batch advanced the cursor iff its
    ``pos`` exceeds the previous file's."""
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time
    import uuid as _uuid

    from cuny_courses_spark.sources.pyds import ensure_registered

    ensure_registered(spark)
    n = 1000
    stream = (
        spark.readStream.format("seqgen")
        .option("n", n)
        .option("batch_rows", 250)
        .option("partitions", 4)
        .load()
    )
    name = "pyds_sink_" + _uuid.uuid4().hex[:12]
    ckpt = _tempfile.mkdtemp(prefix="pyds_ckpt_")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline and spark.table(name).count() < n:
            _time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    # Data batches from the offsets log (streaming/offsets.py): one
    # file per constructed batch, written before execution — race-free.
    from cuny_courses_spark.streaming.offsets import n_advancing_batches

    n_data_batches = n_advancing_batches(ckpt, "pos")
    _shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy((F.col("id") % 7).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id") * F.col("id")).cast("long").alias("sum_sq"),
        )
        .withColumn("n_data_batches", F.lit(n_data_batches).cast("long"))
    )


@register(
    "q_scan_xml",
    oracle="SELECT s_suppkey, s_name, s_nationkey FROM supplier",
)
def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round-trip of ``supplier`` via Spark 4's NATIVE XML source
    (spark-xml graduated into core): write with rowTag elements, read
    back under an EXPLICIT schema (no inference — the same typed-at-the-
    boundary posture as the CSV/JSON scans). XML is the remaining
    enterprise interchange format the engine speaks after
    csv/json/orc/parquet/text/binary; the oracle reads the parquet view,
    so values must survive the markup round-trip (incl. entity escaping)
    bit-exactly. Spark parallelizes the read per file; at 100 TB the
    row-tag splitter streams within files too."""
    from pyspark.sql import types as T

    out = _io_dir(sf_dir, "supplier_xml")
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    s.write.mode("overwrite").format("xml").option(
        "rowTag", "supplier"
    ).option("rootTag", "suppliers").save(out)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(schema)
        .load(out)
        .select("s_suppkey", "s_name", "s_nationkey")
    )


@register(
    "q_scan_binaryfile",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
WHERE doc_id % 50 = 1
""",
)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPAQUE-FILE INGESTION via the ``binaryFile`` source — the scan
    half of the multimodal story (§2 K2 treats image/audio/video as
    binary columns; THIS is how those bytes enter the engine from a
    directory of media files): each file becomes one row of (path,
    modificationTime, length, content), here a deterministic slice of
    ``documents`` materialized as one .bin file per doc (utf-8 bytes).
    The query recovers the doc id from the file NAME, the byte length
    from the source's own ``length`` column (never len(content) — the
    column is the metadata the source contracts to supply), and an md5
    of the content bytes JVM-side. The oracle recomputes length + md5
    from the parquet text — so a truncated read, an encoding mangle, or
    a path-to-id mix-up all hash-FAIL. At 100 TB: files are split-free
    units, listed and read in parallel; pair with mapInPandas decoders
    (functions/multimodal.py) for the feature-extraction stage."""
    import os as _os
    import shutil as _shutil2

    out = _io_dir(sf_dir, "docs_bin")
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 1
    )
    _shutil2.rmtree(out, ignore_errors=True)  # no stale-file carryover
    _os.makedirs(out, exist_ok=True)
    # deterministic tiny fixture (bounded slice): one file per doc,
    # written driver-side — the ingest direction under test is READ
    for r in docs.select("doc_id", "text").collect():
        with open(_os.path.join(out, f"doc_{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    back = spark.read.format("binaryFile").load(out)
    return back.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"doc_(\d+)\.bin", 1
        )
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )
