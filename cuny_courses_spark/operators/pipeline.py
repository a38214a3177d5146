"""§2 N-ext — Composed training-data pipeline (the north-star use case).

One declarative DataFrame chain composing the individually-verified
primitives end-to-end, the shape a 100 TB pretraining-data job actually
runs: quality gate → content-hash exact dedup → deterministic stratified
sample → metadata (embedding label) join → per-stratum audit counts.

Scale notes: every stage is a narrow map or a single keyed shuffle —
(1) the quality gate is a pushed-down filter over scan columns,
(2) exact dedup shuffles once on md5(text) (content-uniform key: no skew by
    construction; at 100 TB this is the shard-local pass after
    fingerprint-range partitioning),
(3) hash sampling is a pure per-row predicate (membership is a function of
    the key — auditable, partition-independent, engine-independent),
(4) the embeddings join is key-to-key (doc_id = vec_id), sort-merge at
    scale, and
(5) the audit aggregate is a tiny (lang × label) rollup.
Catalyst fuses 1+3 into the scan filter; nothing in the chain collects to
the driver or multiplies rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.common import O_davg, davg
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


@register(
    "q_pipeline_training_data",
    oracle=f"""
WITH gated AS (
    SELECT * FROM documents
    WHERE n_chars >= 100 AND len(string_split(text, ' ')) >= 10
), dedup AS (
    SELECT * FROM gated
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), sampled AS (
    SELECT * FROM dedup
    WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 8))::BIGINT
          % 100 < CASE WHEN lang = 'en' THEN 60 ELSE 80 END
)
SELECT s.lang, e.label,
       count(*) AS n_docs,
       {O_davg('s.n_chars', 'avg_chars')},
       CAST(min(s.doc_id) AS BIGINT) AS min_id,
       CAST(max(s.doc_id) AS BIGINT) AS max_id
FROM sampled s JOIN embeddings e ON s.doc_id = e.vec_id
GROUP BY s.lang, e.label
""",
)
def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → stratified hash sample → embedding-label
    join → per-(lang, label) audit. See module header for the per-stage
    scale rationale; each primitive is also verified standalone
    (q_text_quality_score, q_dedup_exact_hash, q_sample_hash_stratified,
    q_text_doc_features)."""
    d = load(spark, sf_dir, "documents")
    gated = d.filter(
        (F.col("n_chars") >= 100) & (F.size(F.split(F.col("text"), " ")) >= 10)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|42"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 60).otherwise(80)
    sampled = dedup.filter(bucket < rate)
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        sampled.join(e, sampled.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("n_chars", "avg_chars"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
        )
    )
