"""§2 H-ext — Reproducible dataset splitting and class balancing.

Training-pipeline primitives over the documents/embeddings tables: split
assignment and per-class downsampling must be pure functions of the row
key (never rand()/sample()) so that 100 TB splits are auditable,
re-runnable, and incrementally maintainable — a new row's split is
decided without touching any other row, and no engine/partitioning change
moves a row between splits. The portable hash is the engine-wide
md5-prefix contract (q_sample_hash_stratified): ``md5(key || salt)[0:8]``
parsed as an integer is identical in Spark and DuckDB.

Scale: split assignment is a narrow map (no shuffle at all — the groupBy
here exists only to emit auditable counts); class balancing is one
shuffle on the label plus a bounded per-label sort, with the minority
size broadcast as a one-row scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


def _bucket(key: F.Column, salt: str, mod: int) -> F.Column:
    """Portable deterministic bucket: md5-prefix integer of key||salt."""
    return (
        F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("long")
        % mod
    )


def _o_bucket(key_expr: str, salt: str, mod: int) -> str:
    """DuckDB twin of _bucket()."""
    return (
        f"('0x' || substring(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 8))"
        f"::BIGINT % {mod}"
    )


@register(
    "q_sample_train_test_split",
    oracle=f"""
WITH b AS (
    SELECT doc_id, lang,
           {_o_bucket('doc_id', '|split7', 100)} AS bkt
    FROM documents
)
SELECT lang,
       CASE WHEN bkt < 80 THEN 'train'
            WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM b GROUP BY lang, split
""",
)
def q_sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by key hash, with
    per-(lang, split) counts and an id checksum for audit. Assignment is
    a narrow projection — a row's split never depends on other rows, so
    adding documents never reshuffles existing splits (the property
    rand()-based randomSplit cannot give you)."""
    d = load(spark, sf_dir, "documents")
    bkt = _bucket(F.col("doc_id"), "|split7", 100)
    split = (
        F.when(bkt < 80, "train").when(bkt < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


@register(
    "q_sample_balance_classes",
    oracle=f"""
WITH k AS (
    SELECT min(cnt) AS k
    FROM (SELECT count(*) AS cnt FROM embeddings GROUP BY label)
), r AS (
    SELECT label, vec_id,
           row_number() OVER (
               PARTITION BY label
               ORDER BY {_o_bucket('vec_id', '|bal', 1000000007)}, vec_id
           ) AS rn
    FROM embeddings
)
SELECT label, count(*) AS n, CAST(sum(vec_id) AS BIGINT) AS id_sum
FROM r, k WHERE rn <= k.k
GROUP BY label
""",
)
def q_sample_balance_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balancing by deterministic undersampling: every label keeps
    exactly minority-class-size rows, chosen by portable-hash order (a
    uniform, reproducible, engine-independent shuffle of each class).
    The minority size is a one-row scalar aggregate cross-joined
    (broadcast) onto the ranked rows; ranking is one shuffle on label
    with per-label bounded sort. Emits per-label counts + id checksum."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    k = e.groupBy("label").count().agg(F.min("count").alias("k"))
    w = Window.partitionBy("label").orderBy(
        _bucket(F.col("vec_id"), "|bal", 1_000_000_007), "vec_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vec_id").cast("long").alias("id_sum"),
        )
    )


@register(
    "q_sample_importance_weighted",
    oracle=f"""
WITH w AS (
    SELECT doc_id, lang, n_chars,
           {_o_bucket('doc_id', '|imp42', 10000)} AS bkt,
           least(n_chars, 400) * 10000 / 400 AS keep_thresh
    FROM documents
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN bkt < keep_thresh THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(sum(CASE WHEN bkt < keep_thresh THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM w
GROUP BY lang
""",
)
def q_sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic subsampling: each doc is kept with
    probability proportional to its quality weight (here length saturated
    at 400 chars — stand-in for any per-doc quality score), decided by
    comparing the portable md5 bucket against the weight-scaled threshold
    in pure integer arithmetic. The up/down-sampling primitive training
    mixtures are built from (importance-weight a source, keep p ∝ w).

    Deterministic by construction — the keep decision is a pure function
    of (doc_id, weight), so re-runs, retries and partition moves agree;
    embarrassingly parallel (narrow filter + one aggregation exchange) at
    any scale. Integer threshold math (bkt < w·10⁴/400 in BIGINT) avoids
    any float boundary between engines."""
    d = load(spark, sf_dir, "documents")
    bkt = _bucket(F.col("doc_id"), "|imp42", 10000)
    keep_thresh = F.least(F.col("n_chars"), F.lit(400)) * 10000 / 400
    kept = F.when(bkt < keep_thresh, 1).otherwise(0)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(
            F.when(bkt < keep_thresh, F.col("n_chars")).otherwise(0)
        ).cast("long").alias("kept_chars"),
    )


@register(
    "q_sample_reservoir_group",
    oracle=f"""
WITH h AS (
    SELECT c_mktsegment, c_custkey, c_name,
           {_o_bucket('c_custkey', '|rsvr42', 1 << 31)} AS hv
    FROM customer
), r AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY c_mktsegment ORDER BY hv, c_custkey) AS BIGINT) AS rk
    FROM h
)
SELECT c_mktsegment, c_custkey, c_name, rk FROM r WHERE rk <= 5
""",
)
def q_sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir sample: exactly min(5, |group|) customers
    per market segment, drawn uniformly by ranking on the portable
    md5-prefix hash of the row key (the engine-wide split contract — never
    ``rand()``/``TABLESAMPLE``, whose draw depends on partitioning and
    engine). Equivalent to distributed reservoir sampling with a
    key-derived priority: the sample is a pure function of the key set, so
    re-runs, engine swaps, and incremental appends keep every previously
    sampled row unless a lower-hash row arrives — auditable at 100 TB.
    Scale: hash is a narrow map; per-group top-5 is a bounded-heap
    aggregate after one exchange on the group key (no global sort; the
    row_number window never materializes more than the partition)."""
    c = load(spark, sf_dir, "customer")
    h = c.select(
        "c_mktsegment",
        "c_custkey",
        "c_name",
        _bucket(F.col("c_custkey"), "|rsvr42", 1 << 31).alias("hv"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("hv", "c_custkey")
    return (
        h.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "rk")
    )


@register(
    "q_sample_mixture_weights",
    oracle=f"""
WITH d AS (
    SELECT doc_id, lang,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok,
           {_o_bucket('doc_id', '|mix12', 1000000)} AS bkt
    FROM documents
), tot AS (
    SELECT lang, CAST(sum(ntok) AS BIGINT) AS tokens_total
    FROM d GROUP BY lang
), frac AS (
    SELECT lang, tokens_total,
           CAST((SELECT min(tokens_total) FROM tot) * 1000000
                // tokens_total AS BIGINT) AS f_ppm
    FROM tot
), kept AS (
    SELECT d.lang, count(*) AS n, CAST(sum(d.ntok) AS BIGINT) AS t
    FROM d JOIN frac USING (lang)
    WHERE d.bkt < frac.f_ppm
    GROUP BY d.lang
)
SELECT frac.lang, frac.tokens_total, frac.f_ppm,
       CAST(coalesce(kept.n, 0) AS BIGINT) AS n_docs_kept,
       CAST(coalesce(kept.t, 0) AS BIGINT) AS tokens_kept
FROM frac LEFT JOIN kept ON frac.lang = kept.lang
""",
)
def q_sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-MIXTURE construction (the DoReMi / Pile data-mixing
    primitive): rebalance a language-skewed corpus to a UNIFORM target
    mixture by deterministic downsampling, never upsampling — the
    largest budget a uniform mixture admits is B = |langs| · min_lang
    tokens, so each language keeps the integer-exact fraction
    f_ppm = (min_tokens · 1e6) DIV its_tokens (1e6 ppm for the binding
    minority, smaller for every over-represented language), and a doc
    survives iff its portable md5-prefix bucket (the engine-wide
    q_sample_hash_stratified contract) falls under f_ppm. Emitted per
    language: corpus tokens, the ppm knob, and the docs/tokens actually
    kept — all integers, no float weights anywhere.

    Pure-function-of-key selection is the 100 TB property: a new doc's
    fate needs only the (|langs|-row, broadcast) fraction table, no
    other row moves when data arrives, and any engine re-run is
    byte-reproducible. Plan: one narrow map for (ntok, bucket), one
    small shuffle for per-lang totals, a 1-row min broadcast, the
    fraction join-back broadcast, and the final per-lang re-agg —
    corpus rows are never shuffled at all."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias(
            "ntok"
        ),
    )
    tot = d.groupBy("lang").agg(F.sum("ntok").alias("tokens_total"))
    mn = tot.agg(F.min("tokens_total").alias("min_t"))
    frac = (
        tot.crossJoin(F.broadcast(mn))
        .select(
            "lang",
            "tokens_total",
            F.expr(
                "CAST(min_t * 1000000 DIV tokens_total AS BIGINT)"
            ).alias("f_ppm"),
        )
    )
    kept = (
        d.withColumn("bkt", _bucket(F.col("doc_id"), "|mix12", 1_000_000))
        .join(F.broadcast(frac.select("lang", "f_ppm")), "lang")
        .filter(F.col("bkt") < F.col("f_ppm"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ntok").alias("t"),
        )
    )
    return frac.join(kept, "lang", "left").select(
        "lang",
        "tokens_total",
        "f_ppm",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_docs_kept"),
        F.coalesce("t", F.lit(0)).cast("long").alias("tokens_kept"),
    )


@register(
    "q_sample_temperature_mix",
    oracle="""
WITH by_lang AS (
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
               AS tokens_total
    FROM documents GROUP BY lang
), z AS (
    SELECT sum(CAST(tokens_total AS DOUBLE)) AS tot,
           sum(pow(CAST(tokens_total AS DOUBLE), 0.3)) AS zt
    FROM by_lang
)
SELECT lang, n_docs, tokens_total,
       round(tokens_total / tot, 4) AS p_raw,
       round(pow(CAST(tokens_total AS DOUBLE), 0.3) / zt, 4) AS p_alpha,
       round((pow(CAST(tokens_total AS DOUBLE), 0.3) / zt)
             / (tokens_total / tot), 4) AS boost
FROM by_lang, z
""",
)
def q_sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED MIXTURE PLANNING (the mC4/PaLM α-sampling
    law, α = 0.3): the sampling proportion of language i becomes
    p_i ∝ tokens_i^α — flattening the natural distribution so
    low-resource languages are up-weighted without going uniform. This
    is the PLANNER half of mixture construction (what proportions to
    train on); the EXECUTION half — integer-exact ppm keep fractions
    per language — is ``q_sample_mixture_weights``. Emitted per
    language: exact integer corpus stats, the natural share, the
    α-share, and the boost factor p_α/p_raw (the number a mixing run
    multiplies each language's sampling rate by). Float columns follow
    the text family's precedent (4-dp rounding; libm-vs-JVM pow drift
    is ~1 ulp, far below the grain). One tiny shuffle (|langs| groups);
    corpus rows are touched once, map-side."""
    d = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("long").alias(
            "ntok"
        ),
    )
    by_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("tokens_total"),
    )
    z = by_lang.agg(
        F.sum(F.col("tokens_total").cast("double")).alias("tot"),
        F.sum(F.pow(F.col("tokens_total").cast("double"), 0.3)).alias(
            "zt"
        ),
    )
    p_raw = F.col("tokens_total") / F.col("tot")
    p_alpha = F.pow(F.col("tokens_total").cast("double"), 0.3) / F.col("zt")
    return by_lang.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        "tokens_total",
        F.round(p_raw, 4).alias("p_raw"),
        F.round(p_alpha, 4).alias("p_alpha"),
        F.round(p_alpha / p_raw, 4).alias("boost"),
    )
