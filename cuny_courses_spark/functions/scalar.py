"""§2 H — Scalar function library (string / date / math / conditional /
cast / array / JSON).

Reference correspondence: all the per-row CSV cleaning the loaders do in
Python (strip/upper/encoding fixes/date parsing — SURVEY §2 H) becomes
built-in ``pyspark.sql.functions`` — JVM-side, inside WholeStageCodegen,
never a Python round-trip.

Cross-engine parity traps handled here (SURVEY §7 "What's hard" #3):
- DuckDB has no ``initcap`` → oracle emulates per-word (data is lowercase);
- DuckDB ``CAST(double AS INT)`` rounds, Spark truncates → use explicit
  floor/round, never a bare fractional→int cast;
- DuckDB ``year()``/``length()`` return BIGINT, Spark INT → cast to BIGINT
  on the Spark side;
- day-of-week conventions differ → exercised via date_trunc/datediff
  instead (which agree);
- float columns are never stringified (formatting differs) — arrays of
  floats are compared via rounded scalar extractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.common import fmt_date, r4
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


@register(
    "q_str_basic",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up,
       lower(p_brand) AS lo,
       trim('  ' || p_type || ' ') AS trimmed,
       substring(p_name, 1, 5) AS sub5,
       concat_ws('|', p_brand, p_type) AS cw,
       CAST(length(p_name) AS BIGINT) AS name_len,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
       string_split(p_name, ' ')[1] AS tok0,
       array_to_string(
           list_transform(string_split(p_name, ' '),
                          w -> upper(w[1]) || lower(w[2:])), ' ') AS cap
FROM part
""",
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/concat_ws/length/lpad/split/initcap."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
        F.split("p_name", " ").getItem(0).alias("tok0"),
        F.initcap("p_name").alias("cap"),
    )


@register(
    "q_str_regex",
    oracle="""
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
       regexp_replace(p_type, '[aeiouAEIOU]', '', 'g') AS devoweled,
       translate(p_name, 'aeiou', 'AEIOU') AS translated
FROM part
""",
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / translate — the catalog-number
    normalizer family (note: Spark regexp_replace is global by default;
    DuckDB needs the 'g' flag)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("long").alias(
            "brand_num"
        ),
        F.regexp_replace("p_type", "[aeiouAEIOU]", "").alias("devoweled"),
        F.translate("p_name", "aeiou", "AEIOU").alias("translated"),
    )


@register(
    "q_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dy,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS BIGINT)
           AS days_to_98,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo
FROM orders
""",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction & arithmetic. Day-of-week is deliberately
    exercised via date_trunc/datediff (conventions agree) rather than
    dayofweek (Spark Sunday=1 vs DuckDB ISO) — SURVEY §2 H parity note."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.quarter(d).cast("long").alias("qtr"),
        fmt_date(F.date_trunc("month", d), "month_start"),
        fmt_date(F.last_day(d), "month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("long").alias(
            "days_to_98"
        ),
        fmt_date(F.add_months(d, 3), "plus3mo"),
    )


@register(
    "q_math_funcs",
    oracle="""
SELECT p_partkey,
       round(p_retailprice, 1) AS r1,
       round(abs(p_retailprice - 1000), 4) AS ab,
       CAST(ceil(p_retailprice) AS BIGINT) AS ce,
       CAST(floor(p_retailprice) AS BIGINT) AS fl,
       round(ln(p_retailprice), 4) AS lg,
       round(exp(p_size / 100.0), 4) AS ex,
       round(pow(p_size, 2), 4) AS pw,
       CAST(p_partkey % 7 AS BIGINT) AS md,
       CAST(sign(p_retailprice - 1000) AS BIGINT) AS sg,
       round(sqrt(p_retailprice), 4) AS sq,
       CAST(greatest(p_size, 25) AS BIGINT) AS gr,
       CAST(least(p_size, 25) AS BIGINT) AS le
FROM part
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/exp/pow/mod/sign/sqrt/greatest/least.

    Transcendentals (ln/exp/sqrt) differ between libm and java.lang.Math at
    ≤1 ulp — far below the 4 dp rounding grain. pmod is expressed as ``%``
    on non-negative operands (DuckDB has no pmod).
    """
    p = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price, 1).alias("r1"),
        r4(F.abs(price - 1000), "ab"),
        F.ceil(price).cast("long").alias("ce"),
        F.floor(price).cast("long").alias("fl"),
        r4(F.log(price), "lg"),
        r4(F.exp(F.col("p_size") / 100.0), "ex"),
        r4(F.pow("p_size", F.lit(2)), "pw"),
        F.pmod("p_partkey", F.lit(7)).cast("long").alias("md"),
        F.signum(price - 1000).cast("long").alias("sg"),
        r4(F.sqrt(price), "sq"),
        F.greatest("p_size", F.lit(25)).cast("long").alias("gr"),
        F.least("p_size", F.lit(25)).cast("long").alias("le"),
    )


@register(
    "q_cond_expr",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 250000 THEN 'medium'
            ELSE 'large' END AS bucket,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_c,
       CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL
            THEN 'resolved' ELSE 'open' END AS nvl2_equiv
FROM orders
""",
)
def q_cond_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / nvl2-equivalent."""
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    s = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.when(tp < 100000, "small")
        .when(tp < 250000, "medium")
        .otherwise("large")
        .alias("bucket"),
        F.coalesce(s, F.lit("PENDING")).alias("status_c"),
        F.when(s.isNotNull(), "resolved").otherwise("open").alias("nvl2_equiv"),
    )


@register(
    "q_cast_types",
    oracle="""
SELECT p_partkey,
       try_cast(p_type AS INT) AS bad_int,
       try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_long,
       CAST(p_size AS DOUBLE) AS size_d,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
       strftime(try_cast('2024-03-05' AS DATE), '%Y-%m-%d') AS const_date,
       try_cast(p_name AS DATE) IS NULL AS bad_date_null
FROM part
""",
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casting incl. failure→NULL via try_cast (ANSI mode is on — Spark 4
    default — so bare invalid casts would throw; SURVEY §4)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_type AS INT)").alias("bad_int"),
        F.expr(
            "try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT)"
        ).alias("brand_long"),
        F.col("p_size").cast("double").alias("size_d"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("string").alias(
            "price_str"
        ),
        fmt_date(F.expr("try_cast('2024-03-05' AS DATE)"), "const_date"),
        F.expr("try_cast(p_name AS DATE)").isNull().alias("bad_date_null"),
    )


@register(
    "q_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(embedding[1]::DOUBLE, 4) AS first_val,
       round(list_aggregate(embedding, 'max')::DOUBLE, 4) AS max_val,
       round(list_aggregate(embedding, 'min')::DOUBLE, 4) AS min_val,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), 4)
           AS sq_norm,
       round(list_sort(embedding)[1]::DOUBLE, 4) AS sorted_first,
       round(embedding[3:6][1]::DOUBLE, 4) AS slice_first
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/array_max/array_min/aggregate/sort_array on the
    embedding column; sq_norm ≈ 1.0 (vectors are L2-normalized, FIXTURES)."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        r4(F.element_at(emb, 1), "first_val"),
        r4(F.array_max(emb), "max_val"),
        r4(F.array_min(emb), "min_val"),
        F.round(
            F.aggregate(
                emb,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
        r4(F.element_at(F.sort_array(emb), 1), "sorted_first"),
        r4(F.element_at(F.slice(emb, 3, 4), 1), "slice_first"),
    )


@register(
    "q_explode_posexplode",
    oracle="""
SELECT vec_id,
       unnest(range(8)) AS pos,
       round(unnest(embedding[1:8])::DOUBLE, 4) AS val
FROM embeddings
""",
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first-8 slice (0-based positions; DuckDB zip-unnest
    of range(8) gives the same)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "v")
    ).select(
        "vec_id", F.col("pos").cast("long").alias("pos"), r4(F.col("v"), "val")
    )


@register(
    "q_json_extract",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY k_bucket
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing of events.props — from_json to a typed struct (the Spark
    path), aggregated by k-bucket; DuckDB oracle uses its JSON extension."""
    e = load(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT").getField("k")
    return (
        e.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


@register(
    "q_map_entries",
    oracle="""
SELECT event_id,
       regexp_extract(props, '"([A-Za-z_]+)":', 1) AS key,
       CAST(json_extract(props, '$.k') AS BIGINT) AS value
FROM events
""",
)
def q_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType → explode to key/value ROWS (determinism rule 2:
    no map-typed output columns)."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select("event_id", F.explode(m).alias("key", "value"))


@register(
    "q_variant_shred",
    oracle="""
WITH inj AS (
    SELECT props FROM events
    UNION ALL
    SELECT 'not json' FROM events WHERE event_id < 50
)
SELECT CASE WHEN json_valid(props)
            THEN CAST(json_extract(props, '$.k') AS BIGINT) % 10 END AS k_bucket,
       count(*) AS n,
       CAST(sum(CASE WHEN json_valid(props)
                     THEN CAST(json_extract(props, '$.k') AS BIGINT) END)
            AS BIGINT) AS sum_k
FROM inj
GROUP BY k_bucket
""",
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the Spark 4 VARIANT type:
    ``try_parse_json`` (NULL on malformed input — 50 injected junk rows
    land in the NULL bucket, never fail the job) → ``variant_get`` typed
    shredding → aggregate. VARIANT keeps the parsed binary form, so
    repeated path access avoids text re-parsing — at 100 TB the parse
    cost is paid once per row, not once per extracted field; the DuckDB
    oracle guards with json_valid to match try_parse_json's tolerance."""
    e = load(spark, sf_dir, "events")
    inj = e.select("props").unionByName(
        e.filter(F.col("event_id") < 50).select(F.lit("not json").alias("props"))
    )
    k = F.variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (
        inj.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )
