"""§2 B — Projections, filters, predicates.

Reference correspondence: per-row field extraction/cleaning and status
filters in the CSV loaders (SURVEY §2 B). Expressed as Column algebra so
Catalyst pushes every predicate into the parquet scan (PushedFilters) and
prunes the read schema — at 100 TB these queries touch only the row groups
and columns they need (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.common import fmt_date, r4
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


@register(
    "q_project_rename",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       l_quantity AS qty,
       round(l_extendedprice * (1 - l_discount), 4) AS net
FROM lineitem
""",
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select / rename / derive (per-row arithmetic is engine-deterministic)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net"),
    )


@register(
    "q_filter_simple",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity < 10
""",
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single numeric predicate, pushed to the parquet row-group level."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 10).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q_filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
   OR (o_totalprice BETWEEN 100000 AND 150000 AND NOT o_orderstatus = 'P')
""",
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN boolean algebra."""
    o = load(spark, sf_dir, "orders")
    pred = (
        (o.o_orderstatus == "F") & o.o_orderpriority.isin("1-URGENT", "2-HIGH")
    ) | (o.o_totalprice.between(100000, 150000) & ~(o.o_orderstatus == "P"))
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@register(
    "q_filter_like",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%red%'
   OR p_type LIKE 'ECONOMY%'
   OR regexp_matches(p_brand, 'Brand#1[0-9]$')
""",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / prefix-LIKE / regex — catalog-number lookup patterns."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        p.p_name.like("%red%")
        | p.p_type.like("ECONOMY%")
        | p.p_brand.rlike("Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@register(
    "q_filter_null",
    oracle="""
SELECT count(*) FILTER (WHERE s IS NULL) AS n_null,
       count(s) AS n_notnull,
       count(*) FILTER (WHERE s IS NOT DISTINCT FROM 'F') AS n_eq_f,
       count(*) FILTER (WHERE s IS NOT DISTINCT FROM NULL) AS n_nullsafe_null,
       count(*) FILTER (WHERE coalesce(s, 'P') = 'P') AS n_coalesced
FROM (SELECT nullif(o_orderstatus, 'P') AS s FROM orders)
""",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic over NULLIF-injected nulls (testdata has none).

    ``<=>`` (eqNullSafe) twin is DuckDB ``IS NOT DISTINCT FROM``.
    """
    o = load(spark, sf_dir, "orders")
    s = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    d = o.select(s.alias("s"))
    return d.agg(
        F.count(F.when(F.col("s").isNull(), 1)).alias("n_null"),
        F.count("s").alias("n_notnull"),
        F.count(F.when(F.col("s").eqNullSafe(F.lit("F")), 1)).alias("n_eq_f"),
        F.count(
            F.when(F.col("s").eqNullSafe(F.lit(None).cast("string")), 1)
        ).alias("n_nullsafe_null"),
        F.count(F.when(F.coalesce(F.col("s"), F.lit("P")) == "P", 1)).alias(
            "n_coalesced"
        ),
    )


@register(
    "q_filter_date",
    oracle="""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
""",
)
def q_filter_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-range predicate (term/effective-date filter pattern)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (o.o_orderdate >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (o.o_orderdate < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", fmt_date("o_orderdate", "order_date"))
