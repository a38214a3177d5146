"""§2 G — Set operations.

Catalyst rewrites these to joins/aggregates (ReplaceDistinctWithAggregate,
RewriteExceptAll — SURVEY §4), so at scale they inherit the same shuffle
machinery as joins; nothing bespoke needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


def _america_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dim = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).filter(
        F.col("r_name") == "AMERICA"
    )
    return c.join(
        F.broadcast(dim), c.c_nationkey == dim.n_nationkey, "left_semi"
    ).select(F.col("c_custkey").alias("k"))


def _america_suppliers(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dim = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).filter(
        F.col("r_name") == "AMERICA"
    )
    return s.join(
        F.broadcast(dim), s.s_nationkey == dim.n_nationkey, "left_semi"
    ).select(F.col("s_suppkey").alias("k"))


_O_AMERICA_C = """
SELECT c_custkey AS k FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
"""
_O_AMERICA_S = """
SELECT s_suppkey AS k FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
"""


@register(
    "q_set_union_all",
    oracle=f"SELECT k FROM ({_O_AMERICA_C}) UNION ALL SELECT k FROM ({_O_AMERICA_S})",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of AMERICA customer keys and supplier keys (bag semantics)."""
    return _america_customers(spark, sf_dir).unionByName(
        _america_suppliers(spark, sf_dir)
    )


@register(
    "q_set_union_distinct",
    oracle=f"SELECT k FROM ({_O_AMERICA_C}) UNION SELECT k FROM ({_O_AMERICA_S})",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of the same key sets."""
    return (
        _america_customers(spark, sf_dir)
        .unionByName(_america_suppliers(spark, sf_dir))
        .distinct()
    )


@register(
    "q_set_intersect",
    oracle="""
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in both customer and supplier (set semantics)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "q_set_except",
    oracle="""
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey AS nk FROM supplier
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # EXCEPT (distinct) — not exceptAll, which is a bag op


@register(
    "q_set_multiset_ops",
    oracle="""
WITH c AS (SELECT c_nationkey % 7 AS g FROM customer),
s AS (SELECT s_nationkey % 7 AS g FROM supplier),
ia AS (SELECT g FROM c INTERSECT ALL SELECT g FROM s),
ea AS (SELECT g FROM c EXCEPT ALL SELECT g FROM s)
SELECT 'intersect_all' AS op, g, CAST(count(*) AS BIGINT) AS n
FROM ia GROUP BY g
UNION ALL
SELECT 'except_all' AS op, g, CAST(count(*) AS BIGINT) AS n
FROM ea GROUP BY g
""",
)
def q_set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — ``intersectAll`` / ``exceptAll`` (SQL's
    INTERSECT ALL / EXCEPT ALL bag semantics, the half of the G group
    the distinct variants can't express): per duplicate-carrying group
    key, INTERSECT ALL keeps min(count_left, count_right) copies and
    EXCEPT ALL keeps max(0, count_left − count_right). Spark plans both
    as a single aggregate-join (count per side → per-row replication),
    which is exactly the 100 TB-safe formulation — multiplicity math on
    aggregated counts, never a row-at-a-time bag diff. Output is the
    per-key multiplicity of both results (a tagged union), so a
    single lost or extra duplicate hash-fails."""
    c = load(spark, sf_dir, "customer").select(
        (F.col("c_nationkey") % 7).alias("g")
    )
    s = load(spark, sf_dir, "supplier").select(
        (F.col("s_nationkey") % 7).alias("g")
    )
    ia = (
        c.intersectAll(s)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    ea = (
        c.exceptAll(s)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    return ia.unionByName(ea).select("op", "g", "n")
