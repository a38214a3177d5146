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
