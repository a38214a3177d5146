"""§2 B-ext — SQL subquery surface (correlated scalar, IN / NOT IN).

The reference's downstream consumers write these shapes as plain SQL
(SURVEY §3.3); these entries run through the engine's SQL surface
(cuny_courses_spark.sql.run_sql over the registered table views) rather
than the DataFrame API, proving the two surfaces share one semantics.

Catalyst decorrelates the scalar subquery into an aggregate + join (no
per-row re-execution — the plan is the same one the DataFrame form would
build), so the shapes scale like any keyed join. Determinism: the
correlated comparison runs in exact fixed-point cents, never a float
equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cuny_courses_spark.registry import register
from cuny_courses_spark.sql import run_sql

_CORR = """
SELECT l_orderkey, l_linenumber
FROM lineitem l
WHERE CAST(round(l_quantity * 100) AS BIGINT) = (
    SELECT max(CAST(round(l2.l_quantity * 100) AS BIGINT))
    FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)
"""


@register("q_subquery_correlated_scalar", oracle=_CORR)
def q_subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: lineitems carrying their order's max
    quantity (exact cents comparison). Same SQL text runs on both engines;
    Catalyst decorrelates to max-per-key aggregate + equi-join."""
    return run_sql(spark, sf_dir, _CORR)


_IN_NOTIN = """
SELECT o_orderkey
FROM orders
WHERE o_custkey IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_orderkey NOT IN
      (SELECT l_orderkey FROM lineitem
       WHERE CAST(round(l_quantity * 100) AS BIGINT) > 4900)
"""


@register("q_subquery_in_notin", oracle=_IN_NOTIN)
def q_subquery_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries (semi/anti-join rewrites; the keys are
    non-null by contract, so NOT IN's three-valued-logic trap can't bite —
    and both engines agree when it can't)."""
    return run_sql(spark, sf_dir, _IN_NOTIN)
