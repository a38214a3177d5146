"""§2 B-ext — TPC-H-shape composite queries through the SQL surface.

The reference's downstream consumers are SQL scripts over the warehouse
(SURVEY §3.3); this module widens that surface beyond q_subquery_* with
the classic TPC-H composite shapes expressible on the slim schema (no
partsupp / commitdate columns): Q4 (EXISTS + priority counts), Q6 (pure
pushdown filter-agg), Q7 (nation-pair volume), Q10 (returned-item top-k),
Q14 (promo revenue share), Q19 (OR-of-ANDs composite predicate). Each
entry is ONE SQL string executed verbatim by BOTH engines (run_sql →
spark.sql; the same text is the DuckDB oracle), proving dialect-portable
semantics end to end.

Determinism: monetary arithmetic goes through the exact cents fixed-point
contract (CAST(round(x*100) AS BIGINT), FIXTURES.md scale guarantee) so
products and sums are integer-exact and order-independent in both engines;
double literals are written in e-notation (1e4) because a decimal literal
(`10000.0`) parses as DECIMAL in Spark SQL and would change the output
type. Top-k carries a key tiebreak.

Scale notes: Q6 is the pushdown showcase (filters reach the parquet scan,
aggregation is a map-side-combined scalar); Q7/Q10 are star joins whose
dims broadcast (nation/customer) while the fact joins shuffle on their
keys with AQE handling skew; Q4's EXISTS plans as a left-semi join, never
a per-row subquery; Q19's OR-of-ANDs stays a single scan with a residual
filter after the part join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cuny_courses_spark.registry import register
from cuny_courses_spark.sql import run_sql

# Exact cents images (FIXTURES scale contract), shared across the texts.
_EP = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_DISC = "CAST(round(l_discount * 100) AS BIGINT)"
# revenue in scale-1e4 fixed point: price_cents * (100 - disc_pct)
_REV = f"round(CAST(sum({_EP} * (100 - {_DISC})) AS DOUBLE) / 1e4, 4)"

_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
                AND l_shipdate > TIMESTAMP '1996-03-01 00:00:00')
GROUP BY o_orderpriority
"""


@register("q_sql_q4_priority_exists", oracle=_Q4)
def q_sql_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority counts of orders with a late shipment
    (EXISTS → left-semi join; the date predicate prunes the orders scan).

    The static `l_shipdate > 1996-03-01` bound inside EXISTS is IMPLIED by
    the correlated condition (min o_orderdate + 60 days) but not derivable
    by either optimizer through the non-equi comparison — stating it
    explicitly pushes a shipdate filter into the lineitem scan (row-group
    min/max pruning at 100 TB; a 3× smaller semi-join build locally)."""
    return run_sql(spark, sf_dir, _Q4)


_Q6 = f"""
SELECT round(CAST(sum({_EP} * {_DISC}) AS DOUBLE) / 1e4, 4) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND {_DISC} BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@register("q_sql_q6_forecast_filter", oracle=_Q6)
def q_sql_q6_forecast_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + scalar aggregate — the predicate-
    pushdown showcase (date range reaches the parquet scan; the discount
    band runs on the exact cents image)."""
    return run_sql(spark, sf_dir, _Q6)


_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_REV} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q_sql_q7_nation_volume", oracle=_Q7)
def q_sql_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair by year —
    5-way star join; both nation dims broadcast, the fact chain shuffles
    on its join keys once each."""
    return run_sql(spark, sf_dir, _Q7)


_Q10 = f"""
SELECT c_custkey, c_name, {_REV} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("q_sql_q10_returned_topk", oracle=_Q10)
def q_sql_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue —
    join + group + TakeOrderedAndProject with key tiebreak on the rounded
    revenue."""
    return run_sql(spark, sf_dir, _Q10)


_Q14 = f"""
SELECT round(
        CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN {_EP} * (100 - {_DISC}) ELSE 0 END) AS DOUBLE)
        * 100.0
        / CAST(sum({_EP} * (100 - {_DISC})) AS DOUBLE), 4) AS promo_share_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-12-01 00:00:00'
"""


@register("q_sql_q14_promo_share", oracle=_Q14)
def q_sql_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate ratio;
    both numerator and denominator are exact integer sums, divided once at
    the end (single float op, identical both engines)."""
    return run_sql(spark, sf_dir, _Q14)


_Q19 = f"""
SELECT {_REV} AS revenue, count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


@register("q_sql_q19_composite_or", oracle=_Q19)
def q_sql_q19_composite_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs composite predicate over the part join —
    one scan, one join, residual disjunction evaluated post-join (Catalyst
    extracts the common p_partkey equi-key; no union-of-scans rewrite)."""
    return run_sql(spark, sf_dir, _Q19)


_REC_TREE = """
WITH RECURSIVE tree AS (
    SELECT n_nationkey AS node, n_name, CAST(0 AS BIGINT) AS depth,
           CAST(n_nationkey AS STRING) AS path
    FROM nation WHERE n_nationkey = 0
    UNION ALL
    SELECT n.n_nationkey, n.n_name, t.depth + 1,
           t.path || '/' || CAST(n.n_nationkey AS STRING)
    FROM nation n JOIN tree t
      ON CAST(floor((n.n_nationkey - 1) / 2) AS BIGINT) = t.node
     AND n.n_nationkey > 0
)
SELECT node, n_name, depth, path FROM tree
"""


@register("q_sql_recursive_hierarchy", oracle=_REC_TREE)
def q_sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE hierarchy walk (Spark 4 `WITH RECURSIVE`): treat
    nation keys as an implicit binary tree (parent = ⌊(k−1)/2⌋) and
    materialize every node's depth and root-to-node path — the org-chart /
    BOM-expansion query shape, executed from ONE SQL text on both engines.
    Notes for portability: `CAST(... AS STRING)` (DuckDB aliases STRING to
    VARCHAR; Spark rejects bare VARCHAR), and the parent expression uses
    floor()+CAST because `/` is float division in both dialects while
    bare-CAST rounding differs. At scale Spark executes each recursion
    level as a join against the previous level's frame — the same
    iterative-join plan q_graph_pagerank builds manually, here planned by
    the engine."""
    return run_sql(spark, sf_dir, _REC_TREE)


_LATERAL = """
SELECT r.r_name, l.n_name, l.n_customers
FROM region r, LATERAL (
    SELECT n.n_name, count(*) AS n_customers
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY n_customers DESC, n.n_name ASC
    LIMIT 2
) l
"""


@register("q_sql_lateral_topk", oracle=_LATERAL)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT: top-2
    nations by customer count for EACH region — the "top-N per entity via
    lateral" idiom, one SQL text on both engines. Catalyst decorrelates
    the lateral into a window/aggregate plan (no per-outer-row
    re-execution), so it scales like q_win_topk_per_group rather than a
    nested loop; the ORDER BY carries a name tiebreak for deterministic
    LIMIT."""
    return run_sql(spark, sf_dir, _LATERAL)
