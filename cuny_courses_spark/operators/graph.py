"""§2 ext — Iterative graph analytics on DataFrames.

q_dedup_cluster_labels (dedup.py) covers connected components; this module
adds PageRank — the canonical fixed-iteration message-passing algorithm —
over the part↔supplier co-occurrence graph from lineitem. Together they
demonstrate the engine's iterative-algorithm story: per-round keyed
shuffles, lineage truncation via ``localCheckpoint``, convergence/iteration
bounds on the driver only.

Determinism contract: ranks are fixed-point BIGINTs (scale 1e6) and every
per-round contribution uses exact integer division, so the sums are
order-independent and both engines agree bit-exactly — no float PageRank
drift. The DuckDB oracle unrolls the same five rounds as chained CTEs
(recursive CTEs disallow aggregation in the recursive term, and unrolling
keeps the SQL portable ANSI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load

_N_ITER = 5

# Fixed-point update: r' = 0.15 + 0.85 * sum(r_u / outdeg_u), scale 1e6,
# every division exact integer div — identical algebra on both sides.


def _pagerank_oracle(n_iter: int) -> str:
    ctes = [
        """
WITH edges AS (
    SELECT DISTINCT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst
    FROM lineitem
    UNION
    SELECT DISTINCT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst
    FROM lineitem
), nodes AS (
    SELECT DISTINCT src AS node FROM edges
), outdeg AS (
    SELECT src, count(*) AS od FROM edges GROUP BY src
), r0 AS (
    SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
)"""
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f""", r{k} AS (
    SELECT n.node,
           CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.r // o.od) AS BIGINT) AS c
        FROM r{k - 1} p
        JOIN edges e ON p.node = e.src
        JOIN outdeg o ON p.node = o.src
        GROUP BY e.dst
    ) s ON n.node = s.node
)"""
        )
    return "".join(ctes) + f"\nSELECT node, r AS rank FROM r{n_iter}"


@register("q_graph_pagerank", oracle=_pagerank_oracle(_N_ITER))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five rounds of fixed-point PageRank (d=0.85, scale 1e6) over the
    symmetrized part↔supplier graph (part nodes 2k, supplier nodes 2k+1).

    Plan shape per round — the Pregel superstep on DataFrames: ranks join
    edges on src (one keyed shuffle), contributions aggregate on dst
    (map-side partial sum bounds the message volume), and a left join back
    to the node set applies the damping update (nodes without in-messages
    get the 0.15 floor). ``localCheckpoint`` truncates lineage each round
    so the plan stays O(1) across iterations; the only driver-side state
    is the loop counter. At 100 TB the same loop runs with edges
    pre-partitioned on src (hash-bucketed layout) so the rank⋈edges join
    is co-located and each superstep pays exactly one shuffle (the dst
    aggregation); iteration count stays a driver constant, never data-
    dependent collect.
    """
    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    r = nodes.withColumn("r", F.lit(1000000).cast("long")).localCheckpoint()
    for _ in range(_N_ITER):
        contrib = (
            r.join(edges, r.node == edges.src)
            .join(outdeg, edges.src == outdeg.src)
            .select("dst", F.expr("r div od").alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("c"))
        )
        r = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.expr(
                    "CAST(150000 + (850 * COALESCE(c, 0)) div 1000 AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return r.select("node", F.col("r").alias("rank"))
