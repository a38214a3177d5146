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


@register(
    "q_graph_triangles",
    oracle="""
WITH pe AS (SELECT p_partkey FROM part WHERE p_size <= 5),
e AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    WHERE a.l_partkey IN (SELECT p_partkey FROM pe)
      AND b.l_partkey IN (SELECT p_partkey FROM pe)
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles,
       (SELECT count(*) FROM e) AS n_edges
FROM e e1
JOIN e e2 ON e1.v = e2.u
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
""",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (motif analytics) on the part co-purchase graph:
    parts sharing an order are adjacent; count closed triples among
    small parts (p_size ≤ 5 bounds the subgraph). Edges are canonically
    oriented u < v, so each triangle is counted EXACTLY once and the
    wedge join e1(u,v)⋈e2(v,w) enumerates only id-increasing paths —
    the standard orientation trick that turns O(Σdeg²) into the
    out-degree-bounded form. At 100 TB: the edge list is the distinct
    pair set (hash aggregate), wedges shuffle on the shared middle
    vertex, and the closing-edge probe is a hash join on (u, w); skewed
    hub vertices are the known hazard — a degree-ordered orientation
    (orient from lower- to higher-degree endpoint) caps out-degree by
    graph degeneracy and is the documented scale upgrade."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    small = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select("p_partkey")
    lis = li.join(
        F.broadcast(small), li.l_partkey == small.p_partkey
    ).select("l_orderkey", "l_partkey")
    a = lis.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = lis.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, ["o"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    e1 = edges
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = edges.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    wedges = e1.join(e2, "v")
    tris = wedges.join(
        e3, (wedges.u == e3.u3) & (wedges.w == e3.w3)
    )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
    )
