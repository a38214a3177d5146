"""§2 C — Joins.

Reference correspondence: the loaders' dict-lookup joins (build {key: row},
probe per row — a hash join in Python) and the declarative joins of the
downstream SQL surface (SURVEY §2 C, §3.2). Declared by semantics; physical
intent per query:

- dimension joins carry an explicit ``broadcast()`` hint (MB-scale dims:
  region/nation/supplier/part at test sf; at 100 TB the same hint holds for
  true dims, and AQE converts sort-merge → broadcast when stats allow);
- fact-fact joins (orders⋈lineitem) shuffle on the join key — at scale these
  become sort-merge joins whose shuffles are the dominant cost, so both
  sides are pre-projected to the needed columns before the exchange;
- the as-of join has no batch built-in: implemented as equi-join on the
  partition key + window argmax, the Spark-native latest-effective-row plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuny_courses_spark.common import O_fp, O_fpsum, fmt_ts, fp, fpsum, r4
from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


@register(
    "q_join_inner_equi",
    oracle="""
SELECT o_orderkey, c_name, round(o_totalprice, 4) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (course→department lookup pattern)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", r4("o_totalprice", "total")
    )


@register(
    "q_join_left",
    oracle="""
SELECT o_orderkey, count(l_orderkey) AS n_items
FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; 257 orders at sf0.01 have no lineitems → n_items=0."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


@register(
    "q_join_right",
    oracle="""
SELECT o_orderkey, count(l_orderkey) AS n_items
FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey
""",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer variant (mirror of q_join_left)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


@register(
    "q_join_full",
    oracle="""
SELECT CASE WHEN o_orderkey IS NULL THEN 'lineitem_only'
            WHEN lk IS NULL THEN 'orders_only'
            ELSE 'both' END AS side,
       count(*) AS n
FROM orders
FULL JOIN (SELECT DISTINCT l_orderkey AS lk FROM lineitem) li
  ON o_orderkey = lk
GROUP BY side
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the snapshot-diff primitive (see q_etl_upsert_classify)."""
    o = load(spark, sf_dir, "orders")
    lk = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("lk"))
        .distinct()
    )
    j = o.join(lk, o.o_orderkey == lk.lk, "full")
    side = (
        F.when(F.col("o_orderkey").isNull(), "lineitem_only")
        .when(F.col("lk").isNull(), "orders_only")
        .otherwise("both")
    )
    return j.groupBy(side.alias("side")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_join_semi",
    oracle="""
SELECT o_orderkey FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): orders having ≥1 lineitem."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select("o_orderkey")


@register(
    "q_join_anti",
    oracle="""
SELECT o_orderkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the reference's orphan-detection audit."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey")


@register(
    "q_join_broadcast_dim",
    oracle=f"""
SELECT r_name, {O_fpsum(f"{O_fp('l_extendedprice')} * (100 - {O_fp('l_discount')})", 4, 'revenue')}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → chained broadcast dims (the hard-coded institution-dim pattern).

    Broadcast policy: explicit hints go only on *bounded* dims (nation=25,
    region=5 — constant forever). supplier scales with SF, so its strategy
    is left to the size threshold / AQE: broadcast at test scale, shuffle
    join once it outgrows the threshold at 100 TB. Result: one pass over
    the fact, no shuffle until the 5-group aggregate, and a plan that
    survives 100× scale-up without edits.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(fpsum(fp("l_extendedprice") * (100 - fp("l_discount")), 4, "revenue"))
    )


@register(
    "q_join_star_multiway",
    oracle=f"""
SELECT n_name, {O_fpsum(f"{O_fp('l_extendedprice')} * (100 - {O_fp('l_discount')})", 4, 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q_join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-table star join, region-filtered, revenue per nation.

    Join order (r4 verdict #2): REDUCE FIRST — orders(date-filtered) ⋈
    customer(region-filtered, broadcast) collapses to a narrow
    (o_orderkey, c_nationkey) build side ~6 % the size of orders before
    lineitem is touched; then ONE join drives the fact scan. The
    local-supplier condition (c_nationkey = s_nationkey) rides the
    supplier join as part of the composite equi-key.

    Fact-join strategy is a PREPARE-TIME runtime-stats decision under the
    large profile (the engine's mini-CBO): one cheap count() of the build
    side at plan-build time (amortized by the plan cache — once per
    corpus, not per execution) picks
      · broadcast when the build fits comfortably per executor
        (≤ _STAR_BCAST_ROWS ≈ 100 MB hashed): lineitem is NEVER
        shuffled — the probe is the filter; measured 2.92 s → 1.35 s at
        the ×100 sweep point (the full-fact exchange was the bottleneck);
      · shuffle-hash otherwise (neither fact side pays the SMJ sort;
        r4-measured 3.5 s SHJ vs 4.5 s SMJ at ×100) — the 100 TB path,
        where the build side (~6 % of orders) is billions of rows.
    Small profile: no hint — the size-threshold planner broadcasts at
    test scale (measured 0.43 s broadcast vs 0.92 s shuffled at sf0.1).

    The CONSTANT bounded dims (nation = 25, region = 5 rows, enumerated by
    the schema contract forever, at any SF) are resolved at plan-build
    time into literals — ``_bounded_dim`` reads the KB-sized files
    driver-side (capped, asserts boundedness) and the region filter +
    nation lookup compile to an ``isin`` over 5 nationkeys pushed INTO the
    customer/supplier scans plus a literal-map projection for n_name.
    That's constant-relation folding, not a driver-side collect of
    distributed data: two broadcast-exchange build jobs disappear (6 → 4
    per execution — each BroadcastExchange is its own Spark job, r3
    verdict #5), both dim scans leave the plan, and the dim predicate
    reaches the parquet scans as a static pushed filter instead of a
    runtime join — strictly better at 100 TB too, where nation/region are
    still 25/5 rows. The plan cache keys on sf_dir content, so a changed
    dim file re-folds.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = o.filter(
        (o.o_orderdate >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (o.o_orderdate < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    from cuny_courses_spark.session import is_small_input

    nation = _bounded_dim(spark, sf_dir, "nation")
    region = _bounded_dim(spark, sf_dir, "region")
    asia = {
        r["r_regionkey"] for r in region if r["r_name"] == "ASIA"
    }
    asian = {
        r["n_nationkey"]: r["n_name"]
        for r in nation
        if r["n_regionkey"] in asia
    }
    keys = sorted(asian)
    in_asia = (
        F.col("s_nationkey").isin(keys) if keys else F.lit(False)
    )
    c2 = c.filter(
        F.col("c_nationkey").isin(keys) if keys else F.lit(False)
    ).select("c_custkey", "c_nationkey")
    s2 = s.filter(in_asia).select("s_suppkey", "s_nationkey")
    nmap = (
        F.create_map(*[F.lit(x) for k in keys for x in (k, asian[k])])
        if keys
        else F.create_map(F.lit(0), F.lit(None).cast("string"))
    )
    if not is_small_input(sf_dir):
        # The filtered-dim joins get the SAME prepare-time count gate as
        # the fact join below (r6: the 8 MB auto-broadcast bound —
        # correct for planner-estimated facts — also stopped the planner
        # broadcasting these region-filtered dims at the ×100 point,
        # where their 2-col scans estimate tens of MB; the SMJ fallback
        # re-sorted orders per lap, star ×100 2.44→1.96 s with the
        # explicit gate). ≤ _STAR_BCAST_ROWS broadcasts — at true 100 TB
        # the counted sides exceed the bound and shuffle-hash instead.
        # Footer-stats seed (r11, r10 verdict missing #6): the UNfiltered
        # footer row count upper-bounds the filtered dim, so when it is
        # already under the gate the count() job is skipped — two fewer
        # prepare-time Spark jobs, same decision. Only the safe direction
        # short-circuits; over-gate footers fall through to the exact
        # filtered count (the filter may still fit broadcast).
        cf, sf_ = _footer_rows(sf_dir, "customer"), _footer_rows(
            sf_dir, "supplier"
        )
        c2 = (
            F.broadcast(c2)
            if (cf is not None and cf <= _STAR_BCAST_ROWS)
            or c2.count() <= _STAR_BCAST_ROWS
            else c2.hint("shuffle_hash")
        )
        s2 = (
            F.broadcast(s2)
            if (sf_ is not None and sf_ <= _STAR_BCAST_ROWS)
            or s2.count() <= _STAR_BCAST_ROWS
            else s2.hint("shuffle_hash")
        )
    # Reduce first: date-filtered orders ⋈ region-filtered customer is the
    # narrow fact-join build side (o_orderkey, c_nationkey).
    oc = o.join(c2, o.o_custkey == c2.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    if is_small_input(sf_dir):
        # Small profile: input is bounded (<4 GiB / <25 M rows), so the
        # filtered build side always fits a broadcast; the explicit hint
        # saves the planner's conservative intermediate-size estimate from
        # shuffling the fact (measured 0.42 s estimated vs 0.23 s hinted
        # at sf0.1).
        oc = F.broadcast(oc)
    else:
        # Prepare-time runtime stats (see docstring): count the build side
        # once per corpus (plan-cached) and pick the fact-join strategy.
        n_build = oc.count()
        oc = (
            F.broadcast(oc)
            if n_build <= _STAR_BCAST_ROWS
            else oc.hint("shuffle_hash")
        )
    return (
        li.join(oc, li.l_orderkey == F.col("o_orderkey"))
        .join(
            s2,
            (li.l_suppkey == s2.s_suppkey)
            & (F.col("c_nationkey") == s2.s_nationkey),
        )
        .groupBy(nmap[F.col("s_nationkey")].alias("n_name"))
        # Split-long exact accumulation (common._fpx_total): profile-free
        # and overflow-provable to ~8.8e12 rows.
        .agg(fpsum(
            fp("l_extendedprice") * (100 - fp("l_discount")), 4, "revenue"
        ))
    )


# Fact-join build side is broadcast below this row count (~400 MB as a
# HashedRelation at ~48 B/row — large but routine: Spark clusters ship
# broadcasts this size daily, and the alternative is exchanging the
# ENTIRE fact), shuffle-hash joined above it. Decision input is a
# prepare-time count of the already-filtered build side, not a guess
# from raw table bytes. Raised 2 M → 8 M in r10: the ×500 sweep point
# crossed the old gate and flipped star/topk to shuffle-hash, paying a
# 300 M-row fact exchange — measured 10.6-17.6 s vs 7.5-8.6 s broadcast
# (steady-state laps, ×500 corpus); every point ≤×100 already broadcast
# under the old gate, so their recorded numbers are unaffected. At true
# 100 TB the counted build sides exceed ANY driver-safe bound and the
# shuffle-hash branch remains the path taken.
_STAR_BCAST_ROWS = 8_000_000


def _footer_rows(sf_dir: str, table: str) -> int | None:
    """Parquet-footer row count of ``table`` — the ANALYZE-free stats
    seed for prepare-time join planning (r10 verdict missing #6): the
    footer total is an UPPER BOUND on any filtered subset of the table,
    so when it already fits the broadcast gate the planner can skip the
    filtered count() job entirely (metadata read, no Spark job — the
    same place the lakehouse manifests harvest their stats). Returns
    None on non-local/unreadable storage; callers fall back to the
    exact prepare-time count. Never used to SKIP a shuffle decision in
    the unsafe direction: an upper bound under the gate proves
    broadcast-safety, an upper bound over it proves nothing and the
    exact count decides."""
    import glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    matches = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    if not matches:
        return None
    try:
        return sum(pq.ParquetFile(m).metadata.num_rows for m in matches)
    except OSError:
        return None


def _bounded_dim(
    spark: SparkSession, sf_dir: str, table: str, cap: int = 100
) -> list[dict]:
    """Plan-build-time rows of a CONSTANT bounded dimension (nation/region:
    enumerated by the schema contract, ≤ 25 rows at any SF — FIXTURES.md).
    Reads the KB-sized parquet driver-side with pyarrow when the path is a
    local file; on any other storage (s3a://, hdfs://, or an unreadable
    local path) it falls back to reading the dim through Spark and
    collecting — still ≤ cap rows, one tiny Spark job (r4 ADVICE: the
    FileNotFoundError-only version was a functional regression on remote
    sf_dirs). EVERY failure mode stays loud (r4 review — the first cut
    silently truncated multi-file dims and returned [] for unmatched
    paths, which would silently drop revenue rows): every matched file is
    read, and the CUMULATIVE row count is checked against the bound with a
    real exception (not assert — must survive ``python -O``), so this can
    never silently become a driver-side materialization of a scaling
    table. A 0-row file (empty-input gate) legitimately yields []."""
    import glob

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    matches = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    rows: list[dict] = []
    if matches:
        for m in matches:
            rows.extend(pq.read_table(m).to_pylist())
            if len(rows) > cap:
                raise ValueError(
                    f"{table} has > {cap} rows — not a bounded constant dim"
                )
        return rows
    # Remote / non-globbable storage: one Spark job over a KB-sized file.
    # limit(cap+1) bounds what reaches the driver even if the contract is
    # violated; the over-cap check then raises exactly as the local path.
    collected = load(spark, sf_dir, table).limit(cap + 1).collect()
    if len(collected) > cap:
        raise ValueError(
            f"{table} has > {cap} rows — not a bounded constant dim"
        )
    return [r.asDict() for r in collected]


@register(
    "q_join_theta",
    oracle=f"""
SELECT p_brand,
       count(*) AS n,
       {O_fpsum(O_fp('l_extendedprice'), 2, 'price_sum')}
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + non-equi residual (grade-bound-predicate pattern):
    hash/SMJ on the equi key, residual filter after the probe."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), fpsum(fp("l_extendedprice"), 2, "price_sum"))
    )


@register(
    "q_join_range_interval",
    oracle="""
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts
 AND b.ts < a.ts + INTERVAL 5 MINUTE
GROUP BY a.user_id
""",
)
def q_join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: same-user event pairs within [ts, ts+5min).

    Physical shape: time-banded hash equi-join, never user-only. A plain
    equi-join on user_id enumerates ALL same-user pairs before the range
    residual — quadratic on hot users at 100 TB. Banding keys both sides
    by the 5-minute epoch (bucket = ts div 5min): a qualifying b lies in
    a's bucket or the next one, so the left side explodes to those two
    bucket keys and the join runs on (user_id, bucket) + exact residual.
    Candidates are bounded by per-user density within ±5 minutes — the
    same bound Structured Streaming's watermarked interval join enforces
    (tests/test_streaming.py runs that twin). Each qualifying pair matches
    exactly one exploded bucket (a's two keys are distinct), so no dedup
    step is needed.
    """
    e = load(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) div 300000000")  # 5-min epoch, exact
    a = e.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        bucket.alias("b_bucket"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (a.bucket == b.b_bucket)
            & (a.a_id < b.b_id)
            & (b.b_ts >= a.a_ts)
            & (b.b_ts < a.a_ts + F.expr("INTERVAL 5 MINUTE")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_join_asof",
    oracle="""
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (
    -- Pre-dedup clicks to max event_id per (user_id, ts): DuckDB ASOF's
    -- pick among duplicate right timestamps is not a documented total
    -- order, so make the right side unique per (user_id, ts) — the same
    -- max-event_id representative the engine's sweep selects.
    SELECT user_id, ts, max(event_id) AS event_id
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, ts
) c
  ON p.user_id = c.user_id AND c.ts <= p.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest same-user click at-or-before
    it — the reference's "latest effective rule at date" pattern (SURVEY §2 C).

    Spark has no batch ASOF (SURVEY §4). The scale-correct formulation is
    the union-window (merge-sweep) plan, not a join: union clicks and
    purchases into one stream, one shuffle on user_id, sort each user's
    history once by (ts, kind, event_id) — clicks ordered before purchases
    at equal ts, so `click.ts <= purchase.ts` is inclusive, and the max
    click_id wins exact-ts ties — a *defined* tie order; the oracle gets
    the same one by pre-deduping clicks to max event_id per (user_id, ts)
    before its ASOF JOIN (DuckDB's own pick among duplicate right
    timestamps is undocumented) — then every purchase reads
    `last(click, ignoreNulls)` over the running frame. Zero candidate
    materialization: a join-then-argmax plan builds every (purchase,
    earlier-click) pair first — quadratic on hot users at 100 TB; this
    sweep is O(history) per user regardless of skew (AQE skew-split and
    salting handle residual partition imbalance).
    """
    e = load(spark, sf_dir, "events")
    ck_t = "struct<click_id:bigint,c_ts:timestamp>"
    clicks = e.filter(e.event_type == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.struct(
            F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
        ).alias("ck"),
    )
    purchases = e.filter(e.event_type == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast(ck_t).alias("ck"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = clicks.unionByName(purchases).withColumn(
        "last_ck", F.last("ck", ignorenulls=True).over(w)
    )
    return (
        swept.filter((F.col("kind") == 1) & F.col("last_ck").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("last_ck.click_id").alias("click_id"),
            (F.unix_micros("ts") - F.unix_micros("last_ck.c_ts")).alias("gap_us"),
        )
    )


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (5 × 25 = 125 rows)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str] | None:
    """Materialize orders & customer as 8-bucket tables on o_custkey /
    c_custkey (external parquet under /tmp). Returns the table names, or
    None if the environment can't write (query then falls back to plain
    frames — correctness never depends on the layout).

    Paths are (content-sig, pid)-scoped: two processes benching the same
    sf_dir never write the same directory, so a reader can't observe a
    half-overwritten table. On any failure the partially-created catalog
    entries are dropped before falling back, so nothing dangling remains.
    """
    import hashlib
    import os as _os

    from cuny_courses_spark.session import _dir_signature

    sig = hashlib.md5(
        repr((sf_dir, _dir_signature(sf_dir))).encode()
    ).hexdigest()[:10]
    scope = f"{sig}_{_os.getpid()}"
    names = (f"ccs_bkt_orders_{scope}", f"ccs_bkt_customer_{scope}")
    specs = (("orders", "o_custkey"), ("customer", "c_custkey"))
    try:
        for name, (table, key) in zip(names, specs):
            if spark.catalog.tableExists(name):
                continue
            (
                load(spark, sf_dir, table)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", f"/tmp/ccs_bucketed/{scope}/{table}")
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        return names
    except Exception:
        for name in names:  # drop partial state; fallback path needs none
            try:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
            except Exception:
                pass
        return None


@register(
    "q_join_bucketed",
    oracle=f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {O_fpsum(O_fp('o_totalprice'), 2, 'sum_price')}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketing — THE pre-partitioning
    lever for repeated fact⋈dim-key joins at 100 TB (SURVEY §4): both
    sides are written bucketed (8 buckets, sorted) on the join key at
    ingest, so the sort-merge join reads matching buckets directly with
    ZERO exchange on either side — the only shuffle in this plan is the
    final tiny groupBy(c_mktsegment). The ``merge`` hint pins SMJ (a
    broadcast of customer would hide the bucketing demonstration; at real
    scale the customer side isn't broadcastable anyway).

    plan-asserted in tests: exactly one Exchange (the final agg), none
    feeding the join."""
    t = _bucketed_tables(spark, sf_dir)
    if t is not None:
        o, c = spark.table(t[0]), spark.table(t[1])
    else:  # read-only fallback: same semantics, shuffled join
        o = load(spark, sf_dir, "orders")
        c = load(spark, sf_dir, "customer")
    j = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        fpsum(fp("o_totalprice"), 2, "sum_price"),
    )


@register(
    "q_join_dpp",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       o_orderstatus AS status,
       count(*) AS n
FROM orders
WHERE year(o_orderdate) IN (1996, 1997)
GROUP BY o_year, status
""",
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a fact table partitioned on o_year joins
    a small year dimension whose *attribute* filter selects 1996-1997; the
    fact scan must read only those two partition directories, with the
    pruning predicate injected AT RUNTIME from the broadcast dim (Catalyst
    `DynamicPartitionPruning`, visible as `dynamicpruningexpression` in the
    scan's PartitionFilters — asserted in tests/test_plans.py). At 100 TB
    this is the difference between scanning 2 partitions and 30: the
    static optimizer cannot prune because the years arrive via the join,
    not as a literal predicate on the fact.

    The partitioned copy is written once per sf_dir content signature
    (same `_io_dir` layout the scan queries use)."""
    from cuny_courses_spark.operators.scans import _io_dir

    out = _io_dir(sf_dir, "orders_dpp")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("long")
    )
    import os

    if not os.path.isdir(out):
        o.select("o_orderkey", "o_orderstatus", "o_year").write.mode(
            "overwrite"
        ).partitionBy("o_year").parquet(out)
    # Explicit schema: a zero-file partitioned dataset (empty input) has
    # nothing to infer from (r3 verdict #6); partition discovery — and
    # with it the runtime pruning predicate — still applies.
    fact = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_year long"
    ).parquet(out)
    dim = (
        spark.range(1992, 1999)
        .select(
            F.col("id").alias("d_year"),
            F.col("id").isin(1996, 1997).alias("d_target"),
        )
    )
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("d_target"))),
            fact.o_year == F.col("d_year"),
        )
        .groupBy(
            F.col("o_year").cast("long").alias("o_year"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def build_selective_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared plan builder for q_join_bloom_runtime_filter (also used by the
    plan test, which re-plans it under production-scale runtime-filter
    thresholds)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fpsum(fp("l_extendedprice"), 2, "sum_price"),
        )
    )


@register(
    "q_join_bloom_runtime_filter",
    oracle=f"""
SELECT l_returnflag, count(*) AS n,
       {O_fpsum(O_fp('l_extendedprice'), 2, 'sum_price')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 400000
GROUP BY l_returnflag
""",
)
def q_join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⋈fact join — the shape where Spark's runtime Bloom
    filter pays off at 100 TB: the filtered orders side builds a
    `bloom_filter_agg` sketch that is pushed into the lineitem scan as a
    `might_contain` row filter, cutting the shuffle volume of the big side
    by the join selectivity BEFORE the exchange (InjectRuntimeFilter; the
    row-level analogue of q_join_dpp's partition-level pruning).

    Conf posture: injection is governed by size thresholds
    (`runtime.bloomFilter.applicationSideScanSizeThreshold`, default
    10 GB) — at test scale the filtered side simply broadcasts (the right
    small-scale plan), while at production scale the thresholds trip and
    the bloom filter injects with no code change. tests/test_plans.py
    re-plans this exact builder under lowered thresholds to assert the
    injection happens."""
    return build_selective_fact_join(spark, sf_dir)


# ------------------------------------------------------- q_join_salted_skew


@register(
    "q_join_salted_skew",
    oracle="""
WITH t AS (
    SELECT o_orderpriority AS p,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
               AS s,
           count(*) AS c
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CASE WHEN CAST(round(o_totalprice * 100) AS HUGEINT) * c > s
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM orders JOIN t ON o_orderpriority = p
GROUP BY o_orderpriority
""",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join: orders ⋈ per-priority stats on
    o_orderpriority — a 5-value join key, the worst-case skew shape (a
    plain shuffle join funnels every row through ≤ 5 reducers no matter
    the cluster size). The salt replicates the 5-row stats side 16× and
    routes each fact row to (key, pmod(o_orderkey, 16)), bounding any
    reducer's input to ~1/16 of a key's rows. Result is provably identical
    to the unsalted join (every fact row still meets exactly one replica
    of its key's stats row) — the oracle is the PLAIN join.

    This is the portable skew plan for when the small side is too big to
    broadcast and AQE skew-split isn't available (e.g. a non-AQE engine
    boundary, or a skewed BUILD side AQE won't split); with AQE on, the
    runtime split achieves the same bound adaptively
    (tests/test_scale_profile.py exercises that profile). The above-mean
    test is cross-multiplied into exact integers (cents·c > Σcents) — no
    float average on either side; shuffle_hash hint keeps the join a real
    shuffle so the salt path is what executes (broadcast would bypass it
    at test scale).
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", fp("o_totalprice").alias("cents")
    )
    stats = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    salted_stats = stats.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(15)))
    )
    fact = o.withColumn("_salt", F.pmod("o_orderkey", F.lit(16)))
    return (
        fact.join(
            salted_stats.hint("shuffle_hash"), ["o_orderpriority", "_salt"]
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(
                    F.col("cents").cast("decimal(38,0)") * F.col("c")
                    > F.col("s"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_above"),
        )
    )


@register(
    "q_join_asof_nearest",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (
    SELECT user_id, ts, max(event_id) AS event_id
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, ts
),
b AS (
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.ts AS c_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts <= p.ts
),
f AS (
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.ts AS c_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.ts >= p.ts
)
SELECT p.event_id AS purchase_id,
       CASE WHEN f.click_id IS NULL
                 OR (b.click_id IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(b.c_ts)
                         <= epoch_us(f.c_ts) - epoch_us(p.ts))
            THEN b.click_id ELSE f.click_id END AS click_id,
       CASE WHEN f.click_id IS NULL
                 OR (b.click_id IS NOT NULL
                     AND epoch_us(p.ts) - epoch_us(b.c_ts)
                         <= epoch_us(f.c_ts) - epoch_us(p.ts))
            THEN epoch_us(p.ts) - epoch_us(b.c_ts)
            ELSE epoch_us(p.ts) - epoch_us(f.c_ts) END AS gap_us
FROM p
JOIN b ON p.event_id = b.purchase_id
JOIN f ON p.event_id = f.purchase_id
WHERE b.click_id IS NOT NULL OR f.click_id IS NOT NULL
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: each purchase matched to the temporally
    closest same-user click in EITHER direction (sensor alignment /
    attribution when the event clock skews both ways); ties go backward,
    `gap_us` keeps the sign (negative = click after purchase).

    Same union-sweep architecture as q_join_asof: one shuffle on user_id,
    two frames over it — `last(click≤)` backward and `first(click>)`
    forward (a same-ts click lands in the backward frame by the (ts,
    kind) sort, and its 0 gap always wins, matching the oracle's
    ≥-inclusive forward pick). Exact-ts click ties resolve to the MAX
    event_id in both directions WITHOUT a pre-dedup shuffle: the backward
    frame's `last` reads ascending event_id order, the forward frame gets
    its own DESCENDING event_id sort — same user_id exchange, one extra
    in-partition sort, versus the oracle's explicit max-per-(user, ts)
    dedup (DuckDB ASOF needs a unique right side; a second Spark exchange
    for the same effect would double the shuffled bytes). Zero candidate
    materialization — O(history) per user versus the join-then-argmin
    plan that is quadratic on hot users; plan-asserted ONE exchange and
    no join (tests/test_plans.py)."""
    e = load(spark, sf_dir, "events")
    ck_t = "struct<click_id:bigint,c_ts:timestamp>"
    clicks = e.filter(e.event_type == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.struct(
            F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
        ).alias("ck"),
    )
    purchases = e.filter(e.event_type == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast(ck_t).alias("ck"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("event_id").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    swept = (
        clicks.unionByName(purchases)
        .withColumn("bk", F.last("ck", ignorenulls=True).over(wb))
        .withColumn("fw", F.first("ck", ignorenulls=True).over(wf))
    )
    pu = F.unix_micros("ts")
    bgap = pu - F.unix_micros("bk.c_ts")
    fgap = F.unix_micros("fw.c_ts") - pu
    back_wins = F.col("fw").isNull() | (F.col("bk").isNotNull() & (bgap <= fgap))
    return (
        swept.filter(F.col("kind") == 1)
        .filter(F.col("bk").isNotNull() | F.col("fw").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.when(back_wins, F.col("bk.click_id"))
            .otherwise(F.col("fw.click_id"))
            .alias("click_id"),
            F.when(back_wins, bgap).otherwise(-fgap).alias("gap_us"),
        )
    )


# The price-band dimension: a tiny TIERED lookup with range predicates —
# the canonical "join on BETWEEN against a rate/band table" shape (tax
# brackets, SLA tiers, grade bands). Bounded by construction (5 rows,
# fixed forever), so the nested-loop probe against it is O(5) per row.
_PRICE_BANDS = [
    ("tier_1", 0, 50_000),
    ("tier_2", 50_000, 100_000),
    ("tier_3", 100_000, 200_000),
    ("tier_4", 200_000, 400_000),
    ("tier_5", 400_000, 10_000_000),
]


@register(
    "q_join_band_lookup",
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES
    {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)}
)
SELECT band, CAST(count(*) AS BIGINT) AS n,
       {O_fpsum(O_fp('o_totalprice'), 2, 'total')}
FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""",
)
def q_join_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-band lookup join: orders classified into price tiers by a
    BETWEEN join against a 5-row band dimension — the one join shape where
    BroadcastNestedLoopJoin IS the right plan at every scale: there is no
    equi-key to hash on, and the build side is bounded by construction
    (the band table is a fixed tariff, not data-derived), so the probe
    does O(bands)=O(5) comparisons per fact row on a broadcast of a few
    hundred bytes — cheaper than any derived-equi-key rewrite (a
    width_bucket pre-key would work for UNIFORM bands but not for the
    general irregular-boundary tariff this models). Plan-allowlisted in
    the BNLJ hygiene gate with this justification. Non-overlapping bands
    ⇒ every order matches exactly one row ⇒ deterministic counts."""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo long, hi long")
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fpsum(fp("o_totalprice"), 2, "total"),
        )
    )


@register(
    "q_join_null_safe",
    oracle="""
WITH d AS (
    SELECT nullif(o_orderstatus, 'P') AS k,
           min(o_orderkey) AS first_key
    FROM orders GROUP BY 1
)
SELECT coalesce(CAST(d.k AS VARCHAR), 'NULL') AS k,
       CAST(count(*) AS BIGINT) AS n_orders,
       d.first_key
FROM (SELECT nullif(o_orderstatus, 'P') AS k, o_orderkey FROM orders) o
JOIN d ON o.k IS NOT DISTINCT FROM d.k
GROUP BY d.k, d.first_key
""",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``<=>`` ≡ IS NOT DISTINCT FROM): orders
    matched back to a per-status dimension where status 'P' is NULLed out
    — the "unknown matches unknown" semantic a plain equi-join silently
    drops (NULL = NULL is NULL ⇒ the whole NULL group vanishes), needed
    whenever the join key comes out of an outer join or optional
    attribute. The planner treats ``<=>`` as a HASHABLE equi-key
    (coalesce-wrapped), so this is a broadcast/hash equi-join — same
    shuffle posture as any dim lookup at 100 TB, never a nested loop
    (covered by the plan-hygiene gate like every registered query)."""
    o = load(spark, sf_dir, "orders").select(
        F.nullif("o_orderstatus", F.lit("P")).alias("k"), "o_orderkey"
    )
    d = o.groupBy(F.col("k").alias("dk")).agg(
        F.min("o_orderkey").alias("first_key")
    )
    return (
        o.join(F.broadcast(d), F.col("k").eqNullSafe(F.col("dk")))
        .groupBy(
            F.coalesce(F.col("dk").cast("string"), F.lit("NULL")).alias("k"),
            "first_key",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select("k", "n_orders", "first_key")
    )


@register(
    "q_join_interval_overlap",
    oracle="""
WITH a AS (
    SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS a_s,
           CAST(o_orderdate AS DATE)
               + CAST(1 + o_orderkey % 14 AS INTEGER) AS a_e
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
), b AS (
    SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS b_s,
           CAST(o_orderdate AS DATE)
               + CAST(1 + o_orderkey % 14 AS INTEGER) AS b_e
    FROM orders
    WHERE o_orderpriority = '2-HIGH'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
)
SELECT a_key, b_key,
       strftime(greatest(a_s, b_s), '%Y-%m-%d') AS overlap_start,
       CAST(date_diff('day', greatest(a_s, b_s), least(a_e, b_e)) + 1
            AS BIGINT) AS overlap_days
FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
""",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP JOIN — both sides are interval sets (urgent vs
    high-priority order fulfillment windows; genomics/temporal engines
    ship this as a native operator): emit every (a, b) pair whose closed
    date ranges intersect, with the overlap start and exact day count.

    Physical strategy — the GRID join (the sort-free distributed answer
    to an inequality-only join): each interval explodes to the 7-day
    grid cells it covers (``sequence`` over integer epoch-weeks — an
    interval of w weeks costs w replicas, bounded by the interval-length
    cap the derivation bakes in: ≤ 15 days ⇒ ≤ 3 cells), the join is an
    EQUI-join on the cell plus the overlap predicate, and duplicate
    hits (a pair sharing several cells) are eliminated CLOSED-FORM —
    keep the hit only in the FIRST COMMON cell, the week of
    greatest(a_s, b_s) — instead of a distinct (which would re-shuffle
    the pair stream; the same trick as q_dedup_substring_spans' gram
    anchoring). A naive theta join is a broadcast nested loop (O(|A|·
    |B|) comparisons); the grid does O(cells) hash work + per-cell
    candidate scans, and at 100 TB the cell key shuffles/banding-salts
    like any equi-join key (hot weeks split by AQE skew handling).
    DuckDB's oracle runs the plain theta join — same pairs, which is
    exactly the proof the grid dedup is exact."""
    o = load(spark, sf_dir, "orders")

    def side(prio: str, key: str, s: str, e: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderpriority") == prio)
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-03-01").cast("timestamp"))
        ).select(
            F.col("o_orderkey").alias(key),
            F.to_date("o_orderdate").alias(s),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.lit(1) + F.pmod("o_orderkey", F.lit(14))).cast("int"),
            ).alias(e),
        )

    epoch = F.lit("1970-01-01").cast("date")

    def wk(c: str) -> F.Column:
        return F.floor(F.datediff(F.col(c), epoch) / 7).cast("long")

    a = side("1-URGENT", "a_key", "a_s", "a_e").withColumn(
        "cell", F.explode(F.sequence(wk("a_s"), wk("a_e")))
    )
    b = side("2-HIGH", "b_key", "b_s", "b_e").withColumn(
        "cell", F.explode(F.sequence(wk("b_s"), wk("b_e")))
    )
    first_common = F.floor(
        F.datediff(F.greatest("a_s", "b_s"), epoch) / 7
    ).cast("long")
    return (
        a.join(b, ["cell"])
        .filter(
            (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & (F.col("cell") == first_common)
        )
        .select(
            "a_key",
            "b_key",
            F.date_format(F.greatest("a_s", "b_s"), "yyyy-MM-dd").alias(
                "overlap_start"
            ),
            (
                F.datediff(F.least("a_e", "b_e"), F.greatest("a_s", "b_s"))
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )
