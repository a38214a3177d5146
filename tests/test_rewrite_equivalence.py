"""Semantic-equivalence guards for the round-7 TPC-H rewrites.

Q21/Q18/Q13/Q10/Q5/Q3 were rewritten from their textbook correlated /
join-then-aggregate forms into one-pass / staged forms (tpch_sql.py).
The driver's oracle gate proves Spark ≡ DuckDB on the NEW text, but that
is tautological about the REWRITE itself — both engines run the same
text. These tests pin the rewrite against the original semantics: the
r6 canonical form and the registered r7 form run side-by-side in DuckDB
over RANDOMIZED small corpora (25 seeds), covering shapes the fixtures
don't (single-supplier orders, all-late orders, zero-order customers,
revenue ties at the top-k boundary, empty filter results).

Data contract note: key columns are unique per table and foreign keys
resolve (o_custkey ⊆ customer, l_suppkey ⊆ supplier, …) — FIXTURES.md
guarantees this for the real corpora, and the Q10/Q18 limit-before-
dim-join rewrites rely on it (an orphan key surviving to a top-k cut
could otherwise change which rows the dim join keeps).
"""

from __future__ import annotations

import random

import duckdb
import pytest

# --- canonical r6 forms (semantic references, frozen) -------------------

OLD_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND n_name = 'NATION_1'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""

OLD_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey ASC
LIMIT 20
"""

OLD_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

_EP = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_DISC = "CAST(round(l_discount * 100) AS BIGINT)"
_REV = f"round(CAST(sum({_EP} * (100 - {_DISC})) AS DOUBLE) / 1e4, 4)"

OLD_Q10 = f"""
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

OLD_Q5 = f"""
SELECT n_name, {_REV} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

OLD_Q4 = """
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

OLD_Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

OLD_Q8 = f"""
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                  AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume,
           n2.n_name AS nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

OLD_Q2 = """
WITH offers AS (
    SELECT l_partkey, l_suppkey,
           min(CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT))
               AS unit_cents
    FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
    SELECT p_partkey, p_name, p_size, p_type, s_suppkey, s_name,
           o.unit_cents,
           min(o.unit_cents) OVER (PARTITION BY p_partkey) AS min_cents
    FROM part
    JOIN offers o ON o.l_partkey = p_partkey
    JOIN supplier ON s_suppkey = o.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_suppkey, s_name, unit_cents
FROM eu
WHERE p_size = 15 AND p_type = 'ECONOMY' AND unit_cents = min_cents
ORDER BY p_partkey ASC, s_suppkey ASC
LIMIT 100
"""

OLD_Q7 = f"""
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

OLD_Q3 = f"""
SELECT l_orderkey, {_REV} AS revenue, o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""

PAIRS = {
    "q_sql_q21_waiting_supplier": OLD_Q21,
    "q_sql_q18_volume_customer": OLD_Q18,
    "q_sql_q13_cust_distribution": OLD_Q13,
    "q_sql_q10_returned_topk": OLD_Q10,
    "q_sql_q5_local_volume": OLD_Q5,
    "q_sql_q3_shipping_priority": OLD_Q3,
    "q_sql_q7_nation_volume": OLD_Q7,
    "q_sql_q2_min_cost_supplier": OLD_Q2,
    "q_sql_q4_priority_exists": OLD_Q4,
    "q_sql_q16_supplier_cnt": OLD_Q16,
    "q_sql_q8_mkt_share": OLD_Q8,
}


def _random_corpus(con: duckdb.DuckDBPyConnection, seed: int) -> None:
    """FK-consistent random mini-warehouse. Keys unique per table, skews
    chosen so every rewrite's edge paths get exercised: some orders have
    one supplier / one line, some are entirely late, ~half of quantities
    cluster so Q18's >300 cut lands near real sums, priorities and
    segments repeat so Q13/Q3 groups collide, and revenue ties are
    common (coarse price grid) so top-k tiebreaks matter."""
    rng = random.Random(seed)
    n_regions, n_nations = 3, 6
    n_cust, n_supp = 30, 8
    n_orders = 120
    n_part = 12
    con.execute("DROP TABLE IF EXISTS region; DROP TABLE IF EXISTS nation;"
                "DROP TABLE IF EXISTS customer; DROP TABLE IF EXISTS supplier;"
                "DROP TABLE IF EXISTS orders; DROP TABLE IF EXISTS lineitem;"
                "DROP TABLE IF EXISTS part")
    con.execute("CREATE TABLE region(r_regionkey INT, r_name VARCHAR)")
    for r in range(n_regions):
        con.execute(
            "INSERT INTO region VALUES (?, ?)",
            [r, {0: "ASIA", 1: "EUROPE"}.get(r, f"REGION_{r}")],
        )
    con.execute("CREATE TABLE nation(n_nationkey INT, n_name VARCHAR,"
                " n_regionkey INT)")
    for n in range(n_nations):
        con.execute("INSERT INTO nation VALUES (?, ?, ?)",
                    [n, f"NATION_{n}", rng.randrange(n_regions)])
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR,"
                " c_mktsegment VARCHAR, c_nationkey INT)")
    for c in range(n_cust):
        con.execute("INSERT INTO customer VALUES (?, ?, ?, ?)", [
            c, f"cust#{c}",
            rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
            rng.randrange(n_nations),
        ])
    con.execute("CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR,"
                " s_nationkey INT, s_acctbal DOUBLE)")
    for s in range(n_supp):
        # duplicate s_name across suppliers sometimes (Q21 groups by name)
        con.execute("INSERT INTO supplier VALUES (?, ?, ?, ?)",
                    [s, f"supp#{s % 5}", rng.randrange(n_nations),
                     rng.randrange(-500, 2000) / 4.0])
    con.execute("CREATE TABLE part(p_partkey BIGINT, p_name VARCHAR,"
                " p_size INT, p_type VARCHAR, p_brand VARCHAR)")
    for p in range(n_part):
        con.execute("INSERT INTO part VALUES (?, ?, ?, ?, ?)", [
            p, f"part#{p}", rng.choice([10, 15, 19, 20, 23]),
            rng.choice(["ECONOMY", "STANDARD", "MEDIUM BRUSHED"]),
            rng.choice(["Brand#45", "Brand#12", "Brand#33"]),
        ])
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,"
                " o_orderstatus VARCHAR, o_totalprice DOUBLE,"
                " o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT, l_suppkey BIGINT,"
                " l_partkey BIGINT, l_quantity DOUBLE,"
                " l_extendedprice DOUBLE, l_discount DOUBLE,"
                " l_shipdate TIMESTAMP, l_returnflag VARCHAR)")
    for o in range(n_orders):
        day = rng.randrange(0, 1000)
        con.execute(
            "INSERT INTO orders VALUES (?, ?, ?, ?,"
            " TIMESTAMP '1995-06-01' + INTERVAL (?) DAY, ?)",
            [o, rng.randrange(n_cust),
             rng.choice(["F", "O", "P"]),
             # coarse grid → frequent total-price ties at the Q18 cut
             rng.randrange(1, 20) * 1000 / 4.0,
             day,
             rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"])])
        for _ in range(rng.randrange(1, 5)):  # 1..4 lines; 1-line orders exist
            con.execute(
                "INSERT INTO lineitem VALUES (?, ?, ?, ?, ?, ?,"
                " TIMESTAMP '1995-06-01' + INTERVAL (?) DAY, ?)",
                [o, rng.randrange(n_supp), rng.randrange(n_part),
                 float(rng.randrange(1, 120)),   # qty: Q18's 300 cut reachable
                 rng.randrange(1, 50) * 100 / 4.0,
                 rng.randrange(0, 11) / 100.0,
                 day + rng.randrange(-5, 90),    # late and not-late mixes
                 rng.choice(["R", "N", "A"])])


_CONS: dict[int, duckdb.DuckDBPyConnection] = {}


def _corpus(seed: int) -> duckdb.DuckDBPyConnection:
    # one corpus build per seed, shared by all six query tests
    con = _CONS.get(seed)
    if con is None:
        con = _CONS[seed] = duckdb.connect()
        _random_corpus(con, seed)
    return con


@pytest.mark.parametrize("name", sorted(PAIRS))
def test_rewrite_matches_canonical_form(name):
    from cuny_courses_spark.registry import oracles

    new_sql = oracles()[name]
    old_sql = PAIRS[name]
    for seed in range(25):
        con = _corpus(seed)
        # sorted: multiset equality — the driver's value hash is order-
        # insensitive, and unordered GROUP BY outputs (Q7) may legally
        # differ in row order between plans. Top-k cuts are still pinned:
        # a different LIMIT selection changes the multiset itself.
        a = sorted(con.execute(old_sql).fetchall(), key=repr)
        b = sorted(con.execute(new_sql).fetchall(), key=repr)
        assert a == b, f"{name} diverges from canonical form at seed {seed}"
