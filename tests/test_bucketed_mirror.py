"""r16 optimization guards: ingest-time bucketed mirrors (sources/bucketed.py).

Above a row threshold, q_sql_q21/q_sql_q16/q_sql_q10 read bucketed mirrors
of lineitem/orders instead of the plain scans; the DuckDB oracle texts are
unchanged. These tests force the mirror path at test scale (threshold
monkeypatched to 0) and pin:

- value equality of the mirror-backed form vs the plain r15 SQL text run
  through Spark itself (both queries end in a total ORDER BY);
- the mirror plan actually reads the mirror AND loses the fact exchange
  (no Exchange hashpartitioning on the join key feeding the fact join);
- the mirror table holds exactly the source table's rows.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture()
def mirror_enabled(monkeypatch):
    import cuny_courses_spark.sources.bucketed as bucketed

    monkeypatch.setattr(bucketed, "_MIN_MIRROR_ROWS", 0)
    monkeypatch.delenv("SPARK_GRAFT_NO_BUCKETED", raising=False)
    # The analyzed-plan memo keys on (name, sf_dir, content-sig) — it
    # cannot see this fixture's threshold patch, so a previously cached
    # plain-path plan would mask the mirror path (and vice versa).
    monkeypatch.setenv("SPARK_GRAFT_NO_PLAN_CACHE", "1")
    yield bucketed


def test_mirror_rows_identical_to_source(spark, mirror_enabled):
    from cuny_courses_spark.sources.bucketed import clustered_view
    from cuny_courses_spark.sources.loaders import load

    name = clustered_view(spark, SF_DIR, "orders", "o_orderkey")
    assert name != "orders", "mirror creation must succeed at test scale"
    src = sorted(_rows(load(spark, SF_DIR, "orders")))
    mir = sorted(_rows(spark.table(name)))
    assert mir == src


@pytest.mark.parametrize(
    "qname", ["q21", "q16", "q10", "q4", "q12", "q13", "q17"]
)
def test_mirror_form_matches_plain_text(spark, mirror_enabled, qname):
    from cuny_courses_spark.operators.tpch_sql import (
        _Q4,
        _Q10,
        _Q12,
        _Q13,
        _Q16,
        _Q17,
        _Q21,
        q_sql_q4_priority_exists,
        q_sql_q10_returned_topk,
        q_sql_q12_priority_by_class,
        q_sql_q13_cust_distribution,
        q_sql_q16_supplier_cnt,
        q_sql_q17_small_qty_revenue,
        q_sql_q21_waiting_supplier,
    )
    from cuny_courses_spark.sql import run_sql

    sql, fn = {
        "q21": (_Q21, q_sql_q21_waiting_supplier),
        "q16": (_Q16, q_sql_q16_supplier_cnt),
        "q10": (_Q10, q_sql_q10_returned_topk),
        "q4": (_Q4, q_sql_q4_priority_exists),
        "q12": (_Q12, q_sql_q12_priority_by_class),
        "q13": (_Q13, q_sql_q13_cust_distribution),
        "q17": (_Q17, q_sql_q17_small_qty_revenue),
    }[qname]
    df = fn(spark, SF_DIR)
    plan = _plan(spark, df)
    assert "ccs_bkt_" in plan, "mirror path must be taken"
    # sorted: q4/q12 carry no total ORDER BY (the oracle hash is
    # order-insensitive); the ordered queries sort identically anyway.
    assert sorted(_rows(df)) == sorted(_rows(run_sql(spark, SF_DIR, sql)))


def test_q21_mirror_join_is_exchange_free(spark, mirror_enabled):
    from cuny_courses_spark.operators.tpch_sql import (
        q_sql_q21_waiting_supplier,
    )

    plan = _plan(spark, q_sql_q21_waiting_supplier(spark, SF_DIR))
    # Co-bucketed scans must feed the ord⋈lineitem join and both rollups
    # without a fact exchange: no hash re-partitioning on the order key.
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_q16_mirror_dedup_is_exchange_free(spark, mirror_enabled):
    from cuny_courses_spark.operators.tpch_sql import q_sql_q16_supplier_cnt

    plan = _plan(spark, q_sql_q16_supplier_cnt(spark, SF_DIR))
    # The DISTINCT (l_partkey, l_suppkey) must reuse the bucketed scan's
    # partitioning (subset-key clustering satisfies the distribution).
    assert "Exchange hashpartitioning(l_partkey" not in plan


def test_mirror_disabled_env_falls_back(spark, monkeypatch):
    import cuny_courses_spark.sources.bucketed as bucketed

    monkeypatch.setattr(bucketed, "_MIN_MIRROR_ROWS", 0)
    monkeypatch.setenv("SPARK_GRAFT_NO_BUCKETED", "1")
    assert (
        bucketed.clustered_view(spark, SF_DIR, "lineitem", "l_orderkey")
        == "lineitem"
    )


def test_checkpoint_probe_skipped_when_bound_is_large(spark, monkeypatch):
    """VERDICT r15 #3: past the footer bound, _checkpointed_small must
    not materialize — no localCheckpoint scan (Scan ExistingRDD) in the
    plan, shuffle-hash posture taken, results unchanged."""
    import cuny_courses_spark.operators.joins as joins
    from cuny_courses_spark.operators.tpch_sql import (
        _Q18,
        q_sql_q18_volume_customer,
    )
    from cuny_courses_spark.sql import run_sql

    expected = _rows(run_sql(spark, SF_DIR, _Q18))
    monkeypatch.setattr(joins, "_STAR_BCAST_ROWS", 0)
    df = q_sql_q18_volume_customer(spark, SF_DIR)
    plan = _plan(spark, df)
    assert "ExistingRDD" not in plan
    assert "ShuffledHashJoin" in plan
    assert _rows(df) == expected
