"""r15 optimization guards: Q18/Q8 two-phase materialize-count-broadcast.

The Spark sides of q_sql_q18_volume_customer and q_sql_q8_mkt_share no
longer run their oracle SQL texts verbatim (tpch_sql._checkpointed_small
materializes the only-knowably-small-at-runtime join side, counts it,
and broadcasts under the star gate so the fact table is never
exchanged). The driver's hash gate proves new-form ≡ DuckDB; these tests
pin the two Spark forms against each other directly, on BOTH sides of
the gate:

- equality of the registered DataFrame form vs the oracle SQL text run
  through Spark itself (ordered rows — both queries end in a total
  ORDER BY);
- the same equality with the gate forced to 0 (every _checkpointed_small
  and footer-gated side falls back to the shuffle posture), proving the
  fallback branch computes the identical result and actually changes the
  join strategy (no broadcast of the gated sides in the plan).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("name", ["q18", "q8"])
def test_dataframe_form_matches_sql_text(spark, name):
    from cuny_courses_spark.operators.tpch_sql import (
        _Q8,
        _Q18,
        q_sql_q8_mkt_share,
        q_sql_q18_volume_customer,
    )
    from cuny_courses_spark.sql import run_sql

    sql, fn = {
        "q18": (_Q18, q_sql_q18_volume_customer),
        "q8": (_Q8, q_sql_q8_mkt_share),
    }[name]
    assert _rows(run_sql(spark, SF_DIR, sql)) == _rows(fn(spark, SF_DIR))


@pytest.mark.parametrize("name", ["q18", "q8"])
def test_gate_fallback_is_identical_and_unbroadcast(spark, name, monkeypatch):
    import cuny_courses_spark.operators.joins as joins
    from cuny_courses_spark.operators.tpch_sql import (
        _Q8,
        _Q18,
        q_sql_q8_mkt_share,
        q_sql_q18_volume_customer,
    )
    from cuny_courses_spark.sql import run_sql

    sql, fn = {
        "q18": (_Q18, q_sql_q18_volume_customer),
        "q8": (_Q8, q_sql_q8_mkt_share),
    }[name]
    expected = _rows(run_sql(spark, SF_DIR, sql))
    monkeypatch.setattr(joins, "_STAR_BCAST_ROWS", 0)
    df = fn(spark, SF_DIR)
    # Fallback posture: the gated sides must not be broadcast. (q8's
    # bounded nation/region dims still auto-broadcast under the session
    # threshold — assert on the gated shuffle-hash joins instead: with
    # the gate at 0 the plan must contain ShuffledHashJoin nodes, which
    # the gate-open plan provably lacks — see plans/r15/*_after.txt.)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ShuffledHashJoin" in plan
    assert _rows(df) == expected
