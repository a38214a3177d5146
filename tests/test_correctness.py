"""Every oracled query must match DuckDB bit-exactly (the driver's t2 gate,
here at SF_DIR). Rows-only queries must at least execute and return rows."""

from __future__ import annotations

import pytest

from cuny_courses_spark.oracle import compare
from cuny_courses_spark.registry import oracles, queries
from tests.conftest import SF_DIR

_QS = queries()
_OS = oracles()


@pytest.mark.parametrize("name", sorted(_OS))
def test_oracle_match(spark, duck, name):
    sp = _QS[name](spark, SF_DIR).toPandas()
    du = duck.execute(_OS[name]).df()
    status, msg = compare(sp, du)
    assert status == "PASS", f"{name}: {status} — {msg}"


@pytest.mark.parametrize("name", sorted(set(_QS) - set(_OS)))
def test_rows_only_executes(spark, name):
    df = _QS[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0
