"""§2 D-ext — Pivot / unpivot reshapes.

Reference correspondence: the reference's report surface emits wide
per-institution × per-status course-count matrices from long keyed rows
(the subtotal-report pattern generalized, SURVEY §2 D rollup row); pivot is
that reshape, unpivot its inverse (wide CSV exports re-normalized into
keyed rows at load time).

Scale: ``pivot`` with an explicit value list compiles to a single
hash-aggregate pass (one conditional aggregate per pivot value — no
per-value scan, no shuffle beyond the one groupBy exchange); never call
pivot without the value list at scale, since inferring it costs an extra
distinct-collect job over the full input. ``unpivot`` is a pure per-row
expand (Spark `Expand` node, map-side only, zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load

# Closed status domain (FIXTURES.md: o_orderstatus ∈ {F, O, P}).
_STATUSES = ["F", "O", "P"]


def _wide_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders pivoted to one row per priority, one count column per status."""
    o = load(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    # Absent (priority, status) combinations pivot to NULL; the conditional-
    # aggregate oracle yields 0 — coalesce so both sides agree.
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s.lower()}")
            for s in _STATUSES
        ],
    )


_O_WIDE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
"""


@register("q_pivot_wide", oracle=_O_WIDE)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: order counts per priority × status, explicit value
    list (compiles to one conditional-aggregate pass — see module header)."""
    return _wide_counts(spark, sf_dir)


@register(
    "q_unpivot_long",
    oracle=f"""
WITH wide AS ({_O_WIDE})
SELECT o_orderpriority, 'n_f' AS status, n_f AS n FROM wide
UNION ALL
SELECT o_orderpriority, 'n_o' AS status, n_o AS n FROM wide
UNION ALL
SELECT o_orderpriority, 'n_p' AS status, n_p AS n FROM wide
""",
)
def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of the pivoted matrix back to keyed rows —
    Spark's native ``DataFrame.unpivot`` (`Expand`, map-side, no shuffle)."""
    return _wide_counts(spark, sf_dir).unpivot(
        ["o_orderpriority"], ["n_f", "n_o", "n_p"], "status", "n"
    )
