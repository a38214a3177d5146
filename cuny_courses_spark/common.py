"""Shared determinism helpers for query/oracle parity.

The single likeliest cause of oracle hash-mismatches is float summation order
(SURVEY §7 "What's hard" #1). ROUND(...,4) alone does NOT stabilize large
sums: summing 1e5 doubles of magnitude 3e4 accumulates O(0.1–1) absolute
error depending on partial-aggregation order — far above the 1e-4 rounding
grain. The engine therefore sums monetary/quantity columns through
DECIMAL(30,6): the double→decimal conversion is deterministic per value,
decimal addition is exact and order-independent, and casting the exact
decimal result back to DOUBLE yields bit-identical values in Spark and
DuckDB. Small-magnitude statistics (stddev/var/avg of ~1e1 values) stay in
double; their cross-engine drift (~1e-12 relative) is far below the 4 dp
rounding grain.

Oracle-side equivalents are the ``O_*`` SQL snippet builders below — keep
both sides textually paired when adding queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column, rounded to 4 dp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), 4).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / count, rounded to 4 dp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        (F.sum(c.cast(DEC)).cast("double") / F.count(c)), 4
    ).alias(alias)


def r4(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.round(c.cast("double"), 4)
    return c.alias(alias) if alias else c


def fmt_ts(col: Column | str, alias: str | None = None) -> Column:
    """Temporal output as 'yyyy-MM-dd HH:mm:ss' string (µs-safe, tz-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.alias(alias) if alias else c


def fmt_date(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.date_format(c, "yyyy-MM-dd")
    return c.alias(alias) if alias else c


# ---- oracle (DuckDB) SQL snippet builders — textual twins of the above ----

def O_dsum(expr: str, alias: str) -> str:
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE), 4) AS {alias}"


def O_davg(expr: str, alias: str) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"
        f" / count({expr}), 4) AS {alias}"
    )


def O_fmt_ts(expr: str, alias: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S') AS {alias}"


def O_fmt_date(expr: str, alias: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d') AS {alias}"
