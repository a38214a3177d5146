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


def vsum(col: Column | str, alias: str) -> Column:
    """dsum twin for ≤6-dp contract doubles (``events.value`` — 2-dp data,
    FIXTURES.md) without the per-row BigDecimal: decimal(30,6) exceeds
    Spark's 18-digit compact Decimal, so ``dsum``'s cast AND its sum are
    BigDecimal ops per row (r6 profile, BASELINE.md "Round-6"). The 1e6
    fixed-point image is the EXACT integer the DECIMAL(30,6) cast
    produces for any ≤6-dp-representable double, and the split-long total
    (``_fpx_total``) is overflow-exact — same value as ``O_dsum`` at any
    scale. Keep ``dsum`` for genuinely arbitrary doubles."""
    return fpsum(fp(col, 6), 6, alias)


def fp(col: Column | str, digits: int = 2) -> Column:
    """Exact int64 fixed-point image of a known-scale decimal column.

    Monetary/quantity columns in the testdata carry ≤ ``digits`` decimal
    places, so ``round(x·10^d)`` recovers the exact integer the double
    approximates — after which all arithmetic (products of fixed-point
    terms, sums) is integer-exact and order-independent WITHOUT the
    per-row double→BigDecimal conversion that makes ``dsum`` the hottest
    expression in the profile (~2× whole-query cost on the Q1 shape).
    Only use on columns whose decimal scale is part of the data contract
    (FIXTURES.md — that contract covers ``events.value`` too: 2-dp data,
    summed via ``vsum``); a genuinely arbitrary double (e.g. a computed
    ratio or ML score column with full mantissa entropy) keeps dsum.

    Rounding is ARITHMETIC nearest-int (add ±0.5, truncate-toward-zero
    cast), not ``F.round``: Spark implements Round on DoubleType through
    ``java.math.BigDecimal.setScale(HALF_UP)`` — a per-row object
    allocation that profiled as ~40 % of the whole Q1 shape at the ×100
    sweep point (1.32 s → 0.79 s, tools/profile_scan.py). Equivalence to
    HALF_UP is exact on contract columns: x·10^d lands within ~1e-9 of an
    integer (never near a k+0.5 tie), where add-±0.5-then-truncate and
    HALF_UP agree for both signs; at an exact representable tie both
    round away from zero; NULL propagates through both. The only
    divergence window is a product within half-an-ulp of k+0.5
    (~1e-11 absolute at 1e5 magnitude) — unreachable from fixed-scale
    decimal data, the same window the former FP multiply-then-round
    already had.
    """
    c = F.col(col) if isinstance(col, str) else col
    x = c * (10 ** digits)
    return F.when(x >= 0, x + 0.5).otherwise(x - 0.5).cast("long")


_SPLIT_BITS = 20


def _fpx_total(int_col: Column) -> Column:
    """Exact integer total of an int64 fixed-point expression via
    SPLIT-LONG accumulation: two codegen'd long sums — floor(x / 2²⁰)
    (arithmetic ``shiftright``) and the non-negative remainder
    (``x & (2²⁰−1)``) — recombined into the exact decimal total
    hi·2²⁰ + lo only at output. x = (x>>20)·2²⁰ + (x & mask) holds for
    negatives too in two's complement, so the identity is per-row exact.

    Why: one decimal(38,0) sum costs ~2× the whole Q1-shape query
    (measured 2.19 s vs 1.14 s on an 88 M-row corpus; at sf0.1 the split
    even edges out a RAW long sum, 0.294 s vs 0.333 s, because the cast
    disappears), while raw int64 accumulation needs a per-profile
    overflow proof. The split needs neither profile nor density
    assumptions: |Σ hi| ≤ rows · max|x|/2²⁰ and Σ lo < rows · 2²⁰, so
    with the engine's largest per-row product (~1.1e11, the scale-6 Q1
    charge expression) both partials stay inside int64 up to ~8.8e12
    rows ≈ a petabyte-scale lineitem — 13× past the 100 TB design point
    (~6.6e11 rows). ANSI mode would THROW, never wrap, beyond that. The
    recombined decimal is the same exact integer the decimal(38,0)
    accumulator produces — bit-identical downstream.
    """
    hi = F.sum(F.shiftright(int_col, _SPLIT_BITS))
    lo = F.sum(int_col.bitwiseAND(F.lit((1 << _SPLIT_BITS) - 1)))
    return hi.cast("decimal(38,0)") * (1 << _SPLIT_BITS) + lo


def fpsum(int_col: Column, scale: int, alias: str) -> Column:
    """Order-independent sum of an exact fixed-point int64 expression,
    via split-long accumulation (``_fpx_total``) — overflow-provable to
    ~8.8e12 rows with no profile/density assumptions, ~2× faster than
    the decimal(38,0) accumulator it replaced (r4). The exact integer
    total is cast to double (round-to-nearest, identical in JVM and
    DuckDB) and rescaled."""
    s = _fpx_total(int_col).cast("double")
    return F.round(s / float(10 ** scale), 4).alias(alias)


def fpavg(int_col: Column, scale: int, count_col: Column | str, alias: str) -> Column:
    """Exact-sum mean of a fixed-point expression, rounded to 4 dp."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    s = _fpx_total(int_col).cast("double")
    return F.round(s / float(10 ** scale) / F.count(c), 4).alias(alias)


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

def O_fp(expr: str, digits: int = 2) -> str:
    """DuckDB twin of fp(): exact int64 fixed-point image (sum → HUGEINT,
    so the DuckDB side is overflow-exact like the decimal(38,0) path)."""
    return f"CAST(round(({expr}) * {10 ** digits}) AS BIGINT)"


def O_fpsum(int_expr: str, scale: int, alias: str) -> str:
    return (
        f"round(CAST(sum({int_expr}) AS DOUBLE) / {float(10 ** scale)}, 4)"
        f" AS {alias}"
    )


def O_fpavg(int_expr: str, scale: int, count_expr: str, alias: str) -> str:
    return (
        f"round(CAST(sum({int_expr}) AS DOUBLE) / {float(10 ** scale)}"
        f" / count({count_expr}), 4) AS {alias}"
    )


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


def pair_set_certificate(
    exact, approx, key_cols: list[str], floor_num: int, floor_den: int
):
    """One-row recall/precision certificate over two pair sets (r3 verdict
    #4 plumbing, shared by q_dedup_minhash_lsh and q_sim_neardup_lsh —
    r4 review deduplicated the two hand-rolled copies): emits
    ``n_exact_pairs`` (BIGINT), ``recall_floor_met`` = floor_den·|approx ∩
    exact| ≥ floor_num·|exact| (integer arithmetic, vacuously true on an
    empty exact set), and ``precision_ok`` = approx ⊆ exact. The matching
    oracle computes |exact| in SQL with constant-true flags."""
    e = exact.select(*key_cols)
    a = approx.select(*key_cols)
    n_exact = e.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_hit = e.join(a, key_cols, "left_semi").agg(
        F.count(F.lit(1)).alias("_hits")
    )
    n_leak = a.join(e, key_cols, "left_anti").agg(
        F.count(F.lit(1)).alias("_leaks")
    )
    return (
        n_exact.crossJoin(n_hit)
        .crossJoin(n_leak)
        .select(
            F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
            (
                floor_den * F.col("_hits")
                >= floor_num * F.col("n_exact_pairs")
            ).alias("recall_floor_met"),
            (F.col("_leaks") == 0).alias("precision_ok"),
        )
    )


def S_r4_ratio(num: str, den: str) -> str:
    """Spark-SQL text: exact HALF-UP 4-dp of the integer ratio num/den,
    emitted as the double of an exact 4-dp decimal.

    ``num`` must be the ratio numerator PRE-SCALED so that num/den is in
    1e-4 units of the desired value (for a plain fraction r/n pass
    ``r * 10000``); both int64, den > 0, 2·num + den inside int64 (caller
    bound). Why: round(double, 4) on a rational whose exact value sits on
    a .xxxx5 boundary is engine-dependent — Spark rounds the shortest
    DECIMAL repr half-up, DuckDB rounds the scaled BINARY half-away — and
    with small denominators those boundaries are populated (q_ts_ewma hit
    20 of them at sf0.1). Integer division has no boundary to disagree
    on. Pair with O_r4_ratio; keep both sides textually identical."""
    return (
        f"CAST((2 * ({num}) + ({den})) div (2 * ({den})) AS DOUBLE)"
        " / 10000.0"
    )


def O_r4_ratio(num: str, den: str) -> str:
    """DuckDB twin of S_r4_ratio (// is integral division)."""
    return (
        f"CAST((2 * ({num}) + ({den})) // (2 * ({den})) AS DOUBLE)"
        " / 10000.0"
    )
