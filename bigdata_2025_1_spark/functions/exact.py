"""Order-independent (bit-exact) floating-point aggregation helpers.

Summing IEEE doubles is order-dependent: Spark folds partitions in
nondeterministic order, DuckDB in another, so ``SUM(double)`` can differ in
the last bits between engines — enough to break a value-hash oracle.

Fix: scale each value to an integer number of "cents" per row
(``round(x * 10^scale)`` — a deterministic per-row double op, identical in
both engines), sum exactly in int64, divide once at the end. The integer sum
is associative/commutative, so partitioning cannot change it; the final
division is a single deterministic double op. Fixture magnitudes
(≤ ~1e9 * 10^4 = 1e13) sit far below int64 range.

The oracle-side SQL mirror of each helper is in the query modules' SQL
strings (``CAST(ROUND(x * 1e4) AS BIGINT)`` etc.).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column, scale: int = 4) -> Column:
    """SUM(col) as double, order-independent: scale→int64→sum→unscale."""
    factor = float(10**scale)
    return F.sum(F.round(col * F.lit(factor)).cast("bigint")) / F.lit(factor)


def exact_avg(col: Column, scale: int = 4) -> Column:
    """AVG(col) as double, order-independent (exact int sum / count)."""
    factor = float(10**scale)
    return (
        F.sum(F.round(col * F.lit(factor)).cast("bigint")).cast("double")
        / F.count(col)
        / F.lit(factor)
    )


def sql_exact_sum(expr: str, scale: int = 4) -> str:
    """DuckDB mirror of :func:`exact_sum` for oracle strings."""
    factor = f"1e{scale}" if scale else "1"
    return f"SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) / {factor}"


def sql_exact_avg(expr: str, scale: int = 4) -> str:
    """DuckDB mirror of :func:`exact_avg`."""
    factor = f"1e{scale}" if scale else "1"
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / COUNT({expr}) / {factor}"
    )


def int_avg(col: Column) -> Column:
    """AVG over integer input as double: exact int64 sum, one division.

    (Plain ``F.avg(long)`` may accumulate as double incrementally; this
    form is engine-order-proof.)
    """
    return F.sum(col).cast("double") / F.count(col)


def sql_int_avg(expr: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT({expr})"


def int_div_exact(num: Column, den: Column) -> Column:
    """Exact integer division for decimal(38,0) operands: (num − num % den)
    / den, cast back to decimal(38,0).

    Spark's ``div`` operator silently narrows DECIMAL operands to int64
    (a 27-digit dividend comes back as a wrapped-around bigint), so it
    cannot be used past the int64 range. The pmod form stays entirely in
    decimal: the modulo is exact, the subtraction makes the dividend an
    exact multiple, and the final division therefore has a zero
    fractional part — the (38,6) intermediate rounds nothing. Operands
    must be non-negative (both call-site uses are counts/rank sums), and
    the QUOTIENT must stay below 10^32 (the (38,6) result type's integer
    digits — ANSI raises loudly past it, never wraps; call sites here
    are ratio-scaled quantizations with quotients ≤ 10^12).
    DuckDB mirror: ``//`` on HUGEINT (exact at any magnitude we reach).
    """
    return ((num - num % den) / den).cast("decimal(38,0)")


APPROX_TOL = 0.05  # sketch-vs-exact relative tolerance (shared by the
# approx_* tolerance-verdict queries and their oracle docstrings)


def within_tol(approx: str | Column, exact: str | Column, tol: float = APPROX_TOL) -> Column:
    """|approx - exact| / exact <= tol — the engine-checkable verdict for
    sketch outputs whose raw values are engine-specific (HLL, KLL).

    exact = 0 (empty input) is exact-equality instead of a relative test
    — the division would be an ANSI DIVIDE_BY_ZERO job failure; NULL
    inputs propagate NULL (matching a NULL-emitting oracle). The
    denominator is |exact| so a negative exact value still bounds the
    deviation (ratio-sign bug otherwise passes ANY deviation)."""
    a = F.col(approx) if isinstance(approx, str) else approx
    e = F.col(exact) if isinstance(exact, str) else exact
    ad, ed = a.cast("double"), e.cast("double")
    return F.when(ed == 0, ad == ed).otherwise((F.abs(ad - ed) / F.abs(ed)) <= tol)
