"""Shared determinism helpers for oracle-checked queries.

The fixtures store money as ``double`` (FIXTURES.md deviation table), but
FP summation order differs between Spark's partial/final aggregation and
DuckDB's. To make value-hashes match exactly, money math is done in
DECIMAL: cast each 2-decimal input to an exact decimal, do the arithmetic
and the SUM in decimal (order-independent, exact), and only cast the final
result back to double. Both engines then produce bit-identical doubles.

Mirrors the reference's choice of ``Decimal128(11,2)`` for money columns
(``/root/reference/src/tpch.rs:154, 209-212``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# money (price-like, up to ~1e6 with 2 decimals) and rate-like (discount,
# tax, in [0,1]) decimal shapes — small enough that products stay within
# 38 digits of precision in both Spark and DuckDB.
MONEY_DEC = "decimal(12,2)"
RATE_DEC = "decimal(4,2)"


def money(c: Column) -> Column:
    """Exact decimal view of a 2-decimal money double."""
    return c.cast(MONEY_DEC)


def rate(c: Column) -> Column:
    """Exact decimal view of a 2-decimal rate double."""
    return c.cast(RATE_DEC)


def dsum(c: Column) -> Column:
    """Order-independent SUM of money: decimal-sum → double, 2 decimals."""
    return F.round(F.sum(money(c)).cast("double"), 2)


def davg(c: Column) -> Column:
    """Order-independent AVG of money: exact decimal sum / count, then
    truncated to 2 decimals (see trunc_digits for why not ROUND)."""
    return trunc_digits(F.sum(money(c)).cast("double") / F.count(c), 2)


def dsum_expr(c: Column) -> Column:
    """SUM of an already-decimal expression → rounded double."""
    return F.round(F.sum(c).cast("double"), 2)


def trunc_digits(c: Column, k: int) -> Column:
    """Truncate a raw double to k decimals: ``floor(x·10^k)/10^k``.

    ``ROUND`` on arbitrary doubles diverges between engines near decimal
    halfway points (Spark rounds the shortest decimal repr, DuckDB the
    binary value). floor of the same IEEE product is bit-deterministic
    in both, so truncation is the cross-engine-safe way to emit
    fractional results of divisions/cosines. Use ROUND only on values
    that are exact decimals by construction (decimal sums cast back).
    """
    scale = 10**k
    return F.floor(c * scale).cast("double") / scale


def sql_trunc_digits(expr: str, k: int) -> str:
    scale = 10**k
    return f"(CAST(floor(({expr}) * {scale}) AS DOUBLE) / {scale})"


# DuckDB-side twins (string templates for oracle SQL).
def sql_dsum(expr: str) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE), 2)"
