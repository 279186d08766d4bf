"""Portable md5-derived integers — the one hash family every cross-engine
query here uses (md5 hex is bit-identical in Spark and DuckDB; native
hash() functions are not).

Each helper has a Spark-Column form and a DuckDB-SQL-string mirror that
MUST stay arithmetic-identical — keeping the pair in one module removes
the hand-synced duplicate spellings that used to live inline at every
call site (checksums, CDC boundaries, feature hashing, sampling,
bootstrap weights).

``hex_digits ≤ 15`` keeps the parsed integer under 2^60 — inside both
engines' exact int64/DOUBLE-safe range.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column, hex_digits: int = 12) -> Column:
    """First ``hex_digits`` hex chars of md5(col) as a non-negative
    int64. col must already be a string (cast/concat at the call site so
    the oracle mirror sees the same bytes)."""
    return F.conv(F.substring(F.md5(col), 1, hex_digits), 16, 10).cast("bigint")


def sql_md5_int(expr: str, hex_digits: int = 12) -> str:
    """DuckDB mirror of :func:`md5_int` (expr is SQL yielding a string)."""
    return f"('0x' || substr(md5({expr}), 1, {hex_digits}))::BIGINT"
