"""Data-layout helpers: Z-order (Morton) values for multi-dimensional
file clustering.

Why: min/max row-group pruning only skips data when each file's value
RANGE is narrow. Sorting by one column narrows that column's ranges and
leaves every other predicate column full-width; interleaving the bits of
two (or more) columns into one sort key narrows ALL of them at once —
the layout trick behind Delta/Iceberg Z-ORDER, expressed here with plain
JVM-side bitwise expressions (no UDF) so a 100 TB rewrite is a
repartitionByRange + sortWithinPartitions away.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int
    columns: result bit 2i is bit i of ``a``, bit 2i+1 is bit i of
    ``b``. Whole-stage-codegen'd shift/mask arithmetic — the sort key
    for Z-ordered writes."""
    az = a.cast("bigint")
    bz = b.cast("bigint")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(az, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bz, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def scale_to_bits(col: Column, col_max: Column | int, bits: int = 8) -> Column:
    """Min-max scale a non-negative int column onto [0, 2^bits) so both
    z-order dimensions occupy the SAME bit width. Interleaving RAW
    values with asymmetric cardinalities degenerates to a single-column
    sort (the wider column owns every significant bit) — which is why
    production Z-ORDER implementations interleave value ranks/buckets,
    not raw values."""
    mx = F.lit(col_max) if isinstance(col_max, int) else col_max
    c = col.cast("bigint")
    top = F.lit((1 << bits) - 1).cast("bigint")
    return F.when(mx <= 0, F.lit(0).cast("bigint")).otherwise(
        (c * top / mx).cast("bigint")
    )
