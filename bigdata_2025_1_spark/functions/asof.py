"""Generic as-of join — the operator Spark has no native form of
(DuckDB/Pandas expose ASOF JOIN / merge_asof; at 100 TB the only
scale-safe shape is the one-shuffle union+window below).

Semantics: for every fact row, attach the timeline row with the greatest
``(ts, tiebreak)`` that is ``<=`` the fact's ``(ts, +inf)`` — i.e.
backward-looking, inclusive at equal timestamps, deterministic under
duplicate timestamps via the tiebreak column.

Why not a join: a per-row "latest before" is a range join; executed
naively it is BroadcastNestedLoop / cartesian-class. Union both sides,
shuffle ONCE on the key, sort within partitions by ``(ts, side,
tiebreak)`` with timeline rows ordered before facts at equal ts, and a
running ``last(ignorenulls)`` carries the newest timeline row to each
fact row. Cost = sessionization (one exchange + one sort), at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_attach_last(
    fact: DataFrame,
    timeline: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value: str,
    out_value: str = "asof_value",
    out_ts: str = "asof_ts",
) -> DataFrame:
    """Return ALL ``fact`` columns + ``out_value``/``out_ts`` from the
    latest ``timeline`` row at-or-before each fact row's ``ts`` (per
    ``key``); both NULL when no timeline row precedes the fact.

    ``fact`` and ``timeline`` must both carry ``key``, ``ts`` and
    ``tiebreak`` columns; ``timeline`` additionally carries ``value``.

    The carried signal is ``struct(ts, value)`` — non-NULL exactly when
    the row IS a timeline row, so a timeline row whose *value* is
    legitimately NULL still wins the as-of race, and ``out_ts``/
    ``out_value`` always come from the SAME timeline row (a bare-value
    sentinel would skip NULL-valued rows and could pair ts and value
    from different rows).
    """
    tl_types = dict(timeline.dtypes)
    sig_type = f"struct<t:{tl_types[ts]},v:{tl_types[value]}>"
    facts = fact.select(
        "*",
        F.lit(1).alias("__is_fact"),
        F.lit(None).cast(sig_type).alias("__sig"),
    )
    tl = timeline.select(
        key,
        ts,
        tiebreak,
        F.lit(0).alias("__is_fact"),
        F.struct(F.col(ts).alias("t"), F.col(value).alias("v")).cast(sig_type).alias(
            "__sig"
        ),
    )
    win = (
        Window.partitionBy(key)
        .orderBy(ts, "__is_fact", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_sig = F.last("__sig", ignorenulls=True).over(win)
    merged = facts.unionByName(tl, allowMissingColumns=True).withColumn(
        "__last", last_sig
    )
    return (
        merged.filter(F.col("__is_fact") == 1)
        .withColumn(out_ts, F.col("__last.t"))
        .withColumn(out_value, F.col("__last.v"))
        .drop("__is_fact", "__sig", "__last")
    )
