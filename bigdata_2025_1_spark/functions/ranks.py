"""Distributed global ranking without the single-partition window.

``row_number().over(Window.orderBy(...))`` is the classic
does-not-survive-100x shape: Spark moves EVERY row into one window
partition (and logs "No Partition Defined for Window operation"). But a
global dense rank over a total order does not need a global funnel:

1. ``repartitionByRange`` on the order columns — Spark's sampling range
   partitioner gives non-overlapping, ordered partitions (partition i
   holds strictly lower keys than partition i+1);
2. number rows *within* each partition (an Arrow-batched streaming
   counter over the partition-local sort — no shuffle, no Python
   row-at-a-time loop);
3. the global rank of a row is its partition-local position plus the
   total row count of all earlier partitions — a partition-count-sized
   offset table, broadcast back.

The only non-partition-parallel step is the offset prefix-sum over
``n_partitions`` rows (a deliberate triangular broadcast join, n^2 pairs
of a tiny table, so no unpartitioned Window appears anywhere and the
single-partition warning never fires). ``tests/test_plans.py`` pins the
absence of ``Exchange SinglePartition`` for the operators built on this.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    num_parts: int | None = None,
    prefix_of: str | None = None,
    prefix_col: str = "cum",
) -> DataFrame:
    """Append ``rank_col``: the 1-based global row number of each row in
    the total order given by ``order_cols`` (which must be a unique key
    for the rank to be deterministic). With ``prefix_of`` set, also
    append ``prefix_col``: the INCLUSIVE global running sum of that
    int64 column over the same order (the distributed form of
    ``sum(x).over(orderBy(...).rowsBetween(unboundedPreceding,
    currentRow))`` — running totals, Pareto prefixes, CDFs).

    Determinism: range-partition boundaries come from Spark's seeded
    reservoir sampling of a deterministic scan, and partitions are
    non-overlapping in the order key, so ``offset(partition) + local
    position/sum`` is the true global rank/prefix regardless of where
    boundaries land.

    Scale shape: ONE full-data shuffle (the range exchange, reused by
    both the numbering branch and the tiny per-partition totals); the
    offset table is ``n_partitions`` rows (its prefix sum is a
    deliberate triangular broadcast join — n^2 pairs of a tiny table, so
    no single-partition exchange exists anywhere here) broadcast back;
    output rank is int64 (a 100 TB table overflows row_number's int32).
    """
    spark = df.sparkSession
    n = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # persist() is CORRECTNESS here, not caching: `parts` is consumed
    # twice (the per-partition size/sum table and the mapInPandas
    # numbering), and each un-persisted evaluation plans its own
    # repartitionByRange whose RangePartitioner samples independently —
    # boundaries can differ between the two runs (observed on a
    # theta-join input: ranks went missing/duplicated), making
    # offset(pid) disagree with the partition layout the kernel saw.
    # With the post-shuffle frame persisted, both consumers read ONE
    # materialization, so _pid and row order are identical by
    # construction. (Same contract in with_prefix_min; cache released
    # by the harnesses' per-query clearCache. The default
    # MEMORY_AND_DISK level spills rather than OOMs on a 100 TB input;
    # clusters that cannot spare the disk should swap persist() for a
    # reliable checkpoint() — the requirement is ONE materialization,
    # not caching per se.)
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )

    size_aggs = [F.count("*").alias("_c")]
    if prefix_of is not None:
        size_aggs.append(F.coalesce(F.sum(prefix_of), F.lit(0)).alias("_vc"))
    sizes = parts.groupBy("_pid").agg(*size_aggs)
    contrib = sizes.select(
        *[F.col(c).alias(f"_b{c.lstrip('_')}") for c in sizes.columns]
    )
    off_aggs = [F.coalesce(F.sum("_bc"), F.lit(0)).alias("_off")]
    if prefix_of is not None:
        off_aggs.append(F.coalesce(F.sum("_bvc"), F.lit(0)).alias("_voff"))
    offs = (
        sizes.join(F.broadcast(contrib), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(*off_aggs)
    )

    out_fields = list(parts.schema.fields) + [StructField("_pos", LongType(), False)]
    if prefix_of is not None:
        out_fields.append(StructField("_vpos", LongType(), False))

    def _number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = 0
        vpos = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pos"] = range(pos + 1, pos + 1 + len(pdf))
            pos += len(pdf)
            if prefix_of is not None:
                if pdf[prefix_of].isna().any():
                    raise ValueError(
                        f"with_global_rank: prefix_of column {prefix_of!r} "
                        "must be non-null int64 (coalesce before ranking)"
                    )
                c = pdf[prefix_of].astype("int64").cumsum() + vpos
                pdf["_vpos"] = c
                vpos = int(c.iloc[-1]) if len(c) else vpos
            yield pdf

    numbered = parts.mapInPandas(_number, schema=type(parts.schema)(out_fields))
    out = (
        numbered.join(F.broadcast(offs), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_pos"))
    )
    if prefix_of is not None:
        out = out.withColumn(prefix_col, F.col("_voff") + F.col("_vpos")).drop("_voff")
    return out.drop("_pid", "_pos", "_off", "_vpos")


def with_prefix_min(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix_min",
) -> DataFrame:
    """Append ``out_col``: the EXCLUSIVE global running minimum of int64
    ``value_col`` over the total order given by ``order_cols`` (NULL for
    the globally-first row — nothing precedes it). The distributed form
    of ``min(x).over(orderBy(...).rowsBetween(unboundedPreceding, -1))``
    — the sweep primitive behind skyline/frontier operators — built the
    same way as :func:`with_global_rank`: ONE range exchange, partition-
    local Arrow cummin, and a partition-count-sized min-offset table
    broadcast back (no single-partition window anywhere)."""
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # persist() is CORRECTNESS, not caching (same contract as
    # with_global_rank): `parts` is consumed twice, and un-persisted
    # evaluations each plan their own range exchange whose boundary
    # sampling can differ — observed producing missing/duplicated ranks
    # on a theta-join input in the global-rank twin. One
    # materialization, one partition layout for both consumers.
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = parts.groupBy("_pid").agg(F.min(value_col).alias("_m"))
    contrib = sizes.select(F.col("_pid").alias("_bpid"), F.col("_m").alias("_bm"))
    offs = (
        sizes.join(F.broadcast(contrib), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.min("_bm").alias("_moff"))
    )

    out_fields = list(parts.schema.fields) + [StructField("_lmin", LongType(), True)]

    def _cummin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        run = None  # inclusive min over all prior rows of this partition
        for pdf in batches:
            pdf = pdf.copy()
            if pdf[value_col].isna().any():
                raise ValueError(
                    f"with_prefix_min: {value_col!r} must be non-null int64"
                )
            # all-integer path — a float64 shift/fillna round-trip would
            # silently lose precision for |value| >= 2^53 (the e12-scaled
            # fixed-point range this repo actually uses)
            vals = pdf[value_col].to_numpy(dtype="int64")
            n_rows = len(vals)
            out = pd.array([pd.NA] * n_rows, dtype="Int64")
            if n_rows:
                inc = np.minimum.accumulate(vals)
                exc = np.empty(n_rows, dtype="int64")
                exc[1:] = inc[:-1]
                if run is None:
                    out[1:] = exc[1:]
                else:
                    exc[0] = run
                    out[:] = np.minimum(exc, run)
                run = int(inc[-1]) if run is None else min(run, int(inc[-1]))
            pdf["_lmin"] = out
            yield pdf

    numbered = parts.mapInPandas(_cummin, schema=type(parts.schema)(out_fields))
    return (
        numbered.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.least(F.col("_lmin"), F.col("_moff")))
        .drop("_pid", "_lmin", "_moff")
    )


def rank_after_limit(
    df: DataFrame,
    order_by: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Distributed top-k, then rank ONLY the survivors: ``orderBy(...)
    .limit(k)`` compiles to ``TakeOrderedAndProject`` (per-partition
    partial top-k merged on the driver — no global sort, no data-sized
    shuffle), and the unpartitioned ``row_number`` window that follows
    runs over AT MOST ``k`` rows. Spark logs its "No Partition Defined
    for Window operation" warning at that second step — here it is
    EXPECTED AND BENIGN: the window input is k-bounded by construction,
    never data-sized, so the single partition holds ≤ k rows at any
    corpus scale. Every top-k-with-rank query in the repo routes through
    this helper so the idiom is self-documenting and grep-able.

    ``order_by`` is the shared total order (Columns, e.g.
    ``[F.desc("score"), F.col("id")]``); it must be a total order (unique
    tiebreaker) for the rank to be deterministic. ``rank_col`` is int32 —
    safe because k bounds it."""
    top = df.orderBy(*order_by).limit(k)
    rank = F.row_number().over(Window.orderBy(*order_by))
    return top.withColumn(rank_col, rank.cast("int"))


def cum_counts_over_values(
    vals: DataFrame,
    value_col: str,
    count_col: str = "vc",
    out_col: str = "cum_before",
    descending: bool = False,
) -> DataFrame:
    """Append ``out_col``: the EXCLUSIVE cumulative sum of ``count_col``
    over ``value_col`` order — the shared first step of every
    distinct-value rank-cut in this repo (equi-depth buckets, percentile
    gates, threshold sweeps, tail quantiles). ``vals`` must be one row
    per DISTINCT value (a count histogram), so the deliberate
    unpartitioned window runs over the VALUE DOMAIN — bounded by value
    cardinality, not data size (the documented exception to the
    no-global-window rule)."""
    order = F.desc(value_col) if descending else F.col(value_col)
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    return vals.withColumn(out_col, F.coalesce(F.sum(count_col).over(w), F.lit(0)))


def boundary_rank_keep(
    rows: DataFrame,
    id_col: str,
    part_cols: list[str],
    cum_col: str = "cum_before",
    kcut_col: str = "kcut",
) -> DataFrame:
    """Keep the first ``kcut − cum_before`` rows (in ``id_col`` order) of
    each boundary value group — the second shared step of a rank cut:
    a row with 1-based in-group position j has global rank cum_before+j,
    so it survives iff cum_before + j ≤ kcut. The window is partitioned
    by the boundary group (``part_cols``) — per construction at most ONE
    value group per cut straddles the boundary, so this touches a single
    group's rows, never the table."""
    w = Window.partitionBy(*part_cols).orderBy(id_col)
    return (
        rows.withColumn("_rb", F.row_number().over(w))
        .filter(F.col(cum_col) + F.col("_rb") <= F.col(kcut_col))
        .drop("_rb")
    )
