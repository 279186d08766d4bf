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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rn",
    num_parts: int | None = None,
) -> DataFrame:
    """Append ``rank_col``: the 1-based global row number of each row in
    the total order given by ``order_cols`` (which must be a unique key
    for the rank to be deterministic).

    Determinism: range-partition boundaries come from Spark's seeded
    reservoir sampling of a deterministic scan, and partitions are
    non-overlapping in the order key, so ``offset(partition) + local
    position`` is the true global rank regardless of where boundaries
    land.

    Scale shape: ONE full-data shuffle (the range exchange, reused by
    both the numbering branch and the tiny per-partition count); the
    offset table is ``n_partitions`` rows broadcast back; output rank is
    int64 (a 100 TB table overflows row_number's int32).
    """
    spark = df.sparkSession
    n = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    sizes = parts.groupBy("_pid").agg(F.count("*").alias("_c"))
    # Prefix-sum over the partition-count-sized table WITHOUT an
    # unpartitioned window: a triangular broadcast join (at most n^2
    # pairs of an n-row table) keeps the plan free of single-partition
    # exchanges.
    contrib = sizes.select(F.col("_pid").alias("_bpid"), F.col("_c").alias("_bc"))
    offs = (
        sizes.join(F.broadcast(contrib), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_bc"), F.lit(0)).alias("_off"))
    )

    out_fields = list(parts.schema.fields) + [StructField("_pos", LongType(), False)]

    def _number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pos"] = range(pos + 1, pos + 1 + len(pdf))
            pos += len(pdf)
            yield pdf

    numbered = parts.mapInPandas(_number, schema=type(parts.schema)(out_fields))
    return (
        numbered.join(F.broadcast(offs), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_pos"))
        .drop("_pid", "_pos", "_off")
    )
