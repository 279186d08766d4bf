"""Z-order layout: writing files clustered by the Morton value of
(l_partkey, l_suppkey) must narrow BOTH columns' per-file min/max
extents (measured from real parquet footers) — the property min/max
pruning needs to skip files for predicates on EITHER dimension. A
single-column sort narrows only its own column; unsorted narrows
neither."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.layout import scale_to_bits, zvalue
from bigdata_2025_1_spark.io import load

N_FILES = 8


def _col_index(md, name: str) -> int:
    rg = md.row_group(0)
    for i in range(rg.num_columns):
        if rg.column(i).path_in_schema == name:
            return i
    raise KeyError(name)


def _extents(path: str, col: str) -> float:
    exts = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = _col_index(md, col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        exts.append(mx - mn)
    return sum(exts) / len(exts)


def test_zorder_narrows_both_dimensions(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    # z-order on equal-width BUCKETS, not raw values: partkey spans ~8
    # bits and suppkey ~4, and interleaving raw asymmetric widths lets
    # the wide column own every significant bit (degenerates to a
    # single-dim sort — the first run of this test proved it).
    amax, bmax = li.agg(
        F.max("l_partkey"), F.max("l_suppkey")
    ).first()

    unsorted_dir = str(tmp_path / "plain")
    li.repartition(N_FILES).write.mode("overwrite").parquet(unsorted_dir)

    linear_dir = str(tmp_path / "by_part")
    li.repartitionByRange(N_FILES, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(linear_dir)

    z_dir = str(tmp_path / "zorder")
    zli = li.withColumn(
        "z",
        zvalue(
            scale_to_bits(F.col("l_partkey"), int(amax), 8),
            scale_to_bits(F.col("l_suppkey"), int(bmax), 8),
            bits=8,
        ),
    )
    zli.repartitionByRange(N_FILES, "z").sortWithinPartitions("z").drop(
        "z"
    ).write.mode("overwrite").parquet(z_dir)

    # single-dim sort: near-perfect on its own column, useless on the other
    assert _extents(linear_dir, "l_partkey") < 0.3 * _extents(unsorted_dir, "l_partkey")
    assert _extents(linear_dir, "l_suppkey") > 0.7 * _extents(unsorted_dir, "l_suppkey")
    # z-order: materially narrows BOTH columns at once
    assert _extents(z_dir, "l_partkey") < 0.6 * _extents(unsorted_dir, "l_partkey")
    assert _extents(z_dir, "l_suppkey") < 0.6 * _extents(unsorted_dir, "l_suppkey")
