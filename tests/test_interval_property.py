"""Property-based checks for the interval-union sweep and the
equi-depth bucketing algebra: the DuckDB oracle proves engine parity on
the fixture; these prove the ALGORITHMS equal their brute-force
definitions on adversarial small inputs (hypothesis-generated)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow

INTERVALS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 20)),  # (start, length)
    min_size=1,
    max_size=12,
)


def _sweep_coverage(spark, ivs):
    """The query's exact window algebra on a crafted frame."""
    rows = [(1, s, s + ln) for s, ln in ivs]
    df = spark.createDataFrame(rows, "user_id int, s long, e long")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "new_island",
        F.when(
            F.max("e").over(w_prev).isNull() | (F.col("s") > F.max("e").over(w_prev)), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    out = (
        islands.groupBy("user_id", "island")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .agg(F.sum(F.col("me") - F.col("ms")).alias("cov"))
        .collect()
    )
    return out[0].cov


@settings(max_examples=12, deadline=None)
@given(INTERVALS)
def test_interval_union_equals_point_count(spark, ivs):
    # brute force: coverage = number of integer unit cells [t, t+1)
    # inside any interval
    covered = set()
    for s, ln in ivs:
        covered.update(range(s, s + ln))
    assert _sweep_coverage(spark, ivs) == len(covered)


VALUES = st.lists(st.integers(0, 30), min_size=1, max_size=40)


@settings(max_examples=12, deadline=None)
@given(VALUES)
def test_equi_depth_bucket_invariants(spark, vals):
    """bucket = floor(cum_before * 10 / n) over distinct values: counts
    sum to n, buckets are monotone in value, ids stay in [0, 10), and
    ties always share a bucket (by construction — one row per value)."""
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    agg = df.groupBy("v").agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = agg.withColumn("cum", F.coalesce(F.sum("c").over(w), F.lit(0)))
    total = len(vals)
    b = cum.select(
        "v", "c", F.expr(f"CAST(cum * 10 div {total} AS INT)").alias("bucket")
    ).collect()
    assert sum(r.c for r in b) == total
    assert all(0 <= r.bucket < 10 for r in b)
    by_v = sorted(b, key=lambda r: r.v)
    assert all(a.bucket <= z.bucket for a, z in zip(by_v, by_v[1:]))
    # expected bucket from the brute-force rank definition
    sorted_vals = sorted(vals)
    for r in by_v:
        first_rank = sorted_vals.index(r.v)  # rows strictly below r.v
        assert r.bucket == first_rank * 10 // total
