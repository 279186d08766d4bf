"""Property tests for functions/ranks.py: with_global_rank must agree
with a driver-side sorted enumeration for ANY key distribution — heavy
ties, all-equal keys, singletons, sizes straddling partition counts —
and for the prefix-sum form, with the running total of the same order.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_2025_1_spark.functions.ranks import with_global_rank

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # key: few values => many ties
        st.integers(min_value=0, max_value=1000),  # value for prefix sums
    ),
    min_size=0,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=ROWS, nparts=st.integers(min_value=1, max_value=7))
def test_rank_and_prefix_match_sorted_enumeration(spark, rows, nparts):
    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k INT, uid INT, v INT")
    got = {
        r.uid: (r.rn, r.cv)
        for r in with_global_rank(
            df, ["k", "uid"], "rn", num_parts=nparts, prefix_of="v", prefix_col="cv"
        ).collect()
    }
    expected = {}
    run = 0
    for rank, (k, uid, v) in enumerate(sorted(data), start=1):
        run += v
        expected[uid] = (rank, run)
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.data_too_large,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    st.lists(
        st.tuples(st.integers(-3, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=50,
    ),
    st.integers(0, 100),
)
def test_rank_cut_helpers_match_sequential(spark, rows, pct):
    """cum_counts_over_values + boundary_rank_keep == the sequential
    'keep the globally lowest-ranked K rows ordered by (value, id)' —
    for ANY tie distribution and ANY cut percentage. This is the exact
    machinery behind the corpus NLL gate and the threshold sweep."""
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.functions.ranks import (
        boundary_rank_keep,
        cum_counts_over_values,
    )

    data = [(i, v) for i, (v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long")
    n = len(data)
    kcut = pct * n // 100

    vals = df.groupBy("v").agg(F.count("*").alias("vc"))
    cum = cum_counts_over_values(vals, "v")
    joined = df.join(cum, "v").withColumn("kcut", F.lit(kcut))
    kept_full = joined.filter(F.col("cum_before") + F.col("vc") <= F.col("kcut"))
    boundary = joined.filter(
        (F.col("cum_before") < F.col("kcut"))
        & (F.col("cum_before") + F.col("vc") > F.col("kcut"))
    )
    kept_part = boundary_rank_keep(boundary, "id", ["v"])
    got = sorted(
        r.id for r in kept_full.select("id").union(kept_part.select("id")).collect()
    )

    expect = sorted(
        i for i, _ in sorted(data, key=lambda t: (t[1], t[0]))[:kcut]
    )
    assert got == expect, (kcut, got, expect)


def test_global_rank_is_permutation_on_join_input(spark):
    """Regression pin for the double-evaluation boundary mismatch: over
    a theta-join input (whose un-persisted range exchange used to sample
    DIFFERENT boundaries for the size table vs the numbering kernel,
    yielding missing/duplicated ranks), with_global_rank must assign
    every rank in 1..n exactly once — on every invocation."""
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.functions.ranks import with_global_rank

    base = spark.range(0, 120).select(
        F.col("id").alias("k"), (F.col("id") * 37 % 101).alias("v")
    )
    a = base.select(F.col("k").alias("ka"), F.col("v").alias("va"))
    b = base.select(F.col("k").alias("kb"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, F.col("ka") < F.col("kb"))
        .select(
            (F.col("vb") - F.col("va")).alias("num"),
            (F.col("kb") - F.col("ka")).alias("den"),
        )
        .withColumn("slope_d", F.col("num").cast("double") / F.col("den"))
    )
    n = pairs.count()
    for _ in range(3):
        ranked = with_global_rank(pairs, ["slope_d", "num", "den"], rank_col="rn")
        got = sorted(r.rn for r in ranked.select("rn").collect())
        assert got == list(range(1, n + 1))
        spark.catalog.clearCache()
