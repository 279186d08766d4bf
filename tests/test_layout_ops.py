"""Layout-maintenance family: hand-computed bin-packing and
clustering-depth arithmetic on crafted tables (the scalar-reference
convention), plus the decision row's reconciliation against its
standalone legs and both decision branches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_2025_1_spark.registry import all_queries


def _write_events(spark, tmp_path, day_sizes: dict[int, int]) -> str:
    """One synthetic ingest batch per day offset: day_sizes[k] rows on
    2024-01-(k+1)."""
    rows = []
    eid = 0
    for day, n in sorted(day_sizes.items()):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=3)
        for _ in range(n):
            rows.append((eid, ts, eid % 7, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _write_orders(spark, tmp_path, dates: list[dt.datetime]) -> str:
    """orders with o_orderkey = position; o_orderdate = dates[key]."""
    df = spark.createDataFrame(
        [(k, k % 97, "O", 100.0, d, "1-URGENT") for k, d in enumerate(dates)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def test_compaction_bins_hand_computed(spark, tmp_path):
    """Batches [400, 400, 400, 400, 600]: the 600 keeps (>=500); the
    four 400s pack next-fit at exact 1000-row offsets — exclusive
    cumsums 0/400/800/1200 -> bins 0/0/0/1, fills 1200 and 400."""
    d = _write_events(
        spark, tmp_path, {0: 400, 1: 400, 2: 400, 3: 400, 4: 600}
    )
    rows = {
        r.batch_date.day: r
        for r in all_queries()["compaction_plan_bins"](spark, d).collect()
    }
    assert [rows[i].action for i in (1, 2, 3, 4, 5)] == [
        "compact", "compact", "compact", "compact", "keep",
    ]
    assert [rows[i].out_bin for i in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert rows[5].out_bin is None and rows[5].bin_rows is None
    assert [rows[i].bin_rows for i in (1, 2, 3, 4)] == [1200, 1200, 1200, 400]
    spark.catalog.clearCache()


def test_clustering_depth_on_clustered_vs_scattered(spark, tmp_path):
    """Clustered arrival (date monotone in key): both layouts score
    depth exactly 1.0 -> no recluster signal. Scattered arrival (date =
    key*7919 mod 160 days): arrival files all span ~the full domain
    while sorted_date files stay disjoint at depth 1.0."""
    base = dt.datetime(1995, 1, 1)
    q = all_queries()["clustering_depth_compare"]

    clustered = _write_orders(
        spark,
        tmp_path / "clus",
        [base + dt.timedelta(days=k // 10) for k in range(1600)],
    )
    got = {r.layout: r for r in q(spark, clustered).collect()}
    assert got["arrival"].n_files == 16
    assert got["arrival"].avg_overlap_depth == 1.0
    assert got["sorted_date"].avg_overlap_depth == 1.0

    scattered = _write_orders(
        spark,
        tmp_path / "scat",
        [base + dt.timedelta(days=(k * 7919) % 160) for k in range(1600)],
    )
    got = {r.layout: r for r in q(spark, scattered).collect()}
    assert got["sorted_date"].avg_overlap_depth == 1.0
    # d = 79k mod 160 (gcd 1): any 100 distinct residues of 0..159 have
    # min <= 60 and max >= 99, so every arrival file's range contains
    # [60, 99] and ALL pairs overlap -> depth exactly n_files
    assert got["arrival"].avg_overlap_depth == 16.0
    # each sorted bucket covers its full 10-day slice -> coverage 160/160
    assert got["sorted_date"].expected_probe_files == 1.0
    assert got["arrival"].expected_probe_files > 10.0
    spark.catalog.clearCache()


def test_plan_reconciles_with_standalone_legs(spark, sf_dir):
    qs = all_queries()
    row = qs["layout_maintenance_plan"](spark, sf_dir).collect()[0]

    plan = qs["compaction_plan_bins"](spark, sf_dir)
    agg = plan.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("action") == "compact", 1).otherwise(0)).alias(
            "small"
        ),
        (
            F.countDistinct("out_bin")
            + F.sum(F.when(F.col("action") == "keep", 1).otherwise(0))
        ).alias("planned"),
    ).collect()[0]
    assert row.n_input_files == agg.n
    assert row.n_small_files == agg.small
    assert row.n_planned_files == agg.planned
    assert row.small_file_frac == (agg.small / agg.n if agg.n else None)

    depth = {
        r.layout: r.avg_overlap_depth
        for r in qs["clustering_depth_compare"](spark, sf_dir).collect()
    }
    assert row.arrival_depth == depth["arrival"]
    assert row.sorted_depth == depth["sorted_date"]
    assert row.depth_ratio == depth["arrival"] / depth["sorted_date"]

    # fixture at sf0.001: every daily batch is tiny -> compaction pays;
    # arrival order is uncorrelated with o_orderdate -> recluster pays
    assert row.needs_compaction is True
    assert row.needs_recluster is True
    spark.catalog.clearCache()


def test_decision_branches_on_healthy_layout(spark, tmp_path):
    """A table with big batches and date-monotone arrival needs
    neither maintenance action."""
    d = str(tmp_path)
    _write_events(spark, tmp_path, {0: 900, 1: 900, 2: 1100})
    base = dt.datetime(1995, 1, 1)
    _write_orders(
        spark, tmp_path, [base + dt.timedelta(days=k // 10) for k in range(1600)]
    )
    row = all_queries()["layout_maintenance_plan"](spark, d).collect()[0]
    assert row.n_input_files == 3 and row.n_small_files == 0
    assert row.n_planned_files == 3
    assert row.small_file_frac == 0.0
    assert row.depth_ratio == 1.0
    assert row.needs_compaction is False
    assert row.needs_recluster is False
    spark.catalog.clearCache()


def test_compaction_online_form_matches_batch_query(spark, sf_dir):
    """The online twin replays the fixture's ingest history to the
    batch plan row-for-row (first four columns; bin fills via the
    final-state readout), and is chunking-invariant."""
    import random

    from bigdata_2025_1_spark.operators.layout_ops import (
        compaction_bin_fills,
        compaction_state_zero,
        compaction_update,
    )

    plan = all_queries()["compaction_plan_bins"](spark, sf_dir).collect()
    expected = [(r.batch_date, r.n_rows, r.action, r.out_bin) for r in plan]
    fills = {
        r.out_bin: r.bin_rows for r in plan if r.action == "compact"
    }
    arrivals = [(r.batch_date, r.n_rows) for r in plan]  # already date-ordered

    state, out = compaction_update(compaction_state_zero(), arrivals)
    assert out == expected
    assert compaction_bin_fills(state) == fills

    rng = random.Random(31)
    for _trial in range(4):
        st = compaction_state_zero()
        got = []
        i = 0
        while i < len(arrivals):
            step = rng.randint(1, 7)
            st, part = compaction_update(st, arrivals[i : i + step])
            got.extend(part)
            i += step
        assert got == expected
        assert compaction_bin_fills(st) == fills
    spark.catalog.clearCache()


def test_retention_plan_hand_computed(spark, tmp_path):
    """Batches on day offsets 0/10/14/20 with the newest at 20: ages
    20/10/6/0 -> expire/retain/retain/retain at the 14-day horizon, and
    the boundary batch (age exactly 14) expires."""
    d = _write_events(spark, tmp_path, {0: 10, 6: 20, 10: 30, 20: 40})
    rows = {
        r.age_days: r
        for r in all_queries()["retention_expiry_plan"](spark, d).collect()
    }
    assert sorted(rows) == [0, 10, 14, 20]
    assert rows[20].action == "expire" and rows[14].action == "expire"
    assert rows[10].action == "retain" and rows[0].action == "retain"
    assert rows[0].n_rows == 40 and rows[20].n_rows == 10
    spark.catalog.clearCache()
