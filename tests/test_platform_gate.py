"""platform_release_gate reconciliation contract: the apex row's six
verdicts must equal the standalone family gates row-for-row, the
conjunction must be the three-valued AND, and the deny / no-decision
branches are exercised on crafted multi-table fixtures (fixture
documents + embeddings with crafted events, and the all-empty
platform).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from bigdata_2025_1_spark.io import TABLES, load
from bigdata_2025_1_spark.registry import all_queries

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow


def _kind(i: int) -> str:
    m = int(hashlib.md5(f"chg:{i}".encode()).hexdigest()[:12], 16) % 25
    return "U" if m == 0 else ("D" if m == 12 else "")


def _delay(i: int) -> int:
    m = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % 20
    return 2 if m == 0 else (1 if m == 10 else 0)


def test_platform_gate_reconciles_with_family_gates(spark, sf_dir):
    qs = all_queries()
    row = qs["platform_release_gate"](spark, sf_dir).collect()[0]

    corpus = qs["corpus_release_gate"](spark, sf_dir).collect()[0]
    assert (row.n_docs, row.corpus_ok) == (corpus.n_docs, corpus.release_ok)
    ddp = qs["dedup_release_gate"](spark, sf_dir).collect()[0]
    assert row.dedup_ok == ddp.dedup_ok
    layout = qs["layout_maintenance_plan"](spark, sf_dir).collect()[0]
    assert row.n_input_files == layout.n_input_files
    # NOT (a OR b) under SQL three-valued logic: any TRUE need denies,
    # else any NULL is unknown, else the table is healthy
    if layout.needs_compaction or layout.needs_recluster:
        assert row.layout_ok is False
    elif layout.needs_compaction is None or layout.needs_recluster is None:
        assert row.layout_ok is None
    else:
        assert row.layout_ok is True
    ann = qs["ann_release_gate"](spark, sf_dir).collect()[0]
    assert (row.n_vecs, row.ann_ok) == (ann.n_vecs, ann.ann_ok)
    ingest = qs["ingest_release_gate"](spark, sf_dir).collect()[0]
    assert (row.n_events_total, row.ingest_ok) == (
        ingest.n_events_total,
        ingest.ingest_ok,
    )
    cdc = qs["cdc_release_gate"](spark, sf_dir).collect()[0]
    assert row.cdc_ok == cdc.cdc_ok

    oks = [
        row.corpus_ok,
        row.dedup_ok,
        row.layout_ok,
        row.ann_ok,
        row.ingest_ok,
        row.cdc_ok,
    ]
    if any(v is False for v in oks):
        assert row.platform_ok is False
    elif any(v is None for v in oks):
        assert row.platform_ok is None
    else:
        assert row.platform_ok is True
    spark.catalog.clearCache()


def test_platform_gate_denies_on_one_broken_family(spark, sf_dir, tmp_path):
    """Fixture documents + embeddings (their gates keep their fixture
    verdicts) with a crafted retraction-flood events table: cdc_ok
    False -> platform_ok False — one broken family can never hide
    behind five healthy ones."""
    for t in TABLES:
        if t == "events":
            continue
        load(spark, sf_dir, t).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"{t}.parquet")
        )
    d_ids = [i for i in range(3000) if _kind(i) == "D"][:30]
    live = [i for i in range(100) if _kind(i) == "" and _delay(i) == 0][:5]
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 10.0, "{}")
        for i in d_ids + live
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    qs = all_queries()
    row = qs["platform_release_gate"](spark, str(tmp_path)).collect()[0]
    assert row.cdc_ok is False  # the flood denies the cdc family
    assert row.platform_ok is False
    # the document/vector families keep their fixture verdicts
    fix = qs["platform_release_gate"](spark, sf_dir).collect()[0]
    assert row.corpus_ok == fix.corpus_ok
    assert row.dedup_ok == fix.dedup_ok
    assert row.ann_ok == fix.ann_ok
    spark.catalog.clearCache()


def test_platform_gate_no_decision_on_empty_platform(spark, tmp_path):
    """All-empty tables: every family is a no-decision -> platform_ok
    NULL (an empty platform must not release, and must not deny)."""
    sf0 = "/root/testdata/sf0.001"
    for t in TABLES:
        load(spark, sf0, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{t}.parquet"))
    row = all_queries()["platform_release_gate"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row.n_docs == 0 and row.n_vecs == 0 and row.n_events_total == 0
    assert row.corpus_ok is None and row.dedup_ok is None
    assert row.layout_ok is None and row.ann_ok is None
    assert row.ingest_ok is None and row.cdc_ok is None
    assert row.platform_ok is None
    spark.catalog.clearCache()
