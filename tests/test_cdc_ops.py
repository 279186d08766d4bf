"""CDC corrections/retractions family (round-13 theme): crafted
scalar references hand-walked against the md5 correction model,
reconciliation pins (delta log replays to the rollup, as-of equals a
prefix replay, net identity, audit/latency totals agree), the gate's
deny / vacuous / no-decision branches, the online chunking-invariance
property, and the REAL 3-trigger foreachBatch maintenance loop.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import time

from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.cdc_ops import (
    LAG_SPAN,
    RECON_WINDOW_DAYS,
    cdc_merge,
    cdc_readout,
    cdc_state_zero,
    cdc_step,
    cdc_update,
)
from bigdata_2025_1_spark.registry import all_queries


def _write_events(spark, d, rows) -> str:
    spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


# Independent plain-Python model walk for the crafted references
# (reimplemented here, NOT imported from the module under test).
def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _delay(i: int) -> int:
    m = _h(str(i)) % 20
    return 2 if m == 0 else (1 if m == 10 else 0)


def _kind(i: int) -> str:
    m = _h(f"chg:{i}") % 25
    return "U" if m == 0 else ("D" if m == 12 else "")


def _lag(i: int) -> int:
    return 1 + _h(f"lag:{i}") % 3


def _rev(i: int) -> int:
    return _h(f"rev:{i}") % 2001 - 1000


# Crafted corpus: md5 residues give (asserted as a premise below)
#   id 0   live, on-time
#   id 22  CORRECTED, lag 3, delta -759 cents, on-time
#   id 28  RETRACTED, lag 2, on-time
#   id 5   live, ONE DAY LATE
#   id 38  RETRACTED, lag 2, ONE DAY LATE (late + retracted corner)
#   id 1   live, on-time
#   id 146 CORRECTED, lag 1, delta +421 cents, on-time
_D = {k: dt.date(2024, 3, k) for k in range(1, 6)}
_CRAFT = [
    (0, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 10.00),
    (22, dt.datetime(2024, 3, 1, 11, 0), 2, "view", 2.50),
    (28, dt.datetime(2024, 3, 1, 12, 0), 1, "click", 7.25),
    (5, dt.datetime(2024, 3, 2, 8, 0), 3, "view", 4.00),
    (38, dt.datetime(2024, 3, 2, 9, 30), 2, "view", 6.00),
    (1, dt.datetime(2024, 3, 3, 10, 0), 3, "click", 5.00),
    (146, dt.datetime(2024, 3, 3, 11, 0), 1, "view", 3.00),
]


def test_crafted_premise_model():
    assert [_delay(i) for i in (0, 22, 28, 5, 38, 1, 146)] == [
        0, 0, 0, 1, 1, 0, 0,
    ]
    assert [_kind(i) for i in (0, 22, 28, 5, 38, 1, 146)] == [
        "", "U", "D", "", "D", "", "U",
    ]
    assert (_lag(22), _lag(28), _lag(38), _lag(146)) == (3, 2, 2, 1)
    assert (_rev(22), _rev(146)) == (-759, 421)


def test_corrected_rollup_crafted_scalar_reference(spark, tmp_path):
    """Hand walk: (03-01, view) = ids 0 + 22 (corrected -759) -> gross
    2, net 2, 1250-759=491 cents, last touched by 22's U on 03-04;
    (03-01, click) = id 28 fully retracted -> net 0, key_deleted;
    (03-02, view) = late ids 5 + 38 (retracted on 03-05) -> net 1, 400;
    etc."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r)
        for r in all_queries()["cdc_corrected_rollup"](spark, sf).collect()
    ]
    assert got == [
        (_D[1], "click", 1, 0, 1, 0, 0, _D[3], True),
        (_D[1], "view", 2, 1, 0, 2, 491, _D[4], False),
        (_D[2], "view", 2, 0, 1, 1, 400, _D[5], False),
        (_D[3], "click", 1, 0, 0, 1, 500, _D[3], False),
        (_D[3], "view", 1, 1, 0, 1, 721, _D[4], False),
    ]
    spark.catalog.clearCache()


def test_delta_log_crafted_scalar_reference(spark, tmp_path):
    """The I/U/D write-log of the same crafted stream, hand-walked:
    the (03-01, click) key is inserted on 03-01 and DELETED by 28's
    retraction on 03-03 (running count hits 0); 22's correction
    re-opens (03-01, view) as an update on 03-04 with d_events 0."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r) for r in all_queries()["cdc_delta_log"](spark, sf).collect()
    ]
    assert got == [
        (_D[1], _D[1], "click", "insert", 1, 0, 0, 1, 725, 1, 725),
        (_D[1], _D[1], "view", "insert", 2, 0, 0, 2, 1250, 2, 1250),
        (_D[3], _D[1], "click", "delete", 0, 0, 1, -1, -725, 0, 0),
        (_D[3], _D[2], "view", "insert", 2, 0, 0, 2, 1000, 2, 1000),
        (_D[3], _D[3], "click", "insert", 1, 0, 0, 1, 500, 1, 500),
        (_D[3], _D[3], "view", "insert", 1, 0, 0, 1, 300, 1, 300),
        (_D[4], _D[1], "view", "update", 0, 1, 0, 0, -759, 2, 491),
        (_D[4], _D[3], "view", "update", 0, 1, 0, 0, 421, 1, 721),
        (_D[5], _D[2], "view", "update", 0, 0, 1, -1, -600, 1, 400),
    ]
    spark.catalog.clearCache()


def test_version_census_crafted_scalar_reference(spark, tmp_path):
    """live = ids 0/5/1 (1900 cents in and out); corrected = 22/146
    (550 -> 212 after -759/+421); retracted = 28/38 (1325 -> 0); each
    changed event's chain holds 2 CDC records."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r)
        for r in all_queries()["event_version_census"](spark, sf).collect()
    ]
    assert got == [
        ("corrected", 2, 4, 550, 212),
        ("live", 3, 3, 1900, 1900),
        ("retracted", 2, 4, 1325, 0),
    ]
    spark.catalog.clearCache()


def test_latency_profile_crafted_scalar_reference(spark, tmp_path):
    """U: 22 (lag 3, |delta| 759) + 146 (lag 1, 421) -> mean lag 2.0,
    total 1180; D: 28 + 38 (both lag 2, 725 + 600 cents)."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r)
        for r in all_queries()["correction_latency_profile"](
            spark, sf
        ).collect()
    ]
    assert got == [
        ("D", 2, 0, 2, 0, 2, 2.0, 1325, 662.5),
        ("U", 2, 1, 0, 1, 3, 2.0, 1180, 590.0),
    ]
    spark.catalog.clearCache()


def test_window_audit_crafted_scalar_reference(spark, tmp_path):
    """W=1 misses 22/28/38 (3 changes, 2084 cents, 3 keys); W=2 misses
    only 22 (759 cents, 1 key); W=3 = the model's max lag is lossless."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r)
        for r in all_queries()["reconciliation_window_audit"](
            spark, sf
        ).collect()
    ]
    assert got == [
        (1, 4, 3, 0.75, 2084, 3),
        (2, 4, 1, 0.25, 759, 1),
        (3, 4, 0, 0.0, 0, 0),
    ]
    spark.catalog.clearCache()


def test_stale_audit_crafted_scalar_reference(spark, tmp_path):
    """Deployed W=2 drops only 22's lag-3 correction: the (03-01,view)
    key is stale by 759 cents with no count gap; click keys exact."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r)
        for r in all_queries()["stale_state_audit"](spark, sf).collect()
    ]
    assert got == [
        ("click", 2, 0, 0, 0),
        ("view", 3, 1, 759, 0),
    ]
    spark.catalog.clearCache()


def test_net_effect_crafted_and_identity(spark, tmp_path, sf_dir):
    """Crafted: view gross 2550, corrections -338, retractions 600 ->
    net 1612; click 1225 - 725 -> 500. And on the fixture, the identity
    net = gross + corrections - retractions holds per type."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    q = all_queries()["cdc_net_effect_by_type"]
    got = [tuple(r) for r in q(spark, sf).collect()]
    assert got == [
        ("click", 2, 0, 1, 1225, 0, 725, 500, 0.0, 0.5),
        ("view", 5, 2, 1, 2550, -338, 600, 1612, 0.4, 0.2),
    ]
    for r in q(spark, sf_dir).collect():
        assert (
            r.net_cents
            == r.gross_cents + r.correction_delta_cents - r.retracted_cents
        )
    spark.catalog.clearCache()


def test_delta_log_replays_to_rollup(spark, sf_dir):
    """Each key's LAST log row equals the standing corrected rollup,
    and keys whose log ends in 'delete' are exactly its key_deleted
    rows — the log IS a valid CDC stream for the table."""
    qs = all_queries()
    log = qs["cdc_delta_log"](spark, sf_dir).collect()
    last: dict = {}
    for r in log:  # rows are change_date-ordered
        last[(r.event_date, r.event_type)] = r
    roll = {
        (r.event_date, r.event_type): r
        for r in qs["cdc_corrected_rollup"](spark, sf_dir).collect()
    }
    assert set(last) == set(roll)
    for k, r in last.items():
        assert (r.n_events_after, r.value_cents_after) == (
            roll[k].n_events,
            roll[k].value_cents,
        ), k
        assert (r.merge_op == "delete") == roll[k].key_deleted, k
    spark.catalog.clearCache()


def test_as_of_equals_delta_log_prefix_replay(spark, sf_dir):
    """VERSION AS OF == folding the write-log's prefix up to the
    cutoff — the snapshot really is a log prefix."""
    qs = all_queries()
    snap = qs["corrected_rollup_as_of"](spark, sf_dir).collect()
    assert snap, "fixture snapshot must be non-empty"
    as_of = snap[0].as_of_batch
    replay: dict = {}
    for r in qs["cdc_delta_log"](spark, sf_dir).collect():
        if r.change_date <= as_of:
            key = (r.event_date, r.event_type)
            agg = replay.setdefault(key, [0, 0, 0, 0, 0])
            agg[0] += r.n_inserts
            agg[1] += r.n_updates
            agg[2] += r.n_deletes
            agg[3] += r.n_events_delta
            agg[4] += r.value_cents_delta
    got = {
        (r.event_date, r.event_type): (
            r.n_events_gross,
            r.n_corrected,
            r.n_retracted,
            r.n_events,
            r.value_cents,
        )
        for r in snap
    }
    assert got == {k: tuple(v) for k, v in replay.items()}
    spark.catalog.clearCache()


def test_audit_latency_and_feed_reconcile(spark, sf_dir):
    """Cross-query invariants on the fixture: the window audit's W=max
    row is lossless; its totals match the latency profile; the feed
    profile's insert total is the event count and its net cents equals
    the rollup's total."""
    qs = all_queries()
    audit = {
        r.window_days: r
        for r in qs["reconciliation_window_audit"](spark, sf_dir).collect()
    }
    assert sorted(audit) == list(range(1, LAG_SPAN + 1))
    assert audit[LAG_SPAN].n_missed == 0
    assert audit[LAG_SPAN].n_keys_stale == 0
    lat = qs["correction_latency_profile"](spark, sf_dir).collect()
    n_changes = sum(r.n_changes for r in lat)
    assert audit[1].n_changes_total == n_changes
    # W=1 misses exactly the lag-2 and lag-3 changes
    assert audit[1].n_missed == sum(r.n_lag2 + r.n_lag3 for r in lat)
    assert audit[RECON_WINDOW_DAYS].n_missed == sum(r.n_lag3 for r in lat)
    feed = qs["cdc_feed_daily_profile"](spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.n_inserts for r in feed) == n_events
    assert sum(r.n_updates + r.n_deletes for r in feed) == n_changes
    roll = qs["cdc_corrected_rollup"](spark, sf_dir).agg(
        F.sum("value_cents").alias("v"), F.sum("n_events").alias("n")
    ).collect()[0]
    assert sum(r.d_cents_net for r in feed) == roll.v
    assert sum(r.d_events_net for r in feed) == roll.n
    spark.catalog.clearCache()


# --- the gate ----------------------------------------------------------------


def test_cdc_gate_reconciles_with_standalone_queries(spark, sf_dir):
    qs = all_queries()
    row = qs["cdc_release_gate"](spark, sf_dir).collect()[0]
    net = qs["cdc_net_effect_by_type"](spark, sf_dir).agg(
        F.sum("n_events_gross").alias("g"),
        F.sum("n_retracted").alias("d"),
        F.sum("gross_cents").alias("gc"),
        F.sum("correction_delta_cents").alias("cd"),
    ).collect()[0]
    assert row.n_events_gross == net.g
    assert row.retraction_rate_total == net.d / net.g
    assert row.correction_impact == abs(net.cd) / net.gc
    win = {
        r.window_days: r
        for r in qs["reconciliation_window_audit"](spark, sf_dir).collect()
    }[RECON_WINDOW_DAYS]
    assert row.n_changes_total == win.n_changes_total
    assert row.frac_missed_at_deployed == win.frac_missed
    feed = qs["cdc_feed_daily_profile"](spark, sf_dir).collect()
    assert row.n_spike_days == sum(1 for r in feed if r.is_retraction_spike)
    assert row.cdc_ok == (
        row.ok_window
        and row.ok_retractions
        and row.ok_corrections
        and row.ok_stability
    )
    # the fixture passes: the deployed window misses ~1/3 of changes
    assert row.cdc_ok is True and 0.2 < row.frac_missed_at_deployed < 0.45
    spark.catalog.clearCache()


def test_cdc_gate_deny_branch_retraction_flood(spark, tmp_path):
    """A crafted stream where most events are retracted (pick 30 ids
    with kind 'D' plus 5 live) denies on the retraction-rate leg, and
    with >= 20 records on a spike day the stability leg can fire too."""
    d_ids = [i for i in range(3000) if _kind(i) == "D"][:30]
    live_ids = [i for i in range(100) if _kind(i) == "" and _delay(i) == 0][:5]
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 10.0)
        for i in d_ids + live_ids
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["cdc_release_gate"](spark, sf).collect()[0]
    assert row.n_events_gross == 35
    assert row.retraction_rate_total == 30 / 35
    assert row.ok_retractions is False
    assert row.cdc_ok is False
    spark.catalog.clearCache()


def test_cdc_gate_deny_branch_correction_drift(spark, tmp_path):
    """Corrected events with tiny original values make the correction
    drift dominate gross cents -> ok_corrections False. Premise: the
    chosen ids' md5 revision deltas sum far from zero."""
    u_ids = [i for i in range(3000) if _kind(i) == "U"][:12]
    drift = sum(_rev(i) for i in u_ids)
    gross = len(u_ids)  # 1 cent each
    assert abs(drift) / gross > 0.05  # the deny premise
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 0.01) for i in u_ids
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["cdc_release_gate"](spark, sf).collect()[0]
    assert row.correction_impact == abs(drift) / gross
    assert row.ok_corrections is False
    assert row.cdc_ok is False
    spark.catalog.clearCache()


def test_cdc_gate_vacuous_pass_no_changes(spark, tmp_path):
    """A live stream with ZERO changes: the window leg passes vacuously
    (frac NULL), corrections pass vacuously (impact NULL with zero
    corrections), and the gate releases."""
    live_ids = [i for i in range(200) if _kind(i) == ""][:8]
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 5.0) for i in live_ids
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["cdc_release_gate"](spark, sf).collect()[0]
    assert row.n_changes_total == 0
    assert row.frac_missed_at_deployed is None and row.ok_window is True
    assert row.correction_impact == 0.0 and row.ok_corrections is True
    assert row.retraction_rate_total == 0.0 and row.ok_retractions is True
    assert row.cdc_ok is True
    spark.catalog.clearCache()


def test_cdc_gate_no_decision_empty(spark, tmp_path):
    """An EMPTY events table is a no-decision, not a pass."""
    sf = _write_events(spark, tmp_path, [])
    row = all_queries()["cdc_release_gate"](spark, sf).collect()[0]
    assert row.n_events_gross == 0
    assert row.ok_window is None and row.ok_retractions is None
    assert row.ok_corrections is None and row.ok_stability is None
    assert row.cdc_ok is None
    spark.catalog.clearCache()


def test_cdc_gate_no_decision_broken_cents(spark, tmp_path):
    """Corrections EXIST but gross cents is non-positive (every value
    negative — a broken cents pipeline, not an idle one): the impact
    leg is a NULL no-decision, never a silent pass (the
    ann_release_gate hardening applied here from day one)."""
    u_id = [i for i in range(300) if _kind(i) == "U"][0]
    live = [i for i in range(100) if _kind(i) == ""][0]
    rows = [
        (u_id, dt.datetime(2024, 3, 1, 9, 0), 1, "view", -5.0),
        (live, dt.datetime(2024, 3, 1, 10, 0), 1, "view", -2.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["cdc_release_gate"](spark, sf).collect()[0]
    assert row.n_events_gross == 2 and row.correction_impact is None
    assert row.ok_corrections is None
    spark.catalog.clearCache()


def test_feed_spike_flag_crafted(spark, tmp_path):
    """Support guard and pure-insert days: a 12-delete change day is
    all deletes by share but sits under the {SPIKE_MIN_CHANGES}-change
    support floor, and a zero-change day never divides by zero (the
    guarded CASE both engines share) — neither flags."""
    d_ids = [i for i in range(3000) if _kind(i) == "D" and _delay(i) == 0]
    live = [i for i in range(3000) if _kind(i) == "" and _delay(i) == 0]
    lag2 = [i for i in d_ids if _lag(i) == 2][:12]
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 5.0)
        for i in live[:30]
    ] + [
        (i, dt.datetime(2024, 3, 2, 9, 0), 1, "view", 5.0)
        for i in live[30:50]
    ] + [
        (i, dt.datetime(2024, 3, 2, 10, 0), 1, "view", 5.0) for i in lag2
    ]
    sf = _write_events(spark, tmp_path, rows)
    feed = {
        r.change_date: r
        for r in all_queries()["cdc_feed_daily_profile"](spark, sf).collect()
    }
    # deliveries: 03-01 = 30 I; 03-02 = 32 I; 03-04 = 12 D
    d4 = feed[dt.date(2024, 3, 4)]
    assert d4.n_deletes == 12 and d4.retraction_share == 1.0
    assert d4.is_retraction_spike is False  # n_changes 12 < support 20
    d2 = feed[dt.date(2024, 3, 2)]
    assert d2.n_changes == 0 and d2.retraction_share is None
    assert d2.is_retraction_spike is False
    spark.catalog.clearCache()


def test_feed_spike_fires_with_support(spark, tmp_path):
    """A cancellation storm DOES flag: 24 retractions delivered on one
    change day against a correction background that keeps the global
    delete share at ~0.5 — the day's share (1.0) clears 1.5x global."""
    d_ids = [
        i
        for i in range(6000)
        if _kind(i) == "D" and _delay(i) == 0 and _lag(i) == 1
    ][:24]
    u_ids = [
        i
        for i in range(6000)
        if _kind(i) == "U" and _delay(i) == 0 and _lag(i) >= 2
    ][:24]
    live = [i for i in range(3000) if _kind(i) == "" and _delay(i) == 0][:60]
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 5.0)
        for i in live + d_ids + u_ids
    ]
    sf = _write_events(spark, tmp_path, rows)
    feed = {
        r.change_date: r
        for r in all_queries()["cdc_feed_daily_profile"](spark, sf).collect()
    }
    spike_day = feed[dt.date(2024, 3, 2)]
    assert spike_day.n_deletes == 24 and spike_day.n_changes == 24
    assert spike_day.retraction_share == 1.0
    assert spike_day.global_retraction_share == 0.5
    assert spike_day.is_retraction_spike is True
    spark.catalog.clearCache()


# --- online form ---------------------------------------------------------------


def _raw_rows(spark, sf_dir):
    return [
        (r.event_id, r.ts, r.event_type, r.value)
        for r in load(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .collect()
    ]


def test_cdc_update_matches_batch_query(spark, sf_dir):
    rows = _raw_rows(spark, sf_dir)
    state = cdc_update(cdc_state_zero(), rows)
    expected = [
        tuple(r)
        for r in all_queries()["cdc_corrected_rollup"](spark, sf_dir).collect()
    ]
    assert cdc_readout(state) == expected
    spark.catalog.clearCache()


def test_cdc_update_is_chunking_invariant(spark, sf_dir):
    rows = _raw_rows(spark, sf_dir)
    whole = cdc_update(cdc_state_zero(), rows)
    for cuts in ((1,), (137, 2000), (7, 8, 9, 5000)):
        state = cdc_state_zero()
        prev = 0
        for c in (*cuts, len(rows)):
            cdc_update(state, rows[prev:c])
            prev = c
        assert state == whole
    spark.catalog.clearCache()


def _stream_three_triggers(spark, tmp_path, df, split_col, per_batch, name):
    """Three event_id-range parquet files consumed as a real stream
    with maxFilesPerTrigger=1 (the incremental_ops loop harness)."""
    stream_dir = str(tmp_path / f"{name}_in")
    lo, hi = df.agg(
        F.min(split_col).alias("a"), F.max(split_col).alias("b")
    ).collect()[0]
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    for pred in (
        F.col(split_col) <= c1,
        (F.col(split_col) > c1) & (F.col(split_col) <= c2),
        F.col(split_col) > c2,
    ):
        df.filter(pred).coalesce(1).write.parquet(stream_dir, mode="append")
        time.sleep(0.2)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()


def test_cdc_maintenance_loop_in_foreachbatch(spark, sf_dir, tmp_path):
    """The retraction-aware rollup maintained ACROSS three triggers by
    cdc_step + cdc_merge must equal the batch replay — the whole point
    of the delta encoding: corrections/retractions fold without ever
    re-reading a key's old value."""
    expected = [
        tuple(r)
        for r in all_queries()["cdc_corrected_rollup"](spark, sf_dir).collect()
    ]
    spark.catalog.clearCache()
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    state = cdc_state_zero()
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        cdc_merge(state, cdc_step(batch_df).collect())

    _stream_three_triggers(spark, tmp_path, ev, "event_id", per_batch, "cdc")
    assert len(batches) == 3, batches
    assert cdc_readout(state) == expected
    spark.catalog.clearCache()


# --- correction bias sign test --------------------------------------------------


def test_sign_test_crafted_unbiased(spark, tmp_path):
    """The crafted corpus has exactly two view corrections with
    opposite signs (22: -759, 146: +421): n_up = n_down = 1 -> z = 0,
    unbiased, however large the net cents drift (-338). click has no
    corrections -> NO row (nothing to test)."""
    sf = _write_events(spark, tmp_path, _CRAFT)
    got = [
        tuple(r)
        for r in all_queries()["correction_bias_sign_test"](
            spark, sf
        ).collect()
    ]
    assert got == [("view", 2, 1, 1, 0, -338, 0.0, False)]
    spark.catalog.clearCache()


def test_sign_test_crafted_biased(spark, tmp_path):
    """Six corrections whose md5 deltas are ALL positive (premise
    asserted): z = 6/sqrt(6) ~ 2.449 > 1.96 -> biased_05 True — the
    upstream-pricing-bug shape the test exists to catch."""
    ids = [42, 146, 226, 235, 300, 412]
    assert all(_kind(i) == "U" and _rev(i) > 0 for i in ids)
    rows = [
        (i, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 5.0) for i in ids
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["correction_bias_sign_test"](spark, sf).collect()[0]
    assert (row.n_corrections, row.n_up, row.n_down) == (6, 6, 0)
    assert row.net_delta_cents == sum(_rev(i) for i in ids)
    assert abs(row.z_sign - 6 / 6**0.5) < 1e-12
    assert row.biased_05 is True
    spark.catalog.clearCache()


def test_sign_test_reconciles_with_net_effect(spark, sf_dir):
    """Per type: n_corrections and the net delta must equal the
    net-effect decomposition's n_corrected / correction_delta_cents,
    and up + down + zero partitions the corrections."""
    qs = all_queries()
    sign = {
        r.event_type: r
        for r in qs["correction_bias_sign_test"](spark, sf_dir).collect()
    }
    for r in qs["cdc_net_effect_by_type"](spark, sf_dir).collect():
        if r.n_corrected == 0:
            assert r.event_type not in sign
            continue
        s = sign[r.event_type]
        assert s.n_corrections == r.n_corrected
        assert s.net_delta_cents == r.correction_delta_cents
        assert s.n_up + s.n_down + s.n_zero == s.n_corrections
    spark.catalog.clearCache()


def test_cdc_update_chunking_property(spark, sf_dir):
    """Hypothesis-driven chunking invariance: ANY sorted cut-point set
    over the event list folds to the same state as the whole-list pass
    (the semigroup claim, not just three hand-picked chunkings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows = _raw_rows(spark, sf_dir)
    whole = cdc_update(cdc_state_zero(), rows)

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=len(rows)),
            min_size=1,
            max_size=8,
        )
    )
    def check(cuts):
        state = cdc_state_zero()
        prev = 0
        for c in (*sorted(cuts), len(rows)):
            if c < prev:
                continue
            cdc_update(state, rows[prev:c])
            prev = c
        assert state == whole

    check()
    spark.catalog.clearCache()
