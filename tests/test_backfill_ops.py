"""Backfill/reprocessing family (round-14 theme): crafted scalar
references hand-walked against the md5 bug/fix model, the cost-model
and schedule arithmetic, gate branches (deny on impact, deny on scope,
vacuous pass, no-decision on empty and on broken gross), the
exactly-once online twin (re-apply == no-op, chunking invariance), and
gate-vs-legs reconciliation on the fixture.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from bigdata_2025_1_spark.operators.backfill_ops import (
    BUG_SPAN_DAYS,
    FIX_OFFSET_DAYS,
    backfill_apply,
    backfill_readout,
    backfill_state_zero,
)
from bigdata_2025_1_spark.registry import all_queries


def _write_events(spark, d, rows) -> str:
    spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


# Independent plain-Python model walk (reimplemented here, NOT imported
# from the module under test — the cdc test discipline).
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


# Crafted DIRTY corpus: the round-13 crafted set plus a calendar-tail
# event (id 3: live, on-time — premise-asserted) that pushes fix_date
# to 03-06 so both U applies (22 and 146, both on 03-04) land INSIDE
# the bug window [03-01, 03-06).
_D = {k: dt.date(2024, 3, k) for k in range(1, 9)}
_DIRTY = [
    (0, dt.datetime(2024, 3, 1, 9, 0), 1, "view", 10.00),
    (22, dt.datetime(2024, 3, 1, 11, 0), 2, "view", 2.50),
    (28, dt.datetime(2024, 3, 1, 12, 0), 1, "click", 7.25),
    (5, dt.datetime(2024, 3, 2, 8, 0), 3, "view", 4.00),
    (38, dt.datetime(2024, 3, 2, 9, 30), 2, "view", 6.00),
    (1, dt.datetime(2024, 3, 3, 10, 0), 3, "click", 5.00),
    (146, dt.datetime(2024, 3, 3, 11, 0), 1, "view", 3.00),
    (3, dt.datetime(2024, 3, 8, 10, 0), 4, "click", 2.00),
]
# The round-13 set alone: max change_date = 03-05 -> fix 03-03, window
# [02-27, 03-03) — both U applies (03-04) land AFTER the fix: clean.
_CLEAN = _DIRTY[:-1]


def test_crafted_premise_model():
    assert (_delay(3), _kind(3)) == (0, "")
    assert [_kind(i) for i in (0, 22, 28, 5, 38, 1, 146)] == [
        "", "U", "D", "", "D", "", "U",
    ]
    assert (_lag(22), _lag(146)) == (3, 1)
    assert (_rev(22), _rev(146)) == (-759, 421)
    assert (FIX_OFFSET_DAYS, BUG_SPAN_DAYS) == (2, 5)


def test_dirty_state_crafted_scalar_reference(spark, tmp_path):
    """Hand walk (fix 03-06, window [03-01, 03-06)): (03-01, view) has
    22's U@03-04 dropped -> stored 1250 vs true 491, drift +759;
    (03-03, view) has 146's U@03-04 dropped -> stored 300 vs true 721,
    drift -421; the other four keys are clean (28's D and 38's D were
    applied correctly — deletes were never part of the bug)."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    got = [
        tuple(r)
        for r in all_queries()["backfill_dirty_state"](spark, sf).collect()
    ]
    fx = _D[6]
    assert got == [
        (_D[1], "click", fx, 0, 0, 0, 0, 0, False),
        (_D[1], "view", fx, 2, 491, 1250, 759, 1, True),
        (_D[2], "view", fx, 1, 400, 400, 0, 0, False),
        (_D[3], "click", fx, 1, 500, 500, 0, 0, False),
        (_D[3], "view", fx, 1, 721, 300, -421, 1, True),
        (_D[8], "click", fx, 1, 200, 200, 0, 0, False),
    ]
    spark.catalog.clearCache()


def test_plan_crafted_scalar_reference(spark, tmp_path):
    """The plan lists exactly the two dirty keys with their replay
    bounds: (03-01, view) replays 3 records from 03-01 and restates
    -759; (03-03, view) replays 2 records from 03-03 and restates
    +421."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    got = [
        tuple(r) for r in all_queries()["backfill_plan"](spark, sf).collect()
    ]
    assert got == [
        (_D[1], "view", _D[6], 1, _D[4], _D[4], _D[1], 3, -759),
        (_D[3], "view", _D[6], 1, _D[4], _D[4], _D[3], 2, 421),
    ]
    spark.catalog.clearCache()


def test_day_census_crafted_scalar_reference(spark, tmp_path):
    """The window's processing days: 03-01 (3 inserts), 03-03 (4
    inserts + 28's delete), 03-04 (both bad U applies — share 1.0),
    03-05 (38's delete)."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    got = [
        tuple(r)
        for r in all_queries()["backfill_day_census"](spark, sf).collect()
    ]
    assert got == [
        (_D[1], 3, 0, 0, 0.0),
        (_D[3], 5, 0, 0, 0.0),
        (_D[4], 2, 2, 2, 1.0),
        (_D[5], 1, 0, 0, 0.0),
    ]
    spark.catalog.clearCache()


def test_cost_model_crafted_scalar_reference(spark, tmp_path):
    """6 keys / 2 dirty -> 5 key-replay records; 4 event days / 2
    dirty -> 8; 2 types / 1 dirty (view) -> 8; full -> all 12 records.
    Amplification relative to the 5-record key plan."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    got = {
        r["granularity"]: tuple(r)[1:]
        for r in all_queries()["backfill_cost_by_granularity"](
            spark, sf
        ).collect()
    }
    assert got == {
        "key": (6, 2, 5, 1.0),
        "event_day": (4, 2, 8, 8 / 5),
        "event_type": (2, 1, 8, 8 / 5),
        "full": (1, 1, 12, 12 / 5),
    }
    spark.catalog.clearCache()


def test_schedule_and_chunks_crafted(spark, tmp_path):
    """Priority: |+759| beats |-421|; cumulative fractions are exact
    759/1180 then 1.0; both keys are needed for 80% coverage. The
    5-record backfill fits one chunk of 2 keys."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    sched = [
        tuple(r)
        for r in all_queries()["backfill_priority_schedule"](
            spark, sf
        ).collect()
    ]
    assert sched == [
        (1, _D[1], "view", -759, 759, 759, 759 / 1180, True),
        (2, _D[3], "view", 421, 421, 1180, 1.0, True),
    ]
    chunks = [
        tuple(r)
        for r in all_queries()["backfill_chunk_plan"](spark, sf).collect()
    ]
    assert chunks == [(0, 2, 5, _D[1], _D[3])]
    spark.catalog.clearCache()


def test_idempotent_audit_crafted_scalar_reference(spark, tmp_path):
    """The 5-record replay set (both dirty keys are 'view') folds to
    1212 cents once, 2424 doubled-naively, 1212 through the
    (event_id, op) dedup — exactly-once holds."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    got = [
        tuple(r)
        for r in all_queries()["idempotent_replay_audit"](
            spark, sf
        ).collect()
    ]
    assert got == [("view", 5, 1212, 2424, 1212, True)]
    spark.catalog.clearCache()


def test_summary_verification_watermark_crafted(spark, tmp_path):
    """Per type: click is untouched (impact 0.0 on gross 1425); view
    restates net -338 (abs 1180) on gross 2550. Verification: both view
    drifts repair to zero residual. Watermark: the view replay reads
    03-01..03-04."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    summ = [
        tuple(r)
        for r in all_queries()["backfill_restatement_summary"](
            spark, sf
        ).collect()
    ]
    assert summ == [
        ("click", 3, 0, 700, 700, 0, 0, 1425, 0.0),
        ("view", 3, 2, 1950, 1612, -338, 1180, 2550, 1180 / 2550),
    ]
    ver = [
        tuple(r)
        for r in all_queries()["backfill_verification_diff"](
            spark, sf
        ).collect()
    ]
    assert ver == [
        ("click", 3, 0, 0, 0, 0, True),
        ("view", 3, 2, 2, 0, 0, True),
    ]
    wm = [
        tuple(r)
        for r in all_queries()["reprocessing_watermark"](spark, sf).collect()
    ]
    assert wm == [("view", _D[1], _D[4], 4, 5, _D[6])]
    spark.catalog.clearCache()


# --- gate branches ------------------------------------------------------------


def test_gate_deny_branch_impact(spark, tmp_path):
    """On the crafted corpus the +/-$10 corrections are HUGE relative
    to gross (1180/3975 cents), so ok_impact denies — the modeled
    'this is not the dropped-column bug class' adjudication."""
    sf = _write_events(spark, tmp_path, _DIRTY)
    row = all_queries()["backfill_release_gate"](spark, sf).collect()[0]
    assert row["n_keys"] == 6 and row["n_dirty_keys"] == 2
    assert row["ok_scope"] is True
    assert row["ok_impact"] is False
    assert row["ok_idempotent"] is True and row["ok_verified"] is True
    assert row["backfill_ok"] is False
    spark.catalog.clearCache()


def test_gate_deny_branch_scope(spark, tmp_path):
    """2 of 3 keys dirty -> dirty_frac 2/3 > 0.5: a backfill that would
    rewrite most of the table should be a rebuild instead."""
    rows = [
        (22, dt.datetime(2024, 3, 1, 11, 0), 2, "view", 2.50),
        (146, dt.datetime(2024, 3, 3, 11, 0), 1, "view", 3.00),
        (3, dt.datetime(2024, 3, 8, 10, 0), 4, "click", 2.00),
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["backfill_release_gate"](spark, sf).collect()[0]
    assert row["n_keys"] == 3 and row["n_dirty_keys"] == 2
    assert row["ok_scope"] is False and row["backfill_ok"] is False
    spark.catalog.clearCache()


def test_gate_vacuous_pass_clean_window(spark, tmp_path):
    """The round-13 crafted set WITHOUT the tail event: both U applies
    land after the fix date, nothing is dirty — the gate passes with an
    empty plan (vacuous, not NULL)."""
    sf = _write_events(spark, tmp_path, _CLEAN)
    assert all_queries()["backfill_plan"](spark, sf).count() == 0
    row = all_queries()["backfill_release_gate"](spark, sf).collect()[0]
    assert row["n_dirty_keys"] == 0 and row["dirty_frac"] == 0.0
    assert (
        row["ok_scope"],
        row["ok_impact"],
        row["ok_idempotent"],
        row["ok_verified"],
        row["backfill_ok"],
    ) == (True, True, True, True, True)
    spark.catalog.clearCache()


def test_gate_no_decision_empty(spark, tmp_path):
    sf = _write_events(spark, tmp_path, [])
    row = all_queries()["backfill_release_gate"](spark, sf).collect()[0]
    assert row["n_keys"] == 0
    assert row["ok_scope"] is None and row["ok_impact"] is None
    assert row["backfill_ok"] is None
    spark.catalog.clearCache()


def test_gate_no_decision_broken_gross(spark, tmp_path):
    """Live dirty keys but non-positive gross cents (a broken value
    pipeline): restatement impact is undefined — a NULL no-decision,
    never a silent pass (the ann_release_gate hardening)."""
    rows = [
        (22, dt.datetime(2024, 3, 1, 11, 0), 2, "view", -2.50),
        (3, dt.datetime(2024, 3, 8, 10, 0), 4, "click", 0.00),
    ]
    sf = _write_events(spark, tmp_path, rows)
    row = all_queries()["backfill_release_gate"](spark, sf).collect()[0]
    assert row["n_dirty_keys"] == 1
    assert row["ok_impact"] is None
    assert row["backfill_ok"] is None
    spark.catalog.clearCache()


def test_gate_reconciles_with_standalone_legs(spark, sf_dir):
    """On the fixture, the gate's scalars equal its standalone legs'
    (the release-gate convention's reconciliation pin)."""
    q = all_queries()
    row = q["backfill_release_gate"](spark, sf_dir).collect()[0]
    state = q["backfill_dirty_state"](spark, sf_dir).collect()
    assert row["n_keys"] == len(state)
    assert row["n_dirty_keys"] == sum(r["is_dirty"] for r in state)
    cost = {
        r["granularity"]: r["n_replay_records"]
        for r in q["backfill_cost_by_granularity"](spark, sf_dir).collect()
    }
    assert row["n_replay_records"] == cost["key"]
    summ = q["backfill_restatement_summary"](spark, sf_dir).collect()
    assert row["restatement_cents"] == sum(
        r["restatement_cents"] for r in summ
    )
    audit = q["idempotent_replay_audit"](spark, sf_dir).collect()
    assert row["ok_idempotent"] == all(r["exactly_once_ok"] for r in audit)
    ver = q["backfill_verification_diff"](spark, sf_dir).collect()
    assert row["ok_verified"] == all(r["verified_ok"] for r in ver)
    assert row["backfill_ok"] is not None  # fixture is live
    spark.catalog.clearCache()


def test_plan_restates_exactly_the_dirty_state_drift(spark, sf_dir):
    """Cross-query invariant on the fixture: the plan's restatement per
    key is exactly -drift from the dirty-state diff, and plan keys ==
    dirty keys."""
    q = all_queries()
    plan = {
        (r["event_date"], r["event_type"]): r["restatement_cents"]
        for r in q["backfill_plan"](spark, sf_dir).collect()
    }
    state = q["backfill_dirty_state"](spark, sf_dir).collect()
    dirty = {
        (r["event_date"], r["event_type"]): r["drift_cents"]
        for r in state
        if r["is_dirty"]
    }
    assert set(plan) == set(dirty)
    assert all(plan[k] == -dirty[k] for k in plan)
    spark.catalog.clearCache()


# --- the online idempotent-apply twin -----------------------------------------


def _crafted_records():
    recs = []
    for i, ts, _u, et, v in _DIRTY:
        ed = ts.date()
        cents = int(round(v * 100))
        recs.append((i, "I", ed, et, 1, cents))
        k = _kind(i)
        if k == "D":
            recs.append((i, "D", ed, et, -1, -cents))
        elif k == "U":
            recs.append((i, "U", ed, et, 0, _rev(i)))
    return recs


def test_online_apply_matches_true_fold():
    state, applied = backfill_state_zero()
    backfill_apply(state, applied, _crafted_records())
    got = backfill_readout(state)
    assert got == [
        (_D[1], "click", 0, 0),
        (_D[1], "view", 2, 491),
        (_D[2], "view", 1, 400),
        (_D[3], "click", 1, 500),
        (_D[3], "view", 1, 721),
        (_D[8], "click", 1, 200),
    ]


def test_online_apply_is_idempotent_and_chunking_invariant():
    """Re-applying any chunk (a retried job) is a no-op, and every
    md5-keyed chunking folds to the same state as the whole."""
    recs = _crafted_records()
    whole, applied = backfill_state_zero()
    backfill_apply(whole, applied, recs)
    base = backfill_readout(whole)
    for n_chunks in (2, 3, 5):
        state, led = backfill_state_zero()
        chunks = [
            [r for r in recs if _h(f"{r[0]}:{r[1]}") % n_chunks == c]
            for c in range(n_chunks)
        ]
        for c in chunks:
            backfill_apply(state, led, c)
        # retry storm: re-apply every chunk, twice
        for c in chunks + chunks:
            backfill_apply(state, led, c)
        assert backfill_readout(state) == base


def test_backfill_apply_in_foreachbatch_with_redelivery(spark, sf_dir, tmp_path):
    """The idempotent ledger driven by a REAL 3-trigger foreachBatch
    loop over the fixture, with every trigger's record chunk RE-applied
    after the loop (the redelivered-batch / retried-job scenario): the
    standing state must equal the batch truth (backfill_dirty_state's
    n_events/true_cents per key) and the redelivery must be a no-op."""
    import time

    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.io import load
    from bigdata_2025_1_spark.operators.cdc_ops import with_changes

    expected = [
        (r["event_date"], r["event_type"], r["n_events"], r["true_cents"])
        for r in all_queries()["backfill_dirty_state"](spark, sf_dir).collect()
    ]
    spark.catalog.clearCache()
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    stream_dir = str(tmp_path / "bf_in")
    lo, hi = ev.agg(
        F.min("event_id").alias("a"), F.max("event_id").alias("b")
    ).collect()[0]
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    for pred in (
        F.col("event_id") <= c1,
        (F.col("event_id") > c1) & (F.col("event_id") <= c2),
        F.col("event_id") > c2,
    ):
        ev.filter(pred).coalesce(1).write.parquet(stream_dir, mode="append")
        time.sleep(0.2)

    state, applied = backfill_state_zero()
    seen_chunks: list[list] = []

    def per_batch(batch_df, bid):
        recs = [
            tuple(r)
            for r in with_changes(batch_df)
            .select(
                "event_id", "op", "event_date", "event_type",
                "d_events", "d_cents",
            )
            .collect()
        ]
        seen_chunks.append(recs)
        backfill_apply(state, applied, recs)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "bf_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(seen_chunks) == 3
    assert backfill_readout(state) == expected
    # the retry storm: redeliver every trigger's chunk — pure no-op
    for recs in seen_chunks:
        backfill_apply(state, applied, recs)
    assert backfill_readout(state) == expected
    spark.catalog.clearCache()


def test_backfill_apply_idempotence_property():
    """Hypothesis-driven exactly-once: for ANY synthetic record set
    with unique (event_id, op) keys and ANY delivery plan — chunk cut
    points plus an arbitrary multiset of chunk re-deliveries in an
    arbitrary order — the ledgered apply converges to the single-pass
    state (the claim the audit query certifies, not just hand-picked
    retry patterns)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base_date = dt.date(2024, 3, 1)

    rec_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # event_id
            st.sampled_from(["I", "U", "D"]),  # op
            st.integers(min_value=0, max_value=5),  # event_date offset
            st.sampled_from(["view", "click"]),  # event_type
            st.integers(min_value=-2, max_value=2),  # d_events
            st.integers(min_value=-1000, max_value=1000),  # d_cents
        ),
        min_size=0,
        max_size=30,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        raw=rec_strategy,
        cuts=st.lists(
            st.integers(min_value=0, max_value=30), min_size=0, max_size=5
        ),
        redeliver=st.lists(
            st.integers(min_value=0, max_value=6), min_size=0, max_size=8
        ),
    )
    def check(raw, cuts, redeliver):
        # unique MERGE keys: last writer per (event_id, op)
        recs = list(
            {
                (i, op): (
                    i,
                    op,
                    base_date + dt.timedelta(days=d),
                    et,
                    de,
                    dc,
                )
                for i, op, d, et, de, dc in raw
            }.values()
        )
        whole, led_w = backfill_state_zero()
        backfill_apply(whole, led_w, recs)
        expected = backfill_readout(whole)

        bounds = sorted(set([0, *[min(c, len(recs)) for c in cuts], len(recs)]))
        chunks = [
            recs[a:b] for a, b in zip(bounds, bounds[1:])
        ] or [recs]
        state, led = backfill_state_zero()
        for c in chunks:
            backfill_apply(state, led, c)
        for idx in redeliver:  # the retry storm, arbitrary order
            backfill_apply(state, led, chunks[idx % len(chunks)])
        assert backfill_readout(state) == expected

    check()
