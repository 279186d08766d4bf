"""The driver-head rotation is machine-checked, not hand-frozen: the
standing convention (previous round's batched additions in registration
order, then oldest-vintage greens alphabetical with vintage spill) must
hold for the CURRENT PRIORITY_HEAD against the CORRECTNESS_r*.json
record, and the derivation must reproduce the next-round freeze written
in the registry comment. A deliberately corrupted head must FAIL, so the
checker itself is checked.

If a future round legitimately deviates from the convention (e.g. a
judge-ratified exception), this test is the forcing function: update
the convention in tools/rotation.py alongside the registry comment.
"""

from __future__ import annotations

from tools.rotation import HEAD_SIZE, derive_head, latest_vintage, verify


def test_current_head_obeys_the_rotation_convention():
    assert verify() == []


def test_current_head_is_the_frozen_round14_plan():
    """The landed round-14 head is exactly the enumeration round 13
    froze (and the round-13 judge re-derived): 12 round-13 additions
    (registration order) + the 7 r6 stragglers + the alphabetically-
    first 31 r7 remainders."""
    from bigdata_2025_1_spark.registry import PRIORITY_HEAD

    head = list(PRIORITY_HEAD)
    assert len(head) == HEAD_SIZE
    assert head[:12] == [
        "cdc_corrected_rollup",
        "cdc_delta_log",
        "cdc_feed_daily_profile",
        "correction_latency_profile",
        "reconciliation_window_audit",
        "corrected_rollup_as_of",
        "event_version_census",
        "stale_state_audit",
        "cdc_net_effect_by_type",
        "correction_bias_sign_test",
        "cdc_release_gate",
        "platform_release_gate",
    ]
    assert head[12:19] == [
        "top_sources_with_other",
        "trade_graph_degree_stats",
        "user_feature_matrix",
        "vocab_frequency_spectrum",
        "vocab_growth_curve",
        "watermark_lateness_audit",
        "weighted_sample_wor",
    ]
    assert head[19] == "ab_test_uplift" and head[49] == "minhash_signatures"


def test_next_head_matches_the_frozen_round15_plan():
    """Re-derive the round-15 freeze exactly as the registry comment
    enumerates it: 11 round-14 additions (registration order) + the 19
    r7 stragglers + the alphabetically-first 20 r8 remainders. The
    derivation simulates this round's driver rows landing green on the
    current head (the state `tools/rotation.py next` will see at the
    round-14 post-driver close)."""
    from bigdata_2025_1_spark.registry import PRIORITY_HEAD, all_queries

    latest = dict(latest_vintage())
    this_round = max(r for r, _ in latest.values()) + 1
    for n in PRIORITY_HEAD:
        latest[n] = (this_round, True)
    additions = [n for n in all_queries() if n not in latest]
    nxt = derive_head(additions, latest)
    assert len(nxt) == HEAD_SIZE
    assert nxt[:11] == [
        "backfill_dirty_state",
        "backfill_plan",
        "backfill_day_census",
        "backfill_cost_by_granularity",
        "backfill_priority_schedule",
        "backfill_chunk_plan",
        "idempotent_replay_audit",
        "backfill_restatement_summary",
        "reprocessing_watermark",
        "backfill_verification_diff",
        "backfill_release_gate",
    ]
    assert nxt[11] == "naive_bayes_source_classifier"
    assert nxt[29] == "zipf_exponent_fit"
    assert nxt[30] == "anova_f_segment_spend"
    assert nxt[49] == "eb_shrunk_supplier_rates"


def test_verify_accepts_the_post_driver_window():
    """Once the driver writes this round's CORRECTNESS file (key set ==
    the head), the un-rotated head must STILL verify — this is the
    lifecycle window that was red at round-13 judge time. Simulate it:
    pretend the newest CORRECTNESS file covers exactly the current
    head."""
    import tools.rotation as rot

    rounds = rot.rounds_census()
    head, _ = rot._registry()
    newest = max(rounds) + 1
    simulated = dict(rounds)
    simulated[newest] = {n: True for n in head}
    real = rot.rounds_census
    try:
        rot.rounds_census = lambda: simulated
        assert rot.verify() == []
    finally:
        rot.rounds_census = real


def test_derive_head_spills_across_vintages():
    latest = {
        "old_b": (1, True),
        "old_a": (1, True),
        "new_c": (2, True),
        "red_x": (1, False),  # never refilled while red
    }
    got = derive_head(["add1"], latest)
    # oldest vintage alphabetical, then the next vintage; red excluded
    assert got[:4] == ["add1", "old_a", "old_b", "new_c"]


def test_verify_catches_a_corrupted_head(monkeypatch):
    import bigdata_2025_1_spark.registry as R
    import tools.rotation as rot

    bad = list(R.PRIORITY_HEAD)
    bad[20], bad[30] = bad[30], bad[20]  # swap two refresh slots
    monkeypatch.setattr(R, "PRIORITY_HEAD", tuple(bad))
    assert rot.verify() != []


def test_rounds_census_merges_same_round_files(tmp_path, monkeypatch):
    """Two files parsing to the same round number (an unpadded r7
    beside r07) must MERGE per query, not glob-order-overwrite
    (self-review r14)."""
    import json

    import tools.rotation as rot

    rec = {"rows_match": True, "schema_match": True, "hash_match": True}
    a = tmp_path / "CORRECTNESS_r7.json"
    a.write_text(json.dumps({"q_only_in_a": rec}))
    b = tmp_path / "CORRECTNESS_r07.json"
    b.write_text(json.dumps({"q_only_in_b": rec}))
    for order in ([str(a), str(b)], [str(b), str(a)]):
        monkeypatch.setattr(rot.glob, "glob", lambda pat, o=order: list(o))
        rounds = rot.rounds_census()
        assert set(rounds[7]) == {"q_only_in_a", "q_only_in_b"}


def test_load_old_rejects_invalid_ref():
    """A typo'd --ref must stay LOUD (self-review r14): silently
    treating it as 'every module is new' would make plandiff --all
    exit 0 having compared nothing."""
    import pytest

    from tools.ab import load_old

    with pytest.raises(SystemExit):
        load_old("no-such-ref-deadbeef", {"q1": "bench.py"})
    # a valid ref with a path that does not exist there still skips
    assert load_old("HEAD", {"q1": "no/such/module.py"}) == {}
