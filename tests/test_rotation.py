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


def test_current_head_is_the_frozen_round15_plan():
    """The landed round-15 head is the enumeration round 14 froze,
    amended by the r14 VERDICT's ask #4: 11 round-14 additions
    (registration order) + the two judge-directed pins
    (lsh_band_sweep, dedup_release_gate) + the 19 r7 stragglers + the
    alphabetically-first 18 r8 remainders (the pins displaced the last
    two of the frozen plan's 20)."""
    from bigdata_2025_1_spark.registry import PRIORITY_HEAD, PRIORITY_PINS

    head = list(PRIORITY_HEAD)
    assert len(head) == HEAD_SIZE
    assert head[:11] == [
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
    assert head[11:13] == list(PRIORITY_PINS) == [
        "lsh_band_sweep",
        "dedup_release_gate",
    ]
    assert head[13] == "naive_bayes_source_classifier"
    assert head[31] == "zipf_exponent_fit"
    assert head[32] == "anova_f_segment_spend"
    assert head[49] == "degree_assortativity_trade"
    # the two names the pins displaced queue for round 16
    assert "domain_doc_stats" not in head
    assert "eb_shrunk_supplier_rates" not in head


def test_next_head_leads_with_the_displaced_r8_greens():
    """Re-derive the round-16 head (pin-free — pins are one-round
    directives; once this head lands they carry r15 vintage and the
    convention reabsorbs them): no batched additions this round, so the
    fill leads with the two r8 greens the pins displaced, then the rest
    of the r8 vintage alphabetical."""
    from bigdata_2025_1_spark.registry import PRIORITY_HEAD, all_queries

    latest = dict(latest_vintage())
    this_round = max(r for r, _ in latest.values()) + 1
    for n in PRIORITY_HEAD:
        latest[n] = (this_round, True)
    additions = [n for n in all_queries() if n not in latest]
    nxt = derive_head(additions, latest)
    assert len(nxt) == HEAD_SIZE
    assert additions == []
    assert nxt[:2] == ["domain_doc_stats", "eb_shrunk_supplier_rates"]
    assert "lsh_band_sweep" not in nxt
    assert "dedup_release_gate" not in nxt


def test_derive_head_places_pins_after_prefix_and_skips_them_in_fill():
    latest = {
        "pinned": (1, True),
        "old_a": (1, True),
        "old_b": (1, True),
    }
    got = derive_head(["add1"], latest, ["pinned"])
    assert got[:4] == ["add1", "pinned", "old_a", "old_b"]
    assert got.count("pinned") == 1


def test_verify_accepts_the_post_driver_window():
    """Once the driver writes this round's CORRECTNESS file (key set ==
    the head), the un-rotated head must STILL verify — this is the
    lifecycle window that was red at round-13 judge time. Simulate it:
    pretend the newest CORRECTNESS file covers exactly the current
    head."""
    import tools.rotation as rot

    rounds = rot.rounds_census()
    head, _, _ = rot._registry()
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
