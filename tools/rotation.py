"""Rotation census: derive and verify the driver-head rotation from the
CORRECTNESS_r*.json record.

The standing convention (ratified across rounds 11-13): each round's
50-slot driver head is

  1. the PREVIOUS round's batched additions — the registered queries
     with no driver row yet, in registration (landing) order (the
     CURRENT round's additions are batched for the NEXT head, so they
     are excluded even though they are also never-checked);
  2. filled to 50 with the OLDEST-VINTAGE greens (vintage = round of a
     query's latest driver row), alphabetical, spilling into the next
     vintage when the oldest has fewer names than the remaining slots.

Every round the freeze is written as a registry comment and the judge
re-derives the arithmetic by hand. This tool makes both machine-checked:

    python tools/rotation.py verify   # PRIORITY_HEAD obeys the convention
    python tools/rotation.py census   # vintage histogram + stale tail
    python tools/rotation.py next     # the next round's head, derived

tests/test_rotation.py runs `verify` as a pytest, so a mis-frozen head
fails at commit time instead of at judge time.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_SIZE = 50
_ROUND_FILE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def _green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match") in (True, None)
    )


def rounds_census() -> "dict[int, dict[str, bool]]":
    """round -> {query: green} for every CORRECTNESS_r*.json on disk.

    Files whose name doesn't match the round pattern are skipped (a
    stray backup like CORRECTNESS_r13.json.bak must not crash the
    verifier or shift the census)."""
    rounds: dict[int, dict[str, bool]] = {}
    # sorted paths + per-query merge: two files parsing to the same
    # round (e.g. an unpadded CORRECTNESS_r7.json beside r07) must not
    # drop records with filesystem-glob-order luck — deterministic
    # last-writer per query instead (self-review r14)
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = _ROUND_FILE.search(os.path.basename(path))
        if not m:
            continue
        with open(path) as fh:
            recs = json.load(fh)
        rounds.setdefault(int(m.group(1)), {}).update(
            {n: _green(r) for n, r in recs.items()}
        )
    return rounds


def _latest_from(rounds: "dict[int, dict[str, bool]]") -> "dict[str, tuple[int, bool]]":
    latest: dict[str, tuple[int, bool]] = {}
    for rnd in sorted(rounds):
        for name, ok in rounds[rnd].items():
            latest[name] = (rnd, ok)
    return latest


def latest_vintage() -> "dict[str, tuple[int, bool]]":
    """query -> (round of latest driver row, was it green)."""
    return _latest_from(rounds_census())


def _registry():
    import bigdata_2025_1_spark.registry as reg

    return (
        list(reg.PRIORITY_HEAD),
        list(reg.all_queries()),
        list(getattr(reg, "PRIORITY_PINS", ())),
    )


def derive_head(
    never_checked_in_head: "list[str]", latest: dict, pins: "list[str]" = ()
) -> "list[str]":
    """The convention's head for a given batched-additions prefix:
    the prefix, then any judge-directed pins (names with an existing
    driver row the round's VERDICT ordered back into the head), then
    oldest-vintage greens alphabetical (spilling across vintages) up
    to HEAD_SIZE. Pins displace the alphabetically-last refreshes."""
    head = list(never_checked_in_head)
    head += [p for p in pins if p not in head]
    placed = set(head)
    by_vintage: dict[int, list[str]] = {}
    for name, (rnd, ok) in latest.items():
        if ok:
            by_vintage.setdefault(rnd, []).append(name)
    for rnd in sorted(by_vintage):
        for name in sorted(by_vintage[rnd]):
            if len(head) >= HEAD_SIZE:
                return head
            if name in placed:
                continue
            head.append(name)
    return head


def verify() -> "list[str]":
    """Return a list of convention violations (empty = head is valid).

    The head is valid in EITHER lifecycle window:

    - pre-driver (just rotated): it matches the convention under the
      full census;
    - post-driver, rotation-pending (the driver has written this
      round's CORRECTNESS file — whose key set IS the head — but the
      next rotation hasn't landed yet): it matches the convention under
      the census EXCLUDING that newest file. Round 13's checker only
      accepted the first window, so the moment the driver wrote
      CORRECTNESS_r13.json a correctly-frozen head read "stale" at
      judge time (the one red pytest of round 13).
    """
    head, registered, pins = _registry()
    rounds = rounds_census()
    problems = _verify_against(head, registered, _latest_from(rounds), pins)
    if problems and rounds:
        newest = max(rounds)
        if set(rounds[newest]) == set(head):
            reduced = {r: recs for r, recs in rounds.items() if r != newest}
            if not _verify_against(
                head, registered, _latest_from(reduced), pins
            ):
                return []
    return problems


def _verify_against(
    head: "list[str]",
    registered: "list[str]",
    latest: dict,
    pins: "list[str]" = (),
) -> "list[str]":
    problems: list[str] = []
    if len(head) != HEAD_SIZE:
        problems.append(f"head has {len(head)} entries, expected {HEAD_SIZE}")
    if len(set(head)) != len(head):
        problems.append("head contains duplicates")
    unknown = [n for n in head if n not in registered]
    if unknown:
        problems.append(f"head names not registered: {unknown}")
    # split the head into its never-checked prefix and the refresh fill
    prefix = [n for n in head if n not in latest]
    fill = [n for n in head if n in latest]
    # 1. the never-checked head members must lead, in registration order
    if head[: len(prefix)] != prefix:
        problems.append("never-checked additions are not a leading prefix")
    reg_order = [n for n in registered if n in set(prefix)]
    if prefix != reg_order:
        problems.append(
            "never-checked additions are not in registration order"
        )
    # 1b. declared pins (judge-directed re-checks) must sit immediately
    #     after the prefix, in declaration order
    pin_list = [p for p in pins if p in latest]
    if pin_list and head[len(prefix) : len(prefix) + len(pin_list)] != pin_list:
        problems.append("pins do not follow the never-checked prefix")
    # 2. the fill must be the oldest-vintage greens, alphabetical with
    #    vintage spill — exactly what derive_head computes
    expected = derive_head(prefix, latest, pin_list)
    if head != expected:
        diffs = [
            f"pos {i}: have {a!r}, convention says {b!r}"
            for i, (a, b) in enumerate(zip(head, expected))
            if a != b
        ]
        problems.append(
            "fill deviates from oldest-vintage-alphabetical: "
            + "; ".join(diffs[:5])
        )
    # 3. every fill member must be green at its latest row (never put a
    #    known-red query back in the head without a fix landing first)
    red = [n for n in fill if not latest[n][1]]
    if red:
        problems.append(f"head contains non-green refreshes: {red}")
    return problems


def census() -> None:
    head, registered, _pins = _registry()
    latest = latest_vintage()
    from collections import Counter

    greens = Counter(r for r, ok in latest.values() if ok)
    print("vintage histogram (latest green rows per round):")
    for rnd in sorted(greens):
        print(f"  r{rnd:02d}: {greens[rnd]}")
    never = [n for n in registered if n not in latest]
    print(f"never driver-checked: {len(never)}: {never}")
    refreshed = set(head) | set(never)
    stale = sorted(
        (r, n) for n, (r, ok) in latest.items() if ok and n not in refreshed
    )
    print("stale tail after this head lands green (oldest first):")
    for r, n in stale[:15]:
        print(f"  r{r:02d} {n}")
    print(f"  ... {len(stale)} total")


def next_head() -> None:
    """Derive the NEXT round's head assuming the current one lands
    green this round (its members become current-round vintage)."""
    # pins are one-round directives: once the current head lands they
    # carry current-round vintage, so the next head derives pin-free
    head, registered, _pins = _registry()
    latest = dict(latest_vintage())
    this_round = max(r for r, _ in latest.values()) + 1
    for n in head:
        latest[n] = (this_round, True)
    additions = [n for n in registered if n not in latest]
    nxt = derive_head(additions, latest)
    print(f"# next head = {len(additions)} batched additions + "
          f"{HEAD_SIZE - len(additions)} refreshes")
    for i, n in enumerate(nxt):
        print(f"{i:2d}  {n}")


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "verify"
    if cmd == "verify":
        problems = verify()
        for p in problems:
            print(f"VIOLATION: {p}")
        print("head OK" if not problems else f"{len(problems)} violations")
        return 1 if problems else 0
    if cmd == "census":
        census()
        return 0
    if cmd == "next":
        next_head()
        return 0
    print(f"unknown command {cmd!r} (verify | census | next)", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
