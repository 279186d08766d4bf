"""Property-based check: the union+window as-of join must agree with an
independent brute-force reference (per fact row: scan all timeline rows,
keep the one with the greatest (ts, tiebreak) <= (ts, fact)) on random
keyed event sets — duplicate timestamps, equal fact/timeline timestamps,
keys with no timeline rows, NULL timeline values, all of it."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_2025_1_spark.functions.asof import asof_attach_last

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow

row = st.tuples(
    st.integers(min_value=0, max_value=3),  # key (few keys -> collisions)
    st.integers(min_value=0, max_value=20),  # ts (small range -> ties)
    st.one_of(  # NULL values must still win the as-of race
        st.none(), st.floats(min_value=-10, max_value=10, allow_nan=False)
    ),
)


def reference(facts: list, timeline: list) -> dict:
    """Brute force: a timeline row qualifies iff its ts <= the fact's ts
    (inclusive at equal timestamps — timeline sorts before facts in the
    operator regardless of tiebreak); among qualifiers the greatest
    (ts, tiebreak) wins, even when its value is None."""
    out = {}
    for fk, fts, fid, _payload in facts:
        best = None
        for tk, tts, tid, tval in timeline:
            if tk == fk and tts <= fts:
                if best is None or (tts, tid) > (best[0], best[1]):
                    best = (tts, tid, tval)
        out[fid] = (best[0], best[2]) if best else (None, None)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    facts=st.lists(row, min_size=1, max_size=12),
    timeline=st.lists(row, min_size=0, max_size=12),
)
def test_asof_matches_bruteforce(spark, facts, timeline):
    # unique tiebreaks per side; facts carry a payload column that the
    # operator must pass through untouched
    f_rows = [(k, ts, 2 * i + 1, 10 * i) for i, (k, ts, _) in enumerate(facts)]
    t_rows = [(k, ts, 2 * i, v) for i, (k, ts, v) in enumerate(timeline)]
    fact_df = spark.createDataFrame(f_rows, "key INT, ts INT, tb INT, payload INT")
    tl_df = (
        spark.createDataFrame(t_rows, "key INT, ts INT, tb INT, value DOUBLE")
        if t_rows
        else spark.createDataFrame([], "key INT, ts INT, tb INT, value DOUBLE")
    )
    result = asof_attach_last(
        fact_df, tl_df, key="key", ts="ts", tiebreak="tb", value="value"
    ).collect()
    got = {r.tb: (r.asof_ts, r.asof_value) for r in result}
    want = reference(f_rows, t_rows)
    assert got == want
    # fact payload columns survive the union+window round trip
    assert {r.tb: r.payload for r in result} == {tb: p for _, _, tb, p in f_rows}
