"""Property tests for the layout-maintenance arithmetic.

Drives the REGISTERED DuckDB oracles (the same algebra the Spark side
is hash-locked to by selfcheck) over hypothesis-generated tables and
compares against independent plain-Python references — the
test_lsh_prefix_property convention: DuckDB-only per example so the
search is wide; Spark-vs-oracle equality is already pinned per-commit
by tools/selfcheck.py and the crafted tests in test_layout_ops.py.
"""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_2025_1_spark.operators.layout_ops import (
    COMPACT_SMALL_ROWS,
    COMPACT_TARGET_ROWS,
    LAYOUT_N_FILES,
)
from bigdata_2025_1_spark.registry import all_oracles, load_all

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow

load_all()
_COMPACT_ORACLE = all_oracles()["compaction_plan_bins"]
_DEPTH_ORACLE = all_oracles()["clustering_depth_compare"]


def _ref_compaction(day_sizes: dict[int, int]):
    """Independent next-fit reference: classify by the small threshold,
    pack compacts in date order at exact target offsets."""
    out = {}
    cum = 0
    fills: dict[int, int] = {}
    for day in sorted(day_sizes):
        n = day_sizes[day]
        if n < COMPACT_SMALL_ROWS:
            b = cum // COMPACT_TARGET_ROWS
            cum += n
            fills[b] = fills.get(b, 0) + n
            out[day] = (n, "compact", b)
        else:
            out[day] = (n, "keep", None)
    return {
        d: (n, a, b, fills[b] if b is not None else None)
        for d, (n, a, b) in out.items()
    }


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=1, max_value=1500),
        min_size=1,
        max_size=12,
    )
)
def test_compaction_oracle_matches_reference(day_sizes):
    con = duckdb.connect()
    parts = [
        f"SELECT (TIMESTAMP '2024-01-01 03:00:00' + INTERVAL {d} DAY) AS ts "
        f"FROM range({n})"
        for d, n in day_sizes.items()
    ]
    con.execute(
        "CREATE OR REPLACE VIEW events AS " + " UNION ALL ".join(parts)
    )
    rows = con.execute(_COMPACT_ORACLE).fetchall()
    ref = _ref_compaction(day_sizes)
    got = {
        (r[0] - dt.date(2024, 1, 1)).days: (r[1], r[2], r[3], r[4])
        for r in rows
    }
    assert got == ref
    con.close()


def _ref_depth(dates: list[int]):
    """Independent reference of the full clustering-depth metric:
    dates[k] is the day offset of order key k."""
    n = len(dates)
    max_key = n - 1
    min_d, max_d = min(dates), max(dates)
    out = {}
    for layout in ("arrival", "sorted_date"):
        files: dict[int, list[int]] = {}
        for k, d in enumerate(dates):
            if layout == "arrival":
                f = (k * LAYOUT_N_FILES) // (max_key + 1)
            else:
                f = ((d - min_d) * LAYOUT_N_FILES) // (max_d - min_d + 1)
            files.setdefault(f, []).append(d)
        ranges = [(min(v), max(v)) for v in files.values()]
        n_files = len(ranges)
        overlap = sum(
            1
            for a in ranges
            for b in ranges
            if a[0] <= b[1] and b[0] <= a[1]
        )
        coverage = sum(hi - lo + 1 for lo, hi in ranges)
        out[layout] = (
            n_files,
            overlap / n_files,
            coverage / (max_d - min_d + 1),
        )
    return out


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=120), min_size=2, max_size=200
    )
)
def test_depth_oracle_matches_reference(dates):
    con = duckdb.connect()
    vals = ", ".join(
        f"({k}, TIMESTAMP '1995-01-01 00:00:00' + INTERVAL {d} DAY)"
        for k, d in enumerate(dates)
    )
    con.execute(
        "CREATE OR REPLACE VIEW orders AS "
        f"SELECT * FROM (VALUES {vals}) AS t(o_orderkey, o_orderdate)"
    )
    rows = con.execute(_DEPTH_ORACLE).fetchall()
    ref = _ref_depth(dates)
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert got == ref
    con.close()
