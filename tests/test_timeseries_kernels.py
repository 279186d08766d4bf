"""Scalar-reference tests for the time-series kernels (the
bt_mm_kernel/pagerank property-test convention)."""

from __future__ import annotations

import pandas as pd

from bigdata_2025_1_spark.operators.timeseries_ops import (
    HOLT_HORIZON,
    _tdiv,
    holt_linear_kernel,
)


def test_tdiv_truncates_toward_zero_like_both_engines():
    # DuckDB `//` and Spark SQL `div` both truncate; Python // floors —
    # the helper must match the ENGINES, not Python
    assert _tdiv(-7, 2) == -3
    assert _tdiv(7, 2) == 3
    assert _tdiv(-10, 10) == -1
    assert _tdiv(0, 5) == 0


def test_holt_constant_series_is_fixed_point():
    # level == y, trend == 0 is exactly preserved under integer updates
    pdf = pd.DataFrame({"m": range(10), "y": [500] * 10})
    out = holt_linear_kernel(pdf)
    fits = out[out["kind"] == "fit"]
    assert (fits["yhat_cents"] == 500).all()
    fc = out[out["kind"] == "forecast"]
    assert len(fc) == HOLT_HORIZON
    assert (fc["yhat_cents"] == 500).all()
    assert list(fc["m"]) == [10, 11, 12]


def test_holt_matches_hand_walked_recurrence():
    ys = [100, 200, 150, 400, -50]
    pdf = pd.DataFrame({"m": [3, 4, 5, 6, 7], "y": ys})
    out = holt_linear_kernel(pdf)
    # hand-walk: l1=100, b1=100
    l, b = 100, 100
    expect = []
    for t in range(1, 5):
        expect.append(l + b)
        l_new = _tdiv(3 * ys[t] + 7 * (l + b), 10)
        b = _tdiv(2 * (l_new - l) + 8 * b, 10)
        l = l_new
    fits = out[out["kind"] == "fit"]
    assert list(fits["yhat_cents"]) == expect
    fc = out[out["kind"] == "forecast"]
    assert list(fc["yhat_cents"]) == [l + h * b for h in (1, 2, 3)]


def test_holt_short_series_emits_nothing():
    assert holt_linear_kernel(pd.DataFrame({"m": [1], "y": [10]})).empty
    assert holt_linear_kernel(pd.DataFrame({"m": [], "y": []})).empty


def test_holt_unsorted_input_is_sorted_first():
    a = holt_linear_kernel(pd.DataFrame({"m": [2, 0, 1], "y": [30, 10, 20]}))
    b = holt_linear_kernel(pd.DataFrame({"m": [0, 1, 2], "y": [10, 20, 30]}))
    assert a.equals(b)
