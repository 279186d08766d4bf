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


def test_hw_online_update_matches_batch_kernel_any_chunking():
    """holt_winters_update is the per-trigger form of the batch kernel:
    for ANY series and ANY chunking, the streamed fits and the
    final-state forecasts must equal the kernel's output exactly
    (hypothesis over random integer series incl. negatives and random
    split points)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_2025_1_spark.operators.timeseries_ops import (
        HW_SEASON,
        HW_STATE_ZERO,
        holt_winters_forecast_from_state,
        holt_winters_kernel,
        holt_winters_update,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        ys=st.lists(
            st.integers(min_value=-10_000, max_value=10_000),
            min_size=2 * HW_SEASON,
            max_size=3 * HW_SEASON + 5,
        ),
        data=st.data(),
    )
    def run(ys, data):
        n = len(ys)
        n_cuts = data.draw(st.integers(min_value=0, max_value=4))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=n),
                    min_size=n_cuts,
                    max_size=n_cuts,
                )
            )
        )
        bounds = [0, *cuts, n]
        state, fits = HW_STATE_ZERO, []
        for lo, hi in zip(bounds, bounds[1:]):
            state, out = holt_winters_update(state, ys[lo:hi])
            fits.extend(out)
        k = holt_winters_kernel(pd.DataFrame({"m": range(n), "y": ys}))
        kf = k[k["kind"] == "fit"]
        assert fits == list(zip(kf["y_cents"], kf["yhat_cents"]))
        assert holt_winters_forecast_from_state(state) == [
            int(v) for v in k[k["kind"] == "forecast"]["yhat_cents"]
        ]

    run()


def test_hw_online_warmup_emits_nothing_and_forecasts_empty():
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        HW_SEASON,
        HW_STATE_ZERO,
        holt_winters_forecast_from_state,
        holt_winters_update,
    )

    state, out = holt_winters_update(HW_STATE_ZERO, [5] * (2 * HW_SEASON - 1))
    assert out == [] and holt_winters_forecast_from_state(state) == []


def test_ph_online_update_is_chunking_invariant():
    """page_hinkley_update must produce the identical (ph, alarm)
    sequence under any chunking of the series (hypothesis over random
    count series and random split points) — the guarantee the
    foreachBatch twin relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_2025_1_spark.operators.timeseries_ops import (
        PH_STATE_ZERO,
        page_hinkley_update,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=40),
        data=st.data(),
    )
    def run(xs, data):
        n = len(xs)
        cuts = sorted(
            data.draw(
                st.lists(st.integers(min_value=0, max_value=n), max_size=4)
            )
        )
        bounds = [0, *cuts, n]
        state, out = PH_STATE_ZERO, []
        for lo, hi in zip(bounds, bounds[1:]):
            state, o = page_hinkley_update(state, xs[lo:hi])
            out.extend(o)
        _, whole = page_hinkley_update(PH_STATE_ZERO, xs)
        assert out == whole

    run()


def test_round_half_away_matches_engine_round_on_ties():
    """round_half_away must implement F.round / DuckDB ROUND tie
    semantics (half AWAY from zero); Python's built-in round() is
    half-to-even and disagrees on every odd→even .5 tie — the exact
    divergence the streaming PH twin would have had on an exact .5 in
    1e6*(x - s/t - delta) before switching to this helper."""
    from bigdata_2025_1_spark.operators.timeseries_ops import round_half_away

    assert round_half_away(0.5) == 1 and round(0.5) == 0
    assert round_half_away(2.5) == 3 and round(2.5) == 2
    assert round_half_away(-0.5) == -1 and round(-0.5) == 0
    assert round_half_away(-2.5) == -3 and round(-2.5) == -2
    assert round_half_away(1.4) == 1 and round_half_away(-1.4) == -1
    assert round_half_away(1.6) == 2 and round_half_away(-1.6) == -2
    assert round_half_away(0.0) == 0


def test_round_half_away_below_half_boundary_doubles():
    """ADVICE r10: the naive floor(v + 0.5) misrounds doubles just
    below a .5 boundary because v + 0.5 itself rounds UP in IEEE
    (0.49999999999999994 + 0.5 == 1.0 exactly) — F.round and DuckDB
    ROUND both give 0 there. The helper must compare the exact
    fractional part instead, and must agree with Decimal
    ROUND_HALF_UP (= half away from zero) on arbitrary doubles."""
    import decimal
    import random

    from bigdata_2025_1_spark.operators.timeseries_ops import round_half_away

    assert round_half_away(0.49999999999999994) == 0
    assert round_half_away(-0.49999999999999994) == 0
    assert round_half_away(2.4999999999999996) == 2
    assert round_half_away(-2.4999999999999996) == -2
    rng = random.Random(1234)
    for _ in range(20000):
        v = rng.uniform(-1e9, 1e9)
        want = int(decimal.Decimal(v).to_integral_value(rounding=decimal.ROUND_HALF_UP))
        assert round_half_away(v) == want, v
    # near-boundary stress: nextafter neighbours of exact .5 ties
    import math

    for base in (0.5, 1.5, 2.5, 1e6 + 0.5):
        lo = math.nextafter(base, -math.inf)
        hi = math.nextafter(base, math.inf)
        for v in (lo, base, hi, -lo, -base, -hi):
            want = int(decimal.Decimal(v).to_integral_value(rounding=decimal.ROUND_HALF_UP))
            assert round_half_away(v) == want, v


def test_cusum_online_update_is_chunking_invariant():
    """cusum_update must produce the identical (cusum_scaled, alarm)
    sequence under any chunking — including splits INSIDE the warm-up
    buffer — the guarantee its foreachBatch twin relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_2025_1_spark.operators.timeseries_ops import (
        CUSUM_STATE_ZERO,
        CUSUM_WARM,
        cusum_update,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        xs=st.lists(
            st.integers(min_value=0, max_value=1000),
            min_size=1,
            max_size=CUSUM_WARM + 30,
        ),
        data=st.data(),
    )
    def run(xs, data):
        n = len(xs)
        cuts = sorted(
            data.draw(st.lists(st.integers(min_value=0, max_value=n), max_size=4))
        )
        bounds = [0, *cuts, n]
        state, out = CUSUM_STATE_ZERO, []
        for lo, hi in zip(bounds, bounds[1:]):
            state, o = cusum_update(state, xs[lo:hi])
            out.extend(o)
        _, whole = cusum_update(CUSUM_STATE_ZERO, xs)
        assert out == whole

    run()


def test_sprt_online_update_is_chunking_invariant():
    """sprt_update must produce the identical (llr, status) sequence
    under any chunking — including splits around the decision hour."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigdata_2025_1_spark.operators.timeseries_ops import (
        SPRT_STATE_ZERO,
        sprt_update,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        obs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),
                st.integers(min_value=0, max_value=50),
            ).map(lambda t: (max(t), min(t))),  # k >= e always
            min_size=1,
            max_size=40,
        ),
        data=st.data(),
    )
    def run(obs, data):
        n = len(obs)
        cuts = sorted(
            data.draw(st.lists(st.integers(min_value=0, max_value=n), max_size=4))
        )
        bounds = [0, *cuts, n]
        state, out = SPRT_STATE_ZERO, []
        for lo, hi in zip(bounds, bounds[1:]):
            state, o = sprt_update(state, obs[lo:hi])
            out.extend(o)
        _, whole = sprt_update(SPRT_STATE_ZERO, obs)
        assert out == whole

    run()
