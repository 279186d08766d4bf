"""Scalar plain-Python references for the round-10 additions — the
mirrored-formula blind-spot guard (cross-engine-numeric trap #3): the
DuckDB oracle proves Spark and DuckDB agree, not that either computes
the intended statistic; only a hand walk does.

BPE-derived quantities reuse the scalar trainer from test_bpe_encode
(itself hand-checked against the Sennrich convention).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from bigdata_2025_1_spark.registry import all_queries
from tests.test_bpe_encode import scalar_bpe

from bigdata_2025_1_spark.operators.corpus_ops import BPE_MERGES
from bigdata_2025_1_spark.operators.text_analysis import FERT_SCALE


def _write_docs_bigint(spark, tmp_path, texts: dict[int, str]) -> str:
    df = spark.createDataFrame(
        [(d, t, "en", "crafted", len(t)) for d, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _md5_parity(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) % 2


def _scalar_fertility(texts: dict[int, str]) -> list[tuple[int, bool]]:
    """(quantized fertility v, in_snapshot_a) per doc with >=1 word,
    via the scalar BPE trainer + the documented trunc quantization."""
    _, segs = scalar_bpe(list(texts.values()), BPE_MERGES)
    out = []
    for did, t in texts.items():
        ws = [w for w in t.lower().split() if w]
        n_bpe = sum(len(segs[w]) for w in ws)
        n_chars = sum(len(w) for w in ws)
        if n_bpe <= 0:
            continue
        out.append((n_chars * FERT_SCALE // n_bpe, _md5_parity(did) == 0))
    return out


def _scalar_mannwhitney(vals: list[tuple[int, bool]]):
    """Midrank U + tie-corrected z, the textbook walk (integer ranks via
    the doubled-midrank identity, ties from the value histogram)."""
    n = len(vals)
    n1 = sum(1 for _, a in vals if a)
    n2 = n - n1
    cnt = Counter(v for v, _ in vals)
    r1x2 = cb = tsum = 0
    for v in sorted(cnt):
        ct = cnt[v]
        c1 = sum(1 for x, a in vals if x == v and a)
        r1x2 += c1 * (2 * cb + ct + 1)
        tsum += ct**3 - ct
        cb += ct
    if n1 == 0 or n2 == 0:
        return n1, n2, None, None
    u1 = (r1x2 - n1 * (n1 + 1)) / 2
    if tsum >= n**3 - n:
        return n1, n2, u1, None
    var = n1 * n2 / 12 * ((n + 1) - tsum / (n * (n - 1)))
    z = round((u1 - n1 * n2 / 2) / math.sqrt(var), 9)
    return n1, n2, u1, z


# Mixed parities (A: 2,3,5; B: 0,1,4), repeated-pair words so BPE merges
# actually fire, plus a deliberate fertility tie across snapshots.
MW_TEXTS = {
    0: "banana band bandana",
    1: "ana ana banana anna",
    2: "xy xy zw zw banana",
    3: "a b c a",
    4: "banana anna band",
    5: "bandana banana xy",
}


def test_mannwhitney_fertility_matches_scalar(spark, tmp_path):
    sf = _write_docs_bigint(spark, tmp_path, MW_TEXTS)
    n1, n2, u1, z = _scalar_mannwhitney(_scalar_fertility(MW_TEXTS))
    assert n1 > 0 and n2 > 0 and z is not None  # the fixture must exercise
    # the full path — both snapshots populated, ties present, z defined
    row = all_queries()["mannwhitney_fertility_drift"](
        spark, sf
    ).collect()[0]
    assert (row.n_a, row.n_b) == (n1, n2)
    assert row.u_a == u1
    assert row.z_score == pytest.approx(z, abs=1e-9)
    spark.catalog.clearCache()


def test_mannwhitney_fertility_all_tied_is_null(spark, tmp_path):
    """Single-char words only: every word encodes to one symbol, every
    doc's fertility is exactly FERT_SCALE — U defined, z NULL (no
    variance), via the identical guards in both engines."""
    texts = {0: "a b c", 1: "b a", 2: "c c a", 3: "a"}
    sf = _write_docs_bigint(spark, tmp_path, texts)
    n1, n2, u1, z = _scalar_mannwhitney(_scalar_fertility(texts))
    assert z is None and u1 is not None
    row = all_queries()["mannwhitney_fertility_drift"](
        spark, sf
    ).collect()[0]
    assert (row.n_a, row.n_b, row.u_a, row.z_score) == (n1, n2, u1, None)
    spark.catalog.clearCache()


def test_mannwhitney_fertility_one_empty_snapshot_is_null(spark, tmp_path):
    """doc_ids 0,1,4 all hash to snapshot B — an empty side must NULL
    both U and z (not divide by zero under ANSI)."""
    texts = {0: "banana band", 1: "ana banana", 4: "band banana"}
    assert all(_md5_parity(d) == 1 for d in texts)
    sf = _write_docs_bigint(spark, tmp_path, texts)
    row = all_queries()["mannwhitney_fertility_drift"](
        spark, sf
    ).collect()[0]
    assert (row.n_a, row.n_b, row.u_a, row.z_score) == (0, 3, None, None)
    spark.catalog.clearCache()


def _scalar_ks(lengths: dict[int, int]):
    """Textbook two-sample KS over (doc_id -> n_chars): exact max-gap
    numerator via cross-multiplied CDF counts, then D / lambda /
    reject at the Smirnov 0.05 critical coefficient."""
    a = sorted(v for d, v in lengths.items() if _md5_parity(d) == 0)
    b = sorted(v for d, v in lengths.items() if _md5_parity(d) == 1)
    n1, n2 = len(a), len(b)
    d_num = 0
    for v in sorted(set(a) | set(b)):
        f1 = sum(1 for x in a if x <= v)
        f2 = sum(1 for x in b if x <= v)
        d_num = max(d_num, abs(f1 * n2 - f2 * n1))
    if n1 == 0 or n2 == 0:
        return n1, n2, d_num, None, None, None
    d = d_num / (n1 * n2)
    lam = round(d * math.sqrt(n1 * n2 / (n1 + n2)), 9)
    rej = d > 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    return n1, n2, d_num, d, lam, rej


def test_ks_doclen_matches_scalar(spark, tmp_path):
    """Snapshot A (ids 2,3,5) long docs, snapshot B (ids 0,1,4) short —
    a real location shift plus a shared length so the CDFs cross at a
    tie point."""
    texts = {
        0: "ab",
        1: "abcd",
        2: "abcdefghij",
        3: "abcdefghijklmnop",
        4: "abcd",
        5: "abcdefghijkl",
    }
    sf = _write_docs_bigint(spark, tmp_path, texts)
    want = _scalar_ks({d: len(t) for d, t in texts.items()})
    row = all_queries()["ks_doclen_drift"](spark, sf).collect()[0]
    got = (row.n_a, row.n_b, row.d_num, row.d_stat, row.ks_lambda, row.reject_05)
    assert got[:4] == want[:4]
    assert got[4] == pytest.approx(want[4], abs=1e-9)
    assert got[5] == want[5]
    spark.catalog.clearCache()


def test_ks_doclen_identical_distributions_is_zero(spark, tmp_path):
    """Both snapshots drawing the same single length: D = 0 exactly and
    the rejection is FALSE (not NULL — both sides populated)."""
    texts = {0: "xxxx", 1: "yyyy", 2: "zzzz", 3: "wwww"}
    sf = _write_docs_bigint(spark, tmp_path, texts)
    row = all_queries()["ks_doclen_drift"](spark, sf).collect()[0]
    assert (row.d_num, row.d_stat, row.reject_05) == (0, 0.0, False)
    assert row.n_a > 0 and row.n_b > 0
    spark.catalog.clearCache()


def test_ks_doclen_one_empty_snapshot_is_null(spark, tmp_path):
    texts = {0: "ab", 1: "abcd", 4: "abcdef"}  # all parity-1 -> B only
    sf = _write_docs_bigint(spark, tmp_path, texts)
    row = all_queries()["ks_doclen_drift"](spark, sf).collect()[0]
    assert (row.n_a, row.n_b) == (0, 3)
    assert (row.d_stat, row.ks_lambda, row.reject_05) == (None, None, None)
    spark.catalog.clearCache()


def test_cusum_online_matches_textbook(spark, tmp_path):
    """Hand-walked one-sided CUSUM: a warm-up whose total divides evenly
    (mu exact), a quiet stretch (statistic pinned at 0 by the clamp), a
    burst that must cross h and alarm, then decay. The textbook
    max(0, S + x - mu - k) walk runs in plain floats on the exact mu and
    must equal the engine's scaled-integer replay."""
    from tests.test_r9_scalar_refs import _write_events

    from bigdata_2025_1_spark.operators.timeseries_ops import (
        CUSUM_H,
        CUSUM_SLACK,
        CUSUM_WARM,
    )

    counts = [5] * CUSUM_WARM + [5, 4, 16, 16, 16, 16, 16, 2, 2, 2]
    sf = _write_events(spark, tmp_path, counts)
    mu = sum(counts[:CUSUM_WARM]) / CUSUM_WARM
    assert mu == int(mu)  # the fixture keeps mu exact on purpose
    s = 0.0
    want = []
    for x in counts[CUSUM_WARM:]:
        s = max(0.0, s + x - mu - CUSUM_SLACK)
        want.append((int(s * CUSUM_WARM), s > CUSUM_H))
    got = [
        (r.cusum_scaled, r.alarm)
        for r in all_queries()["cusum_online_hourly"](
            spark, sf
        ).collect()
    ]
    assert got == want
    assert any(a for _, a in want) and not all(a for _, a in want)
    spark.catalog.clearCache()


def test_cusum_online_short_series_is_empty(spark, tmp_path):
    """A series no longer than the warm-up emits nothing (the detector
    is still calibrating) — identical guards in both engines."""
    from tests.test_r9_scalar_refs import _write_events

    from bigdata_2025_1_spark.operators.timeseries_ops import CUSUM_WARM

    sf = _write_events(spark, tmp_path, [3] * CUSUM_WARM)
    assert all_queries()["cusum_online_hourly"](spark, sf).count() == 0
    spark.catalog.clearCache()


def _write_orders_monthly(spark, tmp_path, cents: dict[int, int]) -> str:
    """One order per month index m with totalprice = cents/100 (1992-01
    epoch, the _MONTH_IDX_SQL convention)."""
    import datetime

    rows = [
        (
            i,
            datetime.date(1992 + m // 12, m % 12 + 1, 15),
            c / 100.0,
        )
        for i, (m, c) in enumerate(sorted(cents.items()))
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def _scalar_decompose(ys: list[int], period: int):
    """Textbook additive decomposition with the 2xM centered MA, all in
    the engine's integer scaling (t24/d24/s24, trunc division)."""
    n = len(ys)
    half = period // 2
    out = []
    t24 = {}
    for t in range(half, n - half):
        t24[t] = ys[t - half] + 2 * sum(ys[t - half + 1 : t + half]) + ys[t + half]
    d24 = {t: 2 * period * ys[t] - v for t, v in t24.items()}
    slots: dict[int, list[int]] = {}
    for t, v in d24.items():
        slots.setdefault(t % period, []).append(v)

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    s_raw = {sl: tdiv(sum(vs), len(vs)) for sl, vs in slots.items()}
    s_mean = tdiv(sum(s_raw.values()), period)
    s24 = {sl: v - s_mean for sl, v in s_raw.items()}
    for t in sorted(t24):
        out.append((t, ys[t], t24[t], s24[t % period], d24[t] - s24[t % period]))
    return out


def test_seasonal_decompose_matches_scalar(spark, tmp_path):
    """Trend + seasonal + noise series, hand-decomposed: the engine's
    integer t24/s24/remainder columns must match the scalar walk
    exactly, and trend + seasonal + remainder must rebuild 24*y."""
    from bigdata_2025_1_spark.operators.timeseries_ops import SD_PERIOD

    rng = [(37 * t * t) % 500 for t in range(30)]  # deterministic "noise"
    ys = [
        100_000 + 2_000 * t + [0, 5_000, -3_000, 8_000][t % 4] * 3 + rng[t]
        for t in range(30)
    ]
    cents = {t: ys[t] for t in range(30)}
    sf = _write_orders_monthly(spark, tmp_path, cents)
    want = _scalar_decompose(ys, SD_PERIOD)
    rows = all_queries()["seasonal_decompose_monthly"](spark, sf).collect()
    got = [
        (r.m, r.y_cents, r.trend_i24, r.seasonal_i24, r.remainder_i24)
        for r in rows
    ]
    assert got == want
    for r in rows:
        assert r.trend_i24 + r.seasonal_i24 + r.remainder_i24 == 24 * r.y_cents
        assert r.trend == pytest.approx(r.trend_i24 / 24, abs=1e-6)
    spark.catalog.clearCache()


def test_seasonal_decompose_short_series_is_empty(spark, tmp_path):
    """No month has a full centered window below period+1 points."""
    from bigdata_2025_1_spark.operators.timeseries_ops import SD_PERIOD

    cents = {t: 100_000 + t for t in range(SD_PERIOD)}
    sf = _write_orders_monthly(spark, tmp_path, cents)
    assert all_queries()["seasonal_decompose_monthly"](spark, sf).count() == 0
    spark.catalog.clearCache()


def _write_events_typed(spark, tmp_path, hourly: list[tuple[int, int]]) -> str:
    """hourly = [(n_events, n_errors), ...] per consecutive hour."""
    import datetime

    rows = []
    for h, (k, e) in enumerate(hourly):
        for j in range(k):
            rows.append(
                (
                    f"e{h}_{j}",
                    j + 1,
                    "error" if j < e else "click",
                    1.0,
                    datetime.datetime(2026, 1, 1) + datetime.timedelta(
                        hours=h, minutes=j % 60
                    ),
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id string, user_id long, event_type string,"
        " value double, ts timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_sprt_matches_textbook_and_freezes_on_reject(spark, tmp_path):
    """High error rate: the LLR climbs monotonically, crosses ln(19)
    and the verdict freezes at reject_h0 while the LLR keeps
    accumulating — walked by hand with the same integer literals."""
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        SPRT_A_I6,
        SPRT_B_I6,
        SPRT_L0_I6,
        SPRT_L1_I6,
    )

    hourly = [(10, 5)] * 8  # 50% errors >> p1
    sf = _write_events_typed(spark, tmp_path, hourly)
    llr, decision, want = 0, None, []
    for k, e in hourly:
        llr += e * SPRT_L1_I6 + (k - e) * SPRT_L0_I6
        if decision is None:
            if llr >= SPRT_A_I6:
                decision = "reject_h0"
            elif llr <= SPRT_B_I6:
                decision = "accept_h0"
        want.append((k, e, llr, decision or "continue"))
    got = [
        (r.n_events, r.n_errors, r.llr_i6, r.status)
        for r in all_queries()["sprt_error_rate"](spark, str(tmp_path)).collect()
    ]
    assert got == want
    assert want[-1][3] == "reject_h0" and want[0][3] == "continue"
    spark.catalog.clearCache()


def test_sprt_accepts_h0_on_clean_stream_and_stays_frozen(spark, tmp_path):
    """Near-zero error rate: the LLR dives, crosses -ln(19), verdict
    freezes at accept_h0 — even when a later hour is all errors (the
    stopping rule: no verdict flip after the decision)."""
    hourly = [(20, 0)] * 6 + [(10, 10)] * 2
    sf = _write_events_typed(spark, tmp_path, hourly)
    rows = all_queries()["sprt_error_rate"](spark, str(tmp_path)).collect()
    assert rows[5].status == "accept_h0"
    assert rows[-1].status == "accept_h0"  # frozen despite the error burst
    assert rows[-1].llr_i6 > rows[5].llr_i6  # LLR itself keeps moving
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# lsh_recall_eval — scalar twin: brute-force truth (NO prefix filter, so the
# engine's prefix-filter completeness is itself under test) + a plain-Python
# MinHash/banding replica of functions/text.py's minhash_signature spec.
# ---------------------------------------------------------------------------


def _sh3(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < 3:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)))


def _scalar_minhash(shingles: list[str], nh: int = 8) -> list[str]:
    sig = []
    hexes = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
    for i in range(nh):
        sig.append(min(h[i:] + h[:i] for h in hexes))
    return sig


def _scalar_lsh_eval(texts: dict[int, str], thr: float = 0.8):
    """(truth, candidates, verified) pair sets — truth by brute force."""
    nz = {d: set(_sh3(t)) for d, t in texts.items() if _sh3(t)}
    ids = sorted(nz)

    def jac(a, b):
        return len(nz[a] & nz[b]) / len(nz[a] | nz[b])

    truth = {
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :] if jac(a, b) >= thr
    }
    buckets: dict[tuple[int, str], list[int]] = {}
    for d in ids:
        sig = _scalar_minhash(sorted(nz[d]))
        for band in range(2):
            key = hashlib.md5("".join(sig[band * 4 : band * 4 + 4]).encode()).hexdigest()
            buckets.setdefault((band, key), []).append(d)
    cand = {
        (a, b)
        for ds in buckets.values()
        for i, a in enumerate(sorted(ds))
        for b in sorted(ds)[i + 1 :]
    }
    verified = {p for p in cand if jac(*p) >= thr}
    return truth, cand, verified


_LSH_EVAL_TEXTS = {
    1: "the quick brown fox jumps over the lazy dog today",
    2: "the quick brown fox jumps over the lazy dog today",  # exact dup of 1
    3: "the quick brown fox jumps over the lazy dog tonight",  # near dup of 1
    4: "the quick brown fox jumps over a lazy dog today",  # mid-edit of 1
    5: "completely unrelated text about spark dataframes and shuffles here",
    6: "too short",  # < 3 tokens -> zero shingles, excluded everywhere
    7: "pack my box with five dozen liquor jugs right now please friend",
}


def test_lsh_recall_eval_matches_scalar(spark, tmp_path):
    """Counts, recall, candidate precision, and the gate must equal the
    brute-force + scalar-MinHash walk exactly (the truth side doubles as
    a completeness check of the engine's prefix filter)."""
    sf = _write_docs_bigint(spark, tmp_path, _LSH_EVAL_TEXTS)
    truth, cand, verified = _scalar_lsh_eval(_LSH_EVAL_TEXTS)
    assert truth, "fixture must contain at least one true pair"
    [r] = all_queries()["lsh_recall_eval"](spark, sf).collect()
    assert r.n_true_pairs == len(truth)
    assert r.n_lsh_candidates == len(cand)
    assert r.n_lsh_pairs == len(verified)
    assert r.recall == len(verified) / len(truth)
    assert r.candidate_precision == len(verified) / len(cand)
    assert r.lsh_ok == (len(verified) / len(truth) >= 0.6)
    spark.catalog.clearCache()


def test_lsh_recall_eval_no_true_pairs_is_null_verdict(spark, tmp_path):
    """A corpus with no >=0.8 pair: zero truth, NULL recall, NULL gate
    (no-decision), and precision defined only by what the bands said."""
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "one two three four five six seven eight nine ten eleven",
        3: "red orange yellow green blue indigo violet pink brown black",
    }
    sf = _write_docs_bigint(spark, tmp_path, texts)
    truth, cand, verified = _scalar_lsh_eval(texts)
    assert not truth and not verified
    [r] = all_queries()["lsh_recall_eval"](spark, sf).collect()
    assert r.n_true_pairs == 0
    assert r.n_lsh_candidates == len(cand)
    assert r.n_lsh_pairs == 0
    assert r.recall is None and r.lsh_ok is None
    assert (r.candidate_precision is None) == (len(cand) == 0)
    spark.catalog.clearCache()


def test_lsh_recall_eval_reconciles_with_standalone_lsh(spark, sf_dir):
    """Suite-composition contract: n_lsh_pairs IS dedup_minhash_lsh's
    row count on the same corpus, and recall <= 1 structurally (the
    verified pairs are a subset of the exact-truth pairs)."""
    [r] = all_queries()["lsh_recall_eval"](spark, sf_dir).collect()
    standalone = all_queries()["dedup_minhash_lsh"](spark, sf_dir).count()
    assert r.n_lsh_pairs == standalone
    assert r.n_true_pairs >= r.n_lsh_pairs
    if r.recall is not None:
        assert 0.0 <= r.recall <= 1.0
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# ab_power_mde — scalar twin: hand-walked md5 split, pooled rate, MDE and
# required-n algebra with math.sqrt/ceil over the identical double chain.
# ---------------------------------------------------------------------------


def _ab_variant(uid: int) -> int:
    return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:12], 16) % 2


def _write_ab_events(spark, tmp_path, rows) -> str:
    """rows = [(user_id, hour, event_type), ...] on 2026-01-01."""
    import datetime

    data = [
        (f"e{i}", uid, et, 1.0, datetime.datetime(2026, 1, 1, h))
        for i, (uid, h, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id string, user_id long, event_type string,"
        " value double, ts timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_ab_power_mde_matches_scalar(spark, tmp_path):
    """Counts, pooled rate, SE, MDE, required n, and the power gate must
    equal the plain-Python walk bit-for-bit (same literal z-sum, same
    operation order, math.sqrt/math.ceil)."""
    from bigdata_2025_1_spark.operators.events_ops import AB_TARGET_MDE, AB_Z_SUM

    # (uid, hour, event_type): several user-hours per arm, some purchases;
    # a purchase and a click in the same user-hour is ONE converted unit.
    rows = [
        (1, 0, "click"), (1, 0, "purchase"), (1, 1, "click"),
        (2, 0, "purchase"), (2, 2, "click"),
        (3, 0, "click"), (3, 1, "click"),
        (4, 0, "purchase"), (4, 1, "click"), (4, 1, "purchase"),
        (5, 0, "click"), (6, 0, "click"), (6, 3, "purchase"),
        (7, 0, "click"), (8, 0, "purchase"), (9, 0, "click"), (10, 0, "click"),
    ]
    sf = _write_ab_events(spark, tmp_path, rows)
    units = {}
    for uid, h, et in rows:
        units[(uid, h)] = max(units.get((uid, h), 0), 1 if et == "purchase" else 0)
    arms = {0: [0, 0], 1: [0, 0]}  # variant -> [n, conv]
    for (uid, _h), conv in units.items():
        arms[_ab_variant(uid)][0] += 1
        arms[_ab_variant(uid)][1] += conv
    (n_a, conv_a), (n_b, conv_b) = arms[0], arms[1]
    assert n_a > 0 and n_b > 0, "fixture must populate both arms"
    zs, tgt = float(AB_Z_SUM), float(AB_TARGET_MDE)
    pooled = (conv_a + conv_b) / (n_a + n_b)
    se = math.sqrt(pooled * (1 - pooled) * (1.0 / n_a + 1.0 / n_b))
    mde = zs * se
    n_req = math.ceil(2.0 * pooled * (1 - pooled) * (zs * zs) / (tgt * tgt))
    [r] = all_queries()["ab_power_mde"](spark, sf).collect()
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n_a, conv_a, n_b, conv_b)
    assert r.pooled_p == pooled
    assert r.se_pooled == se
    assert r.mde_abs == mde
    assert r.mde_rel == mde / pooled
    assert r.n_per_arm_required == n_req
    assert r.powered_for_target == (mde <= tgt)
    spark.catalog.clearCache()


def test_ab_power_mde_one_armed_feed_is_all_null_design(spark, tmp_path):
    """Every unit hashing into one arm: the other arm's n is NULL, so
    SE/MDE/required-n are NULL (no design readout from a one-armed
    test) while the populated arm's counts stay real."""
    uid = next(u for u in range(1, 50) if _ab_variant(u) == 0)
    sf = _write_ab_events(spark, tmp_path, [(uid, 0, "click"), (uid, 1, "purchase")])
    [r] = all_queries()["ab_power_mde"](spark, sf).collect()
    assert (r.n_a, r.conv_a) == (2, 1)
    assert r.n_b is None and r.conv_b is None
    assert r.se_pooled is None and r.mde_abs is None and r.mde_rel is None
    assert r.n_per_arm_required is None and r.powered_for_target is None
    spark.catalog.clearCache()


def test_ab_power_mde_reconciles_with_ab_test_uplift(spark, sf_dir):
    """Suite contract: the design readout and the uplift readout must
    see the SAME experiment — identical per-arm unit and conversion
    counts from the shared split."""
    [d] = all_queries()["ab_power_mde"](spark, sf_dir).collect()
    [u] = all_queries()["ab_test_uplift"](spark, sf_dir).collect()
    assert (d.n_a, d.conv_a, d.n_b, d.conv_b) == (u.n_a, u.conv_a, u.n_b, u.conv_b)
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# theil_u_forecast_skill — scalar twin: the Holt recurrence hand-walk (same
# trunc division), the naive lag, and the integer-ppm U2 algebra.
# ---------------------------------------------------------------------------


def _scalar_theil(cents: dict[int, int]):
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        HOLT_A_NUM,
        HOLT_B_NUM,
        HOLT_DEN,
        THEIL_PPM,
    )

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    ms = sorted(cents)
    ys = [cents[m] for m in ms]
    rows = []  # (y, yhat_holt, yhat_naive) for row-index t >= 1
    if len(ys) >= 2:
        lvl, tr = ys[0], ys[1] - ys[0]
        for t in range(1, len(ys)):
            rows.append((ys[t], lvl + tr, ys[t - 1]))
            ln = tdiv(HOLT_A_NUM * ys[t] + (HOLT_DEN - HOLT_A_NUM) * (lvl + tr), HOLT_DEN)
            tr = tdiv(HOLT_B_NUM * (ln - lvl) + (HOLT_DEN - HOLT_B_NUM) * tr, HOLT_DEN)
            lvl = ln
    n = len(rows)
    mae_h = sum(abs(f - y) for y, f, _ in rows)
    mae_n = sum(abs(p - y) for y, _, p in rows)
    sse_h = sum((f - y) ** 2 for y, f, _ in rows)
    sse_n = sum((p - y) ** 2 for y, _, p in rows)
    if sse_n > 0:
        ppm = sse_h * THEIL_PPM // sse_n
        return n, mae_h, mae_n, ppm, math.sqrt(ppm / float(THEIL_PPM)), ppm < THEIL_PPM
    return n, mae_h or None, mae_n or None, None, None, None


def test_theil_u_matches_scalar(spark, tmp_path):
    """A noisy trend series: every count, MAE mass, the integer ppm
    ratio, the sqrt, and the verdict must equal the hand walk."""
    cents = {0: 10000, 1: 12000, 2: 13000, 3: 12500, 4: 14000,
             5: 15500, 7: 14800, 8: 17000}  # month 6 missing: row-lag, not calendar-lag
    sf = _write_orders_monthly(spark, tmp_path, cents)
    n, mae_h, mae_n, ppm, u2, beats = _scalar_theil(cents)
    [r] = all_queries()["theil_u_forecast_skill"](spark, sf).collect()
    assert r.n_eval_months == n
    assert r.mae_holt_sum_cents == mae_h
    assert r.mae_naive_sum_cents == mae_n
    assert r.u2_sq_ppm == ppm
    assert r.theil_u2 == u2
    assert r.holt_beats_naive == beats
    spark.catalog.clearCache()


def test_theil_u_constant_series_is_null_verdict(spark, tmp_path):
    """Constant revenue: the naive walk is perfect (sse_n = 0) — the
    ratio and verdict must be NULL (no skill measurable), counts real."""
    sf = _write_orders_monthly(spark, tmp_path, {m: 5000 for m in range(6)})
    [r] = all_queries()["theil_u_forecast_skill"](spark, sf).collect()
    assert r.n_eval_months == 5
    assert r.mae_holt_sum_cents == 0 and r.mae_naive_sum_cents == 0
    assert r.u2_sq_ppm is None and r.theil_u2 is None
    assert r.holt_beats_naive is None
    spark.catalog.clearCache()


def test_theil_u_single_month_is_empty_eval(spark, tmp_path):
    """One observed month: Holt emits no fits, the join is empty, and
    the scorecard is the all-NULL zero-count row."""
    sf = _write_orders_monthly(spark, tmp_path, {0: 10000})
    [r] = all_queries()["theil_u_forecast_skill"](spark, sf).collect()
    assert r.n_eval_months == 0
    assert r.mae_holt_sum_cents is None and r.u2_sq_ppm is None
    spark.catalog.clearCache()


def test_theil_u_reconciles_with_holt_fits(spark, sf_dir):
    """Composition contract: the eval sees exactly the registered Holt
    query's fit rows — n_eval_months equals the fit count."""
    n_fits = (
        all_queries()["holt_linear_forecast"](spark, sf_dir)
        .filter("kind = 'fit'")
        .count()
    )
    [r] = all_queries()["theil_u_forecast_skill"](spark, sf_dir).collect()
    assert r.n_eval_months == n_fits
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# split_balance_chi2 — scalar twin: the multiplicative split, the full
# contingency grid, and the i6-rounded contribution walk in plain Python.
# ---------------------------------------------------------------------------


def _write_docs_sourced(spark, tmp_path, docs: list[tuple[int, str]]) -> str:
    df = spark.createDataFrame(
        [(d, f"text of {d}", "en", src, 10) for d, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _scalar_split_chi2(docs: list[tuple[int, str]]):
    from bigdata_2025_1_spark.operators.pipeline_ops import _SPLIT_PRIME

    def split_of(d):
        b = (d * _SPLIT_PRIME) % 100
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    obs: dict[tuple[str, str], int] = {}
    for d, src in docs:
        k = (split_of(d), src)
        obs[k] = obs.get(k, 0) + 1
    sps = sorted({s for s, _ in obs})
    sos = sorted({s for _, s in obs})
    grid = {(p, s): obs.get((p, s), 0) for p in sps for s in sos}
    r = {p: sum(grid[(p, s)] for s in sos) for p in sps}
    c = {s: sum(grid[(p, s)] for p in sps) for s in sos}
    n = sum(grid.values())
    rows = {}
    chi2_i6 = 0
    for (p, s), o in grid.items():
        dd = o * n - r[p] * c[s]
        contrib_i6 = int(math.floor(float(dd) * dd / n / r[p] / c[s] * 1e6 + 0.5))
        chi2_i6 += contrib_i6
        rows[(p, s)] = (o, r[p] * 1.0 * c[s] / n, contrib_i6 / 1e6)
    dof = (len(sps) - 1) * (len(sos) - 1)
    return rows, chi2_i6 / 1e6, dof


def test_split_balance_chi2_matches_scalar(spark, tmp_path):
    """Two sources, ids chosen so all three splits appear: every cell's
    observed/expected/contribution plus chi2 and dof equal the walk."""
    from bigdata_2025_1_spark.operators.pipeline_ops import _SPLIT_PRIME

    by_split = {"train": [], "valid": [], "test": []}
    for d in range(1, 400):
        b = (d * _SPLIT_PRIME) % 100
        by_split["train" if b < 80 else ("valid" if b < 90 else "test")].append(d)
    docs = []
    for i, sp in enumerate(("train", "valid", "test")):
        ids = by_split[sp][: 6 + i]
        assert len(ids) == 6 + i, "need enough ids per split in range"
        docs += [(d, "web" if j % 3 else "books") for j, d in enumerate(ids)]
    sf = _write_docs_sourced(spark, tmp_path, docs)
    rows, chi2, dof = _scalar_split_chi2(docs)
    got = all_queries()["split_balance_chi2"](spark, sf).collect()
    assert len(got) == len(rows) == 6
    for g in got:
        o, exp, contrib = rows[(g.split, g.source)]
        assert g.observed == o
        assert g.expected == exp
        assert g.contrib == contrib
        assert g.chi2 == chi2
        assert g.dof == dof
    spark.catalog.clearCache()


def test_split_balance_chi2_single_source_is_zero(spark, tmp_path):
    """One source: every deviation is structurally zero — chi2 0, dof 0."""
    sf = _write_docs_sourced(spark, tmp_path, [(d, "web") for d in range(1, 40)])
    got = all_queries()["split_balance_chi2"](spark, sf).collect()
    assert got and all(g.chi2 == 0.0 and g.dof == 0 and g.contrib == 0.0 for g in got)
    spark.catalog.clearCache()


def test_split_balance_chi2_reconciles_with_split(spark, sf_dir):
    """Composition contract: per-split observed totals are exactly
    train_test_split's n_docs."""
    from collections import defaultdict

    totals = defaultdict(int)
    for g in all_queries()["split_balance_chi2"](spark, sf_dir).collect():
        totals[g.split] += g.observed
    expect = {
        r.split: r.n_docs
        for r in all_queries()["train_test_split"](spark, sf_dir).collect()
    }
    assert dict(totals) == expect
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# residual_runs_test — scalar twin: Holt residual signs, run counting, and
# the Wald-Wolfowitz normal approximation walked in plain Python.
# ---------------------------------------------------------------------------


def _scalar_runs(cents: dict[int, int]):
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        HOLT_A_NUM,
        HOLT_B_NUM,
        HOLT_DEN,
        RUNS_Z_CRIT,
    )

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    ms = sorted(cents)
    ys = [cents[m] for m in ms]
    errs = []
    if len(ys) >= 2:
        lvl, tr = ys[0], ys[1] - ys[0]
        for t in range(1, len(ys)):
            errs.append((lvl + tr) - ys[t])
            ln = tdiv(HOLT_A_NUM * ys[t] + (HOLT_DEN - HOLT_A_NUM) * (lvl + tr), HOLT_DEN)
            tr = tdiv(HOLT_B_NUM * (ln - lvl) + (HOLT_DEN - HOLT_B_NUM) * tr, HOLT_DEN)
            lvl = ln
    signs = [e > 0 for e in errs if e != 0]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = sum(
        1 for i, sg in enumerate(signs) if i == 0 or sg != signs[i - 1]
    )
    if n1 > 0 and n2 > 0:
        n = n1 + n2
        mu = 2.0 * n1 * n2 / n + 1
        var = 2.0 * n1 * n2 * (2 * n1 * n2 - n) / n / n / (n - 1)
        if var > 0:
            z = (runs - mu) / math.sqrt(var)
            return n1, n2, runs, mu, z, abs(z) < float(RUNS_Z_CRIT)
        return n1, n2, runs, mu, None, None
    return n1, n2, runs, None, None, None


def test_residual_runs_matches_scalar(spark, tmp_path):
    """A series whose Holt residuals mix signs AND contain an exact
    zero (month 1's fit is exact, so the zero-drop rule is exercised):
    counts, the expected-runs mean, z, and the verdict equal the walk."""
    cents = {0: 17100, 1: 18000, 2: 19700, 3: 13400, 4: 13000,
             5: 17300, 6: 18200, 7: 15300, 8: 13600, 9: 19900}
    n1, n2, runs, mu, z, verdict = _scalar_runs(cents)
    assert n1 > 0 and n2 > 0, "fixture must produce both residual signs"
    sf = _write_orders_monthly(spark, tmp_path, cents)
    [r] = all_queries()["residual_runs_test"](spark, sf).collect()
    assert (r.n_pos, r.n_neg, r.n_runs) == (n1, n2, runs)
    assert r.expected_runs == mu
    assert r.z_score == z
    assert r.residuals_random == verdict
    spark.catalog.clearCache()


def test_residual_runs_one_sided_signs_is_null(spark, tmp_path):
    """A series whose Holt residuals never change sign: counts real,
    no mean/z/verdict (the statistic is undefined one-sided)."""
    cents = {m: 10000 + 1000 * m for m in range(8)}
    n1, n2, runs, mu, z, verdict = _scalar_runs(cents)
    assert n1 == 0 or n2 == 0
    sf = _write_orders_monthly(spark, tmp_path, cents)
    [r] = all_queries()["residual_runs_test"](spark, sf).collect()
    assert (r.n_pos, r.n_neg, r.n_runs) == (n1, n2, runs)
    assert r.expected_runs is None and r.z_score is None
    assert r.residuals_random is None
    spark.catalog.clearCache()


def test_residual_runs_perfect_fit_is_zero_counts(spark, tmp_path):
    """An exact linear series: Holt reproduces it exactly (integer
    states, zero residuals dropped), so every count is zero and the
    test is a NULL no-decision."""
    cents = {m: 10000 + 500 * m for m in range(6)}
    n1, n2, runs, *_ = _scalar_runs(cents)
    sf = _write_orders_monthly(spark, tmp_path, cents)
    [r] = all_queries()["residual_runs_test"](spark, sf).collect()
    assert (r.n_pos, r.n_neg, r.n_runs) == (n1, n2, runs)
    if n1 == 0 and n2 == 0:
        assert r.n_runs == 0
    assert r.z_score is None
    spark.catalog.clearCache()
