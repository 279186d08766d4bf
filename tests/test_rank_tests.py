"""Round-7 rank-based tests vs scalar references on the fixture data:
Mann-Whitney U/z, Spearman rho, and the Gini stump must agree with
direct textbook computations done in plain Python."""

from __future__ import annotations

import math

import duckdb

from bigdata_2025_1_spark.operators.statistics import (
    MW_SEG_A,
    MW_SEG_B,
    gini_stump_threshold,
    mann_whitney_segment_spend,
    spearman_qty_price,
)


def _midranks(values):
    """value -> average rank (1-based) with ties."""
    from collections import Counter

    cnt = Counter(values)
    ranks = {}
    below = 0
    for v in sorted(cnt):
        c = cnt[v]
        ranks[v] = below + (c + 1) / 2
        below += c
    return ranks


def test_mann_whitney_matches_scalar_reference(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ROUND(o.o_totalprice * 1e2) AS BIGINT),
               c.c_mktsegment = '{MW_SEG_A}'
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('{MW_SEG_A}', '{MW_SEG_B}')
        """
    ).fetchall()
    vals = [v for v, _ in rows]
    ranks = _midranks(vals)
    r1 = sum(ranks[v] for v, is_a in rows if is_a)
    n1 = sum(1 for _, is_a in rows if is_a)
    n2 = len(rows) - n1
    u1 = r1 - n1 * (n1 + 1) / 2
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(vals).values())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    out = mann_whitney_segment_spend(spark, sf_dir).collect()[0]
    assert (out.n1, out.n2) == (n1, n2)
    assert abs(out.u1 - u1) < 1e-6
    assert abs(out.z_score - z) < 1e-6


def test_spearman_matches_scalar_reference(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ROUND(l_quantity * 1e2) AS BIGINT),
               CAST(ROUND(l_extendedprice * 1e2) AS BIGINT)
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchall()
    rx = _midranks([x for x, _ in rows])
    ry = _midranks([y for _, y in rows])
    xs = [rx[x] for x, _ in rows]
    ys = [ry[y] for _, y in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(sum((a - mx) ** 2 for a in xs)) * math.sqrt(
        sum((b - my) ** 2 for b in ys)
    )
    out = spearman_qty_price(spark, sf_dir).collect()[0]
    assert out.n == n
    assert abs(out.spearman_rho - num / den) < 1e-7


def test_gini_stump_matches_bruteforce(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ROUND(l_extendedprice * 1e2) AS BIGINT),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchall()
    from collections import Counter

    hist = Counter()
    pos = Counter()
    for v, p in rows:
        hist[v] += 1
        pos[v] += p
    ntot = sum(hist.values())
    ptot = sum(pos.values())
    best = None  # (score_i6, -v) max
    nl = pl = 0
    for v in sorted(hist):
        nl += hist[v]
        pl += pos[v]
        nr, pr = ntot - nl, ptot - pl
        if nl == 0 or nr == 0:
            continue
        side = lambda c, m: (c * c + (m - c) * (m - c)) / m  # noqa: E731
        score = round((side(pl, nl) + side(pr, nr)) * 1e6)
        key = (score, -v)
        if best is None or key > best[0]:
            best = (key, v, nl, nr, pl, pr)
    _, v, nl, nr, pl, pr = best
    out = gini_stump_threshold(spark, sf_dir).collect()[0]
    assert out.threshold == v / 100
    assert (out.n_left, out.n_right) == (nl, nr)
    assert (out.pos_left, out.pos_right) == (pl, pr)
    expected_gini = (ntot - best[0][0] / 1e6) / ntot
    assert abs(out.weighted_gini - expected_gini) < 1e-5


def test_kneser_ney_matches_scalar_reference(spark, sf_dir):
    """Top-20 KN bigram probabilities vs an exact-rational scalar
    implementation over the same tokenization."""
    from fractions import Fraction

    from bigdata_2025_1_spark.operators.text_analysis import (
        KN_TOP_K,
        kneser_ney_bigram,
    )

    texts = [
        r.text.lower().split()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    from collections import Counter

    bcnt = Counter()
    for ts in texts:
        if len(ts) >= 2:
            for a, b in zip(ts, ts[1:]):
                bcnt[(a, b)] += 1
    c_a = Counter()
    n1r = Counter()
    n1l = Counter()
    for (a, b), c in bcnt.items():
        c_a[a] += c
        n1r[a] += 1
        n1l[b] += 1
    t = len(bcnt)
    rows = kneser_ney_bigram(spark, sf_dir).collect()
    assert len(rows) == KN_TOP_K
    expected_order = sorted(bcnt.items(), key=lambda kv: (-kv[1], kv[0]))[:KN_TOP_K]
    assert [(r.a, r.b) for r in rows] == [ab for ab, _ in expected_order]
    for r in rows:
        c = bcnt[(r.a, r.b)]
        p = Fraction((4 * c - 3) * t + 3 * n1r[r.a] * n1l[r.b], 4 * c_a[r.a] * t)
        p12 = (p.numerator * 10**12) // p.denominator
        assert r.p_kn == round(p12 / 1e12, 9), (r.a, r.b)
        bow = Fraction(3 * n1r[r.a], 4 * c_a[r.a])
        bow12 = (bow.numerator * 10**12) // bow.denominator
        assert r.backoff_weight == round(bow12 / 1e12, 9)


def test_qini_final_decile_consistency(spark, sf_dir):
    """The last cumulative Qini point must equal the whole-population
    uplift in absolute responders: Pt_tot - Pc_tot * Nt_tot/Nc_tot."""
    from bigdata_2025_1_spark.operators.model_eval import qini_uplift_curve

    rows = qini_uplift_curve(spark, sf_dir).collect()
    nt = sum(r.n_treat for r in rows)
    nc = sum(r.n_ctrl for r in rows)
    # recompute totals of positives from the per-decile uplift rates is
    # lossy; recompute from the fixture instead
    import duckdb as _d

    con = _d.connect()
    pt, pc = con.execute(
        f"""
        SELECT SUM(CASE WHEN (l_orderkey * 506952113) % 2 = 1
                        AND l_returnflag = 'R' THEN 1 ELSE 0 END),
               SUM(CASE WHEN (l_orderkey * 506952113) % 2 = 0
                        AND l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchone()
    expected_final = pt - pc * nt / nc
    # qini is frozen to i6 via floor division of the scaling term
    assert abs(rows[-1].qini - expected_final) < 0.01


def test_woe_iv_sign_identities(spark, sf_dir):
    """IV is a sum of (share-diff * WOE) terms whose factors share sign,
    so IV >= 0; per-bin WOE sign must match the share difference."""
    from bigdata_2025_1_spark.operators.model_eval import woe_information_value

    rows = woe_information_value(spark, sf_dir).collect()
    iv = rows[0].information_value
    assert iv >= 0
    pt = sum(r.n_pos for r in rows)
    qt = sum(r.n_neg for r in rows)
    for r in rows:
        if r.woe is None:
            assert r.n_pos == 0 or r.n_neg == 0
            continue
        dshare = r.n_pos / pt - r.n_neg / qt
        if abs(dshare) > 1e-12 and abs(r.woe) > 1e-9:
            assert (dshare > 0) == (r.woe > 0), (r.bin_value, dshare, r.woe)
