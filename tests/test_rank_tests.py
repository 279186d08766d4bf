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
