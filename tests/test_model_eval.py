"""Model-eval suite: the exact-decimal division primitive vs Python
integers, the rank-sum AUC vs an independent pairwise-counting
reference, and the internal consistency identities of the calibration
and lift tables."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.exact import int_div_exact
from bigdata_2025_1_spark.operators.model_eval import (
    _PRIME,
    I9,
    TRAIN_PCT,
    calibration_ece_bins,
    decile_lift_table,
    roc_auc_holdout,
)


def test_int_div_exact_matches_python_bigints(spark):
    """(num - num % den)/den in decimal(38,0) == Python // far past
    int64 (the range where Spark's own `div` silently wraps)."""
    rng = random.Random(11)
    # construct a = q*d + r with quotients far past int64 but inside the
    # helper's documented 10^32 quotient bound
    cases = []
    for kq in (3, 9, 18, 28):
        for kd in (1, 5, 9):
            for _ in range(3):
                q = rng.randrange(10**kq)
                d = rng.randrange(1, 10**kd)
                cases.append((q * d + rng.randrange(d), d))
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in cases], "a string, b string"
    ).select(
        F.col("a").cast("decimal(38,0)").alias("a"),
        F.col("b").cast("decimal(38,0)").alias("b"),
    )
    out = df.select("a", "b", int_div_exact(F.col("a"), F.col("b")).alias("q"))
    for r in out.collect():
        assert int(r.q) == int(r.a) // int(r.b), (r.a, r.b)


def _holdout_hist_py(sf_dir: str) -> list[tuple[int, int, int]]:
    """Independent (DuckDB-scalar) rebuild of the test-split score
    histogram: [(score_i9, n_pos, n_total)]."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ROUND(l_discount * 1e2) AS BIGINT) AS d,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos,
               (l_orderkey * {_PRIME}) % 100 < {TRAIN_PCT} AS is_train
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchall()
    train: dict[int, list[int]] = {}
    for d, pos, is_train in rows:
        if is_train:
            c = train.setdefault(d, [0, 0])
            c[0] += pos
            c[1] += 1
    pred = {d: (p + 1) * I9 // (n + 2) for d, (p, n) in train.items()}
    hist: dict[int, list[int]] = {}
    for d, pos, is_train in rows:
        if not is_train and d in pred:
            c = hist.setdefault(pred[d], [0, 0])
            c[0] += pos
            c[1] += 1
    return sorted((s, c[0], c[1]) for s, c in hist.items())


def test_roc_auc_matches_pairwise_counting(spark, sf_dir):
    """The rank-sum AUC must equal the direct definition: (wins +
    ties/2) / (n1*n2) counted pairwise over the score histogram — a
    different derivation than the query's Mann-Whitney identity."""
    hist = _holdout_hist_py(sf_dir)
    wins = ties = 0
    neg_below = 0  # negatives with strictly smaller score
    n1 = n2 = 0
    for s, c1, ct in hist:  # ascending score order
        c0 = ct - c1
        wins += c1 * neg_below
        ties += c1 * c0
        neg_below += c0
        n1 += c1
        n2 += c0
    expected = (wins + ties / 2) / (n1 * n2)
    row = roc_auc_holdout(spark, sf_dir).collect()[0]
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.auc - expected) < 1e-8
    assert abs(row.somers_d - (2 * expected - 1)) < 1e-8


def test_ece_is_the_weighted_bin_gap_sum(spark, sf_dir):
    rows = calibration_ece_bins(spark, sf_dir).collect()
    n_total = sum(r.n_rows for r in rows)
    weighted = sum(r.n_rows * r.abs_gap for r in rows) / n_total
    assert abs(rows[0].ece - weighted) < 1e-6
    for r in rows:
        assert abs(r.abs_gap - abs(r.avg_pred - r.emp_rate)) < 1e-6


def test_decile_lift_internal_identities(spark, sf_dir):
    rows = decile_lift_table(spark, sf_dir).collect()
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n_rows for r in rows) == li_count
    # final cumulative gain covers every positive
    assert abs(rows[-1].cum_gain - 1.0) < 1e-6
    # lift averages to 1 under decile weights
    w = sum(r.n_rows * r.lift for r in rows) / li_count
    assert abs(w - 1.0) < 1e-3
    # deciles are descending, disjoint score bands
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt.score_hi < prev.score_lo


def _pav_exact(hist):
    """Fraction-exact pool-adjacent-violators on [(s, pos, n)] ascending:
    the textbook sequential stack algorithm the minimax query must equal."""
    from fractions import Fraction

    blocks = []  # (pos_sum, n_sum)
    for _s, p, n in hist:
        blocks.append((p, n))
        while len(blocks) > 1 and Fraction(blocks[-2][0], blocks[-2][1]) >= Fraction(
            blocks[-1][0], blocks[-1][1]
        ):
            p2, n2 = blocks.pop()
            p1, n1 = blocks.pop()
            blocks.append((p1 + p2, n1 + n2))
    # expand block means back to per-value fits
    out = []
    bi = 0
    covered = 0
    for _s, _p, n in hist:
        if covered == 0:
            covered = blocks[bi][1]
            val = Fraction(blocks[bi][0], blocks[bi][1])
            bi += 1
        out.append(val)
        covered -= n
    return out


def test_isotonic_minimax_equals_exact_pav(spark):
    from bigdata_2025_1_spark.operators.model_eval import (
        I12,
        isotonic_fit_from_hist,
    )

    rng = random.Random(37)
    for trial in range(6):
        d = rng.randint(1, 9)
        hist = []
        for s in range(d):
            n = rng.randint(1, 20)
            p = rng.randint(0, n)
            hist.append((s, p, n))
        df = spark.createDataFrame(hist, "s long, p long, c long")
        got = {
            r.s: int(r.fit12)
            for r in isotonic_fit_from_hist(df).collect()
        }
        ref = _pav_exact(hist)
        for (s, _p, _n), frac in zip(hist, ref):
            want = (frac.numerator * I12) // frac.denominator
            assert got[s] == want, (trial, hist, s, got[s], want)
        # monotone non-decreasing
        fits = [got[s] for s, _, _ in hist]
        assert fits == sorted(fits)


def test_isotonic_domain_cap_raises(spark):
    import pytest as _pytest

    from bigdata_2025_1_spark.operators.model_eval import (
        ISO_DOMAIN_CAP,
        isotonic_fit_from_hist,
    )

    big = spark.range(ISO_DOMAIN_CAP + 1).selectExpr(
        "id as s", "1 as p", "2 as c"
    )
    with _pytest.raises(ValueError, match="quantize"):
        isotonic_fit_from_hist(big)


def test_crossval_fold0_matches_two_pass_reference(spark, sf_dir):
    """The one-pass complement-count CV must equal literally retraining
    without fold 0 and scoring fold 0 (scalar two-pass reference)."""
    from bigdata_2025_1_spark.operators.model_eval import (
        N_FOLDS,
        crossval_auc_folds,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(ROUND(l_discount * 1e2) AS BIGINT) AS d,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos,
               (l_orderkey * {_PRIME}) % {N_FOLDS} AS fold
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchall()
    train: dict[int, list[int]] = {}
    for d, pos, fold in rows:
        if fold != 0:
            c = train.setdefault(d, [0, 0])
            c[0] += pos
            c[1] += 1
    pred = {d: (p + 1) * I9 // (n + 2) for d, (p, n) in train.items()}
    hist: dict[int, list[int]] = {}
    for d, pos, fold in rows:
        if fold == 0 and d in pred:
            c = hist.setdefault(pred[d], [0, 0])
            c[0] += pos
            c[1] += 1
    wins = ties = neg_below = n1 = n2 = 0
    for s in sorted(hist):
        c1, ct = hist[s]
        c0 = ct - c1
        wins += c1 * neg_below
        ties += c1 * c0
        neg_below += c0
        n1 += c1
        n2 += c0
    expected = (wins + ties / 2) / (n1 * n2)
    out = {r.fold: r for r in crossval_auc_folds(spark, sf_dir).collect()}
    assert out[0].n1 == n1 and out[0].n2 == n2
    assert abs(out[0].auc - expected) < 1e-8
    # summary columns agree with the fold column
    aucs = [r.auc for r in out.values() if r.auc is not None]
    mean = sum(aucs) / len(aucs)
    assert abs(out[0].mean_auc - mean) < 1e-6


def test_conformal_qhat_is_exact_rank_statistic(spark, sf_dir):
    """q_hat must be the ceil(0.9*(n_cal+1))-th smallest calibration
    residual, recomputed scalar-side from the same splits."""
    from bigdata_2025_1_spark.operators.model_eval import (
        CONF_ALPHA_PCT,
        conformal_interval_coverage,
    )

    out = conformal_interval_coverage(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c.c_mktsegment AS g,
               CAST(ROUND(o.o_totalprice * 1e2) AS BIGINT) AS y,
               (o.o_orderkey * {_PRIME}) % 100 AS bucket
        FROM read_parquet('{sf_dir}/orders.parquet') o
        JOIN read_parquet('{sf_dir}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        """
    ).fetchall()
    tr: dict[str, list[int]] = {}
    for g, y, b in rows:
        if b < 60:
            tr.setdefault(g, []).append(y)
    pred = {g: sum(v) // len(v) for g, v in tr.items()}
    resid = sorted(
        abs(y - pred[g]) for g, y, b in rows if 60 <= b < 80 and g in pred
    )
    k = ((100 - CONF_ALPHA_PCT) * (len(resid) + 1) + 99) // 100
    assert out.n_cal == len(resid)
    assert out.q_hat == resid[k - 1] / 100
    covered = sum(
        1
        for g, y, b in rows
        if b >= 80 and g in pred and abs(y - pred[g]) <= resid[k - 1]
    )
    n_test = sum(1 for g, y, b in rows if b >= 80 and g in pred)
    assert out.n_test == n_test
    assert abs(out.coverage - covered / n_test) < 1e-6  # r6 output
    # the finite-sample guarantee is >= target in expectation; structural
    # sanity: achieved coverage is a valid proportion near the target
    assert 0.0 <= out.coverage <= 1.0


def test_eb_shrinkage_pulls_toward_prior_mean(spark, sf_dir):
    from bigdata_2025_1_spark.operators.model_eval import (
        eb_shrunk_supplier_rates,
    )

    rows = eb_shrunk_supplier_rates(spark, sf_dir).collect()
    assert rows, "top movers must be non-empty"
    for r in rows:
        # shrunk lies strictly between the raw rate and SOME interior
        # prior mean: it moves off the raw value and stays a probability
        assert 0.0 <= r.shrunk_rate <= 1.0
        assert abs(r.shrunk_rate - r.raw_rate) == r.abs_correction or abs(
            abs(r.shrunk_rate - r.raw_rate) - r.abs_correction
        ) < 2e-9
    # output is ranked by correction magnitude, descending
    deltas = [r.abs_correction for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_bradley_terry_matches_scalar_recurrence(spark, sf_dir):
    """The distributed MM loop must walk the exact integer states of a
    scalar Python implementation of the same recurrence."""
    from bigdata_2025_1_spark.operators.model_eval import (
        BT_I12,
        BT_ITERS,
        BT_PPM,
        bradley_terry_nation_strength,
    )

    con = duckdb.connect()
    wmat = con.execute(
        f"""
        WITH nl AS (
          SELECT o.o_orderkey AS ok, s.s_nationkey AS n,
                 SUM(CAST(ROUND(l.l_extendedprice * 1e2) AS HUGEINT)) AS rev
          FROM read_parquet('{sf_dir}/lineitem.parquet') l
          JOIN read_parquet('{sf_dir}/orders.parquet') o
            ON o.o_orderkey = l.l_orderkey
          JOIN read_parquet('{sf_dir}/supplier.parquet') s
            ON s.s_suppkey = l.l_suppkey
          GROUP BY ok, n
        )
        SELECT a.n, b.n, COUNT(*)
        FROM nl a JOIN nl b ON b.ok = a.ok AND a.n <> b.n AND a.rev > b.rev
        GROUP BY a.n, b.n
        """
    ).fetchall()
    wins: dict[int, int] = {}
    games: dict[tuple[int, int], int] = {}
    parts = set()
    for i, j, c in wmat:
        parts |= {i, j}
        wins[i] = wins.get(i, 0) + c
        key = (min(i, j), max(i, j))
        games[key] = games.get(key, 0) + c
    pi = {n: BT_PPM for n in parts}
    k = len(parts)
    for _ in range(BT_ITERS):
        dsum = {n: 0 for n in parts}
        for (i, j), g in games.items():
            d = g * BT_I12 // (pi[i] + pi[j])
            dsum[i] += d
            dsum[j] += d
        raw = {n: wins.get(n, 0) * BT_I12 // dsum[n] for n in parts}
        sv = sum(raw.values())
        pi = {n: raw[n] * k * BT_PPM // sv for n in parts}
    names = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    expected = {
        names[n]: round(v / BT_PPM, 6) for n, v in pi.items()
    }
    out = bradley_terry_nation_strength(spark, sf_dir).collect()
    assert len(out) == len(parts)
    for r in out:
        assert r.strength == expected[r.nation], (r.nation, r.strength)
    # strengths order consistently with win share for the extremes
    by_strength = sorted(out, key=lambda r: -r.strength)
    top, bot = by_strength[0], by_strength[-1]
    assert top.wins / top.games >= bot.wins / bot.games


def test_shapley_efficiency_axiom(spark, sf_dir):
    """The two Shapley values must sum exactly to the jointly explained
    SS (efficiency), and each must sit between its two marginal
    contributions recomputed scalar-side."""
    from collections import defaultdict

    from bigdata_2025_1_spark.operators.model_eval import (
        shapley_variance_attribution,
    )

    rows = [
        (int(round(r.l_discount * 100)), int(round(r.l_quantity)),
         1 if r.l_returnflag == "R" else 0)
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_discount", "l_quantity", "l_returnflag")
        .collect()
    ]
    n = len(rows)
    sy = sum(y for _, _, y in rows)

    def ss(keyfn):
        g = defaultdict(lambda: [0, 0])
        for d, q, y in rows:
            c = g[keyfn(d, q)]
            c[0] += y
            c[1] += 1
        return sum(s * s * 100 // c for s, c in g.values())

    grand = sy * sy * 100 // n
    vd = ss(lambda d, q: d) - grand
    vq = ss(lambda d, q: q) - grand
    vdq = ss(lambda d, q: (d, q)) - grand
    phi_d = (vd + (vdq - vq)) / 2 / 100
    phi_q = (vq + (vdq - vd)) / 2 / 100
    out = {r.feature: r for r in shapley_variance_attribution(spark, sf_dir).collect()}
    assert abs(out["discount"].shapley_ss - round(phi_d, 4)) < 1e-9
    assert abs(out["quantity"].shapley_ss - round(phi_q, 4)) < 1e-9
    # efficiency: shares of the two features account for all of v({d,q})
    total = out["discount"].total_explained_ss
    assert abs((phi_d + phi_q) - vdq / 100) < 1e-6
    assert abs(total - vdq / 100) < 1e-3
