"""Classical-test cores vs straightforward Python references on random
inputs: the i2-quantized ANOVA F and the moment-chain JB statistic must
agree with textbook scalar formulas (within quantization tolerance)."""

from __future__ import annotations

import math
import random

from bigdata_2025_1_spark.operators.statistics import _anova_from_rows


def _ref_anova(groups: dict[str, list[int]]):
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    allv = [x for v in groups.values() for x in v]
    gm = sum(allv) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values())
    ssw = sum(
        (x - sum(v) / len(v)) ** 2 for v in groups.values() for x in v
    )
    if k < 2 or n <= k or ssw <= 0:
        return k, n, None
    return k, n, (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_f_matches_reference_on_random_groups(spark):
    rng = random.Random(13)
    for trial in range(5):
        groups = {
            f"g{i}": [rng.randrange(1, 5000) for _ in range(rng.randint(2, 40))]
            for i in range(rng.randint(2, 6))
        }
        rows = spark.createDataFrame(
            [(g, v) for g, vals in groups.items() for v in vals], "g string, v long"
        )
        out = _anova_from_rows(rows).collect()[0]
        k, n, f_ref = _ref_anova(groups)
        assert out.k == k and out.n == n
        # i2 quantization of SSB/SSW bounds the F error by ~1e-2/SSW
        assert abs(out.f_stat - f_ref) < max(1e-4, f_ref * 1e-6), (trial, f_ref)


def test_anova_f_degenerate_single_group_is_null(spark):
    rows = spark.createDataFrame([("a", 1), ("a", 5), ("a", 9)], "g string, v long")
    out = _anova_from_rows(rows).collect()[0]
    assert out.k == 1 and out.f_stat is None


def test_anova_f_zero_within_variance_is_null(spark):
    rows = spark.createDataFrame(
        [("a", 4), ("a", 4), ("b", 7), ("b", 7)], "g string, v long"
    )
    out = _anova_from_rows(rows).collect()[0]
    assert out.f_stat is None and out.eta_squared == 1.0


def test_jarque_bera_matches_reference(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import jarque_bera_order_values

    vals = [
        int(round(r.o_totalprice))
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    ]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((x - mu) ** 2 for x in vals) / n
    m3 = sum((x - mu) ** 3 for x in vals) / n
    m4 = sum((x - mu) ** 4 for x in vals) / n
    skew = m3 / m2**1.5
    kurt = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + kurt**2 / 4)
    out = jarque_bera_order_values(spark, sf_dir).collect()[0]
    assert out.n == n
    assert abs(out.skewness - skew) < 1e-4
    assert abs(out.excess_kurtosis - kurt) < 1e-4
    assert abs(out.jb_stat - jb) < max(1e-3, jb * 1e-5)


def _ref_kendall(pairs):
    n = len(pairs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            s = dx * dy
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    from collections import Counter

    n1 = sum(r * (r - 1) // 2 for r in Counter(x for x, _ in pairs).values())
    n2 = sum(r * (r - 1) // 2 for r in Counter(y for _, y in pairs).values())
    n0 = n * (n - 1) // 2
    if n < 2 or n0 == n1 or n0 == n2:
        return conc, disc, None
    return conc, disc, (conc - disc) / ((n0 - n1) ** 0.5 * (n0 - n2) ** 0.5)


def test_kendall_tau_matches_pairwise_reference(spark):
    from bigdata_2025_1_spark.operators.statistics import kendall_tau_from_rows

    rng = random.Random(41)
    for trial in range(5):
        n = rng.randint(2, 60)
        pairs = [(rng.randrange(6), rng.randrange(5)) for _ in range(n)]
        df = spark.createDataFrame(pairs, "x long, y long")
        out = kendall_tau_from_rows(df).collect()[0]
        conc, disc, tau = _ref_kendall(pairs)
        assert out.n_concordant == conc and out.n_discordant == disc, (trial, pairs)
        if tau is None:
            assert out.tau_b is None
        else:
            assert abs(out.tau_b - tau) < 1e-8


def test_kendall_tau_constant_axis_is_null(spark):
    from bigdata_2025_1_spark.operators.statistics import kendall_tau_from_rows

    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "x long, y long")
    assert kendall_tau_from_rows(df).collect()[0].tau_b is None


def test_median_ci_brackets_the_sample_median(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import median_ci_orderstat

    out = median_ci_orderstat(spark, sf_dir).collect()[0]
    vals = sorted(
        int(round(r.o_totalprice * 100))
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    assert out.n == n
    # median = lower median by the pinned (n+1) div 2 rank
    assert out.median == vals[(n + 1) // 2 - 1] / 100
    assert out.ci_lo <= out.median <= out.ci_hi
    # the interval ranks match the scalar formula
    z = 1.959963985
    lo = max(1, math.floor((n - z * n**0.5) / 2))
    hi = min(n, 1 + math.ceil((n + z * n**0.5) / 2))
    assert out.ci_lo == vals[lo - 1] / 100
    assert out.ci_hi == vals[hi - 1] / 100


def test_kmv_estimates_are_close_to_exact(spark, sf_dir):
    """KMV intersection estimates must land within the k=64 sketch's
    expected error band of the exact intersections (deterministic: the
    md5 'randomness' is fixed, so this pins accuracy, not luck)."""
    from bigdata_2025_1_spark.operators.statistics import (
        kmv_intersection_estimate,
    )

    rows = kmv_intersection_estimate(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 event types -> C(5,2) pairs
    for r in rows:
        assert r.exact_intersection > 0
        rel = abs(r.est_intersection - r.exact_intersection) / r.exact_intersection
        assert rel < 0.45, (r.type_a, r.type_b, r.est_intersection, r.exact_intersection)
    # aggregate accuracy is much better than the per-pair worst case
    tot_err = sum(abs(r.est_intersection - r.exact_intersection) for r in rows)
    tot = sum(r.exact_intersection for r in rows)
    assert tot_err / tot < 0.2


def _ref_ipf(cells, r_t, c_t, iters, ppm=10**6):
    """Scalar reference running the SAME integer recurrence."""
    w = {k: ppm for k in cells}
    for _ in range(iters):
        row_tot = {}
        for (g1, _g2), n in cells.items():
            row_tot[g1] = row_tot.get(g1, 0) + w[(g1, _g2)] * n
        w = {
            k: (w[k] * r_t * ppm) // row_tot[k[0]] for k in cells
        }
        col_tot = {}
        for (g1, g2), n in cells.items():
            col_tot[g2] = col_tot.get(g2, 0) + w[(g1, g2)] * n
        w = {k: (w[k] * c_t * ppm) // col_tot[k[1]] for k in cells}
    return w


def test_ipf_matches_scalar_recurrence_and_converges(spark):
    import random as _random

    from bigdata_2025_1_spark.operators.statistics import (
        IPF_PPM,
        ipf_weights_from_grid,
    )

    rng = _random.Random(59)
    for trial in range(3):
        n1, n2 = rng.randint(2, 4), rng.randint(2, 4)
        cells = {
            (a, f"s{b}"): rng.randint(1, 50)
            for a in range(n1)
            for b in range(n2)
        }
        tot = sum(cells.values())
        r_t, c_t = tot // n1, tot // n2
        from decimal import Decimal

        grid = spark.createDataFrame(
            [(g1, g2, Decimal(n), r_t, c_t) for (g1, g2), n in cells.items()],
            "g1 long, g2 string, n decimal(38,0), r_target long, c_target long",
        )
        out = {
            (r.g1, r.g2): int(r.w)
            for r in ipf_weights_from_grid(grid, iters=4).collect()
        }
        ref = _ref_ipf(cells, r_t, c_t, iters=4)
        assert out == ref, (trial, cells)
        # margins converge: weighted column totals near the target
        col_tot = {}
        for (g1, g2), n in cells.items():
            col_tot[g2] = col_tot.get(g2, 0) + ref[(g1, g2)] * n
        for g2, t in col_tot.items():
            assert abs(t / IPF_PPM - c_t) / c_t < 0.01, (g2, t, c_t)


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import (
        NEYMAN_BUDGET,
        neyman_allocation,
    )

    rows = neyman_allocation(spark, sf_dir).collect()
    assert sum(r.allocated for r in rows) == NEYMAN_BUDGET
    # Hamilton: every allocation within 1 of its real-valued quota
    wt = sum(r.neyman_weight for r in rows)
    for r in rows:
        q = r.neyman_weight / wt * NEYMAN_BUDGET
        assert q - 1 <= r.allocated <= q + 1, (r.segment, q, r.allocated)
    # proportional column is the plain size-based floor quota
    nt = sum(r.n_h for r in rows)
    for r in rows:
        assert r.proportional == r.n_h * NEYMAN_BUDGET // nt


def test_hill_alpha_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import HILL_K, hill_tail_index

    vals = sorted(
        (
            int(round(r.o_totalprice * 100))
            for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_totalprice")
            .collect()
        ),
        reverse=True,
    )
    top = vals[: HILL_K + 1]
    vk = top[-1]
    s6 = sum(round(math.log(v / vk) * 1e6) for v in top if v > vk)
    k_used = len(top) - 1
    out = hill_tail_index(spark, sf_dir).collect()[0]
    assert out.k_used == k_used and out.threshold == vk / 100
    assert abs(out.hill_alpha - k_used * 1e6 / s6) < 1e-5


def test_mahalanobis_top_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import mahalanobis_outliers

    rows = [
        (int(round(r.l_quantity * 100)), int(round(r.l_extendedprice * 100)))
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice")
        .collect()
    ]
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    mx, my = sx / n, sy / n
    vxx = (n * sum(x * x for x, _ in rows) - sx * sx) / n / n
    vxy = (n * sum(x * y for x, y in rows) - sx * sy) / n / n
    vyy = (n * sum(y * y for _, y in rows) - sy * sy) / n / n
    det = vxx * vyy - vxy * vxy
    best = max(
        round(
            ((x - mx) ** 2 * vyy - 2 * (x - mx) * (y - my) * vxy + (y - my) ** 2 * vxx)
            / det
            * 1e6
        )
        for x, y in rows
    )
    out = mahalanobis_outliers(spark, sf_dir).collect()
    assert len(out) == min(20, n)
    assert abs(out[0].mahalanobis_d2 - best / 1e6) < 1e-6
    d2s = [r.mahalanobis_d2 for r in out]
    assert d2s == sorted(d2s, reverse=True)


def test_cochran_armitage_matches_scalar(spark, sf_dir):
    """z must equal the textbook T/sqrt(Var T) with
    T = sum s_i (r_i - n_i * pbar) — an independent scalar derivation
    (the cross-engine oracle shares the query's formula, so only this
    catches a standardization slip)."""
    from collections import defaultdict

    from bigdata_2025_1_spark.operators.statistics import cochran_armitage_trend

    g = defaultdict(lambda: [0, 0])
    for r in (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_discount", "l_returnflag")
        .collect()
    ):
        s = int(round(r.l_discount * 100))
        g[s][0] += 1 if r.l_returnflag == "R" else 0
        g[s][1] += 1
    n = sum(v[1] for v in g.values())
    rr = sum(v[0] for v in g.values())
    pbar = rr / n
    sbar = sum(s * v[1] for s, v in g.items()) / n
    t = sum(s * (v[0] - v[1] * pbar) for s, v in g.items())
    var = pbar * (1 - pbar) * sum(v[1] * (s - sbar) ** 2 for s, v in g.items())
    z = t / var**0.5
    out = cochran_armitage_trend(spark, sf_dir).collect()[0]
    assert out.n == n and out.n_pos == rr and out.n_levels == len(g)
    assert abs(out.z_trend - z) < 1e-6, (out.z_trend, z)


def test_risk_odds_ratio_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import risk_ratio_odds_ratio

    out = risk_ratio_odds_ratio(spark, sf_dir).collect()[0]
    a, b, c, d = out.a, out.b, out.c, out.d
    assert abs(out.risk_ratio - (a / (a + b)) / (c / (c + d))) < 1e-5
    orr = a * d / (b * c)
    assert abs(out.odds_ratio - orr) < 1e-5
    se = (1 / a + 1 / b + 1 / c + 1 / d) ** 0.5
    lnor6 = round(math.log(orr) * 1e6) / 1e6
    assert abs(out.or_ci_lo - math.exp(lnor6 - 1.959963985 * se)) < 1e-5
    assert abs(out.or_ci_hi - math.exp(lnor6 + 1.959963985 * se)) < 1e-5
    assert out.or_ci_lo <= out.odds_ratio <= out.or_ci_hi


def test_cohens_kappa_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import cohens_kappa_agreement

    rows = [
        (1 if r.l_discount >= 0.05 else 0, 1 if r.l_quantity >= 25 else 0)
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_discount", "l_quantity")
        .collect()
    ]
    n = len(rows)
    po = sum(1 for x, y in rows if x == y) / n
    p1 = sum(x for x, _ in rows) / n
    p2 = sum(y for _, y in rows) / n
    pe = p1 * p2 + (1 - p1) * (1 - p2)
    kappa = (po - pe) / (1 - pe)
    out = cohens_kappa_agreement(spark, sf_dir).collect()[0]
    assert out.n == n
    assert abs(out.observed_agreement - po) < 1e-6
    assert abs(out.cohens_kappa - kappa) < 1e-5
    assert -1 <= out.cohens_kappa <= 1


# --- round-8 additions -------------------------------------------------------


def test_welch_t_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import (
        MW_SEG_A,
        MW_SEG_B,
        welch_t_spend,
    )

    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    a, b = [], []
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        seg = cust.get(r.o_custkey)
        if seg == MW_SEG_A:
            a.append(round(r.o_totalprice * 100))
        elif seg == MW_SEG_B:
            b.append(round(r.o_totalprice * 100))

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    se2 = va / na + vb / nb
    t_ref = (ma - mb) / math.sqrt(se2)
    df_ref = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    out = welch_t_spend(spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.mean_a - ma / 100) < 1e-5
    assert abs(out.t_stat - t_ref) < 1e-5
    assert abs(out.welch_df - df_ref) < max(1e-3, df_ref * 1e-6)


def test_kruskal_wallis_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import (
        kruskal_wallis_priority_spend,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    data = [(r.o_orderpriority, round(r.o_totalprice * 100)) for r in rows]
    vals = sorted(v for _, v in data)
    n = len(vals)
    # midranks per distinct value
    rank: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    groups: dict[str, list[float]] = {}
    for g, v in data:
        groups.setdefault(g, []).append(rank[v])
    h = 12 / (n * (n + 1)) * sum(
        (sum(rs)) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    from collections import Counter

    ties = Counter(vals)
    tc = 1 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    h_ref = h / tc
    out = kruskal_wallis_priority_spend(spark, sf_dir).collect()
    assert len(out) == len(groups)
    got = out[0]
    assert got.dof == len(groups) - 1
    assert abs(got.h_stat - h_ref) < max(1e-4, h_ref * 1e-6)
    by_g = {r.priority: r for r in out}
    for g, rs in groups.items():
        assert by_g[g].n_g == len(rs)
        assert abs(by_g[g].mean_rank - sum(rs) / len(rs)) < 1e-5


def test_wasserstein_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import (
        KS_TYPE_A,
        KS_TYPE_B,
        wasserstein_value_drift,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    a = sorted(round(r.value * 100) for r in rows if r.event_type == KS_TYPE_A)
    b = sorted(round(r.value * 100) for r in rows if r.event_type == KS_TYPE_B)
    # scalar W1 over the merged value domain
    dom = sorted(set(a) | set(b))
    import bisect

    w1 = 0.0
    for v, v_next in zip(dom, dom[1:]):
        f1 = bisect.bisect_right(a, v) / len(a)
        f2 = bisect.bisect_right(b, v) / len(b)
        w1 += abs(f1 - f2) * (v_next - v)
    w1 /= 100
    out = wasserstein_value_drift(spark, sf_dir).collect()[0]
    assert (out.n1, out.n2) == (len(a), len(b))
    assert abs(out.w1_distance - w1) < 1e-9


def test_durbin_watson_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.timeseries_ops import durbin_watson_hourly

    hours = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(unix_timestamp(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h")
        .groupBy("h")
        .count()
        .collect()
    )
    series = sorted((r.h, r["count"]) for r in hours)
    x0 = series[0][0]
    xs = [h - x0 for h, _ in series]
    ys = [c for _, c in series]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = sy / n - b * (sx / n)
    e = [y - a - b * x for x, y in zip(xs, ys)]
    dw_ref = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(v * v for v in e)
    out = durbin_watson_hourly(spark, sf_dir).collect()[0]
    assert out.n_hours == n
    assert abs(out.slope - b) < 1e-5
    assert abs(out.dw_stat - dw_ref) < 1e-4


def test_piecewise_breakpoint_matches_brute_force(spark, sf_dir):
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        piecewise_linear_breakpoint,
    )

    months = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m",
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y",
        )
        .groupBy("m")
        .sum("y")
        .collect()
    )
    series = sorted((r.m, r["sum(y)"]) for r in months)

    def sse(pts):
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] ** 2 for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        syy = sum(p[1] ** 2 for p in pts)
        cxx = n * sxx - sx * sx
        cxy = n * sxy - sx * sy
        cyy = n * syy - sy * sy
        return (cyy * cxx - cxy * cxy) / (n * cxx)

    best = None
    for i in range(2, len(series) - 1):
        tot = sse(series[:i]) + sse(series[i:])
        k = series[i - 1][0]
        if best is None or (tot, k) < best:
            best = (tot, k)
    out = piecewise_linear_breakpoint(spark, sf_dir).collect()[0]
    assert out.breakpoint_m == best[1]
    # i2 quantization + float-reference ulp: the integer dollars^2 SSE
    # (cents^2 / 1e4) sits within 2 of the float reference
    assert abs(out.sse_dollars2 - best[0] / 1e4) < 2


def test_logrank_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        KM_CENSOR_DAYS,
        LOGRANK_G_A,
        LOGRANK_G_B,
        logrank_priority_survival,
    )

    import pyspark.sql.functions as SF

    lif = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spans = (
        lif.groupBy("l_orderkey")
        .agg(
            SF.datediff(SF.max("l_shipdate"), SF.min("l_shipdate")).alias("dur"),
            SF.max("l_shipdate").alias("last_ship"),
        )
        .collect()
    )
    max_ship = max(r.last_ship for r in spans)
    import datetime as dt

    cut = max_ship - dt.timedelta(days=KM_CENSOR_DAYS)
    pri = {
        r.o_orderkey: r.o_orderpriority
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .collect()
        if r.o_orderpriority in (LOGRANK_G_A, LOGRANK_G_B)
    }
    subjects = [
        (1 if pri[r.l_orderkey] == LOGRANK_G_A else 0, r.dur, r.last_ship > cut)
        for r in spans
        if r.l_orderkey in pri
    ]
    days = sorted({d for _, d, _ in subjects})
    n1 = sum(1 for g, _, _ in subjects if g == 1)
    n2 = len(subjects) - n1
    o1 = 0
    e1 = 0.0
    v = 0.0
    for t in days:
        d1 = sum(1 for g, d, c in subjects if g == 1 and d == t and not c)
        d2 = sum(1 for g, d, c in subjects if g == 0 and d == t and not c)
        r1 = sum(1 for g, d, _ in subjects if g == 1 and d >= t)
        r2 = sum(1 for g, d, _ in subjects if g == 0 and d >= t)
        d, n = d1 + d2, r1 + r2
        if d == 0 or n < 2:
            continue
        o1 += d1
        e1 += d * r1 / n
        v += d * r1 / n * (r2 / n) * ((n - d) / (n - 1))
    chi_ref = (o1 - e1) ** 2 / v
    out = logrank_priority_survival(spark, sf_dir).collect()[0]
    assert (out.n_a, out.n_b) == (n1, n2)
    assert out.observed_a == o1
    assert abs(out.expected_a - e1) < 1e-4
    assert abs(out.logrank_chi2 - chi_ref) < max(1e-4, chi_ref * 1e-5)


def test_jsd_matches_scalar_and_bounds(spark, sf_dir):
    from bigdata_2025_1_spark.operators.text_analysis import (
        JSD_SRC_A,
        JSD_SRC_B,
        jsd_source_divergence,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        toks = [w for w in r.text.lower().strip().split() if w]
        if r.source == JSD_SRC_A:
            ca.update(toks)
        elif r.source == JSD_SRC_B:
            cb.update(toks)
    na, nb = sum(ca.values()), sum(cb.values())

    def kl(cp, np_, cq, nq):
        s = 0.0
        for w, c in cp.items():
            p = c / np_
            m = (p + cq.get(w, 0) / nq) / 2
            s += p * math.log(p / m)
        return s

    jsd_ref = (kl(ca, na, cb, nb) + kl(cb, nb, ca, na)) / 2
    out = jsd_source_divergence(spark, sf_dir).collect()[0]
    assert (out.n_tokens_a, out.n_tokens_b) == (na, nb)
    assert out.vocab_union == len(set(ca) | set(cb))
    # i6 term pinning bounds the divergence error by vocab/1e6/n
    assert abs(out.jsd_nats - jsd_ref) < 1e-4
    assert 0 <= out.jsd_nats <= math.log(2) + 1e-9


def test_mcnemar_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import (
        MCNEMAR_SPLIT,
        mcnemar_paired_returns,
    )

    import datetime as dt

    split = dt.datetime.fromisoformat(MCNEMAR_SPLIT)
    ret_by_order = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_returnflag")
        .collect()
    ):
        ret_by_order[r.l_orderkey] = ret_by_order.get(r.l_orderkey, 0) | (
            1 if r.l_returnflag == "R" else 0
        )
    halves: dict[int, dict[int, int]] = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .collect()
    ):
        if r.o_orderkey not in ret_by_order:
            continue
        h = 0 if r.o_orderdate < split else 1
        d = halves.setdefault(r.o_custkey, {})
        d[h] = d.get(h, 0) | ret_by_order[r.o_orderkey]
    b = c = n = 0
    for d in halves.values():
        if len(d) != 2:
            continue
        n += 1
        if d[0] == 1 and d[1] == 0:
            b += 1
        elif d[0] == 0 and d[1] == 1:
            c += 1
    out = mcnemar_paired_returns(spark, sf_dir).collect()[0]
    assert (out.n_pairs, out.b_discordant, out.c_discordant) == (n, b, c)
    assert abs(out.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-6


def test_cramers_v_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import cramers_v_association

    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    from collections import Counter

    cells: Counter = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderpriority")
        .collect()
    ):
        cells[(cust[r.o_custkey], r.o_orderpriority)] += 1
    segs = sorted({k[0] for k in cells})
    pris = sorted({k[1] for k in cells})
    n = sum(cells.values())
    chi2 = 0.0
    for s in segs:
        rs = sum(cells[(s, p)] for p in pris)
        for p in pris:
            cs = sum(cells[(s2, p)] for s2 in segs)
            e = rs * cs / n
            chi2 += (cells[(s, p)] - e) ** 2 / e
    v_ref = math.sqrt(chi2 / (n * (min(len(segs), len(pris)) - 1)))
    out = cramers_v_association(spark, sf_dir).collect()[0]
    assert (out.n, out.n_rows, out.n_cols) == (n, len(segs), len(pris))
    assert abs(out.chi2 - chi2) < max(1e-3, chi2 * 1e-5)
    assert abs(out.cramers_v - v_ref) < 1e-5


def test_did_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        DID_SPLIT_TS,
        difference_in_differences,
    )
    import datetime as dt
    import hashlib

    split = dt.datetime.fromisoformat(DID_SPLIT_TS)
    cells: dict[tuple[int, int], list[int]] = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
        .collect()
    ):
        treated = int(hashlib.md5(f"did:{r.user_id}".encode()).hexdigest()[:12], 16) % 2
        post = 0 if r.ts < split else 1
        cells.setdefault((treated, post), []).append(round(r.value * 100))

    def mv(xs):
        nn = len(xs)
        m = sum(xs) / nn
        var = sum((x - m) ** 2 for x in xs) / (nn - 1)
        return nn, m, var

    n_tp, m_tp, v_tp = mv(cells[(1, 0)])
    n_tq, m_tq, v_tq = mv(cells[(1, 1)])
    n_cp, m_cp, v_cp = mv(cells[(0, 0)])
    n_cq, m_cq, v_cq = mv(cells[(0, 1)])
    did_ref = ((m_tq - m_tp) - (m_cq - m_cp)) / 100
    se_ref = math.sqrt(v_tp / n_tp + v_tq / n_tq + v_cp / n_cp + v_cq / n_cq) / 100
    out = difference_in_differences(spark, sf_dir).collect()[0]
    assert (out.n_treated_pre, out.n_treated_post) == (n_tp, n_tq)
    assert (out.n_control_pre, out.n_control_post) == (n_cp, n_cq)
    assert abs(out.did_estimate - did_ref) < 1e-5
    assert abs(out.did_se - se_ref) < 1e-5
    assert abs(out.z_score - did_ref / se_ref) < 1e-4


def test_morton_interleave_matches_bit_reference():
    """The shared Spark/DuckDB Morton expression vs an independent
    Python bit-interleave — the shared-string design means a wrong
    formula would be mirrored across engines, so the reference must be
    derived differently (bit shifts, not the div/mod arithmetic)."""
    import duckdb

    from bigdata_2025_1_spark.operators.statistics import (
        ZORDER_BITS,
        _morton_terms,
    )

    def ref(px, sx):
        code = 0
        for i in range(ZORDER_BITS):
            code |= ((px >> i) & 1) << (2 * i)
            code |= ((sx >> i) & 1) << (2 * i + 1)
        return code

    con = duckdb.connect()
    expr = _morton_terms("px", "sx", "//")
    for px in range(1 << ZORDER_BITS):
        for sx in range(1 << ZORDER_BITS):
            got = con.sql(
                f"SELECT {expr} FROM (SELECT {px} AS px, {sx} AS sx)"
            ).fetchone()[0]
            assert got == ref(px, sx), (px, sx, got)
    # the full 16x16 grid maps bijectively onto 0..255
    codes = {ref(a, b) for a in range(16) for b in range(16)}
    assert codes == set(range(256))


def test_average_precision_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.model_eval import (
        _PRIME,
        I9,
        I12,
        TRAIN_PCT,
        average_precision_holdout,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "CAST(ROUND(l_discount * 100) AS BIGINT) AS d",
            "CAST(l_returnflag = 'R' AS INT) AS pos",
            "l_orderkey",
        )
        .collect()
    )
    train: dict[int, list[int]] = {}
    test: list[tuple[int, int]] = []
    for r in rows:
        if (r.l_orderkey * _PRIME) % 100 < TRAIN_PCT:
            p, n = train.get(r.d, (0, 0))
            train[r.d] = (p + r.pos, n + 1)
        else:
            test.append((r.d, r.pos))
    score = {d: (p + 1) * I9 // (n + 2) for d, (p, n) in train.items()}
    hist: dict[int, list[int]] = {}
    for d, pos in test:
        if d not in score:
            continue  # drop-unseen convention (documented)
        c = hist.setdefault(score[d], [0, 0])
        c[0] += pos
        c[1] += 1
    np_ = sum(c1 for c1, _ in hist.values())
    tp = pp = 0
    s12 = 0
    best = None
    for s in sorted(hist, reverse=True):
        c1, ct = hist[s]
        tp += c1
        pp += ct
        q12 = tp * I12 // pp
        s12 += c1 * q12
        f1_i6 = 2 * tp * 1_000_000 // (pp + np_)
        key = (f1_i6, s)
        if best is None or key > best:
            best = key
    out = average_precision_holdout(spark, sf_dir).collect()[0]
    assert out.n_pos == np_
    assert abs(out.average_precision - s12 / (np_ * I12)) < 1e-9
    assert abs(out.best_f1 - best[0] / 1e6) < 1e-9
    assert abs(out.best_f1_threshold - best[1] / I9) < 1e-9


def test_cuped_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        CUPED_SALT,
        CUPED_SPLIT_TS,
        cuped_adjusted_uplift,
    )
    import datetime as dt

    split = dt.datetime.fromisoformat(CUPED_SPLIT_TS)
    users: dict[int, list[int]] = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .select("user_id", "ts", "value")
        .collect()
    ):
        u = users.setdefault(r.user_id, [0, 0])
        u[0 if r.ts < split else 1] += round(r.value * 100)
    xs, ys, arms = [], [], []
    for uid, (x, y) in users.items():
        xs.append(x)
        ys.append(y)
        arms.append((uid * CUPED_SALT % 1000000007) % 2)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    cnum = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    theta = round(cnum / vx * 1e6) / 1e6
    nt = sum(arms)
    nc = n - nt
    syt = sum(y for y, a in zip(ys, arms) if a == 1)
    syc = sy - syt
    sxt = sum(x for x, a in zip(xs, arms) if a == 1)
    sxc = sx - sxt
    raw = syt / nt - syc / nc
    dx = sxt / nt - sxc / nc
    out = cuped_adjusted_uplift(spark, sf_dir).collect()[0]
    assert (out.n_treat, out.n_ctrl) == (nt, nc)
    assert abs(out.uplift_raw - raw / 100) < 1e-5
    assert abs(out.uplift_cuped - (raw - theta * dx) / 100) < 1e-5
    assert abs(out.theta - theta) < 1e-9
    assert abs(out.var_reduction - cnum**2 / vx / vy) < 1e-5


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    """Cramer-rule closed form vs numpy's independent least-squares
    solver, per return flag (the mirrored-determinant blind spot)."""
    import numpy as np

    from bigdata_2025_1_spark.operators.statistics import linreg_price_model

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_returnflag",
            "CAST(ROUND(l_quantity * 100) AS BIGINT) AS x1",
            "CAST(ROUND(l_discount * 10000) AS BIGINT) AS x2",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y",
        )
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append((r.x1, r.x2, r.y))
    out = {r.l_returnflag: r for r in linreg_price_model(spark, sf_dir).collect()}
    assert set(out) == set(by_flag)
    for flag, pts in by_flag.items():
        a = np.array([[1.0, p[0], p[1]] for p in pts])
        y = np.array([p[2] for p in pts], dtype=np.float64)
        beta, *_ = np.linalg.lstsq(a, y, rcond=None)
        got = out[flag]
        assert got.n == len(pts)
        # coefficients are large (price cents scale); compare relatively
        for g, ref in ((got.b0, beta[0]), (got.b1, beta[1]), (got.b2, beta[2])):
            assert abs(g - ref) < max(1e-4, abs(ref) * 1e-6), (flag, g, ref)
        resid = y - a @ beta
        ss_res = float(resid @ resid)
        ss_tot = float(((y - y.mean()) ** 2).sum())
        assert abs(got.r2 - (1 - ss_res / ss_tot)) < 1e-6


def test_corpus_psi_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.corpus_ops import corpus_drift_psi

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        bucket = int(math.floor(math.log2(r.n_chars + 1)))
        (ca if r.doc_id % 2 == 0 else cb)[bucket] += 1
    ta, tb = sum(ca.values()), sum(cb.values())
    out = {r.bucket: r for r in corpus_drift_psi(spark, sf_dir).collect()}
    assert set(out) == set(ca) | set(cb)
    for b_, r in out.items():
        assert (r.n_a, r.n_b) == (ca.get(b_, 0), cb.get(b_, 0))
        if r.n_a > 0 and r.n_b > 0:
            ref = (r.n_a / ta - r.n_b / tb) * math.log((r.n_a * tb) / (r.n_b * ta))
            assert abs(r.psi_contrib - ref) < 1e-9
        else:
            assert r.psi_contrib is None


def test_event_rate_anomaly_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        ANOM_TOP,
        event_rate_anomaly,
    )
    import datetime as dt

    evs = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts")
        .collect()
    )
    from collections import Counter

    obs: Counter = Counter()
    for r in evs:
        obs[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += 1
    h0 = min(h for _, h in obs)
    h1 = max(h for _, h in obs)
    hours = []
    h = h0
    while h <= h1:
        hours.append(h)
        h += dt.timedelta(hours=1)
    types = sorted({t for t, _ in obs})
    slot_tot: Counter = Counter()
    slot_m: Counter = Counter()
    for t in types:
        for h in hours:
            slot_tot[(t, h.hour)] += obs.get((t, h), 0)
            slot_m[(t, h.hour)] += 1
    scored = []
    for t in types:
        for h in hours:
            n = obs.get((t, h), 0)
            tot, m = slot_tot[(t, h.hour)], slot_m[(t, h.hour)]
            ln_term = n * round(math.log(n * m / tot) * 1e6) if n > 0 else 0
            dev_i6 = 2 * (ln_term - round((n * m - tot) / m * 1e6))
            scored.append((dev_i6, t, h, n, tot, m))
    scored.sort(key=lambda s: (-s[0], s[1], s[2]))
    out = event_rate_anomaly(spark, sf_dir).collect()
    assert len(out) == ANOM_TOP
    for rank, (row, ref) in enumerate(zip(out, scored[:ANOM_TOP]), start=1):
        dev_i6, t, h, n, tot, m = ref
        assert row.rank == rank
        assert (row.event_type, row.hour, row.n) == (t, h, n)
        assert abs(row.deviance - dev_i6 / 1e6) < 1e-6
        assert abs(row.expected - round(tot / m * 1e6) / 1e6) < 1e-6


def test_domain_mixture_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.corpus_ops import domain_mixture_reweight

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    from collections import Counter

    sw: dict[str, Counter] = {}
    cw: Counter = Counter()
    n_docs: Counter = Counter()
    for r in docs:
        toks = [w for w in r.text.lower().strip().split() if w]
        sw.setdefault(r.source, Counter()).update(toks)
        cw.update(toks)
        n_docs[r.source] += 1
    n = sum(cw.values())
    nll = {w: round(math.log(n / c) * 1e6) for w, c in cw.items()}
    g_i6 = sum(c * nll[w] for w, c in cw.items())
    prods = {}
    refs = {}
    for s, counts in sw.items():
        n_s = sum(counts.values())
        a_i6 = sum(c * nll[w] for w, c in counts.items())
        excess = max(0, round(a_i6 / n_s - g_i6 / n))
        prods[s] = n_s * (1_000_000 + excess)
        refs[s] = (n_docs[s], n_s, a_i6 / n_s / 1e6, excess / 1e6)
    tot = sum(prods.values())
    out = {r.source: r for r in domain_mixture_reweight(spark, sf_dir).collect()}
    assert set(out) == set(sw)
    for s, r in out.items():
        nd, ns_, ce, ex = refs[s]
        assert (r.n_docs, r.n_tokens) == (nd, ns_)
        assert abs(r.cross_entropy_nats - ce) < 1e-9
        assert abs(r.excess_nats - ex) < 1e-9
        assert r.weight_ppm == round(prods[s] / tot * 1e6)
    # the allocation is a proper mixture (ppm rounding slack only)
    assert abs(sum(r.weight_ppm for r in out.values()) - 1_000_000) <= len(out)


def test_unigram_logprob_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.text_analysis import (
        LP_TOP_K,
        unigram_logprob_quality,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    from collections import Counter

    toks = {
        r.doc_id: [w for w in r.text.lower().strip().split() if w] for r in docs
    }
    cw: Counter = Counter()
    for ts in toks.values():
        cw.update(ts)
    n = sum(cw.values())
    l_i6 = {w: round(math.log(c / n) * 1e6) for w, c in cw.items()}
    nlls = {
        d: (-sum(l_i6[w] for w in ts) / len(ts) / 1e6, len(ts))
        for d, ts in toks.items()
        if ts
    }
    top = sorted(nlls.items(), key=lambda kv: (-kv[1][0], kv[0]))[:LP_TOP_K]
    out = unigram_logprob_quality(spark, sf_dir).collect()
    assert len(out) == LP_TOP_K
    for rank, (row, (d, (nll, ntok))) in enumerate(zip(out, top), start=1):
        assert (row.rank, row.doc_id, row.n_tokens) == (rank, d, ntok)
        assert abs(row.nll - nll) < 1e-9


def test_seasonal_naive_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        BACKTEST_SEASON_HOURS,
        seasonal_naive_backtest,
    )

    hours = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(unix_timestamp(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h")
        .groupBy("h")
        .count()
        .collect()
    )
    by_h = {r.h: r["count"] for r in hours}
    mh = max(by_h)
    pairs = [
        (x, by_h[h - BACKTEST_SEASON_HOURS])
        for h, x in by_h.items()
        if h > mh - BACKTEST_SEASON_HOURS and (h - BACKTEST_SEASON_HOURS) in by_h
    ]
    n = len(pairs)
    sae = sum(abs(x - f) for x, f in pairs)
    se = sum(x - f for x, f in pairs)
    sx = sum(x for x, _ in pairs)
    out = seasonal_naive_backtest(spark, sf_dir).collect()[0]
    assert out.n_hours == n
    assert abs(out.mae - sae / n) < 1e-9
    assert abs(out.bias - se / n) < 1e-9
    assert abs(out.wape - sae / sx) < 1e-9
    spark.catalog.clearCache()


def test_markov_transitions_match_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import markov_event_transitions

    evs = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    from collections import Counter

    seqs: dict[int, list] = {}
    for r in evs:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    pairs: Counter = Counter()
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            pairs[(a, b)] += 1
    totals: Counter = Counter()
    for (a, _b), n in pairs.items():
        totals[a] += n
    out = markov_event_transitions(spark, sf_dir).collect()
    assert len(out) == len(pairs)
    for r in out:
        n = pairs[(r.from_type, r.to_type)]
        assert r.n == n, (r.from_type, r.to_type)
        assert abs(r.prob - n / totals[r.from_type]) < 1e-12


def test_decayed_demand_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.analytic_windows import (
        DECAY_CAP_MONTHS,
        DECAY_TOP_K,
        decayed_part_demand,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_partkey",
            "CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
            "CAST(ROUND(l_quantity) AS BIGINT) AS q",
        )
        .collect()
    )
    from collections import Counter

    cells: Counter = Counter()
    for r in rows:
        cells[(r.l_partkey, r.m)] += r.q
    mx = max(m for _, m in cells)
    w = [10**6]
    for _ in range(DECAY_CAP_MONTHS):
        w.append(w[-1] * 9 // 10)
    dec: Counter = Counter()
    raw: Counter = Counter()
    for (pk, m), q in cells.items():
        age = min(mx - m, DECAY_CAP_MONTHS)
        dec[pk] += q * w[age]
        raw[pk] += q
    top = sorted(dec.items(), key=lambda kv: (-kv[1], kv[0]))[:DECAY_TOP_K]
    out = decayed_part_demand(spark, sf_dir).collect()
    assert [(r.partkey, r.decayed_i6, r.raw_qty, r.rank) for r in out] == [
        (pk, d, raw[pk], i + 1) for i, (pk, d) in enumerate(top)
    ]


def test_seasonality_index_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.analytic_windows import (
        monthly_seasonality_index,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("month(o_orderdate) AS mo", "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c")
        .collect()
    )
    from collections import Counter

    cents: Counter = Counter()
    n_ord: Counter = Counter()
    for r in rows:
        cents[r.mo] += r.c
        n_ord[r.mo] += 1
    total = sum(cents.values())
    nm = len(cents)
    out = monthly_seasonality_index(spark, sf_dir).collect()
    assert len(out) == nm
    for r in out:
        assert (r.n_orders, r.revenue_cents) == (n_ord[r.month], cents[r.month])
        assert abs(r.seasonality_index - cents[r.month] * nm / total) < 1e-12
    # multiplicative indexes weighted by nothing: plain mean is 1.0
    assert abs(sum(r.seasonality_index for r in out) / nm - 1.0) < 1e-9


def test_customer_gini_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import customer_spend_gini

    from collections import Counter

    spend: Counter = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        spend[r.o_custkey] += round(r.o_totalprice * 100)
    xs = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    total = sum(v for _, v in xs)
    weighted = sum((i + 1) * v for i, (_, v) in enumerate(xs))
    gini_ref = 2 * weighted / n / total - (n + 1) / n
    out = customer_spend_gini(spark, sf_dir).collect()[0]
    assert (out.n_customers, out.total_cents) == (n, total)
    assert abs(out.gini - gini_ref) < 1e-12
    assert 0 <= out.gini < 1
    spark.catalog.clearCache()


def test_tokenizer_fertility_matches_scalar(spark, sf_dir):
    """Round 9 reworked fertility to REAL BPE encodes: total_tokens is
    now the sum of per-word-type BPE token counts under the merge table
    trained on this corpus. The scalar walk trains+encodes by hand (the
    tests/test_bpe_encode.py reference implementation) and aggregates
    per language; doc counts and char totals keep their old meaning."""
    from tests.test_bpe_encode import scalar_bpe

    from bigdata_2025_1_spark.operators.corpus_ops import BPE_MERGES
    from bigdata_2025_1_spark.operators.text_analysis import (
        tokenizer_fertility_by_lang,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "text", "n_chars")
        .collect()
    )
    _, segs = scalar_bpe([r.text for r in docs], BPE_MERGES)
    agg: dict[str, list[int]] = {}
    for r in docs:
        a = agg.setdefault(r.lang, [0, 0, 0])
        a[0] += 1
        a[1] += r.n_chars
        a[2] += sum(
            len(segs[w]) for w in r.text.lower().strip().split() if w
        )
    out = {r.lang: r for r in tokenizer_fertility_by_lang(spark, sf_dir).collect()}
    assert set(out) == set(agg)
    for lang, (nd, tc, tt) in agg.items():
        r = out[lang]
        assert (r.n_docs, r.total_chars, r.total_tokens) == (nd, tc, tt)
        if tt:
            assert abs(r.chars_per_token - tc / tt) < 1e-12
    spark.catalog.clearCache()


def test_jsd_one_empty_source_is_null_not_crash(spark, tmp_path):
    """CODE-REVIEW r8: with one configured source absent, every A-row's
    mixture denominator is 0 — ANSI Spark must NOT raise DIVIDE_BY_ZERO
    and both engines must emit the all-NULL metrics row."""
    import duckdb
    from pyspark.sql import functions as SF

    from bigdata_2025_1_spark.io import TABLES, load
    from bigdata_2025_1_spark.oracle import check_query
    from bigdata_2025_1_spark.registry import all_oracles, all_queries

    sf = str(tmp_path)
    for t in TABLES:
        df = load(spark, "/root/testdata/sf0.001", t)
        if t == "documents":
            df = df.filter(SF.col("source") != "src1")  # JSD_SRC_B vanishes
        df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/{t}.parquet")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    problems = check_query(
        spark,
        con,
        all_queries()["jsd_source_divergence"],
        all_oracles()["jsd_source_divergence"],
        sf,
    )
    assert not problems, problems
    row = all_queries()["jsd_source_divergence"](spark, sf).collect()[0]
    assert row.n_tokens_b == 0 or row.n_tokens_b is None
    assert row.jsd_nats is None and row.kl_a_m is None
    con.close()
    spark.catalog.clearCache()


def test_tfidf_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.pipeline_ops import tfidf_top_terms

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    from collections import Counter

    toks = {r.doc_id: [w for w in r.text.lower().strip().split() if w] for r in docs}
    n_docs = len(docs)
    dfreq: Counter = Counter()
    for ts in toks.values():
        dfreq.update(set(ts))
    ref = []
    for d, ts in toks.items():
        if d >= 10:
            continue
        for w, tf in Counter(ts).items():
            idf = math.log(n_docs / dfreq[w])
            if idf > 0:
                ref.append((d, w, round(tf * idf, 6)))
    ref.sort(key=lambda t: (t[0], -t[2], t[1]))
    out = [(r.doc_id, r.word, r.tfidf) for r in tfidf_top_terms(spark, sf_dir).collect()]
    assert out == ref


def test_vocab_growth_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.corpus_ops import vocab_growth_curve

    docs = sorted(
        (
            (r.doc_id, [w for w in r.text.lower().strip().split() if w])
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        )
    )
    out = vocab_growth_curve(spark, sf_dir).collect()
    # output is per 50-doc bucket (docs ordered by doc_id): cumulative
    # docs/tokens/distinct-vocab at each bucket boundary
    seen: set = set()
    cum_tokens = 0
    ref = []
    for i, (d, ts) in enumerate(docs, start=1):
        cum_tokens += len(ts)
        seen |= set(ts)
        if i % 50 == 0:
            ref.append((i // 50 - 1, i, cum_tokens, len(seen)))
    if len(docs) % 50 != 0:
        ref.append((len(docs) // 50, len(docs), cum_tokens, len(seen)))
    got = [(r.bucket, r.docs_seen, r.tokens_seen, r.vocab_size) for r in out]
    assert got == ref


def test_shipping_latency_percentiles_match_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.statistics import (
        LATENCY_PCTS,
        shipping_latency_percentiles,
    )

    ordd = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    by_pri: dict[str, list[int]] = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        pri, od = ordd[r.l_orderkey]
        by_pri.setdefault(pri, []).append((r.l_shipdate - od).days)
    out = {r.priority: r for r in shipping_latency_percentiles(spark, sf_dir).collect()}
    assert set(out) == set(by_pri)
    for pri, days in by_pri.items():
        days.sort()
        n = len(days)
        r = out[pri]
        assert r.n == n
        for p in LATENCY_PCTS:
            # nearest-rank: value at row ceil(n*p/100)
            assert r[f"p{p}"] == days[(n * p + 99) // 100 - 1], (pri, p)


def test_user_active_coverage_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import user_active_coverage

    evs = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
        .collect()
    )
    import calendar

    ivs: dict[int, list] = {}
    for r in evs:
        s = calendar.timegm(r.ts.timetuple())
        e = s + 60 + (round(r.value * 100) % 600)
        ivs.setdefault(r.user_id, []).append((s, e))
    out = {r.user_id: r for r in user_active_coverage(spark, sf_dir).collect()}
    assert set(out) == set(ivs)
    for u, spans in ivs.items():
        spans.sort()
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        r = out[u]
        assert r.n_intervals == len(merged), u
        assert r.covered_seconds == sum(e - s for s, e in merged), u
        assert r.longest_interval == max(e - s for s, e in merged), u


def test_rolling_wau_matches_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        WAU_WINDOW_DAYS,
        rolling_weekly_active_users,
    )
    import datetime as dt

    evs = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    by_day: dict = {}
    for r in evs:
        by_day.setdefault(r.ts.date(), set()).add(r.user_id)
    d0, d1 = min(by_day), max(by_day)
    ref = {}
    d = d0
    while d <= d1:
        users: set = set()
        for k in range(WAU_WINDOW_DAYS):
            users |= by_day.get(d - dt.timedelta(days=k), set())
        ref[d] = len(users)
        d += dt.timedelta(days=1)
    out = {r.day: r.wau for r in rolling_weekly_active_users(spark, sf_dir).collect()}
    assert out == ref


def test_token_association_rules_match_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.text_analysis import (
        MIN_PAIR_TOKEN_LEN,
        RULE_MIN_SUPPORT,
        RULE_TOP_K,
        token_association_rules,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    from collections import Counter
    from itertools import permutations

    doc_toks = {
        r.doc_id: sorted(
            {w for w in r.text.lower().strip().split() if len(w) >= MIN_PAIR_TOKEN_LEN}
        )
        for r in docs
    }
    singles: Counter = Counter()
    pairs: Counter = Counter()
    nd = sum(1 for ts in doc_toks.values() if ts)
    for ts in doc_toks.values():
        singles.update(ts)
        for a, b in permutations(ts, 2):
            pairs[(a, b)] += 1
    rules = []
    for (a, b), n_ab in pairs.items():
        if n_ab >= RULE_MIN_SUPPORT:
            rules.append(
                (a, b, n_ab, n_ab / singles[a], n_ab * nd / singles[a] / singles[b])
            )
    rules.sort(key=lambda r: (-r[4], r[0], r[1]))
    out = token_association_rules(spark, sf_dir).collect()
    assert len(out) == min(RULE_TOP_K, len(rules))
    for rank, (row, ref) in enumerate(zip(out, rules), start=1):
        assert (row.antecedent, row.consequent, row.n_ab, row.rank) == (
            ref[0],
            ref[1],
            ref[2],
            rank,
        )
        assert abs(row.confidence - ref[3]) < 1e-12
        assert abs(row.lift - ref[4]) < 1e-12


def test_duplicate_spans_match_scalar(spark, sf_dir):
    from bigdata_2025_1_spark.operators.corpus_ops import (
        SPAN_K,
        corpus_duplicate_spans,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    spans = {}
    for r in docs:
        ts = [w for w in r.text.lower().strip().split() if w]
        spans[r.doc_id] = {
            " ".join(ts[i : i + SPAN_K]) for i in range(len(ts) - SPAN_K + 1)
        }
    from collections import Counter

    span_docs: Counter = Counter()
    for ss in spans.values():
        span_docs.update(ss)  # one per doc (sets): distinct-doc counts
    out = {r.doc_id: r for r in corpus_duplicate_spans(spark, sf_dir).collect()}
    assert set(out) == set(spans)
    for d, ss in spans.items():
        r = out[d]
        n_dup = sum(1 for s in ss if span_docs[s] >= 2)
        assert (r.n_spans, r.n_dup_spans) == (len(ss), n_dup), d
        assert r.dup_heavy == (10 * n_dup > 3 * len(ss))
    spark.catalog.clearCache()
