"""Hand-checkable semantics for the round-4 late additions (table_ops,
MAD outliers, equi-depth deciles, BM25): the DuckDB oracle proves engine
parity; these prove the operators compute the textbook quantity on
crafted fixtures small enough to verify by hand. Each test writes a tiny
parquet fixture dir and drives the REAL registered query function."""

from __future__ import annotations

import math
from datetime import datetime

from bigdata_2025_1_spark.operators.retrieval_ops import (
    BM25_K1,
    BM25_B,
    bm25_doc_ranking,
)
from bigdata_2025_1_spark.operators.statistics import (
    equi_depth_price_deciles,
    mad_value_outliers,
)
from bigdata_2025_1_spark.operators.table_ops import (
    merge_upsert_latest_state,
    order_month_streaks,
    stratified_exact_sample,
)


def _write(df, d, table):
    df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{table}.parquet"))


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_mad_flags_only_the_far_point(spark, tmp_path):
    # values 10,10,10,10,110: lower median (rank 3 of 5) = 10; deviations
    # 0,0,0,0,100 -> MAD (rank 3) = 0 -> the single dev>0 row is the
    # only outlier (threshold 4.4478*0 = 0).
    rows = [
        (i, datetime(2026, 1, 1), 1, "a", v, "{}")
        for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 110.0])
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(ev, tmp_path, "events")
    out = mad_value_outliers(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.median, r.mad, r.n_outliers) == (5, 10.0, 0.0, 1)


def test_equi_depth_keeps_ties_in_one_bucket(spark, tmp_path):
    # 5 rows at price 1.00 and 5 at 2.00 (N=10): value 1.00 has
    # cum_before 0 -> bucket 0; value 2.00 has cum_before 5 -> bucket 5.
    # ntile(10) would have split each tie group across 5 buckets.
    rows = [(i, 1, "O", 1.0 if i < 5 else 2.0, datetime(2026, 1, 1), "p") for i in range(10)]
    _write(_orders(spark, rows), tmp_path, "orders")
    out = {r.bucket: r for r in equi_depth_price_deciles(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 5}
    assert out[0].n_rows == 5 and out[0].lo == out[0].hi == 1.0
    assert out[5].n_rows == 5 and out[5].lo == out[5].hi == 2.0


def test_merge_upsert_actions_and_latest_wins(spark, tmp_path):
    # cust 1: both eras -> update, delta state wins; cust 2: base only ->
    # keep; cust 3: delta only -> insert. Cust 1's delta has two orders
    # on the SAME date -> the higher orderkey wins (total order).
    rows = [
        (1, 1, "F", 10.0, datetime(1996, 5, 1), "p"),
        (2, 1, "O", 20.0, datetime(1999, 1, 1), "p"),
        (3, 1, "P", 30.0, datetime(1999, 1, 1), "p"),
        (4, 2, "F", 40.0, datetime(1995, 2, 1), "p"),
        (5, 3, "O", 50.0, datetime(2000, 7, 1), "p"),
    ]
    _write(_orders(spark, rows), tmp_path, "orders")
    out = {r.custkey: r for r in merge_upsert_latest_state(spark, str(tmp_path)).collect()}
    assert out[1].action == "update" and out[1].status == "P" and out[1].total_cents == 3000
    assert out[2].action == "keep" and out[2].total_cents == 4000
    assert out[3].action == "insert" and out[3].total_cents == 5000


def test_month_streaks_islands(spark, tmp_path):
    # cust 1 orders in 2026-01, 02, 03 and 06: longest streak 3, two
    # islands, 4 active months; a second order in an already-active
    # month must not inflate anything.
    months = [(2026, 1), (2026, 2), (2026, 3), (2026, 6), (2026, 1)]
    rows = [
        (i, 1, "O", 1.0, datetime(y, m, 15), "p") for i, (y, m) in enumerate(months)
    ]
    _write(_orders(spark, rows), tmp_path, "orders")
    out = order_month_streaks(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.longest_streak, r.active_months, r.n_streaks) == (3, 4, 2)


def test_stratified_sample_is_exact_k_and_stable(spark, tmp_path):
    rows = [(i, 1, "O", float(i), datetime(2026, 1, 1), f"p{i % 2}") for i in range(60)]
    _write(_orders(spark, rows), tmp_path, "orders")
    a = stratified_exact_sample(spark, str(tmp_path)).collect()
    b = stratified_exact_sample(spark, str(tmp_path)).collect()
    assert a == b  # reproducible
    per = {}
    for r in a:
        per.setdefault(r.priority, []).append(r.sample_rank)
    assert set(per) == {"p0", "p1"}
    for ranks in per.values():
        assert ranks == list(range(1, 21))  # exactly k, densely ranked


def test_bm25_matches_hand_formula(spark, tmp_path):
    # 3 docs, every doc 4 tokens long (dl = avgdl -> length norm = 1):
    # score(doc) = ln(1 + (N - df + .5)/(df + .5)) * tf*(k1+1)/(tf + k1)
    docs = [
        (0, "spark a b c", "en", "s", 11),
        (1, "spark spark a b", "en", "s", 15),
        (2, "x y z w", "en", "s", 7),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write(df, tmp_path, "documents")
    out = {r.doc_id: r for r in bm25_doc_ranking(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}  # only docs containing a query term
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))

    def score(tf):
        return idf * (tf * (BM25_K1 + 1)) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * 1.0))

    assert abs(out[0].bm25 - score(1)) < 2e-6
    assert abs(out[1].bm25 - score(2)) < 2e-6
    assert out[1].rank == 1 and out[0].rank == 2  # higher tf wins


def test_pmi_matches_hand_formula(spark, tmp_path):
    # corpus "a b a b a b a b a b": N_tok=10, c(a)=c(b)=5; bigrams: 9
    # total, "a b" x5, "b a" x4 -> PMI(a,b) = ln((5/9)/((5/10)*(5/10)))
    # = ln(2.222...); "b a" (count 4) falls under the min-count 5 gate.
    from bigdata_2025_1_spark.operators.corpus_ops import pmi_token_pairs

    df = spark.createDataFrame(
        [(0, "a b a b a b a b a b", "en", "s", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write(df, tmp_path, "documents")
    out = pmi_token_pairs(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.tok_a, r.tok_b, r.pair_count, r.rank) == ("a", "b", 5, 1)
    assert abs(r.pmi - math.log(5.0 * 10 / 5 * 10 / 5 / 9)) < 2e-6


def test_kmeans_converges_on_separated_points(spark, tmp_path):
    # seeds 0..3 well-separated on distinct axes; vec 4 duplicates seed
    # 2's vector -> joins cluster 2, all centroids stay on their seed,
    # inertia 0 everywhere.
    from bigdata_2025_1_spark.operators.similarity import kmeans_lloyd_clusters

    def vec(axis, mag):
        v = [0.0] * 64
        v[axis] = mag
        return v

    rows = [
        (0, vec(0, 0.5), 0),
        (1, vec(1, 0.5), 1),
        (2, vec(2, 0.5), 2),
        (3, vec(3, 0.5), 3),
        (4, vec(2, 0.5), 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    _write(df, tmp_path, "embeddings")
    out = {r.cluster_id: r for r in kmeans_lloyd_clusters(spark, str(tmp_path)).collect()}
    assert {c: r.n_members for c, r in out.items()} == {0: 1, 1: 1, 2: 2, 3: 1}
    assert all(r.inertia == 0 for r in out.values())
    assert out[0].c0 == 0.5 and out[1].c1 == 0.5 and out[2].c0 == 0.0


def test_interpolation_bridges_gap_linearly(spark, tmp_path):
    # type 'a' observed at hour 0 (value 10) and hour 3 (value 40):
    # hours 1 and 2 interpolate to 20 and 30; observed rows keep their
    # exact mean (two events at hour 3 -> mean of 30 and 50 = 40).
    from bigdata_2025_1_spark.operators.events_ops import events_interpolated_hourly

    rows = [
        (0, datetime(2026, 1, 1, 0, 5), 1, "a", 10.0, "{}"),
        (1, datetime(2026, 1, 1, 3, 10), 1, "a", 30.0, "{}"),
        (2, datetime(2026, 1, 1, 3, 40), 1, "a", 50.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(ev, tmp_path, "events")
    out = sorted(
        events_interpolated_hourly(spark, str(tmp_path)).collect(),
        key=lambda r: r.hour,
    )
    assert [(r.value, r.observed) for r in out] == [
        (10.0, True),
        (20.0, False),
        (30.0, False),
        (40.0, True),
    ]


def test_quantile_normalize_maps_ranks_to_global_values(spark, tmp_path):
    # source A lengths [10, 20]; source B [100, 200, 300]; global sorted
    # [10, 20, 100, 200, 300] (N=5). A's ranks map to percentiles 0 and
    # 1 -> values 10 and 300; B's to 0, .5, 1 -> 10, 100 (idx round(2)),
    # 300. Within-source order is preserved, distributions align.
    from bigdata_2025_1_spark.operators.pandas_surface import quantile_normalize_doclen

    rows = [
        (0, "t", "en", "A", 10),
        (1, "t", "en", "A", 20),
        (2, "t", "en", "B", 100),
        (3, "t", "en", "B", 200),
        (4, "t", "en", "B", 300),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write(df, tmp_path, "documents")
    out = {r.doc_id: r.normalized for r in quantile_normalize_doclen(spark, str(tmp_path)).collect()}
    assert out == {0: 10, 1: 300, 2: 10, 3: 100, 4: 300}


def test_markov_transitions_hand_check(spark, tmp_path):
    # user 1 sequence a->b->a ; user 2 sequence a->a.
    # pairs: (a,b) x1, (b,a) x1, (a,a) x1 -> from 'a' total 2: P(b|a)=0.5,
    # P(a|a)=0.5; from 'b' total 1: P(a|b)=1.0.
    from bigdata_2025_1_spark.operators.events_ops import markov_event_transitions

    rows = [
        (0, datetime(2026, 1, 1, 0, 0), 1, "a", 1.0, "{}"),
        (1, datetime(2026, 1, 1, 0, 1), 1, "b", 1.0, "{}"),
        (2, datetime(2026, 1, 1, 0, 2), 1, "a", 1.0, "{}"),
        (3, datetime(2026, 1, 1, 0, 0), 2, "a", 1.0, "{}"),
        (4, datetime(2026, 1, 1, 0, 1), 2, "a", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(ev, tmp_path, "events")
    out = {(r.from_type, r.to_type): (r.n, r.prob) for r in markov_event_transitions(spark, str(tmp_path)).collect()}
    assert out == {("a", "b"): (1, 0.5), ("a", "a"): (1, 0.5), ("b", "a"): (1, 1.0)}


def test_user_feature_matrix_hand_check(spark, tmp_path):
    from bigdata_2025_1_spark.operators.events_ops import user_feature_matrix

    rows = [
        (0, datetime(2026, 1, 1, 10, 0), 1, "click", 2.5, "{}"),
        (1, datetime(2026, 1, 1, 11, 0), 1, "purchase", 10.0, "{}"),
        (2, datetime(2026, 1, 3, 9, 0), 1, "click", -1.5, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write(ev, tmp_path, "events")
    out = user_feature_matrix(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.n_click, r.n_purchase, r.n_view) == (3, 2, 1, 0)
    assert r.total_value_cents == 250 + 1000 - 150
    assert (r.active_days, r.tenure_days) == (2, 2)
    assert r.events_per_active_day == 1.5
