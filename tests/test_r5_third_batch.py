"""Round-5 third batch: cross-source overlap, SQ8 distortion audit,
mutual-NN pairs, novelty decay, Poisson bootstrap."""

from __future__ import annotations

from bigdata_2025_1_spark.registry import all_queries

QUERIES = all_queries()


def test_cross_source_overlap_set_algebra(spark, sf_dir):
    rows = QUERIES["cross_source_overlap"](spark, sf_dir).collect()
    assert rows, "fixture sources share syndicated spans"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.shared_grams <= min(r.n_grams_a, r.n_grams_b)
        expect_j = r.shared_grams / (r.n_grams_a + r.n_grams_b - r.shared_grams)
        assert abs(r.jaccard - expect_j) < 1e-12
        assert 0 < r.jaccard <= 1


def test_sq8_distortion_within_theoretical_bound(spark, sf_dir):
    """round(127·x/s)/127·s clips each element error at s/254, so the
    relative squared error is bounded by dim·(s/254)²/‖x‖² ≤ 64/254²
    (since ‖x‖² ≥ s²) ≈ 9.9e-4."""
    rows = QUERIES["sq8_quantization_error"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.mean_rel_err <= r.max_rel_err
        assert r.max_rel_err <= 64 / 254**2 + 1e-6
        assert r.n_zero_vectors >= 0


def test_reciprocal_nn_matches_numpy(spark, sf_dir):
    import numpy as np

    from bigdata_2025_1_spark.io import load
    from bigdata_2025_1_spark.operators.similarity import RNN_SUBSET

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(f"vec_id < {RNN_SUBSET}")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    E = np.array([r.embedding for r in emb], dtype=np.float64)
    p = E[:, None, :] * E[None, :, :] * 1e12
    dots = (np.sign(p) * np.floor(np.abs(p) + 0.5)).astype(np.int64).sum(axis=2)
    nsq = np.diag(dots).astype(np.float64)
    cos = dots / np.sqrt(nsq[:, None] * nsq[None, :])
    np.fill_diagonal(cos, -2.0)
    # argmax with neighbor-id tiebreak == first max in id order
    top1 = {int(ids[i]): int(ids[int(np.argmax(cos[i]))]) for i in range(len(ids))}
    expected = {
        (a, b) for a, b in top1.items() if a < b and top1.get(b) == a
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["reciprocal_nn_pairs"](spark, sf_dir).collect()
    }
    assert got == expected


def test_novelty_decay_conserves_first_occurrences(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.functions import text as T
    from bigdata_2025_1_spark.io import load
    from bigdata_2025_1_spark.operators.corpus_ops import SPAN_K

    rows = QUERIES["doc_novelty_decay"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.novel_grams <= r.grams
        assert abs(r.novelty - r.novel_grams / r.grams) < 1e-12
    distinct_hashes = (
        load(spark, sf_dir, "documents")
        .select(F.explode(T.word_shingles(F.col("text"), k=SPAN_K)).alias("s"))
        .select(F.md5("s").alias("h"))
        .distinct()
        .count()
    )
    # every distinct span is novel exactly once, in exactly one bucket
    assert sum(r.novel_grams for r in rows) == distinct_hashes


def test_bootstrap_replicates_concentrate(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.io import load

    rows = QUERIES["bootstrap_mean_ci"](spark, sf_dir).collect()
    assert len(rows) == 32
    n = load(spark, sf_dir, "orders").count()
    true_mean = (
        load(spark, sf_dir, "orders")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("double")
            / F.count("*")
            / 100
        )
        .first()[0]
    )
    for r in rows:
        # Poisson(1) replicate size concentrates around n
        assert abs(r.n_eff - n) < 0.2 * n
        # each replicate mean lands near the point estimate
        assert abs(r.mean_value - true_mean) / true_mean < 0.05
    means = [r.mean_value for r in rows]
    assert min(means) < true_mean < max(means)


def test_harmonic_centrality_bounds(spark, sf_dir):
    rows = QUERIES["harmonic_centrality_trade"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_reached_from <= 25
        # each reaching source contributes at most 1.0 (d=1) and at
        # least 1/3 (d=3)
        assert r.harmonic <= r.n_reached_from + 1e-9
        assert r.harmonic >= r.n_reached_from / 3 - 1e-9
    assert any(r.harmonic > 0 for r in rows)


def test_contrastive_triplets_separate(spark, sf_dir):
    rows = QUERIES["contrastive_triplet_mining"](spark, sf_dir).collect()
    assert rows, "fixture has near-dup pairs above the positive threshold"
    for r in rows:
        assert r.pos_cosine >= 0.45 > r.neg_cosine
        assert r.separation > 0
        assert len({r.anchor_id, r.positive_id, r.negative_id}) == 3
