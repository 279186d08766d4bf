"""Scale guards: the documented O(n^2) anchors must refuse large inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.operators.dedup import dedup_embedding_cosine


def test_embedding_cosine_guard_raises_on_large_input(spark, tmp_path):
    sf = str(tmp_path)
    n = 10_001
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("synthetic").alias("source"),
        F.lit("t").alias("text"), F.lit(1).alias("n_chars"), F.lit("en").alias("lang"),
    )
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    docs.write.parquet(f"{sf}/documents.parquet")
    emb.write.parquet(f"{sf}/embeddings.parquet")
    with pytest.raises(ValueError, match="ann_srp_lsh_pairs"):
        dedup_embedding_cosine(spark, sf)


def test_embedding_cosine_runs_on_fixture(spark, sf_dir):
    # below the guard threshold the anchor still works
    assert dedup_embedding_cosine(spark, sf_dir).count() >= 0


def _one_cell_embeddings(spark, n, noise_scale):
    """n 64-dim vectors engineered to all land in first-level cell
    argmax(proj onto _CENTROIDS): 10x the first centroid direction plus
    (optionally) small deterministic noise. Base projection onto C0 is
    640e9 scaled units; |cross-projections| stay well under half that."""
    import numpy as np

    from bigdata_2025_1_spark.operators.similarity import _CENTROIDS

    rng = np.random.default_rng(7)
    c0 = np.array(_CENTROIDS[0], dtype=np.float64)
    vecs = 10.0 * c0 + noise_scale * rng.standard_normal((n, 64))
    return spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id: long, embedding: array<double>",
    )


def test_semdedup_oversized_cell_resplits(spark):
    """VERDICT r5 #2: an adversarial all-one-first-level-cell input must
    RE-SPLIT by the second-level quantizer, never pair quadratically in
    one group."""
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.operators.similarity import semdedup_keyed_assignment

    n = 200
    # noise 6.0 empirically keeps ALL vectors in first-level cell 0
    # (projection gap ~55 sigma) while spreading them over >=3 sub-cells
    keyed = semdedup_keyed_assignment(_one_cell_embeddings(spark, n, 6.0), cell_cap=20)
    groups = keyed.groupBy("cell", "subkey").count().collect()
    assert len({r.cell for r in groups}) == 1  # adversarial premise holds
    assert len(groups) > 1, "oversized cell did not re-split"
    assert max(r["count"] for r in groups) < n
    spark.catalog.clearCache()


def test_semdedup_hard_guard_raises_on_identical_flood(spark, tmp_path):
    """Identical vectors defeat any quantizer re-split — the hard cap
    must raise (routing to exact dedup), never silently go quadratic."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.operators import similarity as S

    sf = str(tmp_path)
    n = S.SEM_HARD_CAP + 1
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * 64).alias("embedding"),
    )
    emb.write.parquet(f"{sf}/embeddings.parquet")
    with _pytest.raises(ValueError, match="never.*quadratic|re-split|dedup_exact_hash"):
        S.semantic_dedup_pairs(spark, sf)
    spark.catalog.clearCache()


def test_semdedup_small_cells_pair_whole(spark):
    """Below the cap the subkey collapses to 0 — small cells keep the
    un-split pairing semantics."""
    from bigdata_2025_1_spark.operators.similarity import semdedup_keyed_assignment

    keyed = semdedup_keyed_assignment(_one_cell_embeddings(spark, 15, 0.5), cell_cap=20)
    assert keyed.filter("subkey != 0").count() == 0
    spark.catalog.clearCache()


def test_pca_guard_raises_past_int64_bound(spark, tmp_path, monkeypatch):
    """ADVICE r6: the per-dimension Σ dq·xv sums are int64-exact only to
    PCA_MAX_ROWS embedding rows — past the bound the query must raise
    with the rescale route, never return silently-overflowed loadings.
    (Bound shrunk via monkeypatch; the arithmetic bound itself is a
    constant documented at the definition.)"""
    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.operators import similarity as S

    sf = str(tmp_path)
    spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.5)] * 64).alias("embedding"),
    ).write.parquet(f"{sf}/embeddings.parquet")
    monkeypatch.setattr(S, "PCA_MAX_ROWS", 9)
    with pytest.raises(ValueError, match="int64-exact bound"):
        S.pca_power_iteration(spark, sf)
    spark.catalog.clearCache()
    # at or below the bound the guard is silent
    monkeypatch.setattr(S, "PCA_MAX_ROWS", 10)
    assert S.pca_power_iteration(spark, sf).count() == 64
    spark.catalog.clearCache()


def test_naive_bayes_vocab_guard_switches_join(spark, sf_dir, monkeypatch):
    """VERDICT r6 #6: past NB_BROADCAST_VOCAB_MAX measured token types
    the (token, class) log table must NOT carry a broadcast hint — the
    evidence join is left to hash-partition on w (AQE may still
    broadcast a genuinely tiny side at runtime; the guard governs the
    DECLARED plan, which is what survives a 10M-type vocabulary). Pin:
    forcing the bound to 0 removes exactly one broadcast HINT from the
    analyzed logical plan, and the confusion matrix is identical
    either way."""
    from bigdata_2025_1_spark.operators import text_analysis as TA

    def n_hints(df):
        # hints live in the ANALYZED plan (the optimizer consumes them
        # when planning the join)
        return df._jdf.queryExecution().analyzed().toString().count(
            "ResolvedHint"
        )

    wide = TA.naive_bayes_source_classifier(spark, sf_dir)
    rows_wide = sorted(map(tuple, wide.collect()))
    h_wide = n_hints(wide)
    spark.catalog.clearCache()

    monkeypatch.setattr(TA, "NB_BROADCAST_VOCAB_MAX", 0)
    narrow = TA.naive_bayes_source_classifier(spark, sf_dir)
    rows_narrow = sorted(map(tuple, narrow.collect()))
    h_narrow = n_hints(narrow)
    spark.catalog.clearCache()

    assert rows_wide == rows_narrow
    assert h_narrow == h_wide - 1, (h_narrow, h_wide)


def test_bradley_terry_kernel_guard_raises_past_bound(spark, sf_dir, monkeypatch):
    """VERDICT r7 #4: the collapsed MM pandas kernel is only correct
    while the comparison matrix stays kernel-sized — past BT_KERNEL_MAX
    participants (or BT_KERNEL_MAX_PAIRS collapsed pairs) the query must
    raise with routing advice to the distributed TextRank shape, never
    silently funnel an item-scale matrix through one task. Bounds shrunk
    via monkeypatch; TPC-H nations sit far below the real constants."""
    from bigdata_2025_1_spark.operators import model_eval as ME

    monkeypatch.setattr(ME, "BT_KERNEL_MAX", 3)
    with pytest.raises(ValueError, match="TextRank"):
        ME.bradley_terry_nation_strength(spark, sf_dir)
    spark.catalog.clearCache()

    monkeypatch.setattr(ME, "BT_KERNEL_MAX", 2_000)
    monkeypatch.setattr(ME, "BT_KERNEL_MAX_PAIRS", 5)
    with pytest.raises(ValueError, match="TextRank"):
        ME.bradley_terry_nation_strength(spark, sf_dir)
    spark.catalog.clearCache()


def test_bradley_terry_leaves_no_cached_blocks(spark, sf_dir):
    """VERDICT r7 #3: the former wmat/pairs persist pair is replaced by
    a single bounded driver materialization — after the query builds and
    runs, the session's cache manager must hold nothing from it."""
    from bigdata_2025_1_spark.operators import model_eval as ME

    spark.catalog.clearCache()
    out = ME.bradley_terry_nation_strength(spark, sf_dir)
    assert out.count() > 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
