"""lsh_band_sweep: the deployed-config row must reconcile exactly with
lsh_recall_eval (shared truth AND shared band machinery), the grid must
show the S-curve monotonicity, and the theoretical column must be the
exact 1-(1-J^r)^b float."""

from __future__ import annotations

from bigdata_2025_1_spark.operators.dedup import (
    BANDS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
)
from bigdata_2025_1_spark.registry import all_queries


def test_deployed_row_reconciles_with_recall_eval(spark, sf_dir):
    qs = all_queries()
    grid = {r.bands: r for r in qs["lsh_band_sweep"](spark, sf_dir).collect()}
    eval_row = qs["lsh_recall_eval"](spark, sf_dir).collect()[0]
    dep = grid[BANDS]
    assert dep.rows_per_band == NUM_HASHES // BANDS
    assert dep.n_true_pairs == eval_row.n_true_pairs
    assert dep.n_candidates == eval_row.n_lsh_candidates
    assert dep.n_verified == eval_row.n_lsh_pairs
    assert dep.recall == eval_row.recall
    spark.catalog.clearCache()


def test_grid_monotonicity_and_theory_column(spark, sf_dir):
    rows = all_queries()["lsh_band_sweep"](spark, sf_dir).collect()
    assert [r.bands for r in rows] == [1, 2, 4, 8]
    # candidate sets NEST along this divisor chain: sharing a band of
    # 2r rows means sharing both its r-row halves, so 1x8 ⊆ 2x4 ⊆
    # 4x2 ⊆ 8x1 — counts and recall are monotone by construction
    cands = [r.n_candidates for r in rows]
    assert all(a <= b for a, b in zip(cands, cands[1:]))
    recalls = [r.recall for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    # verified pairs are a subset of truth under every config
    for r in rows:
        assert r.n_verified <= r.n_true_pairs
        j = float(JACCARD_THRESHOLD)
        assert r.p_cand_at_thresh == 1.0 - (1.0 - j**r.rows_per_band) ** r.bands
    spark.catalog.clearCache()
