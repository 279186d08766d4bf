"""ann_release_gate reconciliation contract (the corpus/dedup release-
gate convention applied to the ANN index-maintenance family): every
sub-scalar in the gate row must equal the same aggregate computed from
the STANDALONE registered query it composes, plus the deny, drift, and
no-decision branches exercised on crafted vector tables with
hand-computable arithmetic.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from bigdata_2025_1_spark.operators.similarity import (
    N_PROBE,
    _CENTROIDS,
    _py_ivf_cell,
)
from bigdata_2025_1_spark.registry import all_queries


def test_gate_reconciles_with_standalone_queries(spark, sf_dir):
    qs = all_queries()
    row = qs["ann_release_gate"](spark, sf_dir).collect()[0]

    census = (
        qs["ivf_ingest_assign"](spark, sf_dir)
        .agg(
            F.count("*").alias("cells"),
            F.sum(F.col("needs_split").cast("int")).alias("n_split"),
            F.sum("n_vecs").alias("nv"),
            F.max("fill_ratio").alias("maxfill"),
        )
        .collect()[0]
    )
    assert row.n_cells_occupied == census.cells
    assert row.n_cells_need_split == (census.n_split or 0)
    assert row.n_vecs == (census.nv or 0)
    assert row.max_fill_ratio == census.maxfill

    drift = qs["embedding_norm_drift"](spark, sf_dir).collect()[0]
    assert row.ks_reject == drift.reject_05

    curve = {
        r.nprobe: r
        for r in qs["ivf_nprobe_recall_curve"](spark, sf_dir).collect()
    }[N_PROBE]
    assert row.recall_at_deployed == curve.recall_at_k
    assert row.scanned_frac_at_deployed == curve.scanned_frac
    assert row.n_truth == curve.n_truth
    assert row.n_queries == curve.n_queries
    assert row.n_queries > 0 and row.n_truth > 0  # fixtures serve queries

    # the decision really is the conjunction of the leg verdicts
    assert row.ann_ok == (
        row.ok_balance and row.ok_drift and row.ok_recall and row.ok_scan
    )
    spark.catalog.clearCache()


def _write_vecs(spark, d, rows) -> str:
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_deny_branch_hot_cell(spark, tmp_path):
    """40 vectors aligned with centroid 0 + 8 scattered (the crafted
    table test_ivf_ingest pins needs_split on): cell 0 holds 40/48 ~
    26.7x its ideal share, far past the 3x split threshold ->
    ok_balance False -> ann_ok False regardless of the other legs
    (False AND anything = False in three-valued logic)."""
    rows = [(i, [0.01 * v for v in _CENTROIDS[0]], 0) for i in range(40)] + [
        (100 + k, [0.01 * v for v in _CENTROIDS[k]], 0) for k in range(1, 9)
    ]
    d = _write_vecs(spark, tmp_path, rows)
    row = all_queries()["ann_release_gate"](spark, d).collect()[0]
    assert row.n_vecs == 48
    assert row.n_cells_need_split >= 1
    assert row.ok_balance is False
    assert row.ann_ok is False
    spark.catalog.clearCache()


def test_deny_branch_norm_drift(spark, tmp_path):
    """Disjoint norm laws between arrival halves (10 x 0.01-vectors
    then 10 x 0.02-vectors — the drift test's crafted shift): KS D =
    1.0, reject_05 True -> ok_drift False -> ann_ok False. (The same
    table also trips the balance leg: all 20 constant vectors share
    one cell.)"""
    rows = [(i, [0.01] * 64, 0) for i in range(10)] + [
        (10 + i, [0.02] * 64, 0) for i in range(10)
    ]
    d = _write_vecs(spark, tmp_path, rows)
    row = all_queries()["ann_release_gate"](spark, d).collect()[0]
    assert row.ks_reject is True
    assert row.ok_drift is False
    assert row.ok_balance is False  # one cell holds all 20
    assert row.ann_ok is False
    spark.catalog.clearCache()


def test_vacuous_pass_unqueried_balanced_index(spark, tmp_path):
    """A balanced index NOBODY queries must release: one vector per
    centroid direction with vec_ids >= 50 (outside the probe set), so
    the recall and scan legs are vacuously True (no truth, no
    rankings); the arrival split is one-sided (no id doubles below the
    max) so the drift leg is vacuously True; no cell holds > 3 of the
    32 vectors so the balance leg is genuinely True -> ann_ok True."""
    rows = [
        (100 + k, [0.01 * v for v in _CENTROIDS[k]], 0) for k in range(32)
    ]
    # premise: the crafted directions spread across cells with no cell
    # past the split threshold (> 3 of 32), checked via the exact
    # Python twin of the assignment kernel
    counts = Counter(_py_ivf_cell(e) for _, e, _ in rows)
    assert max(counts.values()) <= 3
    d = _write_vecs(spark, tmp_path, rows)
    row = all_queries()["ann_release_gate"](spark, d).collect()[0]
    assert row.n_vecs == 32
    assert row.n_queries == 0 and row.n_truth == 0  # the vacuous premise
    assert row.ks_reject is None and row.ok_drift is True
    assert row.recall_at_deployed is None and row.ok_recall is True
    assert row.scanned_frac_at_deployed is None and row.ok_scan is True
    assert row.ok_balance is True
    assert row.ann_ok is True
    spark.catalog.clearCache()


def test_no_decision_broken_probe_pipeline(spark, tmp_path):
    """Queries EXIST but the truth side is empty (one lone vector with
    vec_id=0: it is a probe-set member, and self-exclusion leaves it no
    true neighbors) -> recall_at_deployed NULL with n_queries = 1. Under
    the round-12 ADVICE hardening that is a NO-DECISION on the recall
    leg (NULL), never a silent vacuous pass — the regression this pins:
    a production change that accidentally empties the truth side must
    not release. The scan leg still has metrics (the lone query scans
    its probed cells), so it decides normally."""
    d = _write_vecs(spark, tmp_path, [(0, [0.01] * 64, 0)])
    row = all_queries()["ann_release_gate"](spark, d).collect()[0]
    assert row.n_vecs == 1
    assert row.n_queries == 1 and row.n_truth == 0
    assert row.recall_at_deployed is None
    assert row.ok_recall is None  # no-decision, NOT True
    # scanned_frac exists (1 query x 1-row corpus), so ok_scan decides:
    # the lone cell holds the whole corpus -> scanned_frac 1.0 > 0.5
    assert row.scanned_frac_at_deployed == 1.0 and row.ok_scan is False
    # the conjunction denies on the scan leg (False AND NULL = False)
    assert row.ann_ok is False
    spark.catalog.clearCache()


def test_no_decision_empty_vector_table(spark, tmp_path):
    """An EMPTY vector table is a no-decision, not a pass: every leg
    verdict NULL, ann_ok NULL."""
    d = _write_vecs(spark, tmp_path, [])
    row = all_queries()["ann_release_gate"](spark, d).collect()[0]
    assert row.n_vecs == 0 and row.n_cells_occupied == 0
    assert row.max_fill_ratio is None
    assert row.ok_balance is None and row.ok_drift is None
    assert row.ok_recall is None and row.ok_scan is None
    assert row.ann_ok is None
    spark.catalog.clearCache()
