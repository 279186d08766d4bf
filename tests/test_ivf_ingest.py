"""IVF ingest / index maintenance: the online form ``ivf_cells_update``
must replay byte-identically to the registered batch query
``ivf_ingest_assign`` under ANY chunking (the page_hinkley / cusum /
lsh_index_update convention), and the foreachBatch maintenance loop
(``ivf_ingest_step`` partial aggregates merged by ``ivf_merge_cells``)
must accumulate to the same per-cell state across triggers."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.similarity import (
    _CENTROIDS,
    ivf_cells_readout,
    ivf_cells_update,
    ivf_ingest_step,
    ivf_merge_cells,
    ivf_state_zero,
)
from bigdata_2025_1_spark.registry import all_queries


def _rows(collected):
    return [
        (r.cell, r.n_vecs, r.first_vec, r.last_vec, r.fill_ratio, r.needs_split)
        for r in collected
    ]


def _arrivals(spark, sf_dir):
    return sorted(
        (r.vec_id, list(r.embedding))
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )


def test_online_readout_matches_batch_query(spark, sf_dir):
    expected = _rows(all_queries()["ivf_ingest_assign"](spark, sf_dir).collect())
    spark.catalog.clearCache()
    state = ivf_cells_update(ivf_state_zero(), _arrivals(spark, sf_dir))
    assert ivf_cells_readout(state) == expected


def test_online_update_is_chunking_invariant(spark, sf_dir):
    vecs = _arrivals(spark, sf_dir)[:200]
    whole = ivf_cells_readout(ivf_cells_update(ivf_state_zero(), vecs))
    rng = random.Random(23)
    for _trial in range(4):
        state = ivf_state_zero()
        i = 0
        while i < len(vecs):
            step = rng.randint(1, 40)
            ivf_cells_update(state, vecs[i : i + step])
            i += step
        assert ivf_cells_readout(state) == whole
    spark.catalog.clearCache()


def test_foreachbatch_merge_accumulates_to_batch_replay(spark, sf_dir, tmp_path):
    """Three vec_id-ordered triggers: each trigger's ivf_ingest_step
    partial aggregates merge into the standing state; the final state
    must equal the full batch query — the index health monitor a
    streaming ingest keeps without ever rescanning history."""
    import time

    expected = _rows(all_queries()["ivf_ingest_assign"](spark, sf_dir).collect())
    spark.catalog.clearCache()

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    n = emb.count()
    cuts = sorted(r.vec_id for r in emb.select("vec_id").collect())
    b1, b2 = cuts[n // 3], cuts[2 * n // 3]
    stream_dir = str(tmp_path / "incoming")
    for pred in (
        F.col("vec_id") < b1,
        (F.col("vec_id") >= b1) & (F.col("vec_id") < b2),
        F.col("vec_id") >= b2,
    ):
        emb.filter(pred).coalesce(1).write.parquet(stream_dir, mode="append")
        time.sleep(0.2)

    state = ivf_state_zero()
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        ivf_merge_cells(state, ivf_ingest_step(batch_df).collect())

    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ivf_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 3, batches  # genuinely incremental
    assert ivf_cells_readout(state) == expected
    spark.catalog.clearCache()


def test_needs_split_fires_on_hot_cell(spark, tmp_path):
    """40 vectors aligned with centroid 0 + 8 scattered: cell 0 holds
    40/48 of the index (fill_ratio 1280/48 ~ 26.7x ideal), far past the
    3x split threshold; the scattered cells stay below it."""
    rows = []
    c0 = [0.01 * v for v in _CENTROIDS[0]]
    for i in range(40):
        rows.append((i, c0, 0))
    for k in range(1, 9):
        rows.append((100 + k, [0.01 * v for v in _CENTROIDS[k]], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = _rows(all_queries()["ivf_ingest_assign"](spark, str(tmp_path)).collect())
    by_cell = {r[0]: r for r in got}
    assert by_cell[0][1] == 40 and by_cell[0][5] is True
    assert by_cell[0][4] == 40 * 32 / 48
    assert by_cell[0][2] == 0 and by_cell[0][3] == 39
    assert all(r[5] is False for c, r in by_cell.items() if c != 0)
    assert sum(r[1] for r in got) == 48
    spark.catalog.clearCache()


def test_embedding_norm_drift_hand_computed(spark, tmp_path):
    """Disjoint norm distributions between arrival halves: D = 1.0
    exactly (d_num = n_old * n_new), lambda = sqrt(n1*n2/(n1+n2)),
    reject at 0.05. Identical halves: D = 0, no rejection."""
    import math

    q = all_queries()["embedding_norm_drift"]

    rows = [(i, [0.01] * 64, 0) for i in range(10)] + [
        (10 + i, [0.02] * 64, 0) for i in range(10)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "shift" / "embeddings.parquet")
    )
    r = q(spark, str(tmp_path / "shift")).collect()[0]
    assert (r.n_old, r.n_new) == (10, 10)
    assert r.d_num == 100 and r.d_stat == 1.0
    assert r.ks_lambda == round(math.sqrt(100 / 20), 9)
    assert r.reject_05 is True

    same = [(i, [0.01] * 64, 0) for i in range(10)]
    spark.createDataFrame(
        same, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "same" / "embeddings.parquet")
    )
    r = q(spark, str(tmp_path / "same")).collect()[0]
    assert (r.n_old, r.n_new) == (5, 5)
    assert r.d_num == 0 and r.d_stat == 0.0 and r.reject_05 is False
    spark.catalog.clearCache()


def test_nprobe_curve_reconciles_and_is_monotone(spark, sf_dir):
    """The curve's endpoint must equal recall measured directly from
    the registered ann_ivf_topk vs ann_topk_cosine results (the served
    config IS the nprobe={N_PROBE} point), and both columns must be
    nondecreasing in nprobe with recall hitting 1.0 only if every true
    neighbor's cell is probed."""
    qs = all_queries()
    curve = {
        r.nprobe: r
        for r in qs["ivf_nprobe_recall_curve"](spark, sf_dir).collect()
    }
    assert sorted(curve) == list(range(1, 13))
    rec = [curve[p].recall_at_k for p in range(1, 13)]
    scn = [curve[p].scanned_frac for p in range(1, 13)]
    assert all(a <= b for a, b in zip(rec, rec[1:]))
    assert all(a <= b for a, b in zip(scn, scn[1:]))
    assert 0.0 < scn[0] and scn[-1] <= 1.0

    truth = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_topk_cosine"](spark, sf_dir).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_ivf_topk"](spark, sf_dir).collect()
    }
    assert curve[12].recall_at_k == len(truth & got) / len(truth)
    spark.catalog.clearCache()


def test_readout_has_no_function_local_self_import():
    """ADVICE r11 regression: ivf_cells_readout must reference the
    module-scope N_CELLS directly, not re-import its own module inside
    the function body. AST-based so a docstring word like 'important'
    can never trip it."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(ivf_cells_readout)))
    imports = [
        n for n in ast.walk(tree)
        if isinstance(n, (ast.Import, ast.ImportFrom))
    ]
    assert imports == []
    assert "N_CELLS" in inspect.getsource(ivf_cells_readout)
