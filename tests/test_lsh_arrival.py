"""Arrival-ordered incremental LSH (growing index): the online form
``lsh_index_update`` must replay byte-identically to the registered
batch query ``dedup_lsh_arrival_log`` under ANY chunking (the
page_hinkley/cusum online-form convention), and the foreachBatch
maintenance loop (``lsh_ingest_step`` + standing-table append) must
accumulate to the same log — the band index maintained ACROSS triggers,
the pipeline shape VERDICT r10 ask #4a named.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.dedup import (
    lsh_arrival_log,
    lsh_index_update,
    lsh_ingest_step,
    lsh_state_zero,
    signatures_from_docs,
)
from bigdata_2025_1_spark.registry import all_queries

import pytest


def _rows(collected):
    return [
        (r.doc_new, r.n_dups, r.dup_of, r.jaccard, r.is_new_content)
        for r in collected
    ]


def test_lsh_index_update_matches_batch_query(spark, sf_dir):
    """One full replay of the fixture corpus through the pure-Python
    online form equals the batch query row-for-row (including jaccard
    doubles — both sides are exact int ratios divided once)."""
    expected = _rows(
        all_queries()["dedup_lsh_arrival_log"](spark, sf_dir).collect()
    )
    spark.catalog.clearCache()
    docs = sorted(
        (r.doc_id, r.text)
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    _state, out = lsh_index_update(lsh_state_zero(), docs)
    assert out == expected


def test_lsh_index_update_is_chunking_invariant(spark, sf_dir):
    """The accumulated output sequence must not depend on how the
    arrival stream is chunked into triggers — including 1-doc chunks
    and one giant chunk."""
    docs = sorted(
        (r.doc_id, r.text)
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(120)
        .collect()
    )
    _s, whole = lsh_index_update(lsh_state_zero(), docs)
    rng = random.Random(17)
    for _trial in range(4):
        state = lsh_state_zero()
        out = []
        i = 0
        while i < len(docs):
            step = rng.randint(1, 25)
            state, part = lsh_index_update(state, docs[i : i + step])
            out.extend(part)
            i += step
        assert out == whole
    spark.catalog.clearCache()


def test_lsh_arrival_crafted_duplicates(spark):
    """Three identical docs + one unique: the 2nd and 3rd copies must
    point at the FIRST occurrence (smallest doc_id tiebreak at jaccard
    1.0) and count every earlier copy; the unique doc is new content."""
    txt = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, txt),
        (2, "totally different words here nothing shared"),
        (3, txt),
        (7, txt),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(lsh_arrival_log(signatures_from_docs(docs)).collect())
    assert got == [
        (1, 0, None, None, True),
        (2, 0, None, None, True),
        (3, 1, 1, 1.0, False),
        (7, 2, 1, 1.0, False),
    ]
    # the online form agrees on the same crafted stream
    _s, out = lsh_index_update(lsh_state_zero(), rows)
    assert out == got
    spark.catalog.clearCache()


@pytest.mark.slow
def test_growing_lsh_index_in_foreachbatch(spark, sf_dir, tmp_path):
    """The band index maintained ACROSS micro-batches: docs arrive in
    THREE doc_id-ordered triggers; each trigger probes the accumulated
    standing signature table via lsh_ingest_step (standing + within-
    batch earlier rows), then appends itself to the standing table. The
    accumulated admission log must equal dedup_lsh_arrival_log over
    everything ingested — the growing-index twin of the frozen-corpus
    test above it in test_streaming.py."""
    import time

    expected = {
        r[0]: r
        for r in _rows(
            all_queries()["dedup_lsh_arrival_log"](spark, sf_dir).collect()
        )
    }
    spark.catalog.clearCache()

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    stream_dir = str(tmp_path / "incoming")
    # three files in ascending doc_id ranges, written with distinct
    # mtimes so FileStreamSource triggers them in arrival order
    cuts = sorted(r.doc_id for r in docs.select("doc_id").collect())
    b1, b2 = cuts[n // 3], cuts[2 * n // 3]
    for pred in (
        F.col("doc_id") < b1,
        (F.col("doc_id") >= b1) & (F.col("doc_id") < b2),
        F.col("doc_id") >= b2,
    ):
        docs.filter(pred).coalesce(1).write.parquet(stream_dir, mode="append")
        time.sleep(0.2)

    state = {"standing": None}
    out: dict = {}
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        batch_sig = signatures_from_docs(batch_df).persist()
        batch_sig.count()
        if state["standing"] is None:
            empty = batch_sig.limit(0)
            log = lsh_ingest_step(batch_sig, empty)
        else:
            log = lsh_ingest_step(batch_sig, state["standing"])
        for r in log.collect():
            out[r.doc_new] = (
                r.doc_new,
                r.n_dups,
                r.dup_of,
                r.jaccard,
                r.is_new_content,
            )
        # append this trigger to the standing index (localCheckpoint:
        # the standing table must not hold lineage into stream sources)
        merged = (
            batch_sig
            if state["standing"] is None
            else state["standing"].unionByName(batch_sig)
        )
        state["standing"] = merged.localCheckpoint()
        batch_sig.unpersist()

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "lsh_grow_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 3, batches  # genuinely incremental
    assert out == expected
    spark.catalog.clearCache()
