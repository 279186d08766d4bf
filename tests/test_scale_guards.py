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
