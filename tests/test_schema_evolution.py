"""Operational schema evolution: a corpus written over months gains
columns. Readers must (a) merge parquet schemas across file generations
(mergeSchema), (b) keep partition pruning working across the mix, and
(c) express version-aware defaults declaratively. Complements the batch
unionByName query (union_by_name_evolution) with the FILE-level story."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parquet_merge_schema_across_generations(spark, tmp_path):
    root = str(tmp_path / "corpus")
    # generation 1: no quality column
    spark.createDataFrame(
        [(1, "alpha", "v1"), (2, "beta", "v1")], "doc_id int, text string, gen string"
    ).write.partitionBy("gen").parquet(root, mode="append")
    # generation 2: adds a quality double
    spark.createDataFrame(
        [(3, "gamma", 0.9, "v2"), (4, "delta", 0.7, "v2")],
        "doc_id int, text string, quality double, gen string",
    ).write.partitionBy("gen").parquet(root, mode="append")

    merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert set(merged.columns) == {"doc_id", "text", "quality", "gen"}
    rows = {r.doc_id: (r.quality, r.gen) for r in merged.collect()}
    assert rows[1] == (None, "v1")  # old files surface NULL for new cols
    assert rows[3] == (0.9, "v2")

    # partition pruning still applies across the generation mix
    plan = merged.filter(F.col("gen") == "v2")._jdf.queryExecution().executedPlan().toString()
    assert "v2" in plan
    assert merged.filter(F.col("gen") == "v2").count() == 2

    # version-aware default: declarative backfill for the old generation
    filled = merged.withColumn(
        "quality_filled", F.coalesce(F.col("quality"), F.lit(0.5))
    )
    got = {r.doc_id: r.quality_filled for r in filled.collect()}
    assert got == {1: 0.5, 2: 0.5, 3: 0.9, 4: 0.7}
