"""Production observability: df.observe() accumulates named metrics ON
the existing action (no second scan) — how a 100 TB pipeline counts
rows-in/rows-dropped per stage without paying extra passes. (Contrast
df.count() bookkeeping, which re-runs the plan.)"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load


def test_observe_piggybacks_quality_metrics(spark, sf_dir):
    obs = Observation("quality")
    docs = load(spark, sf_dir, "documents")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(F.col("n_chars") < 50, 1).otherwise(0)).alias("too_short"),
    )
    kept = observed.filter(F.col("n_chars") >= 50)
    n_kept = kept.count()  # ONE action drives both the filter and the metrics
    m = obs.get
    assert m["rows_in"] == docs.count()
    assert m["rows_in"] - m["too_short"] == n_kept


def test_observe_on_streaming_batch(spark, sf_dir, tmp_path):
    """observe() also works per-micro-batch in structured streaming (the
    streaming-metrics story); here the batch form doubles as the
    foreachBatch stats pattern without a cache+second-agg."""
    obs = Observation("ev")
    ev = load(spark, sf_dir, "events").observe(
        obs, F.count(F.lit(1)).alias("n"), F.max("value").alias("max_value")
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "sink.parquet"))
    m = obs.get
    assert m["n"] == load(spark, sf_dir, "events").count()


def test_clear_cache_contract_releases_all_blocks(spark, sf_dir):
    """Package cache contract (bigdata_2025_1_spark/__init__.py): queries
    may persist() shared intermediates; the caller's clearCache() must
    release every block the query ADDED — pinned here on a persisting
    query from each family (LSH dedup, graph, corpus capstone).
    Baseline-relative on RDD ids: earlier tests' localCheckpoint blocks
    (the lineage-truncation artifact clearCache deliberately does NOT
    touch — they are GC-freed) may linger in the shared session, so a
    zero-blocks assertion would fail on test ORDER, not on a leak."""
    from bigdata_2025_1_spark.registry import all_queries

    queries = all_queries()
    sc = spark.sparkContext

    def block_ids() -> set[int]:
        return {r.id() for r in sc._jsc.sc().getRDDStorageInfo()}

    for q in ("dedup_minhash_lsh", "pagerank_nation_trade", "corpus_curation_v2"):
        spark.catalog.clearCache()
        base = block_ids()
        queries[q](spark, sf_dir).count()  # materialize → persists fill
        assert block_ids() - base, f"{q} did not cache"
        spark.catalog.clearCache()
        assert not (block_ids() - base), f"{q} left cached blocks"
