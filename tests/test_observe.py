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
