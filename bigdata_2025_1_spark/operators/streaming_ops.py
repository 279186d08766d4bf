"""Batch-checkable streaming surface: run the real micro-batch consumer
(file-stream stand-in for the Kafka topic, availableNow trigger), persist
its per-batch StatsSink parquet, then roll the batches up — proving the
C7 cross-batch merge (reference spark/export_stats.py:9-67 scrapes these
same stats out of container logs) against a plain batch oracle.

The rollup is batch-boundary invariant by construction: counts and sums
add, mins/maxes fold, the average is recomputed from the merged sums —
so however the stream chops the input into micro-batches, the rolled-up
row equals the one-shot batch aggregate the DuckDB oracle computes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.registry import query
from bigdata_2025_1_spark.sources.kafka_shape import to_kafka_message
from bigdata_2025_1_spark.streaming.consumer import STATS_SCHEMA, StatsSink, start_consumer


@query(
    "stats_rollup",
    oracle="""
    WITH g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total_documents,
             CAST(MIN(length(text)) AS BIGINT) AS min_size,
             CAST(MAX(length(text)) AS BIGINT) AS max_size,
             CAST(SUM(length(text)) AS BIGINT) AS total_size
      FROM documents
    ), per AS (
      SELECT source, COUNT(*) AS c FROM documents GROUP BY source
    ), dm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_domains,
             string_agg(source || ':' || c, '|' ORDER BY source) AS domain_counts
      FROM per
    )
    SELECT total_documents, n_domains, min_size, max_size, total_size,
           CASE WHEN total_documents = 0 THEN NULL
                ELSE CAST(total_size AS DOUBLE) / total_documents END AS avg_size,
           domain_counts
    FROM g, dm
    """,
)
def stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming stats: documents → Kafka wire shape → file
    stream → consumer foreachBatch → StatsSink parquet → cross-batch
    rollup (one row). The query EXECUTES the streaming pipeline (not a
    batch twin): the oracle matching proves the per-batch stats rows
    merge losslessly regardless of micro-batch boundaries — the property
    that lets a 100 TB ingest checkpoint stats incrementally and still
    report exact corpus totals.

    Work dirs live under a fresh mkdtemp (left for the OS to reap — the
    returned DataFrame lazily re-reads the stats parquet, so deleting
    eagerly would break the caller's collect)."""
    work = tempfile.mkdtemp(prefix="stats_rollup_")
    wire_dir = os.path.join(work, "wire")
    stats_dir = os.path.join(work, "stats")
    docs = load(spark, sf_dir, "documents").select(
        F.col("source").alias("domain"),
        F.concat(F.lit("doc"), F.col("doc_id")).alias("filename"),
        F.col("text").alias("content"),
        F.concat(F.lit("/data/"), F.col("source")).alias("file_path"),
    )
    msgs = to_kafka_message(
        docs, ("domain", "filename"), ["domain", "filename", "content", "file_path"]
    )
    msgs.withColumn("timestamp", F.current_timestamp()).write.mode(
        "overwrite"
    ).parquet(wire_dir)

    src = spark.readStream.schema(
        "key STRING, value STRING, timestamp TIMESTAMP"
    ).parquet(wire_dir)
    sink = StatsSink(parquet_path=stats_dir)
    q = start_consumer(spark, src, sink, os.path.join(work, "ckpt"), once=True)
    q.awaitTermination(300)

    has_stats = os.path.isdir(stats_dir) and any(
        f.endswith(".parquet") for f in os.listdir(stats_dir)
    )
    if has_stats:
        st = spark.read.parquet(stats_dir)
    else:
        # zero batches fired (empty input) — synthesize an empty stats table
        st = spark.createDataFrame([], STATS_SCHEMA)

    g = st.agg(
        F.coalesce(F.sum("total_documents"), F.lit(0)).cast("bigint").alias(
            "total_documents"
        ),
        F.min("size_stats.min_size").cast("bigint").alias("min_size"),
        F.max("size_stats.max_size").cast("bigint").alias("max_size"),
        F.sum("size_stats.total_size").cast("bigint").alias("total_size"),
    )
    per = (
        st.select(F.explode("domains").alias("domain", "c"))
        .groupBy("domain")
        .agg(F.sum("c").alias("c"))
    )
    dm = per.agg(
        F.count("*").cast("bigint").alias("n_domains"),
        F.nullif(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("domain", "c"))),
                    lambda s: F.concat_ws(":", s.domain, s.c.cast("string")),
                ),
                "|",
            ),
            F.lit(""),
        ).alias("domain_counts"),
    )
    return g.crossJoin(dm).select(
        "total_documents",
        "n_domains",
        "min_size",
        "max_size",
        "total_size",
        F.when(
            F.col("total_documents") == 0, F.lit(None).cast("double")
        ).otherwise(F.col("total_size").cast("double") / F.col("total_documents"))
        .alias("avg_size"),
        "domain_counts",
    )
