"""Multimodal-column queries: binary payloads + typed metadata, byte-level
feature extraction through the real mapInPandas plumbing (decode stubbed —
see functions/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.exact import sql_int_avg
from bigdata_2025_1_spark.functions.multimodal import as_media_table, extract_features
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.registry import query


@query(
    "media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    ORDER BY media_id
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction: UTF-8 payload bytes, length and
    sha256 computed ON the binary column (octet_length/sha2 — JVM-side)."""
    docs = load(spark, sf_dir, "documents")
    media = as_media_table(docs, "doc_id", "text", kind="image")
    return media.select("media_id", "kind", "n_bytes", "payload_sha").orderBy("media_id")


@query(
    "media_feature_stats",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             list_sum([unicode(substr(text, i, 1))::BIGINT for i in range(1, length(text) + 1)]) AS byte_sum
      FROM documents
      WHERE LENGTH(text) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
           {sql_int_avg('n_bytes')} AS avg_bytes,
           CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum
    FROM feat
    """,
)
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over mapInPandas-extracted features (Arrow-batched pandas
    UDF — the sanctioned Python hot path). The oracle recomputes the same
    byte statistics relationally.

    NB: oracle parity holds because the fixture text is ASCII (1 char = 1
    byte); the Spark side computes on raw payload bytes, which is the
    honest multimodal shape."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = as_media_table(docs, "doc_id", "text", kind="image")
    feats = extract_features(media)
    return feats.agg(
        F.count("*").cast("bigint").alias("n_media"),
        (F.sum("n_bytes").cast("double") / F.count("*")).alias("avg_bytes"),
        F.sum("feat_byte_sum").alias("total_byte_sum"),
    )
