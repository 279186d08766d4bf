"""Multimodal-column queries: binary payloads + typed metadata, byte-level
feature extraction through the real mapInPandas plumbing (decode stubbed —
see functions/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.exact import sql_int_avg
from bigdata_2025_1_spark.functions.multimodal import (
    MAX_FRAME_SLOTS,
    as_media_table,
    extract_features,
    resize_payloads,
    sample_frames,
)
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


_FRAME_SIZE = 64
_FRAME_STRIDE = 2


@query(
    "media_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
      FROM documents WHERE LENGTH(text) > 0
    ), idx AS (
      -- range bound = functions/multimodal.MAX_FRAME_SLOTS (kernel caps
      -- at the same constant, keeping both sides in lockstep)
      SELECT doc_id, text, n_bytes, CAST(r.i AS INT) AS frame_idx
      FROM f CROSS JOIN range(0, {MAX_FRAME_SLOTS}, {_FRAME_STRIDE}) r(i)
      WHERE r.i * {_FRAME_SIZE} < n_bytes
    )
    SELECT doc_id AS media_id, frame_idx,
           CAST(LEAST({_FRAME_SIZE}, n_bytes - frame_idx * {_FRAME_SIZE}) AS INT)
             AS frame_bytes,
           sha256(substr(text, frame_idx * {_FRAME_SIZE} + 1, {_FRAME_SIZE}))
             AS frame_sha
    FROM idx
    ORDER BY media_id, frame_idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the real mapInPandas fan-out plumbing: every
    2nd 64-byte frame of each payload, with per-frame sha256. The oracle
    regenerates frames relationally (range + substr — ASCII fixture makes
    byte and char offsets coincide, as in media_feature_stats). In a real
    deployment the kernel body decodes and samples actual video frames;
    the Spark-side contract (schema, Arrow batching, row fan-out) is
    exactly this."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = as_media_table(docs, "doc_id", "text", kind="video")
    return sample_frames(media, _FRAME_SIZE, _FRAME_STRIDE).orderBy(
        "media_id", "frame_idx"
    )


_RESIZE_STRIDE = 2
_SQL_RESIZED = (
    "COALESCE(array_to_string([text[i] for i in "
    f"range(1, LENGTH(text) + 1, {_RESIZE_STRIDE})], ''), '')"
)


@query(
    "media_resize",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS orig_bytes,
           CAST(octet_length(encode({_SQL_RESIZED})) AS INT) AS resized_bytes,
           sha256({_SQL_RESIZED}) AS resized_sha
    FROM documents
    WHERE text IS NOT NULL
    ORDER BY media_id
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media "resize" through the real mapInPandas plumbing: every 2nd
    byte of each payload with the result's size and sha256 — the
    deterministic stand-in for an image down-scale kernel (the schema,
    Arrow batching and 1-in/1-out contract are exactly what a PIL-backed
    kernel drops into; see functions/multimodal._decode_image). Oracle
    regenerates the byte-stride relationally (ASCII fixture: chars ==
    bytes, as documented on media_feature_stats)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = as_media_table(docs, "doc_id", "text", kind="image")
    return resize_payloads(media, _RESIZE_STRIDE).orderBy("media_id")


PREFIX_BYTES = 64


@query(
    "media_prefix_clusters",
    oracle=f"""
    WITH pre AS (
      SELECT doc_id AS media_id,
             sha256(substr(text, 1, {PREFIX_BYTES})) AS prefix_sha,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ), clusters AS (
      SELECT prefix_sha,
             COUNT(*) AS n_members,
             SUM(n_bytes) AS total_bytes,
             array_to_string(list_sort(list(media_id)), '|') AS member_ids
      FROM pre GROUP BY prefix_sha
      HAVING COUNT(*) > 1
    )
    SELECT prefix_sha, CAST(n_members AS BIGINT) AS n_members,
           CAST(total_bytes AS BIGINT) AS total_bytes, member_ids
    FROM clusters
    ORDER BY prefix_sha
    """,
)
def media_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-duplicate clustering by PAYLOAD PREFIX hash (first 64
    bytes): opaque media that share a header/opening cluster together —
    the cheap first cut for binary dedup when full-content hashing finds
    nothing (re-encoded or appended-to files keep their openings; the
    fixture's planted near-dups surface here while exact dedup sees 0).
    Pipelines then send only intra-cluster pairs to an expensive
    byte-diff or perceptual hash.

    Determinism: sha256 over identical bytes; member lists are sorted
    and '|'-joined (the driver's canonicalizer cannot hash raw arrays —
    ``inverted_index`` precedent).

    Scale shape: the shuffle key is a 32-byte hash of a 64-byte prefix
    — payload bodies never move; clustering is one map-side-combinable
    groupBy with a HAVING filter."""
    docs = load(spark, sf_dir, "documents")
    media = as_media_table(docs, "doc_id", "text", kind="image")
    pre = media.select(
        "media_id",
        F.sha2(F.expr(f"substring(payload, 1, {PREFIX_BYTES})"), 256).alias("prefix_sha"),
        "n_bytes",
    )
    return (
        pre.groupBy("prefix_sha")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("n_bytes").alias("total_bytes"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("media_id")),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("member_ids"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("prefix_sha")
    )
