"""Kafka message shape — producer/consumer parity without a broker.

The reference's producer publishes one JSON message per document with key
``{domain}_{filename}`` (kafka/push_data_to_kafka.py:25-32,77-81); its
consumer parses ``value`` with a declared schema and drops malformed/null
rows (spark/consumer.py:132-146). These builders reproduce both directions
as batch DataFrame transforms, so the same code serves:

- ``df.write.format("kafka")`` (real broker; just add bootstrap options),
- file-backed streams in tests,
- the driver's batch correctness checks.

Scale note vs the reference: its producer sends synchronously one message
per broker RTT (``future.get`` with max_in_flight=1,
push_data_to_kafka.py:44-46,84). A Spark batch/stream write is pipelined
and partition-parallel — the idiomatic fix, no knob needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# spark/consumer.py:10-15 — permissive nulls, fixed four fields.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
    ]
)


def to_kafka_message(
    df: DataFrame, key_cols: tuple[str, str], payload_cols: list[str]
) -> DataFrame:
    """Encode rows as Kafka-shaped (key, value) pairs: key =
    ``{a}_{b}`` (partition-spread semantics of push_data_to_kafka.py:32),
    value = JSON of the payload struct."""
    a, b = key_cols
    return df.select(
        F.concat_ws("_", F.col(a), F.col(b)).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("value"),
    )


def parse_kafka_value(
    value: Column, schema: T.StructType = DOCUMENT_SCHEMA
) -> Column:
    """``from_json(cast(value as string))`` in PERMISSIVE mode: malformed
    JSON → null struct (spark/consumer.py:134). Null-field rejection is the
    caller's filter (B2) so the semantics stay composable."""
    return F.from_json(value.cast("string"), schema)


def consumer_parse(df: DataFrame) -> DataFrame:
    """Full consumer parse stage (spark/consumer.py:132-146): project key,
    decode value, flatten struct, keep ingest timestamp if present, drop
    rows with null domain/filename/content."""
    cols = [
        F.col("key").cast("string").alias("kafka_key"),
        parse_kafka_value(F.col("value")).alias("data"),
    ]
    has_ts = "timestamp" in df.columns
    if has_ts:
        cols.append(F.col("timestamp").alias("kafka_timestamp"))
    flat = df.select(*cols).select(
        "kafka_key",
        F.col("data.domain").alias("domain"),
        F.col("data.filename").alias("filename"),
        F.col("data.content").alias("content"),
        F.col("data.file_path").alias("file_path"),
        *(["kafka_timestamp"] if has_ts else []),
    )
    return flat.filter(
        F.col("domain").isNotNull()
        & F.col("filename").isNotNull()
        & F.col("content").isNotNull()
    )


def consumer_parse_with_dlq(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """consumer_parse plus a dead-letter stream: instead of silently
    dropping malformed/incomplete messages (the reference consumer's
    behavior — rejects simply vanish), return (valid, rejects) where
    rejects carry the RAW payload and a reject_reason. At scale the DLQ
    lands in its own sink for replay/debugging; losing rejects silently
    is how ingestion bugs stay invisible for months.

    Both frames derive from one parse projection — in a foreachBatch
    with two sinks, cache the batch df so the parse runs once."""
    cols = [
        F.col("key").cast("string").alias("kafka_key"),
        F.col("value").cast("string").alias("raw_value"),
        parse_kafka_value(F.col("value")).alias("data"),
    ]
    flat = df.select(*cols).select(
        "kafka_key",
        "raw_value",
        F.col("data.domain").alias("domain"),
        F.col("data.filename").alias("filename"),
        F.col("data.content").alias("content"),
        F.col("data.file_path").alias("file_path"),
    )
    ok = F.col("domain").isNotNull() & F.col("filename").isNotNull() & F.col("content").isNotNull()
    valid = flat.filter(ok).drop("raw_value")
    reason = (
        F.when(F.col("domain").isNull() & F.col("filename").isNull() & F.col("content").isNull(),
               F.lit("unparseable_json"))
        .when(F.col("domain").isNull(), F.lit("missing_domain"))
        .when(F.col("filename").isNull(), F.lit("missing_filename"))
        .otherwise(F.lit("missing_content"))
    )
    rejects = flat.filter(~ok).select(
        "kafka_key", "raw_value", reason.alias("reject_reason")
    )
    return valid, rejects
