"""The shared documents tokenization pass (optimization round 15).

Four operator families tokenize ``documents`` with the SAME expression
— ``ws_tokens(lower(text))`` — yet each built its own copy of the
subtree, so the release-gate compositions paid the regex tokenize once
per leg: ``gopher_quality_flags``, ``blocklist_filter_rates`` and
``mannwhitney_fertility_drift`` inside ``corpus_release_gate``, and the
dedup family's ``_signatures`` under ``dedup_release_gate`` — all four
under ``platform_release_gate`` (the r14 VERDICT's #1 ask).

:func:`doc_lt_toks` is that pass as ONE canonical frame. Consumers
build from it unconditionally (a pure projection — standalone physical
plans are unchanged after projection collapse); the multi-consumer
GATES register it with ``persist=True`` (the ``_flagged(persist=)``
pattern), and Spark's plan-keyed CacheManager then substitutes every
leg's identical analyzed subtree with the one cached tokenize pass.
Standalone queries never pay the cache write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.io import load, spread


def doc_lt_toks(
    spark: SparkSession, sf_dir: str, persist: bool = False
) -> DataFrame:
    """``(doc_id, source, lt, toks)`` over the spread documents scan:
    ``lt`` = lowercased text, ``toks`` = the shared whitespace
    tokenization. ``persist=True`` ONLY at fan-out sites (the release
    gates); the cache holds ~2x the text width, which single-consumer
    lineages must not pay (the cdc_release_gate negative memo)."""
    docs = spread(load(spark, sf_dir, "documents"))
    lt = F.lower(F.col("text"))
    frame = docs.select(
        "doc_id", "source", lt.alias("lt"), T.ws_tokens(lt).alias("toks")
    )
    return frame.persist() if persist else frame
