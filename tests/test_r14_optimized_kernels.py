"""Round-14 optimization pins: the two operators whose internals were
rewritten for speed must still compute exactly what they computed.

- ``dedup_embedding_cosine``: theta-join + per-pair Arrow dot kernel →
  bounded-broadcast numpy block kernel. Pinned against the SHIPPED
  PREDECESSOR — the all-pairs theta join with ``make_dot_scaled_pandas``
  — whose numpy rounding chain (sign·floor(|x|+0.5)) the block kernel
  reproduces term-for-term, so bit-identity is structural. (An earlier
  pin against the ``dot_scaled`` EXPRESSION form was data-dependently
  fragile: F.round is BigDecimal HALF_UP on the exact decimal of the
  double, which diverges from the float chain on edge doubles like
  0.49999999999999994 — ADVICE r14.)
- ``grouped_map_spend_share``: per-customer applyInPandas frames →
  bucketed frames with an intra-frame groupby-transform. Pinned against
  the relational window-sum twin.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import vectors as V
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.dedup import dedup_embedding_cosine
from bigdata_2025_1_spark.operators.pandas_surface import (
    grouped_map_spend_share,
)


def test_embedding_cosine_block_kernel_matches_join_form(spark, sf_dir):
    got = {
        (r.doc_a, r.doc_b): (r.source_a, r.source_b, r.cosine)
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    # reference: the pre-round-14 shape — all-pairs theta join with the
    # per-pair Arrow dot kernel (make_dot_scaled_pandas), the shipped
    # predecessor whose numpy chain the block kernel reproduces
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load(spark, sf_dir, "embeddings")
    sig = emb.join(docs, docs.doc_id == emb.vec_id).select(
        "vec_id",
        "source",
        "embedding",
        V.norm_sq_scaled(F.col("embedding")).alias("nsq"),
    )
    a = sig.select(
        F.col("vec_id").alias("doc_a"),
        F.col("source").alias("source_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nsq").alias("nsq_a"),
    )
    b = sig.select(
        F.col("vec_id").alias("doc_b"),
        F.col("source").alias("source_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nsq").alias("nsq_b"),
    )
    dot_pd = V.make_dot_scaled_pandas()
    cosine = V.cosine_from_scaled(
        dot_pd(F.col("emb_a"), F.col("emb_b")),
        F.col("nsq_a"),
        F.col("nsq_b"),
    )
    want = {
        (r.doc_a, r.doc_b): (r.source_a, r.source_b, r.cosine)
        for r in (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a", "doc_b", "source_a", "source_b",
                cosine.alias("cosine"),
            )
            .filter(F.col("cosine") >= 0.45)
            .collect()
        )
    }
    assert set(got) == set(want)
    for k, (sa, sb, cos) in want.items():
        gsa, gsb, gcos = got[k]
        assert (gsa, gsb) == (sa, sb)
        assert gcos == cos  # bit-identical, not approx — same IEEE chain
    spark.catalog.clearCache()


def test_grouped_map_share_matches_window_twin(spark, sf_dir):
    got = {
        (r.o_custkey, r.o_orderkey): r.spend_share
        for r in grouped_map_spend_share(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.partitionBy("o_custkey")
    want = {
        (r.o_custkey, r.o_orderkey): r.spend_share
        for r in (
            o.select(
                "o_custkey",
                "o_orderkey",
                (
                    cents.cast("double")
                    / F.sum(cents).over(w).cast("double")
                ).alias("spend_share"),
            ).collect()
        )
    }
    assert got == want
