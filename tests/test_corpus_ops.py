"""Crafted-input semantics for the corpus-hygiene operators: the oracle
proves engine parity; these prove the operators mean what they claim on
inputs where the right answer is computable by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.operators.corpus_ops import SPAN_K


def _spans_of(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sp = df.select("doc_id", T.word_shingles(F.col("text"), k=SPAN_K).alias("spans"))
    ex = sp.select("doc_id", F.explode("spans").alias("span"))
    freq = ex.groupBy("span").agg(F.count_distinct("doc_id").alias("n_docs"))
    return ex, freq


def test_duplicate_span_detects_shared_boilerplate(spark):
    boiler = "this page is licensed under the creative commons attribution"
    rows = [
        (1, f"alpha beta gamma {boiler} delta"),
        (2, f"one two three four five six seven {boiler}"),
        (3, "totally unrelated words that never repeat anywhere else here"),
    ]
    ex, freq = _spans_of(spark, rows)
    shared = {r.span for r in freq.filter(F.col("n_docs") >= 2).collect()}
    # every shared span is a window of the boilerplate sentence
    assert shared
    for s in shared:
        assert all(w in (boiler + " ").split() for w in s.split())
    # doc 3 contributes no shared span
    doc3 = {r.span for r in ex.filter(F.col("doc_id") == 3).collect()}
    assert not (doc3 & shared)


def test_short_docs_have_zero_spans(spark):
    rows = [(1, "fewer than eight words here"), (2, " ")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sp = df.select("doc_id", F.size(T.word_shingles(F.col("text"), k=SPAN_K)).alias("n"))
    assert {(r.doc_id, r.n) for r in sp.collect()} == {(1, 0), (2, 0)}


def test_bpe_pairs_on_known_word(spark):
    df = spark.createDataFrame([(1, "banana banana split")], "doc_id int, text string")
    words = df.select(F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    got = {(r.pair, r.n) for r in pairs.groupBy("pair").agg(F.count("*").alias("n")).collect()}
    # banana -> ba an na na an na (x2 docs' words) ; split -> sp pl li it
    assert ("an", 4) in got and ("na", 4) in got and ("ba", 2) in got
    assert ("sp", 1) in got and ("it", 1) in got


def test_chao1_matches_scalar_spectrum(spark, sf_dir):
    from collections import Counter

    from bigdata_2025_1_spark.operators.corpus_ops import chao1_vocab_coverage

    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    cnt = Counter(w for t in texts for w in t.lower().split())
    d, n = len(cnt), sum(cnt.values())
    f1 = sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    out = chao1_vocab_coverage(spark, sf_dir).collect()[0]
    assert (out.observed_types, out.n_tokens) == (d, n)
    assert (out.singletons, out.doubletons) == (f1, f2)
    chao = d + f1 * f1 / (2 * f2) if f2 else d + f1 * (f1 - 1) / 2
    assert abs(out.chao1_estimate - chao) < 1e-3
    assert out.chao1_estimate >= d  # richness bound is at least observed


def test_capture_recapture_brackets_observed(spark, sf_dir):
    from bigdata_2025_1_spark.operators.events_ops import (
        capture_recapture_population,
    )

    out = capture_recapture_population(spark, sf_dir).collect()[0]
    # Chapman never estimates fewer than the larger capture
    assert out.chapman_estimate >= max(out.n1, out.n2)
    assert out.overlap <= min(out.n1, out.n2)
    # scalar recomputation
    chap = (out.n1 + 1) * (out.n2 + 1) / (out.overlap + 1) - 1
    assert abs(out.chapman_estimate - chap) < 1e-3
