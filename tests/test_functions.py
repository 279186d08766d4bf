"""Unit tests for column-expression builders and the multimodal kernel."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.functions import vectors as V
from bigdata_2025_1_spark.functions.multimodal import as_media_table, extract_features


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).first().v


def test_normalize_ws(spark):
    assert _one(spark, "  a\t b\n\nc  ", T.normalize_ws(F.col("text"))) == "a b c"


def test_collapse_dashes(spark):
    assert _one(spark, "a--b---c-d", T.collapse_dashes(F.col("text"))) == "abc-d"


def test_preview(spark):
    assert _one(spark, "x" * 150, T.preview(F.col("text"))) == "x" * 100 + "..."
    assert _one(spark, "short", T.preview(F.col("text"))) == "short"


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of the house", T.lang_id(F.col("text"))) == "en"
    assert _one(spark, "der Hund und die Katze ist", T.lang_id(F.col("text"))) == "de"
    assert _one(spark, "zzz qqq", T.lang_id(F.col("text"))) == "und"


def test_shingles_and_minhash(spark):
    sh = _one(spark, "a b c d", T.word_shingles(F.col("text"), 3))
    assert sh == ["a b c", "b c d"]
    sig = _one(
        spark, "a b c d", T.minhash_signature(T.word_shingles(F.col("text"), 3), 4)
    )
    assert len(sig) == 4 and all(len(h) == 32 for h in sig)
    # identical text ⇒ identical signature
    sig2 = _one(
        spark, "a  b\tc d", T.minhash_signature(T.word_shingles(F.col("text"), 3), 4)
    )
    assert sig == sig2  # whitespace-insensitive tokenization


def test_simhash_close_for_similar_docs(spark):
    a = _one(spark, "one two three four five six seven eight", T.simhash_bits(F.col("text")))
    b = _one(spark, "one two three four five six seven nine", T.simhash_bits(F.col("text")))
    c = _one(spark, "totally different words entirely unrelated content here now", T.simhash_bits(F.col("text")))
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def test_srp_planes_deterministic():
    p1 = V.srp_planes(bits=4, dim=8)
    p2 = V.srp_planes(bits=4, dim=8)
    assert p1 == p2
    assert all(v in (-1, 1) for row in p1 for v in row)


def test_multimodal_kernel(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], ["doc_id", "text"])
    media = as_media_table(df, "doc_id", "text")
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].n_bytes == 3
    assert rows[1].feat_byte_sum == ord("a") + ord("b") + ord("c")
    assert rows[1].feat_first_byte == ord("a")
    assert rows[1].decoded is False  # decode stubbed in this container
    assert rows[2].feat_byte_sum is None  # empty payload


def test_bpe_ish_tokens(spark):
    n = _one(spark, "hello, world 123!", T.bpe_ish_token_count(F.col("text")))
    # hello , world 123 !
    assert n == 5


def test_min_label_propagate_reliable_checkpoint(spark, tmp_path):
    """The ``reliable=True`` escape hatch (fault-tolerant checkpoint()
    instead of executor-local localCheckpoint) converges to the same
    labels on a two-component path graph."""
    from bigdata_2025_1_spark.functions.iterate import min_label_propagate

    el = [(1, 2), (2, 3), (4, 5)]
    edges = spark.createDataFrame(
        el + [(b, a) for a, b in el], ["a", "b"]
    )
    labels0 = spark.createDataFrame(
        [(v, v) for v in (1, 2, 3, 4, 5)], ["v", "label"]
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    got = {
        r.v: r.label
        for r in min_label_propagate(edges, labels0, reliable=True).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
