"""dedup_release_gate reconciliation contract (the corpus_release_gate
convention applied to the near-dup family): every sub-scalar in the
gate row must equal the same aggregate computed from the STANDALONE
registered query it composes, plus the deny, blowup, and vacuous-pass
branches exercised on crafted corpora with hand-computable arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_2025_1_spark.registry import all_queries


def test_gate_reconciles_with_standalone_queries(spark, sf_dir):
    qs = all_queries()
    row = qs["dedup_release_gate"](spark, sf_dir).collect()[0]

    lr = qs["lsh_recall_eval"](spark, sf_dir).collect()[0]
    assert row.n_true_pairs == lr.n_true_pairs
    assert row.lsh_recall == lr.recall
    assert row.candidate_precision == lr.candidate_precision

    cd = qs["canonical_doc_per_cluster"](spark, sf_dir)
    drops = cd.agg(
        F.sum(F.when(~F.col("is_keeper"), 1).otherwise(0)).alias("d")
    ).collect()[0]
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert row.n_docs == n_docs
    assert row.near_dup_rate == (drops.d or 0) / n_docs
    max_csz = (
        cd.groupBy("cluster_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert row.max_cluster_size == (max_csz or 0)

    # the decision really is the conjunction of the leg verdicts
    assert row.dedup_ok == (
        row.ok_recall and row.ok_precision and row.ok_neardup and row.ok_blowup
    )
    spark.catalog.clearCache()


def _write_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    df = spark.createDataFrame(
        [(d, t, "en", "crafted", len(t)) for d, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


_BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew amber potions beneath the ancient stone bridge at midnight"
)


def test_deny_branch_near_dup_flood(spark, tmp_path):
    """10 exact copies + 2 unique docs: near_dup_rate = 9/12 = 0.75 >
    0.2 -> ok_neardup False -> dedup_ok False, while the LSH legs pass
    (identical docs band together: recall = precision = 1)."""
    texts = {i: _BASE for i in range(10)}
    texts[100] = "completely different words about maritime navigation charts"
    texts[101] = "unrelated prose concerning volcanic geology and mineral seams"
    d = _write_docs(spark, tmp_path, texts)
    row = all_queries()["dedup_release_gate"](spark, d).collect()[0]
    assert row.n_docs == 12
    assert row.near_dup_rate == 9 / 12
    assert row.ok_neardup is False
    assert row.lsh_recall == 1.0 and row.ok_recall is True
    assert row.candidate_precision == 1.0 and row.ok_precision is True
    assert row.max_cluster_size == 10 and row.ok_blowup is True
    assert row.dedup_ok is False
    spark.catalog.clearCache()


def test_blowup_branch_giant_cluster(spark, tmp_path):
    """66 exact copies: one cluster of 66 > 64 -> ok_blowup False (the
    boilerplate-blowup guard fires on exactly the max cluster size,
    independent of the rate leg which also fails here)."""
    texts = {i: _BASE for i in range(66)}
    d = _write_docs(spark, tmp_path, texts)
    row = all_queries()["dedup_release_gate"](spark, d).collect()[0]
    assert row.max_cluster_size == 66
    assert row.ok_blowup is False
    assert row.dedup_ok is False
    spark.catalog.clearCache()


def test_vacuous_pass_clean_corpus(spark, tmp_path):
    """A corpus with NO near-dup pairs must RELEASE: no truth pairs ->
    lsh_ok NULL -> ok_recall vacuously True; no candidates ->
    ok_precision vacuously True; rate 0 and max cluster 0 pass."""
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "one two three four five six seven eight nine ten eleven",
        3: "red orange yellow green blue indigo violet crimson teal navy",
    }
    d = _write_docs(spark, tmp_path, texts)
    row = all_queries()["dedup_release_gate"](spark, d).collect()[0]
    assert row.n_true_pairs == 0 and row.lsh_recall is None
    assert row.ok_recall is True and row.ok_precision is True
    assert row.near_dup_rate == 0.0 and row.max_cluster_size == 0
    assert row.dedup_ok is True
    spark.catalog.clearCache()
