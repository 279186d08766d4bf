"""corpus_release_gate reconciliation contract (VERDICT r9 ask #2):
every sub-scalar in the gate row must equal the same aggregate computed
from the STANDALONE registered query it composes — the capstone may
never drift from the legs the correctness gate certifies individually —
plus both decision branches exercised on crafted corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.registry import all_queries


def test_gate_reconciles_with_standalone_queries(spark, sf_dir):
    qs = all_queries()
    row = qs["corpus_release_gate"](spark, sf_dir).collect()[0]

    gq = qs["gopher_quality_flags"](spark, sf_dir).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0)).alias("p"),
    ).collect()[0]
    assert row.n_docs == gq.n
    assert row.quality_pass_rate == (gq.p / gq.n if gq.n else None)

    bl = qs["blocklist_filter_rates"](spark, sf_dir).agg(
        F.sum("n_docs").alias("n"), F.sum("n_dropped").alias("d")
    ).collect()[0]
    assert row.blocklist_drop_rate == (bl.d / bl.n if bl.n else None)

    de = qs["dedup_exact"](spark, sf_dir).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0)).alias("d"),
    ).collect()[0]
    assert row.dup_rate == (de.d / de.n if de.n else None)

    mw = qs["mannwhitney_fertility_drift"](spark, sf_dir).collect()[0]
    assert row.fert_drift_z == mw.z_score

    # the decision really is the conjunction of the leg verdicts
    assert row.release_ok == (
        row.ok_quality and row.ok_blocklist and row.ok_dedup and row.ok_fertility
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


# Passes every Gopher rule: >=20 words, mean word length 3-10, no '#' or
# '...', >=2 distinct stopwords, >=80% alphabetic words — and carries no
# blocklist term ('slow', 'leak', 'stale'). Word mixes differ per doc so
# nothing is an exact duplicate; doc_ids span both md5 parities.
_CLEAN_BASE = (
    "the quick brown fox jumps over lazy dogs and many other animals "
    "that have been waiting with great patience to see the show today"
)
_CLEAN_TEXTS = {i: f"{_CLEAN_BASE} chapter number {w}" for i, w in enumerate(
    ["alpha", "bravo", "delta", "echo", "golf", "hotel"]
)}


def test_gate_passes_on_a_clean_corpus(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, _CLEAN_TEXTS)
    row = all_queries()["corpus_release_gate"](spark, sf).collect()[0]
    assert row.quality_pass_rate == 1.0
    assert row.blocklist_drop_rate == 0.0
    assert row.dup_rate == 0.0
    assert (
        row.ok_quality,
        row.ok_blocklist,
        row.ok_dedup,
        row.ok_fertility,
        row.release_ok,
    ) == (True, True, True, True, True)
    spark.catalog.clearCache()


def test_gate_fails_on_duplicated_blocklisted_corpus(spark, tmp_path):
    """Half the corpus is one duplicated blocklisted doc: the dedup and
    blocklist legs fail, the conjunction is False even though quality
    still passes for the clean half."""
    bad = _CLEAN_BASE + " slow leak everywhere"
    texts = dict(_CLEAN_TEXTS)
    for i in range(6, 12):
        texts[i] = bad
    sf = _write_docs(spark, tmp_path, texts)
    row = all_queries()["corpus_release_gate"](spark, sf).collect()[0]
    assert row.dup_rate == pytest.approx(5 / 12)
    assert row.blocklist_drop_rate == pytest.approx(6 / 12)
    assert (row.ok_blocklist, row.ok_dedup, row.release_ok) == (
        False,
        False,
        False,
    )
    spark.catalog.clearCache()


def test_gate_empty_corpus_is_no_decision(spark, tmp_path):
    """Zero docs: every rate NULL, release_ok NULL — an empty snapshot
    is a no-decision, not a pass (three-valued AND in both engines)."""
    df = spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = all_queries()["corpus_release_gate"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row.n_docs == 0
    assert (
        row.quality_pass_rate,
        row.blocklist_drop_rate,
        row.dup_rate,
        row.release_ok,
    ) == (None, None, None, None)
    spark.catalog.clearCache()


# --- retrieval_eval_suite (the similarity-family capstone) ----------------


def test_retrieval_suite_reconciles_with_standalone_evals(spark, sf_dir):
    qs = all_queries()
    row = qs["retrieval_eval_suite"](spark, sf_dir).collect()[0]
    m = qs["retrieval_mrr_eval"](spark, sf_dir).collect()[0]
    n = qs["ndcg_retrieval_eval"](spark, sf_dir).collect()[0]
    assert (row.n_queries, row.n_hits, row.recall_at_k, row.mrr) == (
        m.n_queries,
        m.n_hits,
        m.recall_at_k,
        m.mrr,
    )
    assert (row.n_perfect, row.mean_ndcg_at_k) == (
        n.n_perfect,
        n.mean_ndcg_at_k,
    )
    from bigdata_2025_1_spark.operators.similarity import (
        SUITE_MIN_MRR,
        SUITE_MIN_NDCG,
        SUITE_MIN_RECALL,
    )

    assert row.index_ok == (
        row.recall_at_k >= float(SUITE_MIN_RECALL)
        and row.mrr >= float(SUITE_MIN_MRR)
        and row.mean_ndcg_at_k >= float(SUITE_MIN_NDCG)
    )
    spark.catalog.clearCache()


def test_retrieval_rankings_memo_is_shared_within_a_session(spark, sf_dir):
    """The suite's whole point (VERDICT r9 ask #3): a second eval in the
    same session must receive the SAME persisted ranking frames, not
    rebuild the indexes."""
    from bigdata_2025_1_spark.operators import similarity as S

    S._RANKINGS_MEMO.clear()
    e1, s1 = S.retrieval_rankings(spark, sf_dir)
    e2, s2 = S.retrieval_rankings(spark, sf_dir)
    assert e1 is e2 and s1 is s2
    assert len(S._RANKINGS_MEMO) == 1
    spark.catalog.clearCache()


def test_retrieval_rankings_repersist_after_clearcache(spark, sf_dir):
    """spark.catalog.clearCache() silently unpersists the memoized
    frames; the next retrieval_rankings call must re-persist them so a
    suite keeps its one-build contract across the per-query cache
    clears every harness performs (measured in round 10: without this,
    the suite's later evals quietly replayed the full index builds)."""
    from bigdata_2025_1_spark.operators import similarity as S

    S._RANKINGS_MEMO.clear()
    e1, s1 = S.retrieval_rankings(spark, sf_dir)
    spark.catalog.clearCache()
    lvl = e1.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)  # clearCache really wiped it
    e2, s2 = S.retrieval_rankings(spark, sf_dir)
    assert e2 is e1 and s2 is s1
    for df_ in (e2, s2):
        lvl = df_.storageLevel
        assert lvl.useMemory or lvl.useDisk, "memo hit was not re-persisted"
    spark.catalog.clearCache()


def test_retrieval_rankings_eviction_unpersists(spark, sf_dir):
    """ADVICE r10: evicting the oldest memo entry must unpersist the
    evicted frames, or their cached blocks stay pinned until a global
    clearCache(). Fill the memo past its cap with synthetic keys
    pointing at persisted dummies and check the evictee was dropped."""
    from pyspark import StorageLevel

    from bigdata_2025_1_spark.operators import similarity as S

    S._RANKINGS_MEMO.clear()
    spark.catalog.clearCache()
    dummies = []
    # distinct row counts per dummy: Spark's cache manager keys on the
    # ANALYZED PLAN, so two spark.range(3) frames share one cache entry
    # and unpersisting either would wipe both
    for i in range(8):
        a = spark.range(100 + 2 * i).persist(StorageLevel.MEMORY_ONLY)
        b = spark.range(101 + 2 * i).persist(StorageLevel.MEMORY_ONLY)
        a.count(), b.count()
        S._RANKINGS_MEMO[(f"fake-app-{i}", sf_dir)] = (a, b)
        dummies.append((a, b))
    # the real call must evict the OLDEST entry (fake-app-0) and
    # unpersist both of its frames
    e, s = S.retrieval_rankings(spark, sf_dir)
    assert ("fake-app-0", sf_dir) not in S._RANKINGS_MEMO
    assert len(S._RANKINGS_MEMO) == 8
    a0, b0 = dummies[0]
    for df_ in (a0, b0):
        lvl = df_.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), "evictee stayed persisted"
    # a surviving entry keeps its storage level
    a1, _ = dummies[1]
    assert a1.storageLevel.useMemory
    S._RANKINGS_MEMO.clear()
    spark.catalog.clearCache()
