"""Edge-case corpus regression tests (from adversarial review): short,
empty, and mixed-language documents must not crash and must still match
the DuckDB oracle — the fixtures' 10-token minimum makes these latent."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.oracle import check_query
from bigdata_2025_1_spark.registry import all_oracles, all_queries

EDGE_DOCS = [
    (0, "", "en", "srcA", 0),
    (1, "one", "en", "srcA", 3),
    (2, "one two", "en", "srcA", 7),
    (3, "hi", "en", "srcB", 2),
    (4, "   \t  ", "en", "srcB", 6),  # whitespace-only
    (5, "the la la la", "es", "srcB", 12),  # mixed-language markers
    (6, "normal length document with plenty of words to shingle happily", "en", "srcC", 63),
    (7, "normal length document with plenty of words to shingle happily", "en", "srcC", 63),
]

EDGE_QUERIES = [
    "minhash_signatures",
    "dedup_minhash_lsh",
    "doc_fingerprints",
    "simhash_values",
    "dedup_simhash_hamming",
    "dedup_char_ngram_jaccard",
    "dedup_exact",
    "lang_id_heuristic",
    "token_counts",
    "doc_quality_scores",
    "metadata_extract",
    "wordcount",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    spark.createDataFrame(
        EDGE_DOCS, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_sf_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_matches_oracle(name, spark, edge_con, edge_sf_dir):
    problems = check_query(
        spark, edge_con, all_queries()[name], all_oracles()[name], edge_sf_dir
    )
    assert not problems, f"{name}: " + "; ".join(problems)


def test_shingles_empty_and_short(spark):
    df = spark.createDataFrame([("",), ("one two",), ("a b c d",)], ["text"])
    rows = df.select(T.word_shingles(F.col("text"), 3).alias("sh")).collect()
    assert rows[0].sh == [] and rows[1].sh == []
    assert rows[2].sh == ["a b c", "b c d"]


def test_exact_dup_detected_in_edge_corpus(spark, edge_sf_dir):
    res = all_queries()["dedup_exact"](spark, edge_sf_dir).collect()
    by_id = {r.doc_id: r for r in res}
    assert by_id[7].keeper_doc_id == 6 and by_id[7].is_duplicate
