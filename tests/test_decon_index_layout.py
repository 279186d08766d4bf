"""Decontamination standing-index deployment, substantiated (VERDICT r6
#4): benchmark_decontamination's SCALE claim is that at 100 TB the TRAIN
shingle postings are a materialized index the daily eval sweep joins
against with no corpus-side shuffle. This test writes that layout — the
(doc_id, sh) postings bucketed on ``sh`` — and pins the shuffle-free
corpus side in the physical plan, with an unbucketed differential (the
tests/test_lsh_index_layout.py method applied to the repo's second
documented standing index)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.dedup import DECON_K, decon_kept_postings
from bigdata_2025_1_spark.plans.explain import formatted_plan


def _postings(spark, sf_dir):
    sh = load(spark, sf_dir, "documents").select(
        "doc_id", T.word_shingles(F.col("text"), k=DECON_K).alias("shingles")
    )
    return decon_kept_postings(sh)


@pytest.fixture(scope="module")
def train_index(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("decon_warehouse"))
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS train_postings_bkt")
    train = _postings(spark, sf_dir).filter(F.col("doc_id") % 10 != 7)
    (
        train.write.bucketBy(8, "sh")
        .sortBy("sh")
        .option("path", f"{wh}/train_postings_bkt")
        .saveAsTable("train_postings_bkt")
    )
    yield "train_postings_bkt"
    spark.sql("DROP TABLE IF EXISTS train_postings_bkt")
    spark.catalog.clearCache()


def test_eval_sweep_reads_train_index_shuffle_free(spark, sf_dir, train_index):
    """Join the day's eval postings against the materialized train
    index: with broadcast off (the 100 TB case — the train index dwarfs
    any broadcast budget) the corpus side goes scan → join with no
    Exchange between, and the identical join against a plain parquet
    copy needs exactly one more exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = _postings(spark, sf_dir).filter(F.col("doc_id") % 10 == 7).select(
            F.col("doc_id").alias("doc_eval"), "sh"
        )
        train = spark.table(train_index).select(
            F.col("doc_id").alias("doc_train"), "sh"
        )
        pairs = ev.join(train, "sh").groupBy("doc_eval", "doc_train").agg(
            F.count("*").alias("n_shared")
        )
        plan = formatted_plan(pairs)
        scan_line = "Scan parquet spark_catalog.default.train_postings_bkt"
        assert scan_line in plan
        tree = plan.split("== Physical Plan ==", 1)[1]
        corpus_branch = tree[tree.rindex("+- Sort") : tree.index(scan_line)]
        assert "Exchange" not in corpus_branch, corpus_branch

        def n_exchanges(df):
            return len(
                re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE)
            )

        plain_path = spark.sql(
            "DESCRIBE TABLE EXTENDED train_postings_bkt"
        ).filter("col_name = 'Location'").first()["data_type"]
        unbucketed = spark.read.parquet(plain_path).select(
            F.col("doc_id").alias("doc_train"), "sh"
        )
        pairs_plain = ev.join(unbucketed, "sh").groupBy(
            "doc_eval", "doc_train"
        ).agg(F.count("*").alias("n_shared"))
        assert n_exchanges(pairs_plain) == n_exchanges(pairs) + 1
        # sanity: the sweep actually finds shared-shingle pairs
        assert pairs.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.catalog.clearCache()
