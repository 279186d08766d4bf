"""Incremental LSH scale story, substantiated (VERDICT r5 #6): at deploy
time the standing corpus band table is a MATERIALIZED index — bucketed
parquet on the band join key — so the daily new-batch join shuffles only
the batch, never the corpus. This test writes that layout and pins the
shuffle-free corpus side in the physical plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.operators.dedup import _band_rows, _signatures
from bigdata_2025_1_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def band_index(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("lsh_warehouse"))
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS corpus_bands_bkt")
    sig = _signatures(spark, sf_dir)
    corpus_bands = _band_rows(sig).filter(F.col("doc_id") % 2 == 0)
    (
        corpus_bands.write.bucketBy(8, "band", "band_key")
        .sortBy("band", "band_key")
        .option("path", f"{wh}/corpus_bands_bkt")
        .saveAsTable("corpus_bands_bkt")
    )
    yield "corpus_bands_bkt"
    spark.sql("DROP TABLE IF EXISTS corpus_bands_bkt")
    spark.catalog.clearCache()


def test_incremental_lsh_corpus_side_reads_shuffle_free(spark, sf_dir, band_index):
    """Join today's batch bands against the materialized corpus index:
    with broadcast off (the 100 TB case — the corpus index dwarfs any
    broadcast budget) the ONLY exchange in the plan is the batch side's;
    the corpus side goes scan → join with no Exchange between."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sig = _signatures(spark, sf_dir)
        new_bands = _band_rows(sig).filter(F.col("doc_id") % 2 == 1).select(
            F.col("doc_id").alias("doc_new"), "band", "band_key"
        )
        corpus = spark.table(band_index).select(
            F.col("doc_id").alias("doc_old"), "band", "band_key"
        )
        cand = new_bands.join(corpus, ["band", "band_key"]).select(
            "doc_new", "doc_old"
        )
        plan = formatted_plan(cand)
        # 1) the corpus branch (the join's second child: from its Sort to
        # the bucketed scan) contains NO Exchange — the bucketed layout IS
        # the partitioning
        scan_line = "Scan parquet spark_catalog.default.corpus_bands_bkt"
        assert scan_line in plan
        tree = plan.split("== Physical Plan ==", 1)[1]
        corpus_branch = tree[tree.rindex("+- Sort") : tree.index(scan_line)]
        assert "Exchange" not in corpus_branch, corpus_branch
        # 2) differential: the identical join against a PLAIN parquet copy
        # of the same band table needs one MORE exchange (the corpus-side
        # shuffle the bucketed layout removes)
        def n_exchanges(df):
            return len(
                re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE)
            )

        plain_path = spark.sql(
            "DESCRIBE TABLE EXTENDED corpus_bands_bkt"
        ).filter("col_name = 'Location'").first()["data_type"]
        unbucketed = spark.read.parquet(plain_path).select(
            F.col("doc_id").alias("doc_old"), "band", "band_key"
        )
        cand_plain = new_bands.join(unbucketed, ["band", "band_key"]).select(
            "doc_new", "doc_old"
        )
        assert n_exchanges(cand_plain) == n_exchanges(cand) + 1
        # sanity: the join actually produces candidate pairs
        assert cand.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.catalog.clearCache()
