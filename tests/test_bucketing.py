"""Bucketing: the 100 TB answer to fact-fact shuffles. Write both join
sides bucketed on the join key → the sort-merge join needs NO exchange.
This is the layout SCALE.md prescribes for orders⋈lineitem at scale."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # note: spark.sql.warehouse.dir is static — tables get explicit paths
    wh = str(tmp_path_factory.mktemp("warehouse"))
    # autoBucketedScan turns bucketed reading off when it sees no exchange
    # to eliminate (e.g. pure filters) — keep it on so bucket pruning shows
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    (
        load(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/orders_bkt")
        .saveAsTable("orders_bkt")
    )
    (
        load(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem_bkt")
        .saveAsTable("lineitem_bkt")
    )
    yield wh
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    joined = (
        # MERGE hint: at fixture scale Spark would broadcast instead; the
        # 100 TB case is the sort-merge path, which is what bucketing feeds
        spark.table("lineitem_bkt")
        .hint("merge")
        .join(spark.table("orders_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plan = formatted_plan(joined)
    join_section = plan.split("HashAggregate")[0]
    # the join itself must not move data: no hash-partition exchange
    # before the SMJ (the only exchange allowed is the tiny post-join agg)
    assert "SortMergeJoin" in plan
    assert not re.search(
        r"^\(\d+\) Exchange hashpartitioning\((?:l_orderkey|o_orderkey)",
        plan,
        re.M,
    ), plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    # and it returns the right answer
    total = sum(r.n for r in joined.collect())
    assert total == spark.table("lineitem_bkt").count()


def test_bucket_pruning_on_key_filter(spark, warehouse):
    df = spark.table("orders_bkt").filter(F.col("o_orderkey") == 42)
    plan = formatted_plan(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of 8", plan)
    assert m and m.group(1) == "1", plan
