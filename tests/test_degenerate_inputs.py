"""Degenerate-but-legal inputs beyond the empty-table suite: constant
columns (zero entropy) and single-row tables (zero-weight bootstrap
replicates). ANSI mode turns unguarded divisions into job failures at
exactly these points; these pins hold the NULL-not-crash contract."""

from __future__ import annotations

import os

import pytest

from bigdata_2025_1_spark.io import TABLES, load
from bigdata_2025_1_spark.registry import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def degenerate_sf_dir(spark, sf_dir, tmp_path_factory):
    """orders = 20 rows with constant status/priority and a single date
    (zero-entropy columns); every other table empty."""
    d = tmp_path_factory.mktemp("degenerate_sf")
    orders = spark.createDataFrame(
        [(i, i, "O", 10.0, "1995-01-15 00:00:00", "1-URGENT") for i in range(20)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_orderpriority",
    )
    orders.coalesce(1).write.parquet(os.path.join(str(d), "orders.parquet"))
    for t in TABLES:
        if t == "orders":
            continue
        load(spark, sf_dir, t).limit(0).coalesce(1).write.parquet(
            os.path.join(str(d), f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def single_row_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("single_row_sf")
    for t in TABLES:
        load(spark, sf_dir, t).limit(1).coalesce(1).write.parquet(
            os.path.join(str(d), f"{t}.parquet")
        )
    return str(d)


def test_mi_constant_columns_null_nmi(spark, degenerate_sf_dir):
    rows = QUERIES["column_mutual_information"](spark, degenerate_sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.nmi is None  # H = 0 -> undefined, never a crash
        assert r.mi_nats == 0.0
        assert r.n_cells == 1


def test_bootstrap_single_row_survives_zero_weight_replicates(
    spark, single_row_sf_dir
):
    """With one order, ~37% of replicates draw weight 0 — mean_value must
    be NULL there, and the non-empty replicates exact."""
    rows = QUERIES["bootstrap_mean_ci"](spark, single_row_sf_dir).collect()
    assert len(rows) == 32
    empties = [r for r in rows if r.n_eff == 0]
    nonempty = [r for r in rows if r.n_eff > 0]
    assert empties and nonempty  # both arms exercised at n = 1
    for r in empties:
        assert r.mean_value is None
    base = nonempty[0].mean_value
    for r in nonempty:
        assert r.mean_value == base  # every replicate mean = the one row


def test_benford_constant_price_is_one_digit(spark, degenerate_sf_dir):
    rows = QUERIES["benford_price_audit"](spark, degenerate_sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].digit == 1 and rows[0].obs_share == 1.0
