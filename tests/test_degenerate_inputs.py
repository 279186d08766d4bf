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


@pytest.fixture(scope="module")
def zero_label_sf_dir(spark, sf_dir, tmp_path_factory):
    """embeddings where label 0 is ENTIRELY zero vectors (plus a normal
    label 1 cohort); every other table empty. Written as single parquet
    FILES (duckdb) so connect_oracle can read them too."""
    import duckdb

    d = str(tmp_path_factory.mktemp("zero_label_sf"))
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT CAST(i AS BIGINT) AS vec_id,
                 [0.0 for _ in range(64)]::DOUBLE[] AS embedding,
                 0::INT AS label
          FROM range(5) r(i)
          UNION ALL
          SELECT vec_id + 100, embedding::DOUBLE[], 1::INT
          FROM (SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')
                ORDER BY vec_id LIMIT 5)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t == "embeddings":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return d


def test_sq8_all_zero_label_reported_not_dropped(spark, zero_label_sf_dir):
    """ADVICE r5: a label whose vectors ALL have zero norm must still
    appear — with its n_zero_vectors count and NULL mean/max — and the
    oracle must agree on the crafted input (the fixture has no zero
    vectors, so this path is test-exercised)."""
    from bigdata_2025_1_spark.oracle import check_query, connect_oracle
    from bigdata_2025_1_spark.registry import all_oracles

    rows = {
        r.label: r
        for r in QUERIES["sq8_quantization_error"](spark, zero_label_sf_dir).collect()
    }
    assert set(rows) == {0, 1}
    z = rows[0]
    assert z.n_vectors == 5 and z.n_zero_vectors == 5
    assert z.mean_rel_err is None and z.max_rel_err is None
    assert rows[1].n_zero_vectors == 0 and rows[1].mean_rel_err is not None

    con = connect_oracle(zero_label_sf_dir)
    problems = check_query(
        spark,
        con,
        QUERIES["sq8_quantization_error"],
        all_oracles()["sq8_quantization_error"],
        zero_label_sf_dir,
    )
    assert not problems, problems


# --- one-sided emptiness (round 8) ------------------------------------------
# The empty-tables suite covers ALL-empty; the JSD empty-side crash
# (fixed this round) showed the gap is ONE-SIDED emptiness: one of a
# two-group comparison's sides missing entirely. Every two-group query
# must survive it AND match its oracle on the same one-sided fixture.

import duckdb as _duckdb
import pytest as _pytest
from pyspark.sql import functions as _F

from bigdata_2025_1_spark.io import TABLES as _TABLES
from bigdata_2025_1_spark.io import load as _load
from bigdata_2025_1_spark.oracle import check_query as _check_query
from bigdata_2025_1_spark.registry import all_oracles as _all_oracles
from bigdata_2025_1_spark.registry import all_queries as _all_queries

_ONE_SIDED = (
    "mann_whitney_segment_spend",  # customer segment B absent
    "welch_t_spend",
    "ks_value_drift",  # event type B absent
    "wasserstein_value_drift",
    "jsd_source_divergence",  # document source B absent
    "logrank_priority_survival",  # priority group B absent
    "ab_test_uplift",  # arm assignment is hash-based; unaffected, sanity
)


@_pytest.fixture(scope="module")
def one_sided_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("one_sided_sf")
    for t in _TABLES:
        df = _load(spark, "/root/testdata/sf0.001", t)
        if t == "customer":
            df = df.filter(_F.col("c_mktsegment") != "MACHINERY")
        elif t == "events":
            df = df.filter(_F.col("event_type") != "click")
        elif t == "documents":
            df = df.filter(_F.col("source") != "src1")
        elif t == "orders":
            df = df.filter(_F.col("o_orderpriority") != "5-LOW")
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@_pytest.fixture(scope="module")
def one_sided_con(one_sided_sf):
    con = _duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{one_sided_sf}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@_pytest.mark.parametrize("name", _ONE_SIDED)
def test_two_group_query_survives_one_sided_input(
    name, spark, one_sided_con, one_sided_sf
):
    problems = _check_query(
        spark,
        one_sided_con,
        _all_queries()[name],
        _all_oracles().get(name),
        one_sided_sf,
    )
    assert not problems, (name, problems)
    spark.catalog.clearCache()
