"""Every registered query must match its DuckDB oracle at sf0.001 (the
driver runs the same comparison at sf0.01 — tools/selfcheck.py covers
that interactively)."""

from __future__ import annotations

import pytest

from bigdata_2025_1_spark.oracle import check_query, connect_oracle
from bigdata_2025_1_spark.registry import all_oracles, all_queries

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = pytest.mark.slow

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = connect_oracle(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con, sf_dir):
    problems = check_query(spark, con, QUERIES[name], ORACLES.get(name), sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLES)
    # rows-only checks are allowed only for genuinely non-SQL-expressible
    # ops; keep the list explicit so additions are deliberate. Since round
    # 2 even the sketch queries are oracle-checkable (tolerance verdicts).
    assert missing == set(), missing


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())
