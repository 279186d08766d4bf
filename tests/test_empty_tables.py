"""Empty-input robustness: EVERY registered query must run on empty
fixture tables and still match its DuckDB oracle — zero rows is a
legitimate state for any pipeline stage (a fresh deployment, a filter
that matched nothing, an empty partition), and ANSI mode turns unguarded
divisions into job failures exactly there.

This suite found and pinned real bugs: funnel and within_tol divided by
zero on empty input; approx_percentiles' oracle emitted TRUE verdicts
where Spark emits NULL.
"""

from __future__ import annotations

import duckdb
import pytest

from bigdata_2025_1_spark.io import TABLES, load
from bigdata_2025_1_spark.oracle import check_query
from bigdata_2025_1_spark.registry import all_oracles, all_queries

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = pytest.mark.slow

# SQL-standard engines emit the grand-total row for an aggregate over an
# empty table inside ROLLUP/CUBE/GROUPING SETS; Spark emits zero rows.
# Engine semantics, not a bug in either — pinned below, excluded here.
EMPTY_DIVERGENT = {
    "rollup_nation_segment",
    "rollup_time_hierarchy",
    "cube_flag_status",
    "grouping_sets_priority_status",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load(spark, sf_dir, t).limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def empty_con(empty_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n in all_queries() if n not in EMPTY_DIVERGENT]
)
def test_query_on_empty_tables(name, spark, empty_con, empty_sf_dir):
    problems = check_query(
        spark, empty_con, all_queries()[name], all_oracles().get(name), empty_sf_dir
    )
    spark.catalog.clearCache()
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(EMPTY_DIVERGENT))
def test_grouping_sets_empty_divergence_pinned(name, spark, empty_con, empty_sf_dir):
    """Spark: 0 rows; DuckDB: the SQL-standard grand-total row. If either
    engine changes behavior, this pin fails and the EMPTY_DIVERGENT list
    (and the operator docstrings) must be revisited."""
    spark_rows = all_queries()[name](spark, empty_sf_dir).collect()
    duck_rows = empty_con.execute(all_oracles()[name]).fetchall()
    assert len(spark_rows) == 0, name
    assert len(duck_rows) == 1, name
