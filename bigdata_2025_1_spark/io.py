"""Fixture-table IO.

The driver materializes a TPC-H-ish star schema plus ``events`` /
``documents`` / ``embeddings`` at ``/root/testdata/sf*/{table}.parquet``
(see TESTDATA.md / FIXTURES.md). All queries load through here so that a
future move to partitioned/bucketed layouts (or HDFS paths — the reference
deploys HDFS but never writes to it, ``hdfs/docker-compose.yml:4-49``) is a
one-file change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one fixture table. Column pruning / predicate pushdown happen
    downstream because this stays a plain declarative parquet scan."""
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{table}.parquet")
    # Deterministic timestamp semantics on EVERY code path: the tuned
    # session (session.py) already pins UTC, but queries also run under
    # driver-owned vanilla sessions — pin here, at the single entry point
    # all queries load through, so no query's timestamp arithmetic
    # depends on which table was loaded first or on the host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        # The events fixture has shipped ts two ways across driver rounds:
        # TIMESTAMP(NANOS) (rejected by Spark's reader, [PARQUET_TYPE_ILLEGAL]
        # — read nanos as int64, floor-divide to micros, bit-identical to
        # DuckDB's ns→µs truncation) and TIMESTAMP(MICROS) without a UTC flag
        # (read as TIMESTAMP_NTZ). Normalize both to session-TZ TIMESTAMP so
        # downstream epoch arithmetic (unix_micros, window gaps) type-checks;
        # with the UTC pin above, the NTZ→LTZ cast is value-preserving and
        # matches DuckDB's naive reading.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to all cores before CPU-heavy per-row work.

    The fixture tables are single small parquet files, which Spark scans as
    ONE partition — fine for IO-bound scans, serial for compute-bound
    stages (hashing, signatures, regex scans). On a real cluster the input
    would already be split; this keeps the local plan shaped the same way.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view (mirrors the reference's
    ``createOrReplaceTempView('documents')`` SQL entry point,
    spark/visualize.py:27)."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
