"""Pandas-UDF operator surface (SURVEY §2.G UDF/UDAF/UDTF row): grouped
aggregation (pandas UDAF), grouped-map (applyInPandas), exact percentiles,
pivot, and a dual-engine SQL CTE — each with a DuckDB oracle.

Determinism notes: the pandas kernels below compute order-independent
quantities only (exact int sums, sorted-order medians), so Arrow batch
boundaries / partitionings cannot change results.
"""

from __future__ import annotations

import os as _os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.exact import sql_exact_sum, within_tol
from bigdata_2025_1_spark.functions.ranks import with_global_rank
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.registry import query


@query(
    "udaf_median_order_value",
    oracle="""
    SELECT o_orderstatus,
           median(o_totalprice) AS median_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def udaf_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via pandas grouped-agg UDF: exact median per group.

    Median = sorted-order statistic with midpoint interpolation — numpy
    and DuckDB agree bit-for-bit on the same doubles (no accumulation
    order involved). Arrow moves each group's column once."""
    o = load(spark, sf_dir, "orders")

    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # pandas UDAFs cannot mix with JVM aggregates in one agg → count is a
    # (trivial) pandas UDAF too.
    @F.pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return len(v)

    return (
        o.groupBy("o_orderstatus")
        .agg(
            median_udaf("o_totalprice").alias("median_price"),
            count_udaf("o_orderkey").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# Bucketed grouped-map width: enough distinct pmod values to spread over
# any realistic core count without degenerating to per-customer frames.
# FLOOR, not the whole story: each applyInPandas group materializes
# ~1/buckets of the orders scan as ONE in-memory pandas frame, so a
# fixed width would grow per-task memory linearly with data volume
# (ADVICE r14). _share_buckets() therefore scales the width with the
# input's on-disk size, targeting ~32 MB of (compressed, full-width)
# scan bytes per bucket — a few hundred MB of pandas at worst after
# decompression and the 3-column projection; at bench SFs the floor
# binds, so local plans are unchanged.
_SHARE_BUCKETS = 256
_SHARE_BUCKET_TARGET_BYTES = 32 << 20


def _share_buckets(sf_dir: str) -> int:
    path = _os.path.join(sf_dir, "orders.parquet")
    total = 0
    if _os.path.isdir(path):
        for root, _dirs, files in _os.walk(path):
            total += sum(
                _os.path.getsize(_os.path.join(root, f)) for f in files
            )
    elif _os.path.exists(path):
        total = _os.path.getsize(path)
    return max(_SHARE_BUCKETS, -(-total // _SHARE_BUCKET_TARGET_BYTES))


@query(
    "grouped_map_spend_share",
    oracle=f"""
    WITH spends AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 1e2) AS BIGINT) AS cents
      FROM orders
    ), totals AS (
      SELECT o_custkey, SUM(cents) AS total_cents FROM spends GROUP BY o_custkey
    )
    SELECT s.o_custkey, s.o_orderkey,
           CAST(s.cents AS DOUBLE) / t.total_cents AS spend_share
    FROM spends s JOIN totals t USING (o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def grouped_map_spend_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map via applyInPandas: customers' orders arrive as pandas
    frames; emit each order's share of the customer total. The kernel
    divides exact int cents by an exact int total — one double op,
    engine-stable. (The relational twin is a window sum; the point here is
    the applyInPandas surface for logic windows can't express.)

    Round-14 shape change (guide §4: hand WHOLE BATCHES to vectorized
    kernels): grouping directly by o_custkey handed the kernel ~15 k
    single-customer micro-frames — per-group pandas construction + call
    overhead dominated (measured 47 s at sf0.1, 76 s task time for 0.5 s
    of arithmetic). The grouped-map now runs over >= {_SHARE_BUCKETS}
    deterministic customer buckets (pmod of the key — guide §2.5's
    deterministic synthetic key; width scales with the input's on-disk
    size so per-bucket pandas memory stays bounded, see _share_buckets)
    and computes the per-customer totals
    INSIDE each frame with a vectorized groupby-transform: identical
    per-customer integer totals (int64 groupby sum), identical division,
    identical rows — 45 s faster. This is also the production shape for
    high-cardinality grouped maps: the per-group surface does not
    survive millions of groups."""
    o = load(spark, sf_dir, "orders")

    def share(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        total = cents.groupby(pdf["o_custkey"]).transform("sum")
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "spend_share": cents.astype("float64")
                / total.astype("int64"),
            }
        )

    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy(F.pmod(F.col("o_custkey"), F.lit(_share_buckets(sf_dir))))
        .applyInPandas(share, "o_custkey BIGINT, o_orderkey BIGINT, spend_share DOUBLE")
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.90) AS p90
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics). At
    100 TB the approx twin below replaces this; exact is the correctness
    anchor."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
            F.percentile("o_totalprice", F.lit(0.50)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.90)).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "approx_percentiles",
    oracle="""
    SELECT quantile_cont(l_extendedprice, 0.50) AS exact_p50,
           quantile_cont(l_extendedprice, 0.95) AS exact_p95,
           quantile_cont(l_extendedprice, 0.99) AS exact_p99,
           CASE WHEN quantile_cont(l_extendedprice, 0.50) IS NOT NULL
                THEN TRUE END AS p50_within_tol,
           CASE WHEN quantile_cont(l_extendedprice, 0.95) IS NOT NULL
                THEN TRUE END AS p95_within_tol,
           CASE WHEN quantile_cont(l_extendedprice, 0.99) IS NOT NULL
                THEN TRUE END AS p99_within_tol
    FROM lineitem
    """,
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): fixed memory, single pass —
    the scale path for quantiles (exact twin: order_value_percentiles).
    Sketch values are engine-specific, so the checkable output is a
    tolerance verdict per quantile (|approx - exact| / exact <= 0.05)
    alongside the exact interpolated percentiles both engines agree on."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.percentile("l_extendedprice", F.lit(0.50)).alias("exact_p50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("exact_p95"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("exact_p99"),
        F.percentile_approx("l_extendedprice", F.lit(0.50), F.lit(10000)).alias("a50"),
        F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("a95"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("a99"),
    )
    return agg.select(
        "exact_p50",
        "exact_p95",
        "exact_p99",
        within_tol("a50", "exact_p50").alias("p50_within_tol"),
        within_tol("a95", "exact_p95").alias("p95_within_tol"),
        within_tol("a99", "exact_p99").alias("p99_within_tol"),
    )


@query(
    "pivot_status_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P,
           COALESCE({sql_exact_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)}, 0.0)
             AS open_revenue
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list — at scale always enumerate pivot values
    to avoid the extra distinct-scan) + a conditional exact sum."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "status_F", "O": "status_O", "P": "status_P"})
    )
    open_rev = (
        o.groupBy("o_orderpriority")
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("o_orderstatus") == "O", cents)), F.lit(0)
                )
                / 100.0
            ).alias("open_revenue")
        )
    )
    return (
        pivoted.join(open_rev, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.coalesce("status_F", F.lit(0)).alias("status_F"),
            F.coalesce("status_O", F.lit(0)).alias("status_O"),
            F.coalesce("status_P", F.lit(0)).alias("status_P"),
            "open_revenue",
        )
        .orderBy("o_orderpriority")
    )


# One SQL text, two engines: the ANSI-portable subset is the contract.
_DUAL_SQL = """
WITH nation_avg AS (
  SELECT c.c_nationkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 1e2) AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 1e2 AS avg_order
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
)
SELECT n.n_name AS nation, COUNT(*) AS n_big_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN nation_avg na ON na.c_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_totalprice > 2 * na.avg_order
GROUP BY n.n_name
ORDER BY n_big_orders DESC, nation
"""


@query("sql_cte_above_nation_avg", oracle=_DUAL_SQL)
def sql_cte_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point (EP2 parity, spark/visualize.py:27) with a CTE:
    orders more than 2x their nation's average. The SAME SQL text runs on
    Spark and DuckDB — the portable-ANSI contract, exact-sum idiom
    included."""
    for t in ("customer", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_DUAL_SQL)


@query(
    "sql_pipe_revenue",
    oracle="""
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(cents AS DOUBLE) / 1e2 AS revenue
    FROM (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(ROUND(o_totalprice * 1e2) AS BIGINT)) AS cents
      FROM orders
      WHERE o_orderstatus = 'F'
      GROUP BY o_orderpriority
    )
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, SQL:2023-style ``|>`` chaining): the
    same filter→aggregate→project→order pipeline as classic nested SQL,
    written in execution order. Parsed to the identical logical plan —
    the oracle is the classic-syntax spelling, so this also pins that
    pipe syntax changes nothing semantically. Exact-cents sum idiom as
    everywhere."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n,
                     SUM(CAST(ROUND(o_totalprice * 1e2) AS BIGINT)) AS cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, CAST(cents AS DOUBLE) / 1e2 AS revenue
        |> ORDER BY o_orderpriority
    """)


@query(
    "winsorized_segment_spend",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment,
             CAST(ROUND(c_acctbal * 1e2) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY CAST(ROUND(c_acctbal * 1e2) AS BIGINT)) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) - 1 AS k
      FROM customer
    ), bounds AS (
      SELECT c_mktsegment,
             20 * MAX(CASE WHEN rn = k // 20 THEN cents END)
               + (k % 20) * (MAX(CASE WHEN rn = (k + 19) // 20 THEN cents END)
                             - MAX(CASE WHEN rn = k // 20 THEN cents END)) AS lo20,
             20 * MAX(CASE WHEN rn = (19 * k) // 20 THEN cents END)
               + ((19 * k) % 20) * (MAX(CASE WHEN rn = (19 * k + 19) // 20 THEN cents END)
                                    - MAX(CASE WHEN rn = (19 * k) // 20 THEN cents END)) AS hi20
      FROM ranked GROUP BY c_mktsegment, k
    ), w AS (
      SELECT c.c_mktsegment,
             GREATEST(b.lo20, LEAST(b.hi20,
               20 * CAST(ROUND(c.c_acctbal * 1e2) AS BIGINT))) AS wv20
      FROM customer c JOIN bounds b USING (c_mktsegment)
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(wv20) AS DOUBLE) / COUNT(*) / 2e3 AS winsorized_mean
    FROM w GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def winsorized_segment_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per segment: clamp each balance into its segment's
    [p05, p95] band, then average — the robust-stats aggregate that
    keeps a handful of extreme rows from owning a KPI (the outlier-REMOVING
    twin is zscore_outliers; this one caps instead of drops).

    Determinism: the percentile INTERPOLATION itself runs in exact
    integer arithmetic — p05 sits at rank h = k/20 (k = n-1), so the
    linearly interpolated bound, scaled by 20, is
    ``20·v[⌊h⌋] + (k mod 20)·(v[⌈h⌉] − v[⌊h⌋])`` over integer cents:
    bit-exact in any engine, no reliance on two engines' quantile_cont
    producing identical doubles (balances have exactly 2 decimals, so
    cents are exact). The clamp compares 20·cents against those integer
    bounds; only the final mean divides, with an identical op sequence
    both sides.

    Scale shape: the bounds need a per-segment sort — at 100 TB
    substitute approx_percentile (this exact form is the correctness
    anchor, same split as order_value_percentiles vs approx_percentiles).
    Bounds broadcast back; the clamp is map-side; one narrow shuffle of
    (segment, cents) pairs for the rank window."""
    c = load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 1e2).cast("bigint")
    seg_w = Window.partitionBy("c_mktsegment")
    ranked = (
        c.select("c_mktsegment", cents.alias("cents"))
        .withColumn("rn", F.row_number().over(seg_w.orderBy("cents")) - 1)
        .withColumn("k", F.count("*").over(seg_w) - 1)
    )
    k = F.col("k")

    def _at(idx):  # value at 0-based rank ``idx`` within the segment
        return F.max(F.when(F.col("rn") == idx, F.col("cents")))

    bounds = ranked.groupBy("c_mktsegment", "k").agg(
        (
            20 * _at(F.expr("k div 20"))
            + (k % 20) * (_at(F.expr("(k + 19) div 20")) - _at(F.expr("k div 20")))
        ).alias("lo20"),
        (
            20 * _at(F.expr("(19 * k) div 20"))
            + ((19 * k) % 20)
            * (_at(F.expr("(19 * k + 19) div 20")) - _at(F.expr("(19 * k) div 20")))
        ).alias("hi20"),
    ).select("c_mktsegment", "lo20", "hi20")
    wv20 = F.greatest(F.col("lo20"), F.least(F.col("hi20"), 20 * F.col("cents")))
    return (
        c.select("c_mktsegment", cents.alias("cents"))
        .join(F.broadcast(bounds), "c_mktsegment")
        .select("c_mktsegment", wv20.alias("wv20"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            (F.sum("wv20").cast("double") / F.count("*") / 2e3).alias("winsorized_mean"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "quantile_normalize_doclen",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, n_chars FROM documents
    ), per_src AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM d
    ), granks AS (
      SELECT n_chars AS gval,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gidx
      FROM d
    ), tot AS (
      SELECT COUNT(*) AS n FROM d
    ), mapped AS (
      SELECT p.doc_id, p.source, p.n_chars,
             CASE WHEN p.ns = 1 THEN (SELECT n FROM tot) // 2
                  ELSE ((p.rk - 1) * ((SELECT n FROM tot) - 1) * 2 + (p.ns - 1))
                       // (2 * (p.ns - 1))
             END + 1 AS gidx
      FROM per_src p
    )
    SELECT m.doc_id, m.source, CAST(m.n_chars AS BIGINT) AS n_chars,
           CAST(g.gval AS BIGINT) AS normalized
    FROM mapped m JOIN granks g USING (gidx)
    ORDER BY m.doc_id
    """,
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length ACROSS sources: each
    doc's within-source percentile rank maps to the global value at the
    same percentile, so every source's length distribution becomes the
    global one while preserving within-source order — the standard
    cross-batch/cross-source calibration trick (genomics' quantile
    normalization; feature preprocessing for mixed-source corpora).

    Determinism: percentile→index is EXACT integer half-up rounding,
    ``((rk−1)·(N−1)·2 + (ns−1)) // (2·(ns−1))`` — no float percentile
    anywhere; ranks are (value, doc_id)-tiebroken row_numbers. Safe in
    int64 while N·max(rk) < 4.6e18 (N beyond ~2e9 rows would need the
    formula in decimal — documented, loud, not silent).

    Scale shape: the per-source windows partition by source; the global
    value-at-rank table is built WITHOUT a single-partition window
    (pinned in tests/test_plans.py) via ``with_global_rank``
    (range-repartition + partition-local numbering + a
    partition-count-sized offset table, ``functions/ranks.py``); the
    join back is an integer equi-join on gidx."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    per_src = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_src).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    glob = with_global_rank(
        d.select(F.col("n_chars").alias("gval"), "doc_id"), ["gval", "doc_id"], "gidx"
    ).drop("doc_id")
    tot = d.agg(F.count("*").alias("n"))
    gidx = (
        F.when(F.col("ns") == 1, F.expr("n div 2")).otherwise(
            F.expr("((rk - 1) * (n - 1) * 2 + (ns - 1)) div (2 * (ns - 1))")
        )
        + 1
    )
    mapped = per_src.crossJoin(F.broadcast(tot)).select(
        "doc_id", "source", "n_chars", gidx.alias("gidx")
    )
    return (
        mapped.join(glob, "gidx")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("gval").cast("bigint").alias("normalized"),
        )
        .orderBy("doc_id")
    )
