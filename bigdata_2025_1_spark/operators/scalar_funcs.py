"""Scalar/collection function coverage beyond the reference's D1-D11:
wordcount via explode, a Python UDTF, date/time features, string function
showcase (incl. edit distance), array/map builders. Each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.io import load, spread
from bigdata_2025_1_spark.registry import query


@query(
    "wordcount",
    oracle="""
    SELECT t.tok AS word, COUNT(*) AS n
    FROM (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ) t
    GROUP BY t.tok
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical big-data query: tokenize → explode → count → top-k.
    Map-side partial aggregation absorbs the token explosion before the
    shuffle — the property that keeps wordcount viable at 100 TB."""
    docs = spread(load(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


@query(
    "udtf_bigrams",
    oracle="""
    SELECT doc_id, bigram, pos
    FROM (
      SELECT doc_id,
             unnest([{'bigram': toks[i] || ' ' || toks[i+1], 'pos': i}
                     for i in range(1, greatest(len(toks) - 1, 0) + 1)],
                    recursive := true)
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
        FROM documents
        WHERE doc_id < 20
      )
    )
    ORDER BY doc_id, pos
    """,
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4): one input row → N output
    rows of (bigram, position). The lateral-join surface for generators
    that ``explode`` can't express (stateful/multi-column generation)."""

    @F.udtf(returnType="bigram: string, pos: int")
    class Bigrams:
        def eval(self, text: str):  # noqa: D401
            toks = [t for t in (text or "").lower().split() if t]
            for i in range(len(toks) - 1):
                yield f"{toks[i]} {toks[i + 1]}", i + 1

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("bigrams_udtf", Bigrams)
    return spark.sql(
        """
        SELECT d.doc_id, b.bigram, b.pos
        FROM udtf_docs_in d, LATERAL bigrams_udtf(d.text) b
        ORDER BY d.doc_id, b.pos
        """
    )


@query(
    "date_features",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(month(o_orderdate) AS INT) AS order_month_num,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_epoch_end,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions: year/quarter/month, day-of-week,
    datediff, last_day. (Spark dayofweek is 1=Sunday; DuckDB dayofweek is
    0=Sunday — the oracle shifts by one.)"""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.quarter(d).alias("order_quarter"),
        F.month(d).alias("order_month_num"),
        F.dayofweek(d).alias("order_dow"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), d).alias("days_to_epoch_end"),
        F.last_day(d).alias("month_end"),
    ).orderBy("o_orderkey")


@query(
    "string_functions_showcase",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           replace(c_mktsegment, 'A', '@') AS segment_sub,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS seg_edit_dist,
           split_part(c_name, '#', 2) AS name_number,
           CAST(strpos(c_name, '#') AS INT) AS hash_pos
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: case, padding, substitution, Levenshtein
    edit distance, field splitting, position."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("@")).alias("segment_sub"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_edit_dist"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_number"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
    ).orderBy("c_custkey")


@query(
    "array_map_builders",
    oracle="""
    SELECT n.n_name AS nation,
           array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), '|') AS segments,
           CAST(len(list(DISTINCT c.c_mktsegment)) AS INT) AS n_segments,
           list_sort(list(DISTINCT c.c_mktsegment))[1] AS first_segment
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def array_map_builders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregation: collect_set → sorted array + element
    access. (collect_list order is nondeterministic — always sort or use
    collect_set+sort when results must be stable.) The sorted array is
    emitted '|'-joined: the driver's pandas canonicalizer cannot hash raw
    list cells, and the delimited string carries identical information."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    segs = F.array_sort(F.collect_set("c_mktsegment"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(segs, "|").alias("segments"),
            F.size(segs).alias("n_segments"),
            F.try_element_at(segs, F.lit(1)).alias("first_segment"),
        )
        .orderBy("nation")
    )


@query(
    "cross_join_enumeration",
    oracle="""
    SELECT r.r_name AS region, s.status AS status, COUNT(o.o_orderkey) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus = s.status
    GROUP BY r.r_name, s.status
    ORDER BY region, status
    """,
)
def cross_join_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate (tiny × tiny) cross join to build a dense dimension
    grid, then LEFT joins so empty cells survive with 0 — the
    dense-report pattern. The cross join is 5×3; never cross-join
    anything that scales with data."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    statuses = o.select(F.col("o_orderstatus").alias("status")).distinct()
    grid = r.crossJoin(F.broadcast(statuses))
    return (
        grid.join(F.broadcast(n), n.n_regionkey == r.r_regionkey, "left")
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderstatus == F.col("status")),
            "left",
        )
        .groupBy(F.col("r_name").alias("region"), "status")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("region", "status")
    )


@query(
    "nested_order_lines",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 6
    )
    SELECT o.o_orderkey, o.o_orderpriority, CAST(g.n_lines AS INT) AS n_lines,
           l.l_linenumber AS ln, l.l_quantity AS qty, l.l_extendedprice AS price
    FROM g
    JOIN orders o ON o.o_orderkey = g.l_orderkey
    JOIN lineitem l ON l.l_orderkey = g.l_orderkey
    ORDER BY o_orderkey, ln
    """,
)
def nested_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round trip: denormalize lineitems into a per-order
    ``array<struct<ln,qty,price>>`` (the lakehouse nested layout that
    ships an order and its lines in ONE row — no join at read time),
    filter on the nested shape (orders with ≥ 6 lines), then renormalize
    with ``inline``. The oracle checks the flattened VALUES; the Spark
    plan is the structural exercise.

    Determinism: ``collect_list`` order is partition-dependent, so the
    struct array is ``array_sort``-ed — the struct's FIRST field is the
    unique line number, making the sort total. The flat output then
    orders by (order, line).

    Scale shape: one shuffle to group lines by order (the same orderkey
    exchange every order-lines query pays), then inline is a narrow
    generator — no second exchange; at 100 TB the nested table is what
    you'd persist, amortizing that shuffle across every downstream
    reader."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                )
            )
        ).alias("lines")
    )
    denorm = (
        orders.join(nested, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.size("lines") >= 6)
    )
    return (
        denorm.select(
            "o_orderkey",
            "o_orderpriority",
            F.size("lines").alias("n_lines"),
            F.inline("lines"),
        )
        .orderBy("o_orderkey", "ln")
    )
