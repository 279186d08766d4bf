"""Queries with direct reference-semantics parity (SURVEY §2.B/C/D/E).

The fixture ``documents`` table maps onto the reference's streamed record
(``source`` ↔ domain, ``text`` ↔ content; spark/consumer.py:10-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import metadata as M
from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.functions.exact import int_avg, sql_int_avg
from bigdata_2025_1_spark.io import load, spread
from bigdata_2025_1_spark.registry import query


@query(
    "domain_doc_stats",
    oracle=f"""
    SELECT source,
           COUNT(*) AS doc_count,
           MIN(LENGTH(text)) AS min_chars,
           MAX(LENGTH(text)) AS max_chars,
           {sql_int_avg('LENGTH(text)')} AS avg_chars,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY doc_count DESC, source
    """,
)
def domain_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-domain doc count + content-size stats in ONE pass.

    Reference computes these as 4 separate jobs plus a double count
    (spark/consumer.py:36,47,53-76); here it is a single hash aggregate
    (partial+final, AQE-coalesced) — the scale-correct shape.
    """
    docs = load(spark, sf_dir, "documents")
    ln = F.length("text")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.min(ln).alias("min_chars"),
            F.max(ln).alias("max_chars"),
            int_avg(ln).alias("avg_chars"),
            F.sum(ln).alias("total_chars"),
        )
        .orderBy(F.desc("doc_count"), "source")
    )


@query(
    "global_size_stats",
    oracle=f"""
    SELECT COUNT(*) AS total_documents,
           MIN(LENGTH(text)) AS min_size,
           MAX(LENGTH(text)) AS max_size,
           {sql_int_avg('LENGTH(text)')} AS avg_size,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_size
    FROM documents
    """,
)
def global_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/avg/sum of content length (C1+C4,
    spark/consumer.py:47,64-76) — count folded into the same aggregate."""
    docs = load(spark, sf_dir, "documents")
    ln = F.length("text")
    return docs.agg(
        F.count("*").alias("total_documents"),
        F.min(ln).alias("min_size"),
        F.max(ln).alias("max_size"),
        int_avg(ln).alias("avg_size"),
        F.sum(ln).alias("total_size"),
    )


@query(
    "top_domains",
    oracle="""
    SELECT source, COUNT(*) AS doc_count
    FROM documents
    GROUP BY source
    ORDER BY doc_count DESC, source
    LIMIT 10
    """,
)
def top_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 domains by count (C3/C6, spark/export_stats.py:89-98) —
    TakeOrdered (sort+limit pushed into a top-k), deterministic tiebreak."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), "source")
        .limit(10)
    )


@query(
    "filter_project_preview",
    oracle="""
    SELECT doc_id,
           source AS domain,
           CAST(n_chars AS VARCHAR) AS n_chars_str,
           CASE WHEN LENGTH(text) > 100
                THEN SUBSTRING(text, 1, 100) || '...'
                ELSE text END AS preview
    FROM documents
    WHERE source IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
    ORDER BY doc_id
    LIMIT 5
    """,
)
def filter_project_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project+alias+cast, conjunctive not-null filter, ordered head
    (B1/B2/B3 + D4 preview; spark/consumer.py:86-88,132-146)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.col("source").isNotNull()
            & F.col("text").isNotNull()
            & F.col("lang").isNotNull()
        )
        .select(
            "doc_id",
            F.col("source").alias("domain"),
            F.col("n_chars").cast("string").alias("n_chars_str"),
            T.preview(F.col("text")).alias("preview"),
        )
        .orderBy("doc_id")
        .limit(5)
    )


_METADATA_ORACLE = """
WITH lines AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS ls,
         regexp_extract_all(text, '\\d{1,4}/(?:\\d{4}/)?[A-ZĐ]{1,5}(?:-[A-Z0-9]{1,5})*') AS codes
  FROM documents
), parts AS (
  SELECT doc_id, text, ls, codes,
         codes[1] AS main_code,
         list_filter(codes[2:], c -> c <> codes[1]) AS related_codes,
         CASE WHEN contains(text, '|')
              THEN regexp_replace(string_split(text, '|')[2], '^[	
                  　]+|[	
                  　]+$', '', 'g') END AS agency,
         list_filter(ls, l -> contains(l, 'Số:') AND contains(lower(l), 'ngày'))[1] AS primary_line,
         list_filter(ls, l -> regexp_matches(lower(l), 'ngày[	
                  　]+\\d{1,2}[	
                  　]+tháng'))[1] AS fb_line,
         list_filter(ls, l -> regexp_matches(l, '\\b(KT\\.|TL\\.|THỨ TRƯỞNG|BỘ TRƯỞNG)\\b'))[-1] AS signer_line
  FROM lines
)
SELECT doc_id,
       main_code,
       NULLIF(array_to_string(related_codes, '|'), '') AS related_codes,
       agency,
       COALESCE(
         regexp_replace(list_filter(string_split(primary_line, '|'), p -> contains(lower(p), 'ngày'))[1], '^[	
                  　]+|[	
                  　]+$', '', 'g'),
         regexp_replace(fb_line, '^[	
                  　]+|[	
                  　]+$', '', 'g')
       ) AS issue_date,
       CASE WHEN len(list_filter(regexp_split_to_array(regexp_replace(signer_line, '^[	
                  　]+|[	
                  　]+$', '', 'g'), '[	
                  　]+'), w -> w <> '')) >= 2
            THEN list_aggregate(list_filter(regexp_split_to_array(regexp_replace(signer_line, '^[	
                  　]+|[	
                  　]+$', '', 'g'), '[	
                  　]+'), w -> w <> ''), 'string_agg', ' ')
       END AS signer
FROM parts
ORDER BY doc_id
"""


@query("metadata_extract", oracle=_METADATA_ORACLE)
def metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5-D8/E4: document-code regex scan, agency pipe-split, issue-date
    line scan with fallback, signer reverse line scan — one distributed
    ``select``, zero UDFs (crawl/1/extract_document_info.py:4-63)."""
    docs = spread(load(spark, sf_dir, "documents"))
    text = F.col("text")
    return docs.select(
        "doc_id",
        M.main_code(text).alias("main_code"),
        # Joined to a string: the driver's pandas canonicalizer cannot
        # hash array cells (CORRECTNESS_r01 err) — same information.
        # NULLIF('') on both engines: empty match-list ≡ no related codes.
        F.nullif(F.array_join(M.related_codes(text), "|"), F.lit("")).alias(
            "related_codes"
        ),
        M.agency(text).alias("agency"),
        M.issue_date(text).alias("issue_date"),
        M.signer(text).alias("signer"),
    ).orderBy("doc_id")


@query(
    "html_to_markdown_docs",
    oracle="""
    SELECT doc_id,
           '# ' || source || chr(10) || chr(10) ||
           regexp_replace(trim(substr(text, 1, 80)), '\\s+', ' ', 'g') AS markdown
    FROM documents
    ORDER BY doc_id
    """,
)
def html_to_markdown_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 through the engine end-to-end: wrap each document in HTML
    (<h1>source</h1><p>text…</p>), flatten with the Arrow-batched
    pandas UDF, verify against the SQL-computable expected markdown.
    (Table/list/ragged-cell semantics are covered by golden unit tests —
    not SQL-expressible.)"""
    from bigdata_2025_1_spark.functions.html_markdown import html_to_markdown_udf

    docs = spread(load(spark, sf_dir, "documents"))
    html = F.concat(
        F.lit("<h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.substring("text", 1, 80),
        F.lit("</p>"),
    )
    return docs.select(
        "doc_id", html_to_markdown_udf(html).alias("markdown")
    ).orderBy("doc_id")


@query(
    "normalize_text",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '^[	
                  　]+|[	
                  　]+$', '', 'g'), '[	
                  　]+', ' ', 'g') AS normalized,
           regexp_replace(text, '-{2,}', '', 'g') AS dashes_collapsed
    FROM documents
    ORDER BY doc_id
    """,
)
def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace normalize (D9, crawl/crawl.py:198-199) + dash collapse
    (D10, crawl/crawl.py:226) as vectorized regexp_replace."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.normalize_ws(F.col("text")).alias("normalized"),
        T.collapse_dashes(F.col("text")).alias("dashes_collapsed"),
    ).orderBy("doc_id")


TOP_WITH_OTHER_K = 5


@query(
    "top_sources_with_other",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(CAST(n_chars AS BIGINT)) AS total_chars
      FROM documents GROUP BY source
    ), ranked AS (
      SELECT source, n_docs, total_chars,
             ROW_NUMBER() OVER (ORDER BY n_docs DESC, source) AS rk
      FROM counts
    )
    SELECT CASE WHEN rk <= {TOP_WITH_OTHER_K} THEN source ELSE 'OTHER' END AS source,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(total_chars) AS BIGINT) AS total_chars,
           CAST(MIN(rk) AS INT) AS rank
    FROM ranked
    GROUP BY CASE WHEN rk <= {TOP_WITH_OTHER_K} THEN source ELSE 'OTHER' END
    ORDER BY rank
    """,
)
def top_sources_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 sources by document count with everything else folded into
    ONE 'OTHER' row — the reporting shape every dashboard needs and
    plain top-k silently gets wrong (dropping the tail misstates
    totals; the OTHER row keeps the report summing to the corpus).
    Extends the reference's top-domains intent (spark/export_stats.py:
    89-98) with the conservation property.

    Determinism: ranks are (count DESC, source)-tiebroken; the relabel
    + re-aggregate is integer; 'OTHER' takes the smallest absorbed rank
    so ordering is stable.

    Scale shape: source-cardinality aggregate → rank → conditional
    relabel → re-aggregate, all on the tiny grouped table; the corpus
    is touched by exactly one map-side-combinable count."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
    )
    ranked = counts.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("n_docs"), "source"))
    )
    relabeled = ranked.select(
        F.when(F.col("rk") <= TOP_WITH_OTHER_K, F.col("source"))
        .otherwise(F.lit("OTHER"))
        .alias("source"),
        "n_docs",
        "total_chars",
        "rk",
    )
    return (
        relabeled.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_chars").alias("total_chars"),
            F.min("rk").cast("int").alias("rank"),
        )
        .orderBy("rank")
    )
