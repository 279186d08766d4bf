"""Oracle-checked queries over the crawl-shaped Python Data Source.

``sources/pyds.py`` brings the reference's acquisition step
(crawl/crawl.py:63-118 — a Selenium pager, 20 links per page) in-engine as
a Spark 4 Python Data Source. Its synthesis is deterministic (every field
derives from ``md5(f"crawl:{page}:{slot}")``), which makes it
SQL-expressible: DuckDB can regenerate the identical corpus from
``range()`` + ``md5()`` and aggregate it — so the source itself gets a
driver-checked correctness row, not just a pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.registry import query
from bigdata_2025_1_spark.sources import pyds

_CRAWL_PAGE_STATS_SQL = """
WITH cells AS (
    SELECT p.page AS page, s.slot AS slot,
           md5('crawl:' || p.page || ':' || s.slot) AS h
    FROM (SELECT range AS page FROM range(0, 10)) p
    CROSS JOIN (SELECT range AS slot FROM range(0, 20)) s
), docs AS (
    SELECT
        page,
        CASE ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 3)
            WHEN 0 THEN 'thuvienphapluat.vn'
            WHEN 1 THEN 'vanban.chinhphu.vn'
            ELSE 'luatvietnam.vn'
        END AS domain,
        CASE WHEN substr(h, 2, 1) = '0' THEN 404 ELSE 200 END AS status,
        CASE WHEN substr(h, 2, 1) = '0' THEN 0
             ELSE 48 + length(CAST(page AS VARCHAR))
                     + length(CAST(slot AS VARCHAR))
        END AS n_bytes
    FROM cells
)
SELECT domain,
       status,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT page) AS n_pages
FROM docs
GROUP BY domain, status
ORDER BY domain, status
"""


@query("crawl_source_page_stats", oracle=_CRAWL_PAGE_STATS_SQL)
def crawl_source_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain/status stats over a fixed 10-page crawl window, read
    through the ``crawl_sim`` Python Data Source (SURVEY A13; reference
    pager crawl/crawl.py:84). The source plans one input partition per
    2-page range, so the scan itself is worker-parallel; the aggregate is
    an ordinary hash group-by on (domain, status) — ≤6 groups (5 on this
    window: one domain draws no 404s), map-side
    combined. The oracle regenerates the same md5-derived corpus in pure
    SQL, proving the source's synthesis end to end (fixed window, so the
    row is sf-independent by construction)."""
    del sf_dir  # synthetic source: the corpus is the fixed page window
    pyds.register(spark)
    df = (
        spark.read.format("crawl_sim")
        .option("pages", 10)
        .option("pagesPerPartition", 2)
        .load()
    )
    return (
        df.groupBy("domain", "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.count_distinct("page").alias("n_pages"),
        )
        .orderBy("domain", "status")
    )
