"""Spark 4 Python Data Source: the crawl-shaped source (SURVEY A13)
brought IN-engine.

The reference acquires documents with a Selenium pager outside the query
engine (crawl/crawl.py:63-118: 20 links per page, then a per-doc content
fetch). Spark 4's Python Data Source API lets that acquisition step BE a
DataFrame source: ``spark.read.format("crawl_sim")`` plans one input
partition per page-range, and each partition's reader yields its page's
documents — the exact worker-parallel shape a real distributed fetcher
would have (swap ``_fetch_page``'s deterministic synthesis for an HTTP
call and nothing else changes; rate limiting would live per-partition).

Everything is deterministic — content/domain/size derive from md5 of the
page/slot indices — so tests can assert exact values, and repeated scans
are stable (a property the synthetic fixture shares with replaying a
crawl snapshot, and the reason no wall-clock or RNG appears here).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LINKS_PER_PAGE = 20  # reference pager size, crawl/crawl.py:84

SCHEMA = (
    "url string, domain string, page int, slot int, "
    "status int, content string, n_bytes bigint"
)

_DOMAINS = ("thuvienphapluat.vn", "vanban.chinhphu.vn", "luatvietnam.vn")


def _h(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _fetch_page(page: int) -> Iterator[tuple]:
    """Deterministic stand-in for the per-page fetch: 20 links per page,
    ~5% deterministic 404s (md5-derived), content sized by digest bytes."""
    for slot in range(LINKS_PER_PAGE):
        h = _h(f"crawl:{page}:{slot}")
        domain = _DOMAINS[int(h[0], 16) % len(_DOMAINS)]
        url = f"https://{domain}/doc/{page}-{slot}-{h[:8]}"
        status = 404 if int(h[1], 16) == 0 else 200
        content = "" if status != 200 else f"document {page}/{slot} body " + h
        yield (url, domain, page, slot, status, content, len(content))


class CrawlSimReader(DataSourceReader):
    def __init__(self, options):
        self.pages = int(options.get("pages", 10))
        self.pages_per_partition = int(options.get("pagesPerPartition", 2))

    def partitions(self):
        step = self.pages_per_partition
        return [InputPartition((lo, min(lo + step, self.pages)))
                for lo in range(0, self.pages, step)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for page in range(lo, hi):
            yield from _fetch_page(page)


class CrawlSimDataSource(DataSource):
    """``spark.read.format("crawl_sim").option("pages", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "crawl_sim"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CrawlSimReader:
        return CrawlSimReader(self.options)

    def simpleStreamReader(self, schema) -> "CrawlSimStreamReader":
        return CrawlSimStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CrawlSimDataSource)


class CrawlSimStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: the crawl frontier AS a stream. Offsets are page
    numbers; each micro-batch advances the frontier by ``pagesPerBatch``
    pages (bounded work per trigger — the maxOffsetsPerTrigger analog),
    up to an optional ``maxPages`` horizon. ``readBetweenOffsets``
    replays any committed range deterministically, which is what makes
    the source exactly-once under checkpoint recovery."""

    def __init__(self, options):
        self.pages_per_batch = int(options.get("pagesPerBatch", 2))
        self.max_pages = int(options.get("maxPages", 0))  # 0 = unbounded

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        lo = start["page"]
        hi = lo + self.pages_per_batch
        if self.max_pages:
            hi = min(hi, self.max_pages)
        rows = [r for p in range(lo, hi) for r in _fetch_page(p)]
        return iter(rows), {"page": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        for p in range(start["page"], end["page"]):
            yield from _fetch_page(p)
