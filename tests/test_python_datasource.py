"""Spark 4 Python Data Source (SURVEY A13 in-engine): partition planning,
deterministic replay, and engine integration (filters/aggregates run on
top of the custom source like any other scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_2025_1_spark.sources.pyds import (
    LINKS_PER_PAGE,
    CrawlSimDataSource,
    register,
)


def _load(spark, pages=10, per_part=2):
    register(spark)
    return (
        spark.read.format("crawl_sim")
        .option("pages", str(pages))
        .option("pagesPerPartition", str(per_part))
        .load()
    )


def test_row_count_and_partition_planning(spark):
    df = _load(spark, pages=10, per_part=2)
    assert df.count() == 10 * LINKS_PER_PAGE
    # 10 pages / 2 per partition = 5 source tasks
    assert df.rdd.getNumPartitions() == 5


def test_deterministic_replay_and_engine_ops(spark):
    df = _load(spark, pages=6)
    a = df.orderBy("url").collect()
    b = df.orderBy("url").collect()
    assert a == b  # replay-stable scan
    ok = df.filter(F.col("status") == 200)
    agg = (
        ok.groupBy("domain")
        .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("bytes"))
        .collect()
    )
    assert sum(r.n for r in agg) == ok.count()
    assert set(r.domain for r in agg) <= {
        "thuvienphapluat.vn", "vanban.chinhphu.vn", "luatvietnam.vn"
    }
    # deterministic 404 share exists but is small
    n404 = df.filter(F.col("status") == 404).count()
    assert 0 < n404 < df.count() * 0.2
    assert df.filter((F.col("status") == 200) & (F.col("n_bytes") == 0)).count() == 0


def test_streaming_crawl_frontier(spark, tmp_path):
    """The same source streamed: page offsets advance pagesPerBatch per
    trigger; availableNow drains to the maxPages horizon exactly once."""
    register(spark)
    stream = (
        spark.readStream.format("crawl_sim")
        .option("pagesPerBatch", "2")
        .option("maxPages", "6")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("crawl_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # drains until the offset stops advancing at the maxPages horizon
    # (availableNow would snapshot only ONE read()'s worth of pages)
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM crawl_stream")
    assert out.count() == 6 * LINKS_PER_PAGE
    # exactly-once: no duplicate urls across micro-batches
    assert out.select("url").distinct().count() == 6 * LINKS_PER_PAGE


def test_jsonl_sink_writer_roundtrip(spark, tmp_path):
    """Python Data Source WRITE path: per-partition temp files are
    renamed into part-NNNNN.jsonl at commit, the manifest carries exact
    per-file row counts, and a re-read agrees with the input."""
    import json
    import os

    from bigdata_2025_1_spark.sources import pyds_sink

    pyds_sink.register(spark)
    dest = str(tmp_path / "links_out")
    df = (
        spark.range(100)
        .selectExpr(
            "id",
            "concat('https://example.test/doc/', id) AS url",
            "array(id, id * 2) AS refs",
        )
        .repartition(4)
    )
    df.write.format("jsonl_sink").option("path", dest).mode("append").save()

    manifest = json.load(open(os.path.join(dest, pyds_sink.MANIFEST)))
    assert manifest["total_rows"] == 100
    assert sorted(f["file"] for f in manifest["files"]) == [
        f"part-{i:05d}.jsonl" for i in range(4)
    ]
    assert sum(f["rows"] for f in manifest["files"]) == 100
    # no stray temp files survive commit
    assert not [f for f in os.listdir(dest) if f.startswith("_tmp-")]

    back = spark.read.json(os.path.join(dest, "part-*.jsonl"))
    assert back.count() == 100
    got = {(r.id, r.url, tuple(r.refs)) for r in back.collect()}
    want = {(i, f"https://example.test/doc/{i}", (i, i * 2)) for i in range(100)}
    assert got == want


def test_jsonl_sink_requires_path(spark):
    import pytest as _pytest

    from bigdata_2025_1_spark.sources import pyds_sink

    pyds_sink.register(spark)
    with _pytest.raises(Exception, match="path"):
        spark.range(3).write.format("jsonl_sink").mode("append").save()


def test_crawl_stream_to_jsonl_sink_pipeline(spark, tmp_path):
    """Capstone composition: the reference's whole acquisition pipeline
    (Selenium pager → filter → driver-side json.dump, crawl/crawl.py)
    expressed in-engine end to end — streaming crawl source → declarative
    transform → idempotent per-batch jsonl sink. Each micro-batch commits
    through the two-phase writer into its own directory (batch_id-keyed,
    the exactly-once foreachBatch pattern); replaying the stream from
    scratch produces byte-identical output because the source is
    deterministic."""
    import json
    import os

    from pyspark.sql import functions as F

    from bigdata_2025_1_spark.sources import pyds, pyds_sink

    pyds.register(spark)
    pyds_sink.register(spark)
    out_root = str(tmp_path / "crawl_out")

    def sink_batch(batch_df, batch_id):
        (
            batch_df.filter(F.col("status") == 200)
            .select("url", "domain", "page", "n_bytes")
            .write.format("jsonl_sink")
            .option("path", os.path.join(out_root, f"batch-{batch_id:05d}"))
            .mode("append")
            .save()
        )

    stream = (
        spark.readStream.format("crawl_sim")
        .option("pagesPerBatch", "3")
        .option("maxPages", "6")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batches = sorted(os.listdir(out_root))
    assert batches == ["batch-00000", "batch-00001"]
    total, urls = 0, set()
    for b in batches:
        man = json.load(open(os.path.join(out_root, b, pyds_sink.MANIFEST)))
        total += man["total_rows"]
        for fn in (f["file"] for f in man["files"]):
            for line in open(os.path.join(out_root, b, fn)):
                rec = json.loads(line)
                assert rec["n_bytes"] > 0  # the 404s were filtered out
                urls.add(rec["url"])
    # all 200-status docs of the 6-page window, exactly once
    from bigdata_2025_1_spark.sources.pyds import _fetch_page

    expected = {r[0] for p in range(6) for r in _fetch_page(p) if r[4] == 200}
    assert urls == expected
    assert total == len(expected)
