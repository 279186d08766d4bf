"""Structured Streaming tests — no Kafka broker needed: file-backed
streams over kafka-shaped parquet (A3 message shape), availableNow
triggers, checkpointing, watermarked windows, watermarked dedup.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.events_ops import events_hourly_windows
from bigdata_2025_1_spark.sources.kafka_shape import to_kafka_message
from bigdata_2025_1_spark.streaming import windows as W
from bigdata_2025_1_spark.streaming.consumer import StatsSink, start_consumer

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def kafka_shaped_dir(spark, sf_dir, tmp_path_factory):
    """documents fixture → kafka message shape → parquet dir, the
    broker-less stand-in for a topic."""
    out = str(tmp_path_factory.mktemp("kafka_shaped"))
    docs = load(spark, sf_dir, "documents").select(
        F.col("source").alias("domain"),
        F.concat(F.lit("doc"), F.col("doc_id")).alias("filename"),
        F.col("text").alias("content"),
        F.concat(F.lit("/data/"), F.col("source")).alias("file_path"),
    )
    msgs = to_kafka_message(docs, ("domain", "filename"), ["domain", "filename", "content", "file_path"])
    msgs.withColumn("timestamp", F.current_timestamp()).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_us"))
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_consumer_pipeline(spark, kafka_shaped_dir, tmp_path):
    src = spark.readStream.schema(
        "key STRING, value STRING, timestamp TIMESTAMP"
    ).parquet(kafka_shaped_dir)
    sink = StatsSink()
    q = start_consumer(spark, src, sink, str(tmp_path / "ckpt"), once=True)
    q.awaitTermination(120)
    assert not q.isActive
    assert len(sink.rows) >= 1
    total = sum(r["total_documents"] for r in sink.rows)
    assert total == 500  # documents @ sf0.001
    merged_domains = {}
    for r in sink.rows:
        for d, c in r["domains"].items():
            merged_domains[d] = merged_domains.get(d, 0) + c
    assert sum(merged_domains.values()) == 500
    st = sink.rows[0]["size_stats"]
    assert st["min_size"] >= 0 and st["max_size"] >= st["min_size"]
    # EP2 parity: the batch registered a live (global) temp view for SQL
    assert spark.sql("SELECT COUNT(*) AS n FROM global_temp.documents").first().n == 500


def test_consumer_drops_malformed(spark, tmp_path):
    rows = [
        ("k1", '{"domain":"a","filename":"f1","content":"x","file_path":"p"}'),
        ("k2", "not json at all"),
        ("k3", '{"domain":"a","filename":null,"content":"y","file_path":"p"}'),
    ]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(rows, "key STRING, value STRING").write.parquet(src_dir)
    src = spark.readStream.schema("key STRING, value STRING").parquet(src_dir)
    sink = StatsSink()
    q = start_consumer(spark, src, sink, str(tmp_path / "ckpt2"), once=True)
    q.awaitTermination(120)
    assert sum(r["total_documents"] for r in sink.rows) == 1  # B2 null-reject


def _run_stream_to_memory(spark, sdf, name, mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def test_tumbling_windows_match_batch_twin(spark, events_stream_dir, sf_dir):
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).parquet(events_stream_dir)
    result = _run_stream_to_memory(
        spark, W.tumbling_counts(stream), "tumbling_test", mode="append"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in result.collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in events_hourly_windows(spark, sf_dir).drop("n_users").collect()
    }
    # availableNow + watermark: all-but-the-last windows must be emitted
    # and every emitted window must agree exactly with the batch twin
    assert len(got) >= len(expected) - 24
    for k, v in got.items():
        assert expected[k][0] == v[0] and expected[k][1] == v[1]


def test_session_windows_stream(spark, events_stream_dir):
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).parquet(events_stream_dir)
    result = _run_stream_to_memory(
        spark, W.session_counts(stream), "session_test", mode="append"
    )
    rows = result.collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start and r.n_events >= 1 for r in rows)


def test_dedup_within_watermark(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", "click"),
        (1, "2024-01-01 00:00:05", "click"),  # dup within watermark
        (2, "2024-01-01 00:01:00", "view"),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts_s STRING, event_type STRING").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    src_dir = str(tmp_path / "dedupsrc")
    df.write.parquet(src_dir)
    stream = spark.readStream.schema("user_id INT, ts TIMESTAMP, event_type STRING").parquet(src_dir)
    result = _run_stream_to_memory(
        spark,
        W.dedup_within_watermark(stream, ["user_id", "event_type"]),
        "dedup_test",
    )
    assert result.count() == 2


def test_stateful_running_counters(spark, tmp_path):
    from bigdata_2025_1_spark.streaming.stateful import running_user_counters

    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 00:10:00", 5.5),
        (2, "2024-01-01 00:05:00", 2.25),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts_s STRING, value DOUBLE").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    src_dir = str(tmp_path / "statesrc")
    df.write.parquet(src_dir)
    stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(src_dir)
    result = _run_stream_to_memory(
        spark, running_user_counters(stream), "stateful_test", mode="update"
    )
    # state accumulates across ALL rows of the batch per user
    final = {r.user_id: r for r in result.collect()}
    assert final[1].n_events == 2 and final[1].total_value == 15.5
    assert final[2].n_events == 1 and final[2].total_value == 2.25
    assert final[1].last_seen.minute == 10


def test_checkpoint_resume_no_reprocessing(spark, tmp_path):
    """F4: restarting a query on the same checkpoint must process ONLY new
    data (offsets are durable; stats don't double-count)."""
    src_dir = str(tmp_path / "ckptsrc")
    ckpt = str(tmp_path / "ckpt3")

    def write_batch(vals):
        rows = [
            (f"k{v}", f'{{"domain":"d","filename":"f{v}","content":"c","file_path":"p"}}')
            for v in vals
        ]
        spark.createDataFrame(rows, "key STRING, value STRING").write.mode(
            "append"
        ).parquet(src_dir)

    write_batch(range(5))
    src_schema = "key STRING, value STRING"
    sink1 = StatsSink()
    q1 = start_consumer(
        spark, spark.readStream.schema(src_schema).parquet(src_dir), sink1, ckpt, once=True
    )
    q1.awaitTermination(120)
    assert sum(r["total_documents"] for r in sink1.rows) == 5

    write_batch(range(5, 8))
    sink2 = StatsSink()
    q2 = start_consumer(
        spark, spark.readStream.schema(src_schema).parquet(src_dir), sink2, ckpt, once=True
    )
    q2.awaitTermination(120)
    # only the 3 new docs — the first 5 are committed in the checkpoint
    assert sum(r["total_documents"] for r in sink2.rows) == 3


def test_stats_parquet_sink_and_rollup(spark, kafka_shaped_dir, tmp_path):
    """A9/C7: stats land in a real parquet table; the cross-batch roll-up
    (export_stats.py:81,89-98 semantics) is then a plain batch query."""
    stats_path = str(tmp_path / "stats_pq")
    sink = StatsSink(parquet_path=stats_path)
    src = spark.readStream.schema(
        "key STRING, value STRING, timestamp TIMESTAMP"
    ).parquet(kafka_shaped_dir)
    q = start_consumer(spark, src, sink, str(tmp_path / "ckpt_pq"), once=True)
    q.awaitTermination(120)

    stats = spark.read.parquet(stats_path)
    rollup = stats.select(
        F.explode("domains").alias("domain", "doc_count"), "total_documents"
    ).groupBy("domain").agg(F.sum("doc_count").alias("total"))
    per_domain = {r.domain: r.total for r in rollup.collect()}
    assert sum(per_domain.values()) == 500
    # top-k domains across batches (C6 on the stats table)
    top = rollup.orderBy(F.desc("total"), "domain").limit(3).collect()
    assert len(top) == 3 and top[0].total >= top[-1].total
    # size_stats struct survived the sink round-trip
    row = stats.select("size_stats.min_size", "size_stats.total_size").first()
    assert row.min_size >= 0 and row.total_size > 0


def test_stream_static_enrichment(spark, events_stream_dir, sf_dir):
    from bigdata_2025_1_spark.streaming.joins import enrich_with_dimension

    dim = spark.createDataFrame(
        [("click", "web"), ("purchase", "commerce"), ("view", "web")],
        "event_type STRING, category STRING",
    )
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).parquet(events_stream_dir)
    enriched = enrich_with_dimension(stream, dim, "event_type")
    result = _run_stream_to_memory(spark, enriched, "enrich_test")
    rows = result.collect()
    assert len(rows) == 1000  # events @ sf0.001, left join preserves all
    cats = {r.event_type: r.category for r in rows if r.category is not None}
    assert cats["click"] == "web" and cats["purchase"] == "commerce"
    assert all(r.category is None for r in rows if r.event_type in ("signup", "error"))


def test_stream_stream_interval_join(spark, events_stream_dir, sf_dir):
    from bigdata_2025_1_spark.streaming.joins import interval_self_join

    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).parquet(events_stream_dir)
    joined = interval_self_join(stream, max_gap_seconds=300)
    result = _run_stream_to_memory(spark, joined, "ss_join_test")
    rows = result.collect()
    # batch twin computed directly for equality
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    expected = (
        c.join(p, (F.col("u") == F.col("pu"))
               & (F.col("pts") >= F.col("cts"))
               & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 300 SECONDS")))
        .count()
    )
    assert expected > 0
    # availableNow + watermark may hold back pairs near the stream end,
    # but every emitted pair must be a true pair and most must arrive
    got = {(r.click_id, r.purchase_id) for r in rows}
    assert len(got) <= expected
    assert len(got) >= expected - 50


def test_asof_join_in_foreachbatch(spark, events_stream_dir, sf_dir, tmp_path):
    """The round-2 window family streams: asof_attach_last runs unchanged
    inside foreachBatch (the reference's own streaming style — batch code
    per micro-batch) and the accumulated result matches the batch query
    over the same data."""
    from bigdata_2025_1_spark.registry import all_queries

    expected = {
        (r.user_id, r.click_id): (r.last_purchase_ts, r.last_purchase_value)
        for r in all_queries()["asof_join_last_purchase"](spark, sf_dir).collect()
    }

    out: dict = {}

    def per_batch(batch_df, _bid):
        from bigdata_2025_1_spark.functions.asof import asof_attach_last

        clicks = batch_df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = batch_df.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        for r in asof_attach_last(
            clicks, purchases, key="user_id", ts="ts", tiebreak="event_id",
            value="value", out_value="v", out_ts="t",
        ).collect():
            out[(r.user_id, r.event_id)] = (r.t, r.v)

    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ).parquet(events_stream_dir)
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "asof_ckpt"))
        .start()
    )
    try:
        # False = timed out with the stream still running and mutating
        # `out` — fail crisply instead of diffing a partial dict
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    # availableNow on a static dir = one micro-batch = same input as batch
    assert out == expected


def test_stateful_operator_survives_restart(spark, tmp_path):
    """F4 x stateful: ``applyInPandasWithState`` state must be durable in
    the checkpoint — a stopped query restarted on the same checkpoint
    resumes per-key counters from where batch 1 left them (it reads ONLY
    the new file, yet emits totals that include the old rows)."""
    from bigdata_2025_1_spark.streaming.stateful import running_user_counters

    src_dir = str(tmp_path / "statefulsrc")
    ckpt = str(tmp_path / "stateful_ckpt")
    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"

    def write_batch(rows):
        spark.createDataFrame(
            rows, "user_id LONG, ts_s STRING, value DOUBLE"
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).write.mode("append").parquet(src_dir)

    def run_once(name):
        # memory sink forbids checkpoint recovery; foreachBatch is the
        # recovery-capable sink shape (same as the StatsSink consumer)
        out: list = []
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            running_user_counters(stream)
            .writeStream.foreachBatch(lambda df, _bid: out.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r.user_id: r for r in out}

    write_batch(
        [(1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-01 00:05:00", 2.5),
         (2, "2024-01-01 00:01:00", 7.0)]
    )
    first = run_once("stateful_restart_1")
    assert first[1].n_events == 2 and first[1].total_value == 12.5
    assert first[2].n_events == 1

    # "kill": the query object is gone; only the checkpoint survives.
    write_batch([(1, "2024-01-01 00:20:00", 1.0), (3, "2024-01-01 00:21:00", 4.0)])
    second = run_once("stateful_restart_2")
    # user 1's counter RESUMES at 2 — state was restored, not rebuilt
    assert second[1].n_events == 3 and second[1].total_value == 13.5
    # user 3 is brand new state
    assert second[3].n_events == 1 and second[3].total_value == 4.0
    # user 2 had no new rows: update mode emits nothing for it in run 2
    assert 2 not in second


def test_transform_with_state_running_counters(spark, tmp_path):
    """Spark 4 transformWithState twin of the applyInPandasWithState
    counters: same exact-cents semantics on the RocksDB state store.

    Environment-gated like the PIL decode stub: the transformWithState
    Python worker needs protobuf for its state-server protocol; without
    it the worker crashes, so the test skips (the operator itself is
    real code, exercised wherever protobuf exists)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python worker requires protobuf",
    )
    from bigdata_2025_1_spark.streaming.stateful import running_user_counters_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rows = [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 00:10:00", 5.5),
            (2, "2024-01-01 00:05:00", 2.25),
        ]
        df = spark.createDataFrame(
            rows, "user_id LONG, ts_s STRING, value DOUBLE"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        src_dir = str(tmp_path / "twssrc")
        df.write.parquet(src_dir)
        stream = spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP, value DOUBLE"
        ).parquet(src_dir)
        result = _run_stream_to_memory(
            spark, running_user_counters_tws(stream), "tws_test", mode="update"
        )
        final = {r.user_id: r for r in result.collect()}
        assert final[1].n_events == 2 and final[1].total_value == 15.5
        assert final[2].n_events == 1 and final[2].total_value == 2.25
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_stream_left_outer_join(spark, events_stream_dir, sf_dir):
    """Outer stream-stream: clicks with no purchase in-window must
    surface as NULL rows (after the watermark passes their window), and
    every non-NULL pair must be a true interval match."""
    from bigdata_2025_1_spark.streaming.joins import interval_left_join

    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).parquet(events_stream_dir)
    joined = interval_left_join(stream, max_gap_seconds=300)
    result = _run_stream_to_memory(spark, joined, "ss_left_join_test")
    rows = result.collect()
    assert len(rows) > 0
    matched = [r for r in rows if r.purchase_id is not None]
    unmatched = [r for r in rows if r.purchase_id is None]
    # the fixture has far more clicks than within-5-min purchases: both
    # outcomes must actually occur
    assert matched and unmatched
    # spot-verify every matched pair satisfies the interval predicate
    for r in matched:
        gap = (r.purchase_ts - r.click_ts).total_seconds()
        assert 0 <= gap <= 300
    # no click id may appear both matched and unmatched-NULL
    assert {r.click_id for r in matched}.isdisjoint({r.click_id for r in unmatched})


def test_stateful_ttl_evicts_idle_keys(spark, tmp_path):
    """ProcessingTimeTimeout: once wall-clock passes a key's TTL the
    handler fires with hasTimedOut — under availableNow Spark drains
    pending timeouts in trailing micro-batches before stopping, so ONE
    run yields both the normal row and the eviction tombstone (state
    removed, final accumulated value preserved)."""
    from bigdata_2025_1_spark.streaming.stateful import running_user_counters_ttl

    src_dir = str(tmp_path / "ttlsrc")
    ckpt = str(tmp_path / "ttlckpt")
    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0)], "user_id LONG, ts_s STRING, value DOUBLE"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    ).write.parquet(src_dir)

    rows = []
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        running_user_counters_ttl(stream, ttl_ms=1)
        .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    normal = [r for r in rows if r.n_events == 1]
    tombstones = [r for r in rows if r.n_events == -1]
    assert normal and normal[0].total_value == 10.0
    assert tombstones and tombstones[0].total_value == 10.0  # state preserved into the tombstone


def test_foreachbatch_idempotent_multi_sink_replay(spark, tmp_path):
    """Exactly-once via idempotent writes: foreachBatch lands each batch
    under batch_id=N with dynamic partition overwrite, into TWO sinks.
    foreachBatch is at-least-once per sink (not transactional across
    them), so a crash between the write and the commit re-runs the
    batch — the batch_id-keyed overwrite makes that re-run REPLACE
    instead of append. The replay is exercised by re-invoking the sink
    with the same batch id (Spark-side offset recovery itself is pinned
    in test_checkpoint_resume_no_reprocessing)."""
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    raw_dir = str(tmp_path / "raw")
    agg_dir = str(tmp_path / "agg")

    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id LONG, k LONG"
    ).write.parquet(src_dir)

    seen = []

    def sink(df, bid):
        seen.append(bid)
        with_bid = df.withColumn("batch_id", F.lit(bid))
        (
            with_bid.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(raw_dir)
        )
        (
            with_bid.groupBy("batch_id", "k")
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(agg_dir)
        )

    q = (
        spark.readStream.schema("id LONG, k LONG")
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(raw_dir).count() == 30
    agg1 = sorted(map(tuple, spark.read.parquet(agg_dir).collect()))
    # replay the LAST batch verbatim (what a post-crash restart does)
    last_bid = seen[-1]
    replay_df = spark.read.parquet(src_dir)
    sink(replay_df, last_bid)
    assert spark.read.parquet(raw_dir).count() == 30  # replaced, not appended
    assert sorted(map(tuple, spark.read.parquet(agg_dir).collect())) == agg1


def test_consumer_parse_dlq_split(spark):
    """Every input row lands in exactly one of (valid, DLQ), and the DLQ
    carries the raw payload + a specific reject reason."""
    from bigdata_2025_1_spark.sources.kafka_shape import consumer_parse_with_dlq

    rows = [
        ("k1", '{"domain":"a","filename":"f1","content":"x","file_path":"p"}'),
        ("k2", "not json at all"),
        ("k3", '{"domain":null,"filename":"f3","content":"y","file_path":"p"}'),
        ("k4", '{"domain":"a","filename":"f4","content":null,"file_path":"p"}'),
    ]
    df = spark.createDataFrame(rows, "key STRING, value STRING")
    valid, rejects = consumer_parse_with_dlq(df)
    assert [r.kafka_key for r in valid.collect()] == ["k1"]
    got = {r.kafka_key: (r.reject_reason, r.raw_value) for r in rejects.collect()}
    assert got["k2"] == ("unparseable_json", "not json at all")
    assert got["k3"][0] == "missing_domain"
    assert got["k4"][0] == "missing_content"
    assert valid.count() + rejects.count() == len(rows)


def test_incremental_lsh_admission_in_foreachbatch(spark, sf_dir, tmp_path):
    """The daily-ingest dedup shape, streamed: odd docs arrive in TWO
    micro-batches (maxFilesPerTrigger=1), each probed against the
    STANDING corpus signature table via the same lsh_admission_log the
    batch query calls — the accumulated admission log must equal
    dedup_incremental_lsh over the same data, proving the per-batch path
    and the batch path cannot drift."""
    from bigdata_2025_1_spark.operators.dedup import (
        lsh_admission_log,
        signatures_from_docs,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = {
        r.doc_new: (r.n_dups, r.dup_of, r.jaccard, r.is_new_content)
        for r in all_queries()["dedup_incremental_lsh"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()

    docs = load(spark, sf_dir, "documents")
    corpus_sig = signatures_from_docs(
        docs.filter(F.col("doc_id") % 2 == 0)
    ).persist()
    corpus_sig.count()  # materialize the standing index once, up front

    stream_dir = str(tmp_path / "incoming")
    new_docs = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    new_docs.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    new_docs.filter(F.col("doc_id") % 4 == 3).coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    out: dict = {}
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        log = lsh_admission_log(signatures_from_docs(batch_df), corpus_sig)
        for r in log.collect():
            out[r.doc_new] = (r.n_dups, r.dup_of, r.jaccard, r.is_new_content)

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "lsh_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental, not one gulp
    assert out == expected
    spark.catalog.clearCache()


def test_slo_burn_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """SRE paging, streamed: events arrive in TWO micro-batches; each
    batch contributes its hourly_error_counts PARTIALS to a standing
    store (counts are mergeable — the streaming-state algebra), and
    burn_from_hourly over the merged store must equal the batch
    slo_burn_rate over the same events, proving the micro-batch path and
    the batch path cannot drift."""
    from bigdata_2025_1_spark.operators.events_ops import (
        burn_from_hourly,
        hourly_error_counts,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = {
        r.hour_ts: (r.err_1h, r.tot_1h, r.err_6h, r.tot_6h, r.alert)
        for r in all_queries()["slo_burn_rate"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()

    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    stream_dir = str(tmp_path / "ev_incoming")
    ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    partials: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        partials.extend(
            (r.h, r.err, r.tot) for r in hourly_error_counts(batch_df).collect()
        )

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "slo_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental

    merged = (
        spark.createDataFrame(partials, "h TIMESTAMP, err BIGINT, tot BIGINT")
        .groupBy("h")
        .agg(F.sum("err").alias("err"), F.sum("tot").alias("tot"))
    )
    got = {
        r.hour_ts: (r.err_1h, r.tot_1h, r.err_6h, r.tot_6h, r.alert)
        for r in burn_from_hourly(merged).collect()
    }
    assert got == expected
    spark.catalog.clearCache()


def test_ks_drift_monitor_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Feature-drift monitoring, streamed: events arrive in TWO
    micro-batches; each batch contributes its (v, c1, c2) histogram
    PARTIALS to a standing store (counts are mergeable), and
    ks_from_hist over the merged store must equal the batch
    ks_value_drift over the same events — the summary/finalize split
    that lets the KS monitor run per-trigger without reprocessing
    history."""
    from bigdata_2025_1_spark.operators.statistics import (
        ks_class_hist,
        ks_from_hist,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = all_queries()["ks_value_drift"](spark, sf_dir).collect()[0]
    spark.catalog.clearCache()

    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    stream_dir = str(tmp_path / "ks_incoming")
    ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    partials: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        partials.extend(
            (r.v, r.c1, r.c2) for r in ks_class_hist(batch_df).collect()
        )

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ks_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental

    store = spark.createDataFrame(partials, "v long, c1 long, c2 long")
    merged = store.groupBy("v").agg(
        F.sum("c1").alias("c1"), F.sum("c2").alias("c2")
    )
    got = ks_from_hist(merged).collect()[0]
    assert (got.n1, got.n2) == (expected.n1, expected.n2)
    assert abs(got.d_stat - expected.d_stat) < 1e-12
    assert got.at_value == expected.at_value

    # the SAME standing store finalizes the Wasserstein drift monitor:
    # one histogram, two statistics per trigger
    from bigdata_2025_1_spark.operators.statistics import w1_from_hist
    from bigdata_2025_1_spark.registry import all_queries as _aq

    w1_expected = _aq()["wasserstein_value_drift"](spark, sf_dir).collect()[0]
    w1_got = w1_from_hist(merged).collect()[0]
    assert (w1_got.n1, w1_got.n2) == (w1_expected.n1, w1_expected.n2)
    assert abs(w1_got.w1_distance - w1_expected.w1_distance) < 1e-12


def test_kmv_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Distinct-set intersection, streamed: events arrive in TWO
    micro-batches; each batch contributes its per-type bottom-k sketch
    rows to a standing store, merged by union → distinct → re-sketch
    (bottom-k of a union IS the bottom-k of the unioned sketches — KMV's
    mergeability guarantee), and kmv_est_from_sketch over the merged
    store must equal the batch kmv_intersection_estimate's estimates
    over the same events — the summary/finalize split that lets the
    intersection monitor run per-trigger without reprocessing history
    (VERDICT r7 ask #5)."""
    from bigdata_2025_1_spark.functions.hashing import md5_int
    from bigdata_2025_1_spark.operators.statistics import (
        kmv_est_from_sketch,
        kmv_sketch,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = {
        (r.type_a, r.type_b): r.est_intersection
        for r in all_queries()["kmv_intersection_estimate"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()

    ev = load(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    stream_dir = str(tmp_path / "kmv_incoming")
    ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    partials: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        du = batch_df.select(
            F.col("event_type").alias("t"),
            md5_int(F.col("user_id").cast("string")).alias("u"),
        ).distinct()
        partials.extend((r.t, r.u) for r in kmv_sketch(du).collect())

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING, user_id BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental

    store = spark.createDataFrame(partials, "t string, u long")
    merged = kmv_sketch(store.distinct())
    got = {
        (r.ta, r.tb): r.est_intersection
        for r in kmv_est_from_sketch(merged).collect()
    }
    assert got == expected


def test_mg_summary_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Heavy-hitter detection, streamed: documents arrive in TWO
    micro-batches; each batch's token counts merge into a standing
    Misra-Gries summary with the same merge-then-truncate rule the
    batch query's partition kernel uses. The mergeable-summaries
    guarantee (undercount <= n/k across ANY merge tree) means the
    standing summary must still contain every true heavy hitter found
    by the batch heavy_hitters_mg."""
    from bigdata_2025_1_spark.operators.pipeline_ops import _MG_K
    from bigdata_2025_1_spark.registry import all_queries

    expected_words = {
        r.word for r in all_queries()["heavy_hitters_mg"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    stream_dir = str(tmp_path / "mg_incoming")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    standing: dict[str, int] = {}
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        counts = (
            batch_df.select(
                F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
            )
            .filter(F.col("w") != "")
            .groupBy("w")
            .count()
            .collect()
        )
        for r in counts:
            standing[r.w] = standing.get(r.w, 0) + r["count"]
        if len(standing) >= _MG_K:
            kth = sorted(standing.values(), reverse=True)[_MG_K - 1]
            for w in list(standing):
                standing[w] -= kth
                if standing[w] <= 0:
                    del standing[w]

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental
    assert expected_words <= set(standing), (
        expected_words - set(standing)
    )
    # the summary honours its size bound
    assert len(standing) < 2 * _MG_K


def test_page_hinkley_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Online drift detection, streamed: events arrive in TWO
    micro-batches split on a day boundary (hours never straddle a
    batch); each batch collapses to its hourly counts and feeds the
    standing 4-integer Page-Hinkley state via page_hinkley_update — the
    per-trigger transition an online monitor keeps. The streamed
    per-hour (ph_stat, alarm) sequence must equal the batch
    page_hinkley_hourly query's rows over the same events, proving the
    batch query really is a faithful replay of the online detector."""
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        PH_STATE_ZERO,
        page_hinkley_update,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = [
        (r.hidx, r.ph_stat, r.alarm)
        for r in all_queries()["page_hinkley_hourly"](spark, sf_dir).collect()
    ]
    spark.catalog.clearCache()

    ev = load(spark, sf_dir, "events").select("ts")
    stream_dir = str(tmp_path / "ph_incoming")
    ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    state = [PH_STATE_ZERO]
    emitted: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        hours = (
            batch_df.groupBy(
                (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
                .cast("bigint")
                .alias("hidx")
            )
            .agg(F.count("*").alias("x"))
            .orderBy("hidx")
            .collect()
        )
        state[0], out = page_hinkley_update(state[0], [r.x for r in hours])
        emitted.extend(
            (r.hidx, ph, alarm) for r, (ph, alarm) in zip(hours, out)
        )

    stream = (
        spark.readStream.schema("ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ph_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental
    assert emitted == expected


def test_holt_winters_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Seasonal forecasting, streamed: orders arrive in TWO
    micro-batches split on a month boundary (months never straddle a
    batch); each batch collapses to its monthly revenue and feeds the
    standing (buffer, l, b, seasonal-queue) state via
    holt_winters_update. The streamed one-step fits plus the
    final-state forecasts must equal the batch holt_winters_forecast
    query's rows over the same orders — the per-trigger form of the
    seasonal forecaster (the page_hinkley/KMV twin convention)."""
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        HW_STATE_ZERO,
        holt_winters_forecast_from_state,
        holt_winters_update,
    )
    from bigdata_2025_1_spark.registry import all_queries

    rows = all_queries()["holt_winters_forecast"](spark, sf_dir).collect()
    expected_fits = [
        (r.y_cents, r.yhat_cents) for r in rows if r.kind == "fit"
    ]
    expected_fc = [r.yhat_cents for r in sorted(
        (r for r in rows if r.kind == "forecast"), key=lambda r: r.m
    )]
    spark.catalog.clearCache()

    # the fixture stores o_orderdate as a timestamp type; normalize to
    # DATE at write time so the stream schema is stable
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_totalprice"
    )
    stream_dir = str(tmp_path / "hw_incoming")
    orders.filter(F.col("o_orderdate") < "1995-01-01").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    orders.filter(F.col("o_orderdate") >= "1995-01-01").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    state = [HW_STATE_ZERO]
    fits: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        monthly = (
            batch_df.groupBy(
                ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
                .cast("bigint")
                .alias("m")
            )
            .agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).alias("y")
            )
            .orderBy("m")
            .collect()
        )
        state[0], out = holt_winters_update(state[0], [r.y for r in monthly])
        fits.extend(out)

    stream = (
        spark.readStream.schema("o_orderdate DATE, o_totalprice DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hw_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches
    assert fits == expected_fits
    assert holt_winters_forecast_from_state(state[0]) == expected_fc


def test_cusum_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Online CUSUM, streamed: events arrive in TWO micro-batches split
    on a day boundary (hours never straddle a batch); each batch
    collapses to its hourly counts and feeds the standing 4-integer
    CUSUM state via cusum_update — warm-up hours emit nothing, so the
    streamed output aligns with the TAIL of each chunk's hours. The
    streamed per-hour (cusum_scaled, alarm) sequence must equal the
    batch cusum_online_hourly query's rows over the same events (the
    page_hinkley twin convention)."""
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        CUSUM_STATE_ZERO,
        cusum_update,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = [
        (r.hidx, r.cusum_scaled, r.alarm)
        for r in all_queries()["cusum_online_hourly"](spark, sf_dir).collect()
    ]
    spark.catalog.clearCache()

    ev = load(spark, sf_dir, "events").select("ts")
    stream_dir = str(tmp_path / "cusum_incoming")
    ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    state = [CUSUM_STATE_ZERO]
    emitted: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        hours = (
            batch_df.groupBy(
                (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
                .cast("bigint")
                .alias("hidx")
            )
            .agg(F.count("*").alias("x"))
            .orderBy("hidx")
            .collect()
        )
        state[0], out = cusum_update(state[0], [r.x for r in hours])
        # out covers only post-warm-up hours: the LAST len(out) of chunk
        emitted.extend(
            (r.hidx, s, alarm)
            for r, (s, alarm) in zip(hours[len(hours) - len(out):], out)
        )

    stream = (
        spark.readStream.schema("ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cusum_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches  # genuinely incremental
    assert emitted == expected


def test_sprt_accumulates_in_foreachbatch(spark, sf_dir, tmp_path):
    """Sequential hypothesis testing, streamed: events arrive in TWO
    micro-batches split on a day boundary; each batch collapses to its
    hourly (events, errors) pairs and feeds the standing (llr, decision)
    SPRT state via sprt_update. The streamed per-hour (llr_i6, status)
    sequence must equal the batch sprt_error_rate query's rows (the
    page_hinkley/cusum twin convention) — including the frozen verdict
    surviving the batch boundary."""
    from bigdata_2025_1_spark.operators.timeseries_ops import (
        SPRT_STATE_ZERO,
        sprt_update,
    )
    from bigdata_2025_1_spark.registry import all_queries

    expected = [
        (r.hidx, r.llr_i6, r.status)
        for r in all_queries()["sprt_error_rate"](spark, sf_dir).collect()
    ]
    spark.catalog.clearCache()

    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    stream_dir = str(tmp_path / "sprt_incoming")
    ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
        stream_dir, mode="append"
    )

    state = [SPRT_STATE_ZERO]
    emitted: list = []
    batches: list[int] = []

    def per_batch(batch_df, bid):
        batches.append(bid)
        hours = (
            batch_df.groupBy(
                (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
                .cast("bigint")
                .alias("hidx")
            )
            .agg(
                F.count("*").alias("k"),
                F.sum((F.col("event_type") == "error").cast("bigint")).alias("e"),
            )
            .orderBy("hidx")
            .collect()
        )
        state[0], out = sprt_update(state[0], [(r.k, r.e) for r in hours])
        emitted.extend(
            (r.hidx, llr, st) for r, (llr, st) in zip(hours, out)
        )

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sprt_ckpt"))
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in 180s"
    finally:
        q.stop()
    assert len(batches) == 2, batches
    assert emitted == expected
