"""Tests for file sources/sinks (A4, A6-A8, A12) and the Kafka message
shape (A2/A3) in batch form."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_2025_1_spark.sources.files import (
    read_corpus,
    read_links_json,
    read_text_tree,
    write_corpus,
    write_links_json,
)
from bigdata_2025_1_spark.sources.kafka_shape import consumer_parse, to_kafka_message


def test_read_text_tree(spark, tmp_path):
    for domain, files in {"dn1": ["a.txt", "b.txt"], "dn2": ["c.txt"]}.items():
        d = tmp_path / "corpus" / domain
        d.mkdir(parents=True)
        for name in files:
            (d / name).write_text(f"content of {domain}/{name}", encoding="utf-8")
        (d / "ignored.html").write_text("nope", encoding="utf-8")
    df = read_text_tree(spark, str(tmp_path / "corpus"))
    rows = {(r.domain, r.filename): r for r in df.collect()}
    assert set(rows) == {("dn1", "a.txt"), ("dn1", "b.txt"), ("dn2", "c.txt")}
    assert rows[("dn1", "a.txt")].content == "content of dn1/a.txt"
    assert rows[("dn2", "c.txt")].file_path.endswith("dn2/c.txt")


def test_corpus_roundtrip_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [("dn1", "a", "x"), ("dn2", "b", "y")], "domain STRING, filename STRING, content STRING"
    )
    out = str(tmp_path / "corpus_pq")
    write_corpus(df, out)
    # physical layout: one directory per domain → pruning works
    assert os.path.isdir(os.path.join(out, "domain=dn1"))
    back = read_corpus(spark, out).filter(F.col("domain") == "dn1")
    assert [r.filename for r in back.collect()] == ["a"]


def test_links_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("Doc 1", "http://x/1"), ("Doc 2", "http://x/2")], "name STRING, link STRING")
    out = str(tmp_path / "links")
    write_links_json(df, out)
    back = read_links_json(spark, out)
    assert sorted((r.name, r.link) for r in back.collect()) == [
        ("Doc 1", "http://x/1"),
        ("Doc 2", "http://x/2"),
    ]


def test_kafka_shape_roundtrip(spark):
    df = spark.createDataFrame(
        [("dn1", "f1", "hello", "/p/1"), ("dn2", "f2", "world", "/p/2")],
        "domain STRING, filename STRING, content STRING, file_path STRING",
    )
    msgs = to_kafka_message(df, ("domain", "filename"), ["domain", "filename", "content", "file_path"])
    keys = sorted(r.key for r in msgs.collect())
    assert keys == ["dn1_f1", "dn2_f2"]
    parsed = consumer_parse(msgs)
    back = sorted((r.domain, r.filename, r.content, r.file_path) for r in parsed.collect())
    assert back == [("dn1", "f1", "hello", "/p/1"), ("dn2", "f2", "world", "/p/2")]


def test_csv_roundtrip(spark, tmp_path):
    """CSV source/sink: header + explicit schema (never infer at scale —
    inference is a full extra pass over 100 TB)."""
    df = spark.createDataFrame(
        [(1, "a,b", 2.5), (2, None, -1.0)], "id BIGINT, s STRING, v DOUBLE"
    )
    out = str(tmp_path / "csv")
    df.write.option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("id BIGINT, s STRING, v DOUBLE")
        .csv(out)
    )
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a,b", 2.5),
        (2, None, -1.0),
    ]


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink (built-in columnar alternative to parquet)."""
    df = spark.createDataFrame([(1, [1.5, 2.5]), (2, [])], "id BIGINT, arr ARRAY<DOUBLE>")
    out = str(tmp_path / "orc")
    df.write.orc(out)
    back = spark.read.orc(out)
    assert sorted((r.id, r.arr) for r in back.collect()) == [(1, [1.5, 2.5]), (2, [])]


def test_json_lines_with_corrupt_record(spark, tmp_path):
    """JSON-lines source in PERMISSIVE mode: malformed rows land in
    _corrupt_record instead of failing the job (the A2 semantics at the
    file layer)."""
    p = tmp_path / "data.json"
    p.write_text('{"a": 1}\nnot json\n{"a": 3}\n', encoding="utf-8")
    df = spark.read.schema("a BIGINT, _corrupt_record STRING").json(str(p))
    rows = df.collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1
    assert sorted(r.a for r in rows if r.a is not None) == [1, 3]
