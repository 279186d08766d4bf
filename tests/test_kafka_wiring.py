"""A1 wire-shape proof without a broker: kafka_source's reader chain.

The sandbox has no Kafka broker and no spark-sql-kafka package, so the
production source can't be driven end-to-end (SURVEY §2.A1's one
documented gap). What IS provable is the wiring: that ``kafka_source``
configures exactly the options the reference consumer passes
(/root/reference/spark/consumer.py:119-126) — bootstrap servers,
subscribe topic, starting offsets, failOnDataLoss — plus the
functioning spelling of the rate limit (``maxOffsetsPerTrigger``; the
reference sets a no-op key), and that the rate limit is OMITTED, not
nulled, when disabled. A pure-Python recording fake stands in for
``spark.readStream``; no JVM, no broker.
"""

from __future__ import annotations

from bigdata_2025_1_spark.streaming.consumer import kafka_source


class _RecordingReader:
    def __init__(self) -> None:
        self.fmt: str | None = None
        self.opts: dict[str, str] = {}
        self.loaded = False

    def format(self, fmt: str) -> "_RecordingReader":
        self.fmt = fmt
        return self

    def option(self, k: str, v: str) -> "_RecordingReader":
        self.opts[k] = v
        return self

    def load(self) -> "_RecordingReader":
        self.loaded = True
        return self


class _FakeSpark:
    def __init__(self) -> None:
        self.reader = _RecordingReader()

    @property
    def readStream(self) -> _RecordingReader:
        return self.reader


def test_kafka_source_wires_the_reference_consumer_options():
    fake = _FakeSpark()
    out = kafka_source(
        fake, "broker1:9092,broker2:9092", "events", max_offsets_per_trigger=500
    )
    r = fake.reader
    assert out is r and r.loaded
    assert r.fmt == "kafka"
    assert r.opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        # the WORKING spelling of the reference's intended rate limit,
        # stringified as the option API requires
        "maxOffsetsPerTrigger": "500",
    }


def test_kafka_source_omits_the_rate_limit_when_disabled():
    fake = _FakeSpark()
    kafka_source(fake, "b:9092", "t", starting_offsets="latest",
                 max_offsets_per_trigger=None)
    r = fake.reader
    assert "maxOffsetsPerTrigger" not in r.opts
    assert r.opts["startingOffsets"] == "latest"
