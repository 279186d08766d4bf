"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs via
``mapInPandas``.

The heavy decode step (PIL/ffmpeg/torchaudio) is STUBBED — those libs are
not in this container — behind ``decode_available()``; the Spark-side
plumbing (schemas, batch iteration, UDF signatures, partitioning) is real
and tested. A deployment drops a real decoder into ``_decode_image`` and
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media blob — the lakehouse-standard shape
# (mirrors what e.g. image/binaryFile sources expose).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feat_mean_byte", T.DoubleType(), True),
        T.StructField("feat_byte_sum", T.LongType(), True),
        T.StructField("feat_first_byte", T.IntegerType(), True),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


def decode_available() -> bool:
    """True when a real image decoder is importable (not in this
    container — the plumbing below then uses deterministic byte-level
    features instead)."""
    try:  # pragma: no cover - environment-dependent
        import PIL  # noqa: F401

        return True
    except Exception:
        return False


def _decode_image(payload: bytes) -> object:
    """Real decode hook. Out of scope in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not present in this environment; "
        "byte-level features are used instead"
    )


def as_media_table(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Wrap any table into the media shape by treating a column's UTF-8
    bytes as the opaque payload — real binary columns end-to-end, no fake
    files needed."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"{kind}/x-synthetic").alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers ``payload`` as pd.Series of bytes per batch; the UDF is
    pure-Python-per-batch (vectorized numpy over byte buffers), the shape
    a real decode/resize/frame-sample kernel would have."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        use_decoder = decode_available()
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else None)
            mean_byte = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if b else None
            )
            byte_sum = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64))
                if b
                else None
            )
            first_byte = payloads.map(lambda b: int(b[0]) if b else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "feat_mean_byte": mean_byte,
                    "feat_byte_sum": byte_sum,
                    "feat_first_byte": first_byte,
                    "decoded": use_decoder,
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_bytes", T.IntegerType(), True),
        T.StructField("resized_bytes", T.IntegerType(), True),
        T.StructField("resized_sha", T.StringType(), True),
    ]
)


def resize_payloads(df: DataFrame, stride: int) -> DataFrame:
    """mapInPandas "resize": keep every ``stride``-th byte of each payload
    (the deterministic stand-in for an image down-scale — a real kernel
    would decode, PIL-resize and re-encode here; see ``_decode_image``).
    1-in / 1-out rows, but the payload column shrinks by ~stride — the
    batch shape and schema contract of a real resize stage. NULL payloads
    propagate as NULL outputs (same contract as extract_features)."""
    import hashlib

    def opt(f):
        return lambda b: f(b) if b is not None else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(opt(lambda b: b[::stride]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_bytes": pdf["payload"].map(opt(len)),
                    "resized_bytes": resized.map(opt(len)),
                    "resized_sha": resized.map(
                        opt(lambda b: hashlib.sha256(b).hexdigest())
                    ),
                }
            )

    return df.mapInPandas(kernel, RESIZE_SCHEMA)


MAX_FRAME_SLOTS = 4096  # frames considered per payload (256 KiB at 64 B)


def sample_frames(df: DataFrame, frame_size: int, stride: int) -> DataFrame:
    """mapInPandas frame sampling over binary payloads: chunk each payload
    into ``frame_size``-byte frames, emit every ``stride``-th one (the
    1-in-N frame-sample shape a video pipeline runs, with byte slicing
    standing in for the stubbed codec — see ``_decode_image``). Fan-out
    rows per input row is exactly what mapInPandas (vs a scalar UDF) is
    for; each output frame carries its index, size and sha256.

    Frame indices are capped at ``MAX_FRAME_SLOTS`` per payload — the
    same bound the SQL oracle's ``range()`` generator uses, so the two
    sides stay in lockstep on oversized payloads (fixture max is 577 B;
    raise both constants together if real payloads exceed the cap)."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = min(-(-len(payload) // frame_size), MAX_FRAME_SLOTS)
                for idx in range(0, n_frames, stride):
                    frame = payload[idx * frame_size : (idx + 1) * frame_size]
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(kernel, FRAME_SCHEMA)
