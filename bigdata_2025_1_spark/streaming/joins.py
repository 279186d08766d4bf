"""Streaming joins — the remaining F6-class surface:

- stream-static: enrich an event stream with a dimension table
  (broadcast per micro-batch; the dimension may be refreshed between
  batches — no state kept);
- stream-stream: watermarked interval join (both sides buffer bounded
  state; the time-bound predicate lets Spark expire it — an unbounded
  stream-stream join would grow state forever and is refused in append
  mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: per-batch hash join against the (small) static
    side — ``F.broadcast`` keeps the stream side unshuffled."""
    return events.join(F.broadcast(dim), on, "left")


def interval_self_join(
    events: DataFrame,
    watermark: str = "10 minutes",
    max_gap_seconds: int = 300,
) -> DataFrame:
    """Stream-stream self-join: pair each 'click' with 'purchase' events
    by the same user within ``max_gap_seconds`` AFTER the click.

    Both inputs are watermarked; the range condition bounds the buffered
    state on each side (Spark derives the state-expiry horizon from
    watermark + interval)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        ),
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts")


def interval_left_join(
    events: DataFrame,
    watermark: str = "10 minutes",
    max_gap_seconds: int = 300,
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, with its
    within-window purchase or NULLs. Outer stream-stream joins have
    stricter semantics than inner: the NULL row for an unmatched click
    is emitted only once the watermark passes the click's join window
    (before that, a matching purchase could still arrive) — so results
    trail the watermark, and BOTH the watermark and the interval bound
    are mandatory for the state to be evictable at all (Spark refuses
    the join otherwise)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        ),
        "leftOuter",
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts")
