"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics windows/aggregations can't express
(running per-key state that survives across micro-batches with explicit
timeout control).

Example operator: per-user running counters (events seen, value sum,
last-seen timestamp) emitted once per micro-batch per active user — the
building block of online feature stores / rate limiters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, last_seen TIMESTAMP"
STATE_SCHEMA = "n_events BIGINT, total_cents BIGINT, last_seen_us BIGINT"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, total_cents, last_seen_us = state.get
    else:
        n_events, total_cents, last_seen_us = 0, 0, 0
    for pdf in pdfs:
        n_events += len(pdf)
        # exact int cents — state must be associative/deterministic too
        total_cents += int((pdf["value"] * 100).round().astype("int64").sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).max()
        last_seen_us = max(last_seen_us, int(ts_us))
    state.update((n_events, total_cents, last_seen_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [total_cents / 100.0],
            "last_seen": [pd.Timestamp(last_seen_us, unit="us")],
        }
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Streaming: per-user running counters with processing-time timeout
    disabled (state lives for the query lifetime; production would pick
    ``ProcessingTimeTimeout`` and call ``state.setTimeoutDuration``)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
