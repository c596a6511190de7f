"""Stateful streaming sessionization — applyInPandasWithState.

The streaming counterpart of operators/events.sessionize: user sessions
split at inter-event gaps > gap_seconds, computed incrementally over a
stream with per-user GroupState and EVENT-TIME timeouts (a session is
emitted when the watermark passes its last event + gap — the standard
session-window pattern Structured Streaming cannot express with built-in
windows when the output needs per-session aggregates beyond count).

Semantics vs the batch operator: identical session boundaries for events
that arrive in watermark order; events later than the watermark may be
assigned to a new session instead of reopening an emitted one (emitted
sessions are immutable — the same contract every streaming session
implementation makes).

Scale shape: state is keyed by user_id (one small fixed-width row per
OPEN session; closed sessions leave state immediately), shuffled once per
micro-batch by the state key — the bot-user hazard of the batch window
becomes bounded per-batch work here, which is exactly why the streaming
form is the 100 TB path for continuous logs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
STATE_SCHEMA = "start long, last long, n long"  # epoch MICROS + count


def _us(series: pd.Series) -> list[int]:
    return sorted(int(v) for v in series.astype("int64") // 1_000)


def _row(user: int, start: int, last: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([user], dtype="int64"),
            "session_start": pd.to_datetime([start], unit="us"),
            "session_end": pd.to_datetime([last], unit="us"),
            "n_events": pd.Series([n], dtype="int64"),
        }
    )


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming (user_id, session_start, session_end, n_events), one row
    per CLOSED session. ``events`` must be a streaming DataFrame with a
    ``ts`` timestamp column; sessions close either inside a batch (a
    larger gap observed directly) or via event-time timeout when the
    watermark passes last_event + gap."""
    gap_us = int(gap_seconds) * 1_000_000
    ev = events.withWatermark("ts", watermark).select("user_id", "ts")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _row(user, start, last, n)
            return
        ts: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts.extend(_us(pdf["ts"]))
        ts.sort()
        cur = tuple(state.get) if state.exists else None
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                yield _row(user, *cur)
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            # fire once the event-time watermark passes last + gap; the
            # timeout timestamp (millis) must exceed the current watermark
            state.setTimeoutTimestamp(
                max((cur[1] + gap_us) // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )

    return ev.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the built-in
    late-data-tolerant aggregation (append mode emits a window only after
    the watermark passes its end)."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
