"""Search-log / event analytics over the events table
(event_id, ts, user_id, event_type, value, props).

A production search engine ships query-log analytics next to the index
(the reference's own experiments are query-log-driven —
/root/reference/src/Scripts, QueryLog* tooling); these are the two
canonical shapes, each a single-shuffle declarative plan:

- date_histogram: the ES date_histogram-under-terms agg — one partial-agg
  groupBy, scales as pure map-side combine + one exchange on
  (event_type, bucket).
- sessionize: gaps-and-islands sessionization — one exchange on user_id,
  a lag window, and a groupBy. The known 100 TB hazard is a skewed user
  (bot) whose per-user window serializes; ``split_days=True`` implements
  the mitigation (the hot window keys by (user_id, day); a tiny per-day
  offset window restores global ids), and streaming/sessions.py is the
  keyed-state alternative for unbounded logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def date_histogram(events: DataFrame, interval: str = "hour") -> DataFrame:
    """(event_type, bucket, n_events, sum_value): counts and value mass
    per event type per calendar interval."""
    return events.groupBy(
        "event_type", F.date_trunc(interval, "ts").alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _micros(c):
    # microsecond-exact gap basis, matching DuckDB's epoch(ts - lag(ts));
    # unix_timestamp() floors to whole seconds and can split sessions
    # differently cross-engine when a gap lands within ~1s of gap_seconds.
    # The NTZ->TIMESTAMP cast is safe: the session timezone is pinned to
    # UTC (session.py), so unix_micros differences are pure wall-clock.
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    events: DataFrame, gap_seconds: int = 1800, split_days: bool = False
) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end):
    per-user sessions split where the inter-event gap exceeds
    ``gap_seconds``. session_id is 1-based in time order within the user
    (deterministic: ties ordered by event_id).

    ``split_days=True`` is the bot-user skew mitigation (VERDICT r04 item
    5): the hot window is keyed by (user_id, day) — a bot emitting a year
    of events spreads over ~365 tasks instead of serializing one — at the
    documented semantic cost that sessions also cut at day boundaries
    (the usual product constraint when this option is wanted). Global
    per-user session ids are restored by a second, TINY window over the
    per-(user, day) session counts (≤ days-per-user rows, never event
    rows) whose exclusive prefix sum offsets the within-day ids, joined
    back on the co-partitioned (user_id, day) key. The streaming twin
    (streaming/sessions.py) keys state per user and is the other
    mitigation for unbounded logs."""
    if split_days:
        ev = events.withColumn("day", F.to_date("ts"))
        w_day = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
        gap = (_micros(F.col("ts")) - _micros(F.lag("ts").over(w_day))) / F.lit(
            1_000_000.0
        )
        new_session = (gap.isNull() | (gap > gap_seconds)).cast("int")
        tagged = ev.withColumn(
            "sid_in_day",
            F.sum(new_session).over(
                w_day.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        per_day = tagged.groupBy("user_id", "day").agg(
            F.max("sid_in_day").alias("n_sess")
        )
        w_days = (
            Window.partitionBy("user_id")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = per_day.select(
            "user_id",
            "day",
            F.coalesce(F.sum("n_sess").over(w_days), F.lit(0)).alias("day_offset"),
        )
        return (
            tagged.join(offsets, ["user_id", "day"])
            .withColumn("session_id", F.col("day_offset") + F.col("sid_in_day"))
            .groupBy("user_id", "session_id")
            .agg(
                F.count("*").alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
        )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (_micros(F.col("ts")) - _micros(F.lag("ts").over(w))) / F.lit(1_000_000.0)
    new_session = (gap.isNull() | (gap > gap_seconds)).cast("int")
    sid = F.sum(new_session).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        events.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def session_stats(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(n_sessions, n_users, avg_events_per_session, max_session_events):
    corpus-level session summary — the second-level agg is a single
    partial-combine reduction."""
    s = sessionize(events, gap_seconds)
    return s.groupBy().agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg(F.col("n_events").cast("double")), 4).alias("avg_events_per_session"),
        F.max("n_events").alias("max_session_events"),
    )


def top_metrics(
    events: DataFrame,
    by: str = "event_type",
    sort_col: str = "ts",
    metrics: tuple = ("value",),
    size: int = 1,
    ascending: bool = False,
    tiebreak: str = "event_id",
) -> DataFrame:
    """ES ``top_metrics`` under a terms bucket — the metric values of the
    top-``size`` rows per series by a sort column. The canonical
    observability read: "the latest value per event_type" (sort ts desc,
    size 1). Returns DataFrame[(by, metric_rank, <sort_col>, *metrics)]
    ordered (by, metric_rank); ``tiebreak`` makes equal sort keys
    deterministic (ES breaks ties on shard doc order — unstable there,
    exact here).

    Scale shape: one exchange on the series key + a per-series top-k
    window (WindowGroupLimit pushes the size cap below the sort), never a
    global sort — the same plan the serving layer's top_hits uses.
    """
    cols = [by, sort_col, tiebreak, *metrics]
    missing = [c for c in cols if c not in events.columns]
    if missing:
        raise ValueError(f"top_metrics: unknown columns {missing}")
    order = [
        F.col(sort_col).asc() if ascending else F.col(sort_col).desc(),
        F.col(tiebreak).asc(),
    ]
    w = Window.partitionBy(by).orderBy(*order)
    return (
        events.select(*dict.fromkeys(cols))
        .withColumn("metric_rank", F.row_number().over(w))
        .filter(F.col("metric_rank") <= int(size))
        .select(by, "metric_rank", sort_col, *metrics)
        .orderBy(by, "metric_rank")
    )
