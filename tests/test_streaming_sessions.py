"""Stateful streaming sessionization (applyInPandasWithState +
event-time timeouts) must emit exactly the batch operator's sessions when
events arrive in watermark order."""

import datetime as dt
import glob
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.events import sessionize
from bitfunnel_spark.streaming.sessions import sessionize_stream, windowed_event_counts

TESTDATA = "/root/testdata/sf0.001"
EV_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
SENTINEL_USER = -1


def _drop_chunk(chunk, src_dir: str, i: int) -> None:
    """Materialize a chunk as ONE flat parquet file inside the streamed
    dir (the file source does not recurse into subdirectories)."""
    stage = os.path.join(src_dir, f"_stage{i}")
    chunk.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, f"c{i}.parquet"))
    shutil.rmtree(stage)


def _run_stream(spark, src_dir, chunks, gap_seconds):
    """Drop parquet chunks one micro-batch at a time; flush with two
    far-future sentinel batches so every real session's timeout fires."""
    os.makedirs(src_dir, exist_ok=True)
    stream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(src_dir)
    out = sessionize_stream(stream, gap_seconds=gap_seconds)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(src_dir, "_ckpt"))
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            # write order + maxFilesPerTrigger=1 keeps micro-batches in
            # ts order
            _drop_chunk(chunk, src_dir, i)
            q.processAllAvailable()
        return {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["user_id"] != SENTINEL_USER
        }
    finally:
        q.stop()


def _sentinels(spark, base_ts):
    rows = [
        (10**9 + i, base_ts + dt.timedelta(days=30 + i), SENTINEL_USER, "x", 0.0, "")
        for i in range(2)
    ]
    return [spark.createDataFrame([r], EV_DDL) for r in rows]


def test_stream_matches_batch(spark, tmp_path):
    events = (
        spark.read.parquet(f"{TESTDATA}/events.parquet")
        .orderBy("ts", "event_id")
        .limit(400)
        .cache()
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    third = events.count() // 3
    rows = events.collect()
    chunks = [
        spark.createDataFrame(rows[:third], EV_DDL),
        spark.createDataFrame(rows[third : 2 * third], EV_DDL),
        spark.createDataFrame(rows[2 * third :], EV_DDL),
    ] + _sentinels(spark, max_ts)
    got = _run_stream(spark, str(tmp_path / "src"), chunks, gap_seconds=1800)
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(events, 1800).collect()
    }
    assert got == want


def test_stream_planted_gap(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    batch1 = spark.createDataFrame(
        [(1, t0, 7, "q", 0.0, ""), (2, t0 + dt.timedelta(minutes=5), 7, "q", 0.0, "")],
        EV_DDL,
    )
    # second batch: same user after a 40-min gap -> closes session 1
    batch2 = spark.createDataFrame(
        [(3, t0 + dt.timedelta(minutes=45), 7, "q", 0.0, "")], EV_DDL
    )
    got = _run_stream(
        spark, str(tmp_path / "src"), [batch1, batch2] + _sentinels(spark, t0), 1800
    )
    assert got == {
        (7, t0, t0 + dt.timedelta(minutes=5), 2),
        (7, t0 + dt.timedelta(minutes=45), t0 + dt.timedelta(minutes=45), 1),
    }


def test_windowed_counts_append(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1, 0, 10, 0)
    b1 = spark.createDataFrame(
        [(1, t0, 1, "a", 0.0, ""), (2, t0 + dt.timedelta(minutes=20), 1, "a", 0.0, "")],
        EV_DDL,
    )
    b2 = spark.createDataFrame(
        [(3, t0 + dt.timedelta(hours=3), 1, "b", 0.0, "")], EV_DDL
    )
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(src)
    out = windowed_event_counts(stream, "1 hour", "0 seconds")
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", os.path.join(src, "_ckpt")).start()
    )
    try:
        for i, chunk in enumerate([b1, b2]):
            _drop_chunk(chunk, src, i)
            q.processAllAvailable()
        rows = {
            (r["window_start"], r["event_type"], r["n_events"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        # the first (closed) window emitted once the watermark passed it;
        # the open 03:00 window is NOT emitted in append mode
        assert rows == {(dt.datetime(2026, 1, 1, 0, 0, 0), "a", 2)}
    finally:
        q.stop()
