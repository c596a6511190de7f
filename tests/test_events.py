"""Event/search-log analytics vs DuckDB oracles on the real events table,
plus planted sessionization semantics."""

import datetime as dt

import pytest

from bitfunnel_spark.operators.events import date_histogram, session_stats, sessionize

TESTDATA = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{TESTDATA}/events.parquet").cache()


def test_date_histogram_vs_oracle(events, duck):
    got = sorted(
        (r["event_type"], r["bucket"], r["n_events"], r["sum_value"])
        for r in date_histogram(events, "hour").collect()
    )
    want = sorted(
        duck.execute(
            """SELECT event_type, date_trunc('hour', ts) AS bucket,
                      count(*) AS n_events, round(sum(value), 4) AS sum_value
               FROM events GROUP BY 1, 2"""
        ).fetchall()
    )
    assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in want]
    for (_, _, _, g), (_, _, _, w) in zip(got, want):
        assert g == pytest.approx(w, abs=1e-3)


def test_sessionize_vs_oracle(events, duck):
    got = sorted(
        (r["user_id"], r["session_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in sessionize(events, 1800).collect()
    )
    want = sorted(
        duck.execute(
            """WITH g AS (
                 SELECT user_id, ts, event_id,
                        CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts - lag(ts) OVER w) > 1800
                             THEN 1 ELSE 0 END AS ns
                 FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
               ),
               s AS (
                 SELECT user_id, ts,
                        sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
                 FROM g
               )
               SELECT user_id, sid, count(*) AS n, min(ts), max(ts)
               FROM s GROUP BY user_id, sid"""
        ).fetchall()
    )
    assert got == want


def test_sessionize_planted(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events in one session, then a 31-min gap -> new session
        (1, t0, 1, "q", 1.0, ""),
        (2, t0 + dt.timedelta(minutes=5), 1, "q", 1.0, ""),
        (3, t0 + dt.timedelta(minutes=10), 1, "q", 1.0, ""),
        (4, t0 + dt.timedelta(minutes=41, seconds=1), 1, "q", 1.0, ""),
        # user 2: single event
        (5, t0, 2, "q", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, 1800).collect()
    }
    assert got == {(1, 1): 3, (1, 2): 1, (2, 1): 1}
    stats = session_stats(df, 1800).collect()[0]
    assert stats["n_sessions"] == 3 and stats["n_users"] == 2
    assert stats["max_session_events"] == 3


def test_gap_boundary_exclusive(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "q", 0.0, ""),
        (2, t0 + dt.timedelta(seconds=1800), 1, "q", 0.0, ""),  # == gap -> same
        (3, t0 + dt.timedelta(seconds=3601), 1, "q", 0.0, ""),  # > gap -> new
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = sorted(r["session_id"] for r in sessionize(df, 1800).collect())
    assert got == [1, 2]


def test_sessionize_single_exchange(events):
    # the window partitions by user_id; the groupBy(user_id, session_id)
    # must REUSE that partitioning (HashPartitioning(user_id) satisfies
    # ClusteredDistribution(user_id, session_id)) — exactly one Exchange
    plan = sessionize(events, 1800)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_date_histogram_partial_agg(events):
    # map-side partial aggregation before the single exchange
    plan = date_histogram(events, "hour")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_top_metrics_latest_per_series(spark, duck):
    from bitfunnel_spark.operators.events import top_metrics

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    rows = top_metrics(ev, size=2).collect()
    want = duck.execute("""
        SELECT event_type, row_number() OVER w AS r, ts, value FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts DESC, event_id ASC)
        QUALIFY r <= 2
        ORDER BY event_type, r""").fetchall()
    assert [(r.event_type, r.metric_rank, r.ts, r.value) for r in rows] == [
        tuple(w) for w in want]
    # plan: the size cap rides WindowGroupLimit below the sort
    df = top_metrics(ev, size=2)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    import pytest as _pytest
    with _pytest.raises(ValueError):
        top_metrics(ev, metrics=("nope",))
