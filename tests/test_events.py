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


def test_sessionize_split_days_bot_user(spark):
    """The split_days skew mitigation: a planted bot emitting events across
    several days must flow through a (user_id, day)-keyed window — no
    single task holds the whole user — while session ids stay global,
    1-based, in time order per user."""
    t0 = dt.datetime(2026, 1, 1, 23, 0, 0)
    rows = []
    eid = 0
    # bot user 9: an event every 10 minutes for 3 days straight
    for i in range(3 * 24 * 6):
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=10 * i), 9, "q", 0.0, ""))
    # normal user 1: two sessions inside one day (31-min gap), no midnight
    t1 = dt.datetime(2026, 1, 2, 9, 0, 0)
    for delta in (0, 5, 10, 41.02):
        eid += 1
        rows.append((eid, t1 + dt.timedelta(minutes=delta), 1, "q", 0.0, ""))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = sessionize(df, 1800, split_days=True)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"])
        for r in out.collect()
    }
    # bot: continuous 10-min cadence => exactly one session per calendar
    # day (cut at midnight by design), ids 1..4 in day order (Jan 1 23:00
    # through Jan 4 22:50 spans 4 calendar days)
    bot = sorted((sid, v) for (u, sid), v in got.items() if u == 9)
    assert [sid for sid, _ in bot] == [1, 2, 3, 4]
    assert bot[0][1][0] == 6  # Jan 1: 23:00-23:50 -> 6 events
    assert sum(v[0] for _, v in bot) == 3 * 24 * 6
    # starts strictly increasing in time => global ordering preserved
    starts = [v[1] for _, v in bot]
    assert starts == sorted(starts)
    # normal user unaffected by the day key (no midnight crossing): same
    # result as the default path
    base = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df.filter("user_id = 1"), 1800).collect()
    }
    assert {(u, s): v[0] for (u, s), v in got.items() if u == 1} == base
    # plan shape: the EVENT-level window is keyed by (user_id, day) — the
    # only user-only window runs over the tiny per-(user, day) frame
    plan = out._jdf.queryExecution().executedPlan().toString()
    event_windows = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line and "event_id" in line
    ]
    assert event_windows and all("day" in line for line in event_windows), plan


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
