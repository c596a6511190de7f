"""Pipeline aggregations (operators/pipeline_aggs) + the date_histogram
DSL front end (plans/dsl.run_date_aggs) — semantics vs hand computation
and vs a DuckDB window-function oracle over the same events table."""

import math
import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# painless-lite script compiler

def test_script_precedence_and_paths(spark):
    import pandas as pd

    from bitfunnel_spark.operators.pipeline_aggs import compile_script

    df = spark.createDataFrame(pd.DataFrame({"x": [2.0, 10.0], "y": [3.0, 4.0]}))
    col = compile_script("params.x + params.y * 2", {"x": "x", "y": "y"})
    assert [r[0] for r in df.select(col).collect()] == [8.0, 18.0]
    col = compile_script("(x + y) * 2 - -1", {"x": "x", "y": "y"})
    assert [r[0] for r in df.select(col).collect()] == [11.0, 29.0]
    col = compile_script("x / y % 3", {"x": "x", "y": "y"})
    assert [r[0] for r in df.select(col).collect()] == [2.0 / 3 % 3, 2.5 % 3]
    sel = compile_script("x > 5 && !(y == 3)", {"x": "x", "y": "y"})
    assert [r[0] for r in df.select(sel).collect()] == [False, True]


def test_script_rejections():
    from bitfunnel_spark.operators.pipeline_aggs import (
        PipelineError,
        compile_script,
    )

    with pytest.raises(PipelineError):
        compile_script("params.z + 1", {"x": "x"})  # unknown path
    with pytest.raises(PipelineError):
        compile_script("x + ", {"x": "x"})  # dangling operator
    with pytest.raises(PipelineError):
        compile_script("import os", {"x": "x"})  # not an expression
    with pytest.raises(PipelineError):
        compile_script("x; x", {"x": "x"})  # statement separator
    with pytest.raises(PipelineError):
        compile_script("", {"x": "x"})


# ---------------------------------------------------------------------------
# apply_pipeline semantics on a hand-checkable frame

@pytest.fixture(scope="module")
def buckets(spark):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"bucket": [1, 2, 3, 4, 5],
                      "v": [10.0, 30.0, 20.0, 50.0, 40.0]})
    )


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_cumulative_sum_and_derivative(buckets):
    from bitfunnel_spark.operators.pipeline_aggs import apply_pipeline

    out = apply_pipeline(
        buckets, ["bucket"],
        [("cum", "cumulative_sum", {"buckets_path": "v"}),
         ("d", "derivative", {"buckets_path": "v"})],
    ).orderBy("bucket")
    assert _rows(out, "cum") == [(10.0,), (40.0,), (60.0,), (110.0,), (150.0,)]
    assert _rows(out, "d") == [(None,), (20.0,), (-10.0,), (30.0,), (-10.0,)]


def test_serial_diff_lag2(buckets):
    from bitfunnel_spark.operators.pipeline_aggs import apply_pipeline

    out = apply_pipeline(
        buckets, ["bucket"],
        [("sd", "serial_diff", {"buckets_path": "v", "lag": 2})],
    ).orderBy("bucket")
    assert _rows(out, "sd") == [(None,), (None,), (10.0,), (20.0,), (20.0,)]


def test_moving_fn_es_shift_semantics(buckets):
    """ES moving_fn shift=0 covers the `window` buckets STRICTLY BEFORE
    the current one; shift=1 is trailing-inclusive."""
    from bitfunnel_spark.operators.pipeline_aggs import apply_pipeline

    out = apply_pipeline(
        buckets, ["bucket"],
        [("m", "moving_fn",
          {"buckets_path": "v", "window": 2,
           "script": "MovingFunctions.unweightedAvg(values)"}),
         ("mi", "moving_fn",
          {"buckets_path": "v", "window": 2, "fn": "max", "shift": 1})],
    ).orderBy("bucket")
    # exclusive window: [None, avg(10), avg(10,30), avg(30,20), avg(20,50)]
    assert _rows(out, "m") == [(None,), (10.0,), (20.0,), (25.0,), (35.0,)]
    # inclusive max over (prev, current)
    assert _rows(out, "mi") == [(10.0,), (30.0,), (30.0,), (50.0,), (50.0,)]


def test_bucket_script_selector_sort(buckets):
    from bitfunnel_spark.operators.pipeline_aggs import apply_pipeline

    out = apply_pipeline(
        buckets, ["bucket"],
        [("r", "bucket_script",
          {"buckets_path": {"v": "v"}, "script": "params.v / 10"}),
         ("keep", "bucket_selector",
          {"buckets_path": {"v": "v"}, "script": "params.v > 15"}),
         ("s", "bucket_sort", {"sort": [{"v": "desc"}], "size": 2, "from": 1})],
    )
    # selector keeps v in {30,20,50,40}; sort desc -> 50,40,30,20;
    # from=1 size=2 -> 40,30
    assert _rows(out, "bucket", "v", "r") == [(5, 40.0, 4.0), (2, 30.0, 3.0)]


def test_selector_drops_null_paths(buckets):
    from bitfunnel_spark.operators.pipeline_aggs import apply_pipeline

    out = apply_pipeline(
        buckets, ["bucket"],
        [("d", "derivative", {"buckets_path": "v"}),
         ("keep", "bucket_selector",
          {"buckets_path": {"d": "d"}, "script": "params.d >= -100"})],
    )
    # first bucket's derivative is null -> filtered
    assert sorted(r[0] for r in out.select("bucket").collect()) == [2, 3, 4, 5]


def test_partitioned_pipeline_is_per_series(spark):
    import pandas as pd

    from bitfunnel_spark.operators.pipeline_aggs import apply_pipeline

    df = spark.createDataFrame(
        pd.DataFrame({"s": ["a", "a", "b", "b"], "bucket": [1, 2, 1, 2],
                      "v": [1.0, 2.0, 10.0, 20.0]})
    )
    out = apply_pipeline(
        df, ["bucket"],
        [("cum", "cumulative_sum", {"buckets_path": "v"})],
        partition_by=["s"],
    ).orderBy("s", "bucket")
    assert _rows(out, "cum") == [(1.0,), (3.0,), (10.0,), (30.0,)]


def test_sibling_bucket(buckets):
    from bitfunnel_spark.operators.pipeline_aggs import sibling_bucket

    assert sibling_bucket(buckets, "avg_bucket", "v").collect()[0]["value"] == 30.0
    assert sibling_bucket(buckets, "max_bucket", "v").collect()[0]["value"] == 50.0
    row = sibling_bucket(buckets, "stats_bucket", "v").collect()[0]
    assert (row["count"], row["min"], row["max"], row["sum"], row["avg"]) == (
        5, 10.0, 50.0, 150.0, 30.0)


def test_pipeline_rejections(buckets):
    from bitfunnel_spark.operators.pipeline_aggs import (
        PipelineError,
        apply_pipeline,
        sibling_bucket,
    )

    with pytest.raises(PipelineError):
        apply_pipeline(buckets, ["bucket"],
                       [("x", "cumulative_sum", {"buckets_path": "nope"})])
    with pytest.raises(PipelineError):
        apply_pipeline(buckets, ["bucket"],
                       [("x", "moving_fn", {"buckets_path": "v", "window": 0,
                                            "fn": "avg"})])
    with pytest.raises(PipelineError):
        apply_pipeline(buckets, ["bucket"],
                       [("x", "moving_fn", {"buckets_path": "v", "window": 2,
                                            "script": "Math.evil(values)"})])
    with pytest.raises(PipelineError):
        apply_pipeline(buckets, ["bucket"], [("x", "unknown_kind", {})])
    with pytest.raises(PipelineError):
        apply_pipeline(buckets, ["bucket"],
                       [("x", "derivative", {"buckets_path": "v",
                                             "gap_policy": "skip"})])
    with pytest.raises(PipelineError):
        sibling_bucket(buckets, "median_bucket", "v")


# ---------------------------------------------------------------------------
# run_date_aggs end-to-end vs DuckDB over the real events table

EVENTS_BODY = {
    "query": {"term": {"event_type": "click"}},
    "aggs": {"per_hour": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {
            "v": {"sum": {"field": "value"}},
            "cum": {"cumulative_sum": {"buckets_path": "v"}},
            "deriv": {"derivative": {"buckets_path": "v"}},
            "mov3": {"moving_fn": {
                "buckets_path": "v", "window": 3,
                "script": "MovingFunctions.unweightedAvg(values)"}},
            # empty buckets (min_doc_count=0 fill) are dropped before the
            # rate so the division stays well-defined (ANSI /0 raises)
            "keep": {"bucket_selector": {
                "buckets_path": {"n": "doc_count"},
                "script": "params.n > 0"}},
            "rate": {"bucket_script": {
                "buckets_path": {"v": "v", "n": "doc_count"},
                "script": "params.v / params.n"}},
        },
    }},
}

SQL_EVENTS_PIPELINE = """WITH b AS (
  SELECT date_trunc('hour', ts) AS bucket, count(*) AS doc_count,
         round(sum(value), 4) AS v
  FROM events WHERE event_type = 'click' GROUP BY 1
),
axis AS (
  SELECT unnest(generate_series((SELECT min(bucket) FROM b),
                                (SELECT max(bucket) FROM b),
                                INTERVAL 1 HOUR)) AS bucket
),
f AS (
  SELECT a.bucket, coalesce(b.doc_count, 0)::BIGINT AS doc_count,
         coalesce(b.v, 0.0) AS v
  FROM axis a LEFT JOIN b ON a.bucket = b.bucket
),
p AS (
  SELECT bucket, doc_count, v,
         sum(v) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         v - lag(v) OVER (ORDER BY bucket) AS deriv,
         avg(v) OVER (ORDER BY bucket
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS mov3
  FROM f
)
SELECT bucket, doc_count, v, cum, deriv, mov3, v / doc_count AS rate
FROM p WHERE doc_count > 0 ORDER BY bucket"""


def test_run_date_aggs_matches_duckdb(spark, duck):
    from bitfunnel_spark.plans.dsl import run_date_aggs

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    got = run_date_aggs(ev, EVENTS_BODY).collect()
    want = duck.execute(SQL_EVENTS_PIPELINE).fetchall()
    assert len(got) == len(want) > 3
    for g, w in zip(got, want):
        assert g["bucket"] == w[0] and g["doc_count"] == w[1]
        for gi, wi in zip((g["v"], g["cum"], g["deriv"], g["mov3"], g["rate"]),
                          w[2:]):
            if wi is None:
                assert gi is None
            else:
                assert gi is not None and math.isclose(gi, wi, rel_tol=1e-12)


def test_run_date_aggs_sibling(spark, duck):
    from bitfunnel_spark.plans.dsl import run_date_aggs

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    body = {
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"v": {"sum": {"field": "value"}}},
            },
            "total": {"max_bucket": {"buckets_path": "per_day>v"}},
        }
    }
    got = run_date_aggs(ev, body).collect()
    want = duck.execute(
        """SELECT max(v) FROM (SELECT round(sum(value), 4) AS v FROM events
           GROUP BY date_trunc('day', ts))"""
    ).fetchone()[0]
    assert len(got) == 1 and math.isclose(got[0]["value"], want, rel_tol=1e-12)


def test_run_date_aggs_range_filter_and_sort(spark):
    from bitfunnel_spark.plans.dsl import run_date_aggs

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    body = {
        "query": {"bool": {"filter": [
            {"term": {"event_type": "view"}},
            {"range": {"value": {"gte": 5.0, "lt": 50.0}}},
        ]}},
        "aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"n": {"value_count": {"field": "event_id"}},
                     "top": {"bucket_sort": {"sort": [{"n": "desc"}],
                                             "size": 3}}},
        }},
    }
    rows = run_date_aggs(ev, body).collect()
    assert 1 <= len(rows) <= 3
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r["doc_count"] == r["n"] for r in rows)


def test_run_date_aggs_rejections(spark):
    from bitfunnel_spark.plans.dsl import DslError, run_date_aggs

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    with pytest.raises(DslError):
        run_date_aggs(ev, {"aggs": {"h": {"terms": {"field": "event_type"}}}})
    with pytest.raises(DslError):  # bad interval
        run_date_aggs(ev, {"aggs": {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "5m"}}}})
    with pytest.raises(DslError):  # unknown field
        run_date_aggs(ev, {"aggs": {"h": {"date_histogram": {
            "field": "nope", "calendar_interval": "hour"}}}})
    with pytest.raises(DslError):  # metric after pipeline
        run_date_aggs(ev, {"aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"c": {"cumulative_sum": {"buckets_path": "doc_count"}},
                     "v": {"sum": {"field": "value"}}}}}})
    with pytest.raises(DslError):  # sibling path must name the parent
        run_date_aggs(ev, {"aggs": {
            "h": {"date_histogram": {"field": "ts",
                                     "calendar_interval": "day"},
                  "aggs": {"v": {"sum": {"field": "value"}}}},
            "t": {"avg_bucket": {"buckets_path": "other>v"}}}})
    with pytest.raises(DslError):  # size must be 0
        run_date_aggs(ev, {"size": 5, "aggs": {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "hour"}}}})
    with pytest.raises(DslError):  # unsupported query kind
        run_date_aggs(ev, {"query": {"match": {"event_type": "x"}},
                           "aggs": {"h": {"date_histogram": {
                               "field": "ts", "calendar_interval": "hour"}}}})


def test_run_date_aggs_fills_gap_buckets(spark):
    """ES date_histogram (min_doc_count=0) emits empty buckets — the
    derivative across a gap must compare against the filled zero bucket,
    not the previous non-empty one."""
    import datetime as dt

    import pandas as pd

    from bitfunnel_spark.plans.dsl import run_date_aggs

    ev = spark.createDataFrame(pd.DataFrame({
        "ts": [dt.datetime(2024, 1, 1, 10, 5), dt.datetime(2024, 1, 1, 10, 40),
               dt.datetime(2024, 1, 1, 13, 1)],  # 11:00 and 12:00 are empty
        "value": [4.0, 6.0, 8.0],
    }))
    rows = run_date_aggs(ev, {"aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"v": {"sum": {"field": "value"}},
                 "d": {"derivative": {"buckets_path": "v"}}},
    }}}).collect()
    assert [r["bucket"].hour for r in rows] == [10, 11, 12, 13]
    assert [r["doc_count"] for r in rows] == [2, 0, 0, 1]
    assert [r["v"] for r in rows] == [10.0, 0.0, 0.0, 8.0]
    # derivative at 13:00 compares against the EMPTY 12:00 bucket (8-0),
    # not the 10:00 bucket (8-10)
    assert [r["d"] for r in rows] == [None, -10.0, 0.0, 8.0]


def test_auto_date_histogram(spark):
    import datetime as dt

    import pandas as pd

    from bitfunnel_spark.plans.dsl import DslError, run_date_aggs

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(pd.DataFrame({
        "ts": [base + dt.timedelta(hours=h) for h in range(0, 72, 3)],
        "value": [float(h) for h in range(0, 72, 3)],
    }))
    # 72h span: hour -> 70 buckets > 10; day -> 3 <= 10 => day chosen
    rows = run_date_aggs(ev, {"aggs": {"h": {
        "auto_date_histogram": {"field": "ts", "buckets": 10}}}}).collect()
    assert [r["interval"] for r in rows] == ["day"] * 3
    assert [r["doc_count"] for r in rows] == [8, 8, 8]
    # a generous target picks the finest interval
    rows = run_date_aggs(ev, {"aggs": {"h": {
        "auto_date_histogram": {"field": "ts", "buckets": 100}}}}).collect()
    assert rows[0]["interval"] == "hour" and len(rows) == 70  # filled axis
    with pytest.raises(DslError):
        run_date_aggs(ev, {"aggs": {"h": {
            "auto_date_histogram": {"field": "ts", "buckets": 0}}}})


def test_significant_text_alias(index):
    from bitfunnel_spark.plans.dsl import run_aggs

    a = run_aggs(index, {"query": {"match": {"content": "data"}},
                         "aggs": {"s": {"significant_text": {
                             "field": "content", "size": 5}}}}).collect()
    b = run_aggs(index, {"query": {"match": {"content": "data"}},
                         "aggs": {"s": {"significant_terms": {
                             "field": "content", "size": 5}}}}).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a


def test_series_date_histogram_per_series_pipelines(spark, duck):
    """terms(series) > date_histogram > pipelines: each series gets its
    own filled axis and its own pipeline window."""
    import datetime as dt

    import pandas as pd

    from bitfunnel_spark.plans.dsl import DslError, run_date_aggs

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(pd.DataFrame({
        "event_type": ["a", "a", "a", "b", "b"],
        # series a spans 10:00-13:00 with a gap at 11-12; b spans 2 hours
        "ts": [base + dt.timedelta(hours=h) for h in (10, 10, 13, 20, 21)],
        "value": [1.0, 2.0, 4.0, 10.0, 30.0],
    }))
    rows = run_date_aggs(ev, {"aggs": {"by": {
        "terms": {"field": "event_type"},
        "aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"v": {"sum": {"field": "value"}},
                     "cum": {"cumulative_sum": {"buckets_path": "v"}},
                     "d": {"derivative": {"buckets_path": "v"}}},
        }},
    }}}).collect()
    got = [(r["event_type"], r["bucket"].hour, r["doc_count"], r["v"],
            r["cum"], r["d"]) for r in rows]
    # series a: filled 10,11,12,13 with zeros; cum restarts per series
    assert got == [
        ("a", 10, 2, 3.0, 3.0, None),
        ("a", 11, 0, 0.0, 3.0, -3.0),
        ("a", 12, 0, 0.0, 3.0, 0.0),
        ("a", 13, 1, 4.0, 7.0, 4.0),
        ("b", 20, 1, 10.0, 10.0, None),
        ("b", 21, 1, 30.0, 40.0, 20.0),
    ]
    with pytest.raises(DslError):  # bucket_sort not supported per series
        run_date_aggs(ev, {"aggs": {"by": {
            "terms": {"field": "event_type"},
            "aggs": {"h": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "hour"},
                "aggs": {"s": {"bucket_sort": {"sort": ["doc_count"]}}},
            }}}}})
    with pytest.raises(DslError):  # auto interval not supported per series
        run_date_aggs(ev, {"aggs": {"by": {
            "terms": {"field": "event_type"},
            "aggs": {"h": {"auto_date_histogram": {"field": "ts",
                                                   "buckets": 5}}}}}})


def test_series_pipeline_matches_duckdb_on_events(spark, duck):
    from bitfunnel_spark.plans.dsl import run_date_aggs

    ev = spark.read.parquet(f"{TESTDATA}/events.parquet")
    got = run_date_aggs(ev, {"aggs": {"by": {
        "terms": {"field": "event_type"},
        "aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v": {"sum": {"field": "value"}},
                     "cum": {"cumulative_sum": {"buckets_path": "v"}}},
        }},
    }}}).collect()
    want = duck.execute("""
        WITH b AS (SELECT event_type, date_trunc('day', ts) AS bucket,
                          count(*) AS n, round(sum(value), 4) AS v
                   FROM events GROUP BY 1, 2),
        bounds AS (SELECT event_type, min(bucket) lo, max(bucket) hi
                   FROM b GROUP BY 1),
        axis AS (SELECT event_type,
                        unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
                 FROM bounds),
        f AS (SELECT a.event_type, a.bucket,
                     coalesce(b.n, 0)::BIGINT AS n, coalesce(b.v, 0.0) AS v
              FROM axis a LEFT JOIN b
              ON a.event_type = b.event_type AND a.bucket = b.bucket)
        SELECT event_type, bucket, n, v,
               sum(v) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM f ORDER BY event_type, bucket""").fetchall()
    assert len(got) == len(want) > 10
    import math
    for g, w in zip(got, want):
        assert (g["event_type"], g["bucket"], g["doc_count"]) == (w[0], w[1], w[2])
        assert math.isclose(g["v"], w[3], rel_tol=1e-12)
        assert math.isclose(g["cum"], w[4], rel_tol=1e-12)
