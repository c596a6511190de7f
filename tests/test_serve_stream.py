"""Continuous query serving (streaming.serve): query-log files arrive in
waves; each micro-batch runs the batched kernel; results match single-query
search exactly, ranked and exactly-once across restarts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.streaming import serve

WAVE1 = [(1, "data the"), (2, "data -slow"), (3, '"the data"')]
WAVE2 = [(4, "a | data"), (5, "zzzqqq_absent")]


@pytest.fixture(scope="module")
def env(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    small = corpus.filter("doc_id < 300").cache()
    idx = FullTextIndex.build_fused(spark, small, BuildConfig(n_slices=2))
    idx.prepare_serve()
    qdir = str(root / "queries")
    rdir = str(root / "results")
    os.makedirs(qdir)
    return {"idx": idx, "qdir": qdir, "rdir": rdir}


def _arrive(spark, env, wave, name):
    spark.createDataFrame(wave, serve.QUERY_LOG_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(env["qdir"] + "_stage_" + name)
    import shutil

    stage = env["qdir"] + "_stage_" + name
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f), os.path.join(env["qdir"], f"{name}_{f}"))
    shutil.rmtree(stage)


def test_served_results_match_search(spark, env):
    _arrive(spark, env, WAVE1, "w1")
    serve.serve_query_stream(spark, env["idx"], env["qdir"], env["rdir"], k=5)
    _arrive(spark, env, WAVE2, "w2")
    serve.serve_query_stream(spark, env["idx"], env["qdir"], env["rdir"], k=5)

    res = serve.read_results(spark, env["rdir"])
    by_q = {
        qid: sorted(rows, key=lambda r: r["rank"])
        for qid, rows in (
            (qid, [r for r in res.collect() if r["query_id"] == qid])
            for qid, _ in WAVE1 + WAVE2
        )
    }
    for qid, qtext in WAVE1 + WAVE2:
        want = env["idx"].search(qtext, k=5, mode="kernel").collect()
        got = by_q[qid]
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ], qtext
        assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
        assert all(r["query"] == qtext for r in got)


def test_replayed_batch_is_skipped(spark, env):
    """Re-running with no new files must not duplicate results."""
    before = serve.read_results(spark, env["rdir"]).count()
    serve.serve_query_stream(spark, env["idx"], env["qdir"], env["rdir"], k=5)
    assert serve.read_results(spark, env["rdir"]).count() == before


def test_batch_dirs_are_atomic_units(env):
    dirs = [d for d in os.listdir(env["rdir"]) if d.startswith("batch=")]
    assert len(dirs) >= 2  # one per wave
    assert not [d for d in os.listdir(env["rdir"]) if d.startswith("_tmp_")]


def test_percolate_stream_matches_offline(spark, corpus, tmp_path_factory):
    """Streaming percolation: docs arrive in two waves; per-batch alert rows
    must equal the offline percolate of each wave, and a replayed run adds
    nothing (idempotent batch dirs)."""
    from bitfunnel_spark.plans.batch import percolate

    root = tmp_path_factory.mktemp("perc")
    cdir = str(root / "docs")
    rdir = str(root / "alerts")
    os.makedirs(cdir)
    queries = ["data & fast", "vector | dup", "the -data"]
    w1 = corpus.filter("doc_id < 60").cache()
    w2 = corpus.filter("doc_id >= 60 AND doc_id < 120").cache()

    def arrive(df, name):
        stage = cdir + "_stage_" + name
        df.coalesce(1).write.mode("append").parquet(stage)
        import shutil
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(stage, f), os.path.join(cdir, f"{name}_{f}"))
        shutil.rmtree(stage)

    cfg = BuildConfig(n_slices=2)
    arrive(w1, "w1")
    serve.percolate_stream(spark, cdir, queries, rdir, config=cfg)
    arrive(w2, "w2")
    serve.percolate_stream(spark, cdir, queries, rdir, config=cfg)

    got = {
        (r["query_id"], r["doc_id"])
        for r in serve.read_results(spark, rdir).collect()
    }
    want = {
        (r["query_id"], r["doc_id"])
        for r in percolate(spark, w1, queries, config=cfg).collect()
    } | {
        (r["query_id"], r["doc_id"])
        for r in percolate(spark, w2, queries, config=cfg).collect()
    }
    assert got == want and got
    # replay: no new batches, results unchanged (idempotent)
    serve.percolate_stream(spark, cdir, queries, rdir, config=cfg)
    again = {
        (r["query_id"], r["doc_id"])
        for r in serve.read_results(spark, rdir).collect()
    }
    assert again == got
