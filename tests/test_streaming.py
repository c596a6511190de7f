"""Streaming incremental ingest: two corpus increments arrive as files; the
live view (main ∪ increments) must answer queries over all docs seen so
far; compaction folds increments into main and refreshes epoch stats."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.sources.corpus import prime_factors_corpus
from bitfunnel_spark.streaming import ingest

CFG = BuildConfig(n_slices=2)


@pytest.fixture(scope="module")
def env(spark):
    root = tempfile.mkdtemp(prefix="bf_stream_")
    corpus_dir = os.path.join(root, "corpus")
    index_root = os.path.join(root, "index")
    os.makedirs(corpus_dir)
    os.makedirs(index_root)
    full = prime_factors_corpus(spark, 200).cache()
    # frozen epoch stats from the full expected corpus (serve-time freeze)
    meta = stats.corpus_meta(stats.doc_stats(full, CFG))
    return {"root": root, "corpus_dir": corpus_dir, "index_root": index_root, "full": full, "avgdl": meta["avgdl"]}


def _arrive(env, lo, hi, name):
    part = env["full"].filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    part.coalesce(1).write.mode("overwrite").parquet(os.path.join(env["corpus_dir"], "_stage_" + name))
    # move files in atomically, as a producer would
    import shutil

    stage = os.path.join(env["corpus_dir"], "_stage_" + name)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f), os.path.join(env["corpus_dir"], f"{name}_{f}"))
    shutil.rmtree(stage)


def _live_index(spark, env, seen_corpus):
    idx = FullTextIndex.build(spark, seen_corpus, CFG, cache=False)
    idx.segments = ingest.read_live_segments(spark, env["index_root"])
    return idx


def test_incremental_ingest_and_query(spark, env):
    _arrive(env, 1, 101, "inc1")
    ingest.ingest_increments(spark, env["corpus_dir"], env["index_root"], CFG, env["avgdl"])
    seen1 = env["full"].filter(F.col("doc_id") < 101)
    idx1 = _live_index(spark, env, seen1)
    got1 = sorted(r["doc_id"] for r in idx1.search("p2 p3", k=100, mode="kernel").collect())
    assert got1 == [d for d in range(1, 101) if d % 6 == 0]

    _arrive(env, 101, 201, "inc2")
    ingest.ingest_increments(spark, env["corpus_dir"], env["index_root"], CFG, env["avgdl"])
    inc_root = os.path.join(env["index_root"], "increments")
    assert len([d for d in os.listdir(inc_root) if d.startswith("batch=")]) >= 2

    idx2 = _live_index(spark, env, env["full"])
    got2 = sorted(r["doc_id"] for r in idx2.match("p2 p3").collect())
    assert got2 == [d for d in range(1, 201) if d % 6 == 0]


def test_compaction_restores_exact_build(spark, env):
    ingest.compact(spark, env["index_root"], CFG, env["full"])
    assert not os.path.exists(os.path.join(env["index_root"], "increments"))
    live = ingest.read_live_segments(spark, env["index_root"])
    # compacted store ≡ a from-scratch build (same set of encoded blocks)
    fresh = FullTextIndex.build(spark, env["full"], CFG, cache=False)
    fresh.build_segments(cache=False)

    def key(df):
        return {
            (r["term_key"], r["shard"], r["slice"], r["block_id"], bytes(r["docs_vb"]))
            for r in df.collect()
        }

    assert key(live) == key(fresh.segments)
