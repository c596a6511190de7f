"""Snapshot retention + time travel over the generation manifest
(streaming.ingest): retained snapshots protect their source directories
through promotions, `read_segments_at` reproduces a pre-promotion view
exactly, expiry reclaims storage, and retention off keeps the aggressive
delete behavior."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import build_segments_fused
from bitfunnel_spark.streaming import ingest

CFG = BuildConfig(n_slices=2)


def _posting_mass(df):
    # per-(term, shard) posting counts from the blocks' n column — invariant
    # under merges (blocks move between runs, postings never drop)
    return {
        (r["term_key"], r["shard"]): r["total"]
        for r in df.groupBy("term_key", "shard").agg(F.sum("n").alias("total")).collect()
    }


@pytest.fixture()
def env(spark, corpus, tmp_path):
    root = str(tmp_path / "snap_idx")
    small = corpus.filter("doc_id < 80").cache()
    avgdl = stats.corpus_meta(stats.doc_stats(small, CFG))["avgdl"]
    inc_root = os.path.join(root, "increments")
    os.makedirs(inc_root)
    for b in range(4):
        part = small.filter(
            (F.col("doc_id") >= 20 * b) & (F.col("doc_id") < 20 * (b + 1))
        )
        build_segments_fused(part, avgdl, CFG).write.parquet(
            os.path.join(inc_root, f"batch={b}")
        )
    return {"root": root, "corpus": small, "avgdl": avgdl}


def test_time_travel_roundtrip(spark, env):
    root = env["root"]
    ingest.set_snapshot_retention(root, keep_last=10)
    snaps = ingest.snapshots(root)
    assert len(snaps) == 1 and snaps[0]["operation"] == "set_retention"
    v0 = snaps[0]["snapshot_id"]
    assert snaps[0]["live_batches"] == [0, 1, 2, 3]

    before = _posting_mass(ingest.read_live_segments(spark, root))

    promos = ingest.promote_increments(spark, root, CFG, fanout=2)
    assert promos  # promotions happened and committed snapshots
    snaps = ingest.snapshots(root)
    assert len(snaps) == 1 + len(promos)
    assert all(s["operation"] == "promote" for s in snaps[1:])

    # source batch dirs of consumed increments survive (protected)
    inc_left = sorted(os.listdir(os.path.join(root, "increments")))
    assert inc_left == ["batch=0", "batch=1", "batch=2", "batch=3"]

    # the as-of-v0 view is the original pre-promotion view
    at_v0 = ingest.read_segments_at(spark, root, v0)
    assert _posting_mass(at_v0) == before

    # every intermediate snapshot carries the same posting mass (merge
    # moves blocks between runs, never drops postings)
    for s in snaps:
        assert _posting_mass(ingest.read_segments_at(spark, root, s["snapshot_id"])) == before

    # current live view unchanged too
    assert _posting_mass(ingest.read_live_segments(spark, root)) == before


def test_expire_reclaims(spark, env):
    root = env["root"]
    ingest.set_snapshot_retention(root, keep_last=10)
    ingest.promote_increments(spark, root, CFG, fanout=2)
    first = ingest.snapshots(root)[0]["snapshot_id"]
    # keep only the newest snapshot: old batch dirs become garbage
    ingest.expire_snapshots(root, keep_last=1)
    assert len(ingest.snapshots(root)) == 1
    with pytest.raises(FileNotFoundError):
        ingest.read_segments_at(spark, root, first)
    # consumed batch dirs now reclaimed (the newest snapshot's sources are
    # the promoted runs, not the raw batches)
    inc_left = sorted(os.listdir(os.path.join(root, "increments")))
    assert inc_left == []  # all 4 consumed by the fanout-2 cascade
    # newest snapshot still readable
    newest = ingest.snapshots(root)[0]["snapshot_id"]
    ingest.read_segments_at(spark, root, newest)


def test_retention_off_keeps_aggressive_delete(spark, env):
    root = env["root"]
    ingest.promote_increments(spark, root, CFG, fanout=2)
    assert ingest.snapshots(root) == []
    inc_left = sorted(os.listdir(os.path.join(root, "increments")))
    assert inc_left == []  # victims deleted immediately, as before
    with pytest.raises(FileNotFoundError):
        ingest.read_segments_at(spark, root, 1)
