"""Size-tiered generation compaction (streaming.ingest.promote_increments):
tier promotion cascades, manifest-committed atomicity (crash garbage is
swept, consumed batches never double-count), byte-identity of the live view
vs a fused rebuild, and epoch compaction retiring the generation tree."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import build_segments_fused
from bitfunnel_spark.streaming import ingest

CFG = BuildConfig(n_slices=2)


def _block_key(df):
    return {
        (
            r["term_key"], r["shard"], r["slice"], r["block_id"],
            bytes(r["docs_vb"]), bytes(r["tfs_vb"]), bytes(r["partials"]),
            r["enc"],
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def env(spark, corpus, tmp_path_factory):
    """Five fused-build increments over disjoint corpus slices, all encoded
    at the union's frozen avgdl — exactly what streaming batches are."""
    root = str(tmp_path_factory.mktemp("gen_idx"))
    small = corpus.filter("doc_id < 100").cache()
    avgdl = stats.corpus_meta(stats.doc_stats(small, CFG))["avgdl"]
    inc_root = os.path.join(root, "increments")
    os.makedirs(inc_root)
    for b in range(5):
        part = small.filter(
            (F.col("doc_id") >= 20 * b) & (F.col("doc_id") < 20 * (b + 1))
        )
        build_segments_fused(part, avgdl, CFG).write.parquet(
            os.path.join(inc_root, f"batch={b}")
        )
    return {"root": root, "corpus": small, "avgdl": avgdl}


def test_promotion_cascade_and_live_equivalence(spark, env):
    promos = ingest.promote_increments(spark, env["root"], CFG, fanout=2)
    # 5 tier-0 runs, fanout 2: (b0,b1)->t1, (b2,b3)->t1, then both t1 -> t2;
    # b4 stays an unconsumed increment
    assert [p["tier"] for p in promos] == [1, 1, 2]
    man = json.load(open(os.path.join(env["root"], "_generations.json")))
    assert [r["tier"] for r in man["runs"]] == [2]
    assert man["consumed_batches"] == [0, 1, 2, 3]
    inc_left = [
        d for d in os.listdir(os.path.join(env["root"], "increments"))
        if d.startswith("batch=")
    ]
    assert inc_left == ["batch=4"]
    # the cascaded tier-2 run is byte-identical to a one-shot fused build of
    # its source slice (merge is associative: decode is lossless and the
    # final re-encode sees the full per-group doc set)
    t2 = spark.read.parquet(man["runs"][0]["path"])
    fused_03 = build_segments_fused(
        env["corpus"].filter("doc_id < 80"), env["avgdl"], CFG
    )
    assert _block_key(t2) == _block_key(fused_03)
    # live view (tier-2 run + remaining batch) carries exactly the full
    # posting mass — block boundaries differ until everything is folded,
    # so compare per-term posting counts, not bytes
    live = ingest.read_live_segments(spark, env["root"])
    rebuilt = build_segments_fused(env["corpus"], env["avgdl"], CFG)

    def _mass(df):
        return {
            (r["term_key"], r["shard"]): r["total"]
            for r in df.groupBy("term_key", "shard")
            .agg(F.sum("n").alias("total"))
            .collect()
        }

    assert _mass(live) == _mass(rebuilt)


def test_consumed_batch_replay_is_pruned_and_swept(spark, env):
    """A crashed promotion can leave a consumed batch dir behind (or a
    streaming replay can re-surface one). The manifest's partition filter
    must keep it out of the live view; the next promote sweeps it."""
    inc_root = os.path.join(env["root"], "increments")
    ghost = os.path.join(inc_root, "batch=0")
    before = _block_key(ingest.read_live_segments(spark, env["root"]))
    part = env["corpus"].filter("doc_id < 20")
    build_segments_fused(part, env["avgdl"], CFG).write.parquet(ghost)
    after = _block_key(ingest.read_live_segments(spark, env["root"]))
    assert after == before  # ghost pruned at planning time, no double count
    assert ingest.promote_increments(spark, env["root"], CFG, fanout=2) == []
    assert not os.path.exists(ghost)  # garbage swept


def test_unreferenced_generation_dir_is_swept(spark, env):
    """A run directory the manifest never committed (crash mid-promotion)
    is garbage-collected, not served."""
    orphan = os.path.join(env["root"], "generations", "tier=1", "run=999")
    os.makedirs(orphan)
    ingest.promote_increments(spark, env["root"], CFG, fanout=2)
    assert not os.path.exists(orphan)


def test_compact_merge_retires_generations(spark, env):
    ingest.compact_merge(spark, env["root"], CFG)
    assert not os.path.exists(os.path.join(env["root"], "generations"))
    assert not os.path.exists(os.path.join(env["root"], "increments"))
    man = json.load(open(os.path.join(env["root"], "_generations.json")))
    assert man["runs"] == []
    assert 4 in man["consumed_batches"]  # replay of any folded batch stays a no-op
    live = ingest.read_live_segments(spark, env["root"])
    rebuilt = build_segments_fused(env["corpus"], env["avgdl"], CFG)
    assert _block_key(live) == _block_key(rebuilt)
