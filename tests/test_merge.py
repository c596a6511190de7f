"""Segment-level tiered merge (operators.segments.merge_segment_blocks):
byte-identity vs a rebuild at the frozen epoch avgdl, tombstone drops,
positional preservation, and the compact_merge wrapper."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import (
    build_segments_fused,
    merge_segment_blocks,
)
from bitfunnel_spark.streaming import ingest


def _block_key(df):
    return {
        (
            r["term_key"], r["shard"], r["slice"], r["block_id"],
            bytes(r["docs_vb"]), bytes(r["tfs_vb"]), bytes(r["partials"]),
            bytes(r["pos_vb"]) if r["pos_vb"] is not None else b"",
            r["enc"],
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "positional"])
def halves(request, spark, corpus):
    """Two disjoint corpus halves encoded separately at the union's frozen
    avgdl (exactly what streaming increments are), plus the union build."""
    cfg = BuildConfig(n_slices=2, positions=request.param)
    small = corpus.filter("doc_id < 80").cache()
    avgdl = stats.corpus_meta(stats.doc_stats(small, cfg))["avgdl"]
    a = build_segments_fused(small.filter("doc_id < 40"), avgdl, cfg).cache()
    b = build_segments_fused(small.filter("doc_id >= 40"), avgdl, cfg).cache()
    union_build = build_segments_fused(small, avgdl, cfg).cache()
    return {"cfg": cfg, "a": a, "b": b, "union": union_build, "corpus": small,
            "avgdl": avgdl}


def test_merge_is_byte_identical_to_rebuild(halves):
    merged = merge_segment_blocks(halves["a"].unionByName(halves["b"]), halves["cfg"])
    assert _block_key(merged) == _block_key(halves["union"])


def test_merge_drops_tombstones(halves):
    tomb = [1, 2, 41, 42]
    merged = merge_segment_blocks(
        halves["a"].unionByName(halves["b"]), halves["cfg"], tombstones=tomb
    )
    rebuilt = build_segments_fused(
        halves["corpus"].filter(~F.col("doc_id").isin(tomb)),
        halves["avgdl"],
        halves["cfg"],
    )
    assert _block_key(merged) == _block_key(rebuilt)


def test_merge_idempotent(halves):
    """Merging an already-clean store is the identity."""
    merged = merge_segment_blocks(halves["union"], halves["cfg"])
    assert _block_key(merged) == _block_key(halves["union"])


def test_compact_merge_wrapper(spark, corpus, tmp_path):
    """compact_merge folds main+increments on disk without a corpus scan
    and the result serves queries identically to a fresh full build."""
    cfg = BuildConfig(n_slices=2)
    small = corpus.filter("doc_id < 80").cache()
    avgdl = stats.corpus_meta(stats.doc_stats(small, cfg))["avgdl"]
    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, "increments"), exist_ok=True)
    build_segments_fused(small.filter("doc_id < 40"), avgdl, cfg).write.parquet(
        os.path.join(root, "segments")
    )
    build_segments_fused(small.filter("doc_id >= 40"), avgdl, cfg).write.parquet(
        os.path.join(root, "increments", "batch=0")
    )
    ingest.compact_merge(spark, root, cfg, tombstones=[3])
    assert not os.path.exists(os.path.join(root, "increments"))
    live = ingest.read_live_segments(spark, root)
    rebuilt = build_segments_fused(
        small.filter("doc_id != 3"), avgdl, cfg
    )
    assert _block_key(live) == _block_key(rebuilt)
    # and block doc-ranges are monotone again per (key, shard, slice)
    pdf = live.toPandas()
    for _, rows in pdf.groupby(["term_key", "shard", "slice"]):
        rows = rows.sort_values("block_id")
        lasts = rows["last_doc"].to_numpy()
        firsts = rows["first_doc"].to_numpy()
        assert np.all(firsts[1:] > lasts[:-1])
