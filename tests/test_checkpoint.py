"""Resume-from-checkpoint (FIXTURES.md F6): interrupt the build mid-way,
resume, and require (a) completion using checkpoints, (b) final segments
identical to an uninterrupted build, (c) lineage recording both attempts."""

import tempfile

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig
from bitfunnel_spark.operators.checkpoint import CheckpointedBuild, FaultInjected
from bitfunnel_spark.sources.corpus import prime_factors_corpus

# boundaries sized to the prime-factors corpus (doclen = Ω(d) ∈ 1..8) so all
# four shards are populated
CFG = BuildConfig(n_slices=2, shard_boundaries=(0, 3, 5, 7))


def _segment_set(spark, root):
    df = spark.read.parquet(f"{root}/segments")
    return {
        (r["term_key"], r["shard"], r["slice"], r["block_id"], bytes(r["docs_vb"]), bytes(r["tfs_vb"]))
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def corpus(spark):
    return prime_factors_corpus(spark, 300).cache()


def test_interrupt_resume_identical(spark, corpus):
    clean_root = tempfile.mkdtemp(prefix="bf_clean_")
    resumed_root = tempfile.mkdtemp(prefix="bf_resume_")

    CheckpointedBuild(spark, clean_root, CFG).build(corpus)

    # interrupted build: crash while committing shard 2
    ckpt = CheckpointedBuild(spark, resumed_root, CFG)

    def fault(unit):
        if unit == "segments:shard=2":
            raise FaultInjected(unit)

    with pytest.raises(FaultInjected):
        ckpt.build(corpus, fault=fault)

    # resume without the fault → completes
    ckpt.build(corpus)

    assert _segment_set(spark, resumed_root) == _segment_set(spark, clean_root)

    lineage = ckpt.lineage()
    sh2 = lineage.filter(F.col("unit") == "segments:shard=2").orderBy("attempt").collect()
    assert [r["status"] for r in sh2] == ["failed", "done"]
    assert "FaultInjected" in sh2[0]["error"]
    # earlier units were NOT rebuilt on resume (exactly one attempt each)
    ds = lineage.filter(F.col("unit") == "doc_stats").collect()
    assert len(ds) == 1 and ds[0]["status"] == "done"
    # metrics recorded
    assert all(r["wall_ms"] >= 0 for r in lineage.collect())
    done_rows = {r["unit"]: r["rows"] for r in lineage.filter(F.col("status") == "done").collect()}
    assert done_rows["doc_stats"] == 300
    assert all(v > 0 for u, v in done_rows.items() if u.startswith("segments:"))


def test_loaded_index_serves_queries(spark, corpus):
    root = tempfile.mkdtemp(prefix="bf_load_")
    ckpt = CheckpointedBuild(spark, root, CFG)
    ckpt.build(corpus)
    idx = ckpt.load_index(corpus)
    got = sorted(r["doc_id"] for r in idx.search("p2 p3", k=10, mode="kernel").collect())
    assert len(got) == 10 and all(d % 6 == 0 for d in got)


def test_rerun_noop(spark, corpus):
    root = tempfile.mkdtemp(prefix="bf_noop_")
    ckpt = CheckpointedBuild(spark, root, CFG)
    ckpt.build(corpus)
    n1 = ckpt.lineage().count()
    ckpt.build(corpus)  # everything checkpointed → no new attempts
    assert ckpt.lineage().count() == n1


def test_slice_band_units_resume_identical(spark, corpus):
    """Finer resume quantum: slice_bands=2 splits each shard into two
    checkpoint units; a crash in one band resumes without redoing the
    other, and the final store matches the per-shard layout's blocks."""
    coarse_root = tempfile.mkdtemp(prefix="bf_band_coarse_")
    band_root = tempfile.mkdtemp(prefix="bf_band_")
    CheckpointedBuild(spark, coarse_root, CFG).build(corpus)

    ckpt = CheckpointedBuild(spark, band_root, CFG, slice_bands=2)

    def fault(unit):
        if unit == "segments:shard=1:band=1":
            raise FaultInjected(unit)

    with pytest.raises(FaultInjected):
        ckpt.build(corpus, fault=fault)
    ckpt.build(corpus)

    assert _segment_set(spark, band_root) == _segment_set(spark, coarse_root)

    lineage = ckpt.lineage()
    banded = lineage.filter(F.col("unit") == "segments:shard=1:band=1").orderBy("attempt").collect()
    assert [r["status"] for r in banded] == ["failed", "done"]
    # the sibling band committed once and was not rebuilt on resume
    sib = lineage.filter(F.col("unit") == "segments:shard=1:band=0").collect()
    assert len(sib) == 1 and sib[0]["status"] == "done"
    # resume quantum = shards x bands segment units
    seg_units = {
        r["unit"]
        for r in lineage.filter(F.col("status") == "done").collect()
        if r["unit"].startswith("segments:")
    }
    assert len(seg_units) == 4 * 2

    idx = ckpt.load_index(corpus)
    got = sorted(r["doc_id"] for r in idx.search("p2 p3", k=10, mode="kernel").collect())
    assert len(got) == 10 and all(d % 6 == 0 for d in got)
