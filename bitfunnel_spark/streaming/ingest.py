"""Incremental ingest — Structured Streaming over an append-only corpus.

The reference ingests online, in-process (thread-per-chunk fan-out —
/root/reference/src/Chunks/src/ChunkEnumerator.cpp:31-55) into mutable
slices. Our analogue: `readStream` over the corpus location; each micro-batch
is tokenized and encoded into an *increment* segment directory
({root}/increments/batch=N/ — the analogue of a freshly allocated Slice);
queries read main ∪ increments (decode_group re-sorts interleaved blocks);
`compact()` runs the tiered repartition-and-reduce merge folding increments
into the main store (the analogue of slice recycling, without the token
manager — directories are immutable snapshots).

BM25 global stats (avgdl, df→idf) drift as documents arrive. Standard serve
practice (and ours): freeze stats at build time per epoch; `compact()`
recomputes them. Between compactions, stored partials use the frozen avgdl
and idf comes from the refreshed term_stats at query time — exactness
vs the oracle is restored at each compaction boundary (tested).

Exactly-once: foreachBatch writes each batch to its own directory keyed by
batch_id and moves it into place atomically; Structured Streaming's
checkpoint (WAL + source offsets) guarantees a batch id is never applied
twice. Corpus updates/deletes are out of scope for streaming — they are
row-level operations on the corpus table followed by a shard rebuild
(Iceberg snapshot isolation covers the cutover).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitfunnel_spark.config import BuildConfig
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import build_segments

CORPUS_DDL = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def corpus_stream(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Streaming corpus source: parquet files appearing under corpus_dir."""
    return spark.readStream.schema(CORPUS_DDL).parquet(corpus_dir)


def ingest_increments(
    spark: SparkSession,
    corpus_dir: str,
    index_root: str,
    config: BuildConfig,
    avgdl: float,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) the streaming
    ingest: corpus files → per-batch increment segment directories.

    `avgdl` is the frozen epoch value (see module docstring).
    """
    inc_root = os.path.join(index_root, "increments")
    os.makedirs(inc_root, exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(index_root, "_stream_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(inc_root, f"batch={batch_id}")
        if os.path.exists(out):  # replayed batch after restart — idempotent skip
            return
        postings = stats.postings(batch_df, config)
        seg = build_segments(postings, avgdl, config)
        tmp = os.path.join(inc_root, f"_tmp_batch={batch_id}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        seg.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, out)

    writer = (
        corpus_stream(spark, corpus_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def read_live_segments(spark: SparkSession, index_root: str) -> DataFrame:
    """main ∪ increments — the queryable view between compactions.

    Increments are discovered with ONE globbed Spark read
    (``increments/batch=*``): path resolution goes through Spark's Hadoop
    filesystem connector, which lists correctly on object storage (S3/GCS)
    where a driver-side ``os.listdir`` would not exist — and a single read
    of N increment directories beats N separate reads + unions."""
    from pyspark.errors import AnalysisException

    parts = []
    main = os.path.join(index_root, "segments")
    try:
        parts.append(spark.read.parquet(main))
    except AnalysisException:
        pass  # no main store yet (pure-streaming start)
    inc_root = os.path.join(index_root, "increments")
    try:
        inc = spark.read.option("basePath", inc_root).parquet(
            os.path.join(inc_root, "batch=*")
        )
        if "batch" in inc.columns:  # partition-dir column from the glob
            inc = inc.drop("batch")
        if parts:
            inc = inc.select(*parts[0].columns)
        parts.append(inc)
    except AnalysisException:
        pass  # no increments yet
    if not parts:
        raise FileNotFoundError(f"no segments under {index_root}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_merge(
    spark: SparkSession,
    index_root: str,
    config: BuildConfig,
    tombstones=None,
) -> None:
    """Segment-LEVEL compaction: fold main ∪ increments into clean blocks
    with `operators.segments.merge_segment_blocks` — NO corpus rescan, cost
    scales with index size. Keeps the epoch's frozen stats (the increments
    were encoded against them, so stored partials are reused bit-exactly);
    tombstones are dropped physically. Run the full `compact` (corpus
    rebuild + stats refresh) at epoch boundaries; run this one between
    them — at 100 TB this is the difference between a takedown costing an
    index-sized merge and a corpus-sized rebuild."""
    from bitfunnel_spark.operators.segments import merge_segment_blocks

    live = read_live_segments(spark, index_root)
    merged = merge_segment_blocks(live, config, tombstones=tombstones)
    main = os.path.join(index_root, "segments")
    tmp = main + "_tmp_compact"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").parquet(tmp)
    old = main + "_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(main):
        os.rename(main, old)
    os.rename(tmp, main)
    if os.path.exists(old):
        shutil.rmtree(old)
    inc_root = os.path.join(index_root, "increments")
    if os.path.exists(inc_root):
        shutil.rmtree(inc_root)


def compact(
    spark: SparkSession,
    index_root: str,
    config: BuildConfig,
    corpus: DataFrame,
    tombstones=None,
) -> None:
    """Tiered merge: fold all increments + main into fresh segments, with
    epoch stats (n_docs, avgdl, term_stats) recomputed over the full corpus.
    One repartition-and-reduce pass (the same single-shuffle build as
    operators/segments.build_segments); atomic directory swap.

    ``tombstones`` (iterable of doc ids) are dropped PHYSICALLY here — the
    soft-delete mask (index.delete_docs) becomes a hard delete and the new
    epoch's stats no longer count the deleted docs. At 100 TB this is the
    takedown path: deletes are served instantly by the mask and reclaimed
    at the next compaction, never by a per-delete rebuild."""
    if tombstones:
        ids = [int(d) for d in sorted(set(tombstones))]
        tomb = spark.createDataFrame([(d,) for d in ids], "doc_id long")
        corpus = corpus.join(F.broadcast(tomb), "doc_id", "left_anti")
    ds = stats.doc_stats(corpus, config)
    meta = stats.corpus_meta(ds)
    postings = stats.postings(corpus, config)
    seg = build_segments(postings, meta["avgdl"], config)
    main = os.path.join(index_root, "segments")
    tmp = main + "_tmp_compact"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    seg.write.mode("overwrite").parquet(tmp)
    old = main + "_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(main):
        os.rename(main, old)
    os.rename(tmp, main)
    if os.path.exists(old):
        shutil.rmtree(old)
    # refresh stats tables + retire increments
    for name, df in (
        ("doc_stats", ds),
        ("term_stats", stats.term_stats(postings, meta["n_docs"], config)),
        ("meta", spark.createDataFrame([(meta["n_docs"], meta["avgdl"])], "n_docs long, avgdl double")),
    ):
        path = os.path.join(index_root, name)
        tmpp = path + "_tmp"
        df.write.mode("overwrite").parquet(tmpp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmpp, path)
    inc_root = os.path.join(index_root, "increments")
    if os.path.exists(inc_root):
        shutil.rmtree(inc_root)
