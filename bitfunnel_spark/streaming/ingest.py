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

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitfunnel_spark.config import BuildConfig
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import build_segments
from bitfunnel_spark.sources import fsio

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
    inc_root = fsio.join(index_root, "increments")
    fsio.mkdirs(inc_root)
    checkpoint_dir = checkpoint_dir or fsio.join(index_root, "_stream_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = fsio.join(inc_root, f"batch={batch_id}")
        if fsio.exists(out):  # replayed batch after restart — idempotent skip
            return
        if batch_id in _load_manifest(index_root)["consumed_batches"]:
            return  # replayed batch already folded into a generation run
        postings = stats.postings(batch_df, config)
        seg = build_segments(postings, avgdl, config)
        tmp = fsio.join(inc_root, f"_tmp_batch={batch_id}")
        if fsio.exists(tmp):
            fsio.delete(tmp)
        seg.write.mode("overwrite").parquet(tmp)
        fsio.rename(tmp, out)

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


# ---- generation manifest (LSM catalog) ---------------------------------
#
# Size-tiered compaction needs an atomic commit point: a promotion writes a
# merged run, then swaps ONE small JSON manifest that (a) references the new
# run and (b) marks its sources consumed. Readers trust the manifest, never
# a directory listing, so a crash between "run written" and "sources
# deleted" can only leave unreferenced garbage (swept on the next promote),
# never duplicates or holes. This is Lucene's segments_N / RocksDB's
# MANIFEST; on a real cluster the same commit is one Iceberg snapshot.

_MANIFEST = "_generations.json"
_SNAPSHOT_DIR = "_snapshots"
_EMPTY_MANIFEST = {
    "runs": [], "consumed_batches": [], "next_run": 1,
    "snapshot_id": 0, "retain_snapshots": 0,
}


def _load_manifest(index_root: str) -> dict:
    path = fsio.join(index_root, _MANIFEST)
    text = fsio.read_text(path)
    if text is None:
        return {k: (list(v) if isinstance(v, list) else v) for k, v in _EMPTY_MANIFEST.items()}
    man = json.loads(text)
    for k, v in _EMPTY_MANIFEST.items():  # back-compat with pre-snapshot manifests
        man.setdefault(k, list(v) if isinstance(v, list) else v)
    return man


def _live_batch_ids(index_root: str, man: dict) -> list[int]:
    """Unconsumed increment batch ids present on disk right now."""
    inc_root = fsio.join(index_root, "increments")
    if not fsio.isdir(inc_root):
        return []
    consumed = set(man["consumed_batches"])
    return sorted(
        int(d.split("=", 1)[1])
        for d in fsio.listdir(inc_root)
        if d.startswith("batch=") and int(d.split("=", 1)[1]) not in consumed
    )


def _commit_manifest(index_root: str, manifest: dict, operation: str = "commit") -> None:
    # When snapshot retention is on, every commit is also an immutable
    # versioned snapshot (the Iceberg snapshot log): the snapshot file
    # captures the generation runs AND the unconsumed batches live at this
    # instant, so `read_segments_at` can rebuild exactly this view later.
    if manifest.get("retain_snapshots", 0) > 0:
        import time

        manifest["snapshot_id"] = int(manifest.get("snapshot_id", 0)) + 1
        snap = dict(manifest)
        snap["operation"] = operation
        snap["committed_at"] = time.time()
        snap["live_batches"] = _live_batch_ids(index_root, manifest)
        sdir = fsio.join(index_root, _SNAPSHOT_DIR)
        fsio.mkdirs(sdir)
        spath = fsio.join(sdir, f"v{manifest['snapshot_id']}.json")
        fsio.write_text_atomic(spath, json.dumps(snap))
    path = fsio.join(index_root, _MANIFEST)
    fsio.write_text_atomic(path, json.dumps(manifest))  # the atomic commit point


def snapshots(index_root: str) -> list[dict]:
    """Snapshot log, oldest first: [{snapshot_id, operation, committed_at,
    runs, live_batches, ...}] — the Iceberg `snapshots` metadata table."""
    sdir = fsio.join(index_root, _SNAPSHOT_DIR)
    if not fsio.isdir(sdir):
        return []
    out = []
    for name in fsio.listdir(sdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(json.loads(fsio.read_text(fsio.join(sdir, name))))
    return sorted(out, key=lambda s: s["snapshot_id"])


def set_snapshot_retention(index_root: str, keep_last: int) -> None:
    """Enable time travel: retain the last ``keep_last`` manifest commits as
    immutable snapshots. Promotions and garbage sweeps then keep every
    run/increment directory any retained snapshot references, so
    ``read_segments_at`` can serve any retained version. 0 disables
    retention (the default — storage is reclaimed aggressively)."""
    man = _load_manifest(index_root)
    man["retain_snapshots"] = int(keep_last)
    _commit_manifest(index_root, man, operation="set_retention")


def expire_snapshots(index_root: str, keep_last: int | None = None) -> None:
    """Drop snapshot files beyond the newest ``keep_last`` (default: the
    manifest's retention setting), then sweep directories no longer
    referenced by any retained snapshot — Iceberg's expire_snapshots."""
    man = _load_manifest(index_root)
    if keep_last is None:
        keep_last = man.get("retain_snapshots", 0)
    snaps = snapshots(index_root)
    for s in snaps[: max(0, len(snaps) - int(keep_last))]:
        fsio.delete(fsio.join(index_root, _SNAPSHOT_DIR, f"v{s['snapshot_id']}.json"))
    _sweep_garbage(index_root, man)


def _protected_paths(index_root: str, man: dict) -> set[str]:
    """Directories some retained snapshot still references — never deleted
    by promotions or sweeps while the snapshot is retained."""
    keep = man.get("retain_snapshots", 0)
    if keep <= 0:
        return set()
    inc_root = fsio.join(index_root, "increments")
    protected: set[str] = set()
    for s in snapshots(index_root)[-keep:]:
        protected.update(r["path"] for r in s["runs"])
        protected.update(
            fsio.join(inc_root, f"batch={b}") for b in s.get("live_batches", [])
        )
    return protected


def promote_increments(
    spark: SparkSession,
    index_root: str,
    config: BuildConfig,
    fanout: int = 8,
    tombstones=None,
) -> list[dict]:
    """Size-tiered generation compaction of streaming increments (LSM style).

    Tier-0 runs are the per-batch increment directories; whenever a tier
    accumulates ``fanout`` runs, the oldest ``fanout`` are folded — with the
    segment-LEVEL merge (`merge_segment_blocks`, no corpus rescan) — into
    ONE run of the next tier under ``generations/tier=T/run=N``. The main
    store is never rewritten here, so each posting is re-merged
    O(log_fanout(#batches)) times between epoch compactions instead of once
    per compaction — at 100 TB with thousands of micro-batches this is the
    difference between bounded write amplification and re-folding the whole
    increment set on every cadence tick. Queries keep reading
    main ∪ generation runs ∪ unconsumed batches (`read_live_segments`);
    increments were encoded against the epoch's frozen avgdl, so merged
    partials stay bit-exact (tested in tests/test_merge.py).

    Reference analogue: slice recycling / Shard::TemporaryRecycleSlice —
    freshly filled slices are folded back into the shard's capacity without
    a corpus pass (/root/reference/src/Index/src/Shard.cpp); our immutable
    variant merges runs instead of mutating them.

    Returns a list of {"tier", "run", "sources"} describing each promotion.
    """
    from bitfunnel_spark.operators.segments import merge_segment_blocks

    man = _load_manifest(index_root)
    _sweep_garbage(index_root, man)
    inc_root = fsio.join(index_root, "increments")
    gen_root = fsio.join(index_root, "generations")
    promotions: list[dict] = []

    def tier_runs(tier: int) -> list[dict]:
        if tier == 0:
            if not fsio.isdir(inc_root):
                return []
            consumed = set(man["consumed_batches"])
            ids = sorted(
                int(d.split("=", 1)[1])
                for d in fsio.listdir(inc_root)
                if d.startswith("batch=") and int(d.split("=", 1)[1]) not in consumed
            )
            return [{"tier": 0, "batch": i, "path": fsio.join(inc_root, f"batch={i}")} for i in ids]
        return sorted(
            (r for r in man["runs"] if r["tier"] == tier), key=lambda r: r["run"]
        )

    tier = 0
    while True:
        runs = tier_runs(tier)
        if len(runs) < fanout:
            if tier > 0 and not runs and tier > max((r["tier"] for r in man["runs"]), default=0):
                break
            tier += 1
            if tier > 64:  # structurally impossible; loop guard
                break
            continue
        victims = runs[:fanout]
        run_id = man["next_run"]
        out = fsio.join(gen_root, f"tier={tier + 1}", f"run={run_id}")
        tmp = out + "_tmp"
        if fsio.exists(tmp):
            fsio.delete(tmp)
        src = spark.read.parquet(*[v["path"] for v in victims])
        merge_segment_blocks(src, config, tombstones=tombstones).write.mode(
            "overwrite"
        ).parquet(tmp)
        fsio.mkdirs(out.rsplit("/", 1)[0])
        fsio.rename(tmp, out)
        # ONE manifest swap commits the promotion: new run in, sources out
        man["next_run"] = run_id + 1
        man["runs"] = [
            r for r in man["runs"] if r["path"] not in {v["path"] for v in victims}
        ] + [{"tier": tier + 1, "run": run_id, "path": out}]
        man["consumed_batches"] = sorted(
            set(man["consumed_batches"]) | {v["batch"] for v in victims if v["tier"] == 0}
        )
        _commit_manifest(index_root, man, operation="promote")
        protected = _protected_paths(index_root, man)
        for v in victims:  # post-commit garbage collection (crash-safe: swept next time)
            if fsio.exists(v["path"]) and v["path"] not in protected:
                fsio.delete(v["path"])
        promotions.append(
            {"tier": tier + 1, "run": run_id, "sources": [v["path"] for v in victims]}
        )
        # stay on this tier: more runs may still be ready; cascades upward
    return promotions


def _sweep_garbage(index_root: str, man: dict) -> None:
    """Remove directories a crashed promotion left behind: consumed batch
    dirs that were never deleted, and generation dirs the manifest does not
    reference (including interrupted ``*_tmp`` writes). Directories a
    retained snapshot references are kept (time travel)."""
    protected = _protected_paths(index_root, man)
    inc_root = fsio.join(index_root, "increments")
    if fsio.isdir(inc_root):
        consumed = set(man["consumed_batches"])
        for d in fsio.listdir(inc_root):
            p = fsio.join(inc_root, d)
            if (
                d.startswith("batch=")
                and int(d.split("=", 1)[1]) in consumed
                and p not in protected
            ):
                fsio.delete(p)
    gen_root = fsio.join(index_root, "generations")
    if fsio.isdir(gen_root):
        live = {r["path"] for r in man["runs"]} | protected
        for tier_d in fsio.listdir(gen_root):
            tp = fsio.join(gen_root, tier_d)
            for run_d in fsio.listdir(tp) if fsio.isdir(tp) else []:
                rp = fsio.join(tp, run_d)
                if rp not in live:
                    fsio.delete(rp)


def read_live_segments(spark: SparkSession, index_root: str) -> DataFrame:
    """main ∪ generation runs ∪ unconsumed increments — the queryable view
    between compactions.

    Increments are discovered with ONE globbed Spark read
    (``increments/batch=*``): path resolution goes through Spark's Hadoop
    filesystem connector, which lists correctly on object storage (S3/GCS)
    where a driver-side ``os.listdir`` would not exist — and a single read
    of N increment directories beats N separate reads + unions. Batches the
    generation manifest marked consumed are excluded with a partition
    filter on the ``batch`` directory column — Catalyst prunes those
    directories at planning time, so a crash window where a consumed batch
    dir still exists cannot double-count it. Generation runs are read from
    the manifest (never a directory listing — see the manifest note above),
    all paths in one read."""
    from pyspark.errors import AnalysisException

    parts = []
    main = fsio.join(index_root, "segments")
    try:
        parts.append(spark.read.parquet(main))
    except AnalysisException:
        pass  # no main store yet (pure-streaming start)
    man = _load_manifest(index_root)
    if man["runs"]:
        gen = spark.read.parquet(*[r["path"] for r in man["runs"]])
        if parts:
            gen = gen.select(*parts[0].columns)
        parts.append(gen)
    inc_root = fsio.join(index_root, "increments")
    try:
        inc = spark.read.option("basePath", inc_root).parquet(
            fsio.join(inc_root, "batch=*")
        )
        if "batch" in inc.columns:  # partition-dir column from the glob
            if man["consumed_batches"]:
                inc = inc.filter(~F.col("batch").isin(man["consumed_batches"]))
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


def read_segments_at(spark: SparkSession, index_root: str, snapshot_id: int) -> DataFrame:
    """Time travel: the queryable segment view exactly as of a retained
    snapshot (Iceberg's `VERSION AS OF`). Requires snapshot retention
    (`set_snapshot_retention`); raises if the snapshot was expired or its
    directories were reclaimed. Valid within an epoch — an epoch compaction
    rewrites main and resets the timeline."""
    spath = fsio.join(index_root, _SNAPSHOT_DIR, f"v{int(snapshot_id)}.json")
    if not fsio.exists(spath):
        raise FileNotFoundError(
            f"snapshot {snapshot_id} not found (expired, never retained, or "
            f"reset by an epoch compaction) under {index_root}"
        )
    snap = json.loads(fsio.read_text(spath))
    inc_root = fsio.join(index_root, "increments")
    paths = [r["path"] for r in snap["runs"]] + [
        fsio.join(inc_root, f"batch={b}") for b in snap.get("live_batches", [])
    ]
    missing = [p for p in paths if not fsio.isdir(p)]
    if missing:
        raise FileNotFoundError(
            f"snapshot {snapshot_id} references reclaimed directories "
            f"(raise retention before promoting): {missing}"
        )
    parts = []
    main = fsio.join(index_root, "segments")
    from pyspark.errors import AnalysisException

    try:
        parts.append(spark.read.parquet(main))
    except AnalysisException:
        pass
    if paths:
        extra = spark.read.parquet(*paths)
        if parts:
            extra = extra.select(*parts[0].columns)
        parts.append(extra)
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
    main = fsio.join(index_root, "segments")
    tmp = main + "_tmp_compact"
    if fsio.exists(tmp):
        fsio.delete(tmp)
    merged.write.mode("overwrite").parquet(tmp)
    old = main + "_old"
    if fsio.exists(old):
        fsio.delete(old)
    if fsio.exists(main):
        fsio.rename(main, old)
    fsio.rename(tmp, main)
    if fsio.exists(old):
        fsio.delete(old)
    _retire_increments(index_root)


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
    main = fsio.join(index_root, "segments")
    tmp = main + "_tmp_compact"
    if fsio.exists(tmp):
        fsio.delete(tmp)
    seg.write.mode("overwrite").parquet(tmp)
    old = main + "_old"
    if fsio.exists(old):
        fsio.delete(old)
    if fsio.exists(main):
        fsio.rename(main, old)
    fsio.rename(tmp, main)
    if fsio.exists(old):
        fsio.delete(old)
    # refresh stats tables + retire increments
    for name, df in (
        ("doc_stats", ds),
        ("term_stats", stats.term_stats(postings, meta["n_docs"], config)),
        ("meta", spark.createDataFrame([(meta["n_docs"], meta["avgdl"])], "n_docs long, avgdl double")),
    ):
        path = fsio.join(index_root, name)
        tmpp = path + "_tmp"
        df.write.mode("overwrite").parquet(tmpp)
        if fsio.exists(path):
            fsio.delete(path)
        fsio.rename(tmpp, path)
    _retire_increments(index_root)


def _retire_increments(index_root: str) -> None:
    """After a compaction folded everything into main: drop increment and
    generation directories and reset the generation manifest (consumed-batch
    ids are retained so a streaming replay of an old batch stays a no-op)."""
    man = _load_manifest(index_root)
    consumed = set(man["consumed_batches"])
    inc_root = fsio.join(index_root, "increments")
    if fsio.exists(inc_root):
        consumed |= {
            int(d.split("=", 1)[1])
            for d in fsio.listdir(inc_root)
            if d.startswith("batch=")
        }
        fsio.delete(inc_root)
    gen_root = fsio.join(index_root, "generations")
    if fsio.exists(gen_root):
        fsio.delete(gen_root)
    # an epoch compaction rewrites main, which invalidates every pre-epoch
    # view — the snapshot timeline resets (retention setting survives)
    sdir = fsio.join(index_root, _SNAPSHOT_DIR)
    if fsio.exists(sdir):
        fsio.delete(sdir)
    _commit_manifest(
        index_root,
        {
            "runs": [], "consumed_batches": sorted(consumed),
            "next_run": man["next_run"], "snapshot_id": man.get("snapshot_id", 0),
            "retain_snapshots": man.get("retain_snapshots", 0),
        },
        operation="epoch_compact",
    )
