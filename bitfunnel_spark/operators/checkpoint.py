"""Resumable index builds: per-partition checkpoints + lineage + metrics.

north_rule: "resumable from checkpoint with per-partition lineage and
metrics tables". The reference's analogue is slice save/load warm-start
(/root/reference/src/Index/src/Shard.h:115-117, Ingestor.cpp:163-200 —
TemporaryWriteAllSlices / TemporaryReadAllSlices).

Layout under an index root (plain parquet here; an Iceberg catalog swaps in
transparently — each stage commit becomes an Iceberg snapshot commit):

    {root}/doc_stats/                  stage: doc stats (+ sha256 invariant)
    {root}/term_stats/                 stage: term dictionary
    {root}/meta/                       stage: n_docs / avgdl scalars
    {root}/segments/shard=K/           one checkpoint unit per shard
    {root}/lineage/                    append-only event log (the lineage +
                                       metrics table: unit, attempt, status,
                                       rows, wall_ms, ts)

Semantics:
- Each unit is written to `{root}/segments/_tmp_shard=K` then atomically
  renamed to `shard=K`; the lineage "done" row is appended only after the
  rename — so a crash mid-unit leaves either no directory or an orphan tmp
  dir, never a half-committed unit.
- resume(): units whose lineage says "done" AND whose directory exists are
  skipped; everything else is (re)built. Repeated runs are idempotent and
  the final segment set is byte-identical to an uninterrupted build
  (postings→blocks is deterministic: sorted by doc_id, fixed block size).
- Failed attempts are recorded (status='failed', the exception class) —
  the lineage table is the audit trail the north_rule asks for.

Scale: one Spark job per shard (≤16 — BitFunnelTypes.h:81-84 caps shards at
16 too); within a job, (term, stream, slice) groups are the parallel tasks.
The per-shard job reads only that shard's postings (partition-pruned if the
postings table is persisted partitioned by shard).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitfunnel_spark.config import BuildConfig
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import build_segments
from bitfunnel_spark.sources import fsio

LINEAGE_SCHEMA = (
    "unit string, attempt int, status string, rows long, wall_ms long, "
    "error string, ts double"
)


class FaultInjected(RuntimeError):
    """Raised by the test fault hook to simulate a mid-build crash."""


@dataclass
class CheckpointedBuild:
    spark: SparkSession
    root: str
    config: BuildConfig
    # Resume granularity: each shard splits into this many slice-band units
    # (unit = contiguous slice range, dir = segments/shard=K/band=J). The
    # resume quantum is n_shards × slice_bands — at scale, 8 shards × 32
    # bands means a preemption loses ≤ 1/256 of the segment work. Slices
    # are a uniform doc-id hash, so bands are uniformly sized by
    # construction. 1 keeps the per-shard layout.
    slice_bands: int = 1

    # -- lineage ---------------------------------------------------------

    def _lineage_path(self) -> str:
        return fsio.join(self.root, "lineage")

    def _log(self, unit: str, attempt: int, status: str, rows: int = 0, wall_ms: int = 0, error: str = "") -> None:
        row = [(unit, attempt, status, rows, wall_ms, error, time.time())]
        self.spark.createDataFrame(row, LINEAGE_SCHEMA).coalesce(1).write.mode("append").parquet(
            self._lineage_path()
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_path())

    def _completed_units(self) -> set[str]:
        if not fsio.exists(self._lineage_path()):
            return set()
        return {
            r["unit"]
            for r in self.lineage().filter(F.col("status") == "done").select("unit").distinct().collect()
        }

    def _attempt_no(self, unit: str) -> int:
        if not fsio.exists(self._lineage_path()):
            return 1
        prev = self.lineage().filter(F.col("unit") == unit).agg(F.max("attempt")).collect()[0][0]
        return (prev or 0) + 1

    # -- stages ----------------------------------------------------------

    def _stage(self, unit: str, out_path: str, make_df, fault=None) -> None:
        """Run one checkpoint unit: build → tmp write → atomic rename → log."""
        done = self._completed_units()
        if unit in done and fsio.exists(out_path):
            return
        attempt = self._attempt_no(unit)
        t0 = time.time()
        tmp = fsio.join(fsio.dirname(out_path), f"_tmp_{fsio.basename(out_path)}")
        try:
            if fsio.exists(tmp):
                fsio.delete(tmp)
            df = make_df()
            df.write.mode("overwrite").parquet(tmp)
            if fault is not None:
                fault(unit)  # test hook: crash after write, before commit
            rows = self.spark.read.parquet(tmp).count()
            if fsio.exists(out_path):
                fsio.delete(out_path)
            fsio.rename(tmp, out_path)
            self._log(unit, attempt, "done", rows, int((time.time() - t0) * 1000))
        except Exception as e:  # noqa: BLE001 — log then re-raise: the audit trail is the point
            self._log(unit, attempt, "failed", 0, int((time.time() - t0) * 1000), f"{type(e).__name__}: {e}")
            raise

    def build(self, corpus: DataFrame, fault=None) -> None:
        """Full (resumable) build. `fault(unit)` is a test-only crash hook."""
        fsio.mkdirs(self.root)
        cfg = self.config
        ds = stats.doc_stats(corpus, cfg)
        self._stage("doc_stats", fsio.join(self.root, "doc_stats"), lambda: ds, fault)
        doc_stats_df = self.spark.read.parquet(fsio.join(self.root, "doc_stats"))
        meta = stats.corpus_meta(doc_stats_df)

        def meta_df():
            return self.spark.createDataFrame(
                [(meta["n_docs"], meta["avgdl"])], "n_docs long, avgdl double"
            )

        self._stage("meta", fsio.join(self.root, "meta"), meta_df, fault)

        postings = stats.postings(corpus, cfg).cache()
        self._stage(
            "term_stats",
            fsio.join(self.root, "term_stats"),
            lambda: stats.term_stats(postings, meta["n_docs"], cfg),
            fault,
        )

        seg_root = fsio.join(self.root, "segments")
        fsio.mkdirs(seg_root)
        n_shards = len(cfg.shard_boundaries)
        bands = max(1, min(int(self.slice_bands), cfg.n_slices))
        width = -(-cfg.n_slices // bands)  # ceil — last band may be narrower
        for shard in range(n_shards):
            for band in range(bands):
                lo, hi = band * width, min((band + 1) * width, cfg.n_slices)
                if lo >= hi:
                    continue
                if bands == 1:
                    unit = f"segments:shard={shard}"
                    out = fsio.join(seg_root, f"shard={shard}")
                    pred = F.col("shard") == shard
                else:
                    unit = f"segments:shard={shard}:band={band}"
                    out = fsio.join(seg_root, f"shard={shard}", f"band={band}")
                    pred = (
                        (F.col("shard") == shard)
                        & (F.col("slice") >= lo)
                        & (F.col("slice") < hi)
                    )
                self._stage(
                    unit,
                    out,
                    lambda p=pred: build_segments(
                        postings.filter(p), meta["avgdl"], cfg
                    ).drop("shard"),
                    fault,
                )
        postings.unpersist()

    # -- load ------------------------------------------------------------

    def load_index(self, corpus: DataFrame):
        from bitfunnel_spark.index import FullTextIndex

        meta = self.spark.read.parquet(fsio.join(self.root, "meta")).collect()[0]
        seg = self.spark.read.parquet(fsio.join(self.root, "segments"))
        if "band" in seg.columns:  # slice-band partition dirs (slice_bands > 1)
            seg = seg.drop("band")
        return FullTextIndex(
            spark=self.spark,
            config=self.config,
            corpus=corpus,
            doc_stats=self.spark.read.parquet(fsio.join(self.root, "doc_stats")),
            postings=stats.postings(corpus, self.config),
            term_stats=self.spark.read.parquet(fsio.join(self.root, "term_stats")),
            n_docs=meta["n_docs"],
            avgdl=meta["avgdl"],
            segments=self.spark.read.parquet(fsio.join(self.root, "segments")),
        )
