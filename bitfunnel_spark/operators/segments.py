"""Posting-segment construction — the persisted index structure.

Design (SURVEY §7 stage D / north_star): postings are shuffled ONCE by
(shard, slice, term_bucket) and reduced into per-term sorted,
delta+varbyte-compressed blocks with per-block metadata (first/last doc for
range skipping, block-max BM25 partial for WAND pruning). This one shuffle
is the "tiered repartition-and-reduce merge": Spark's shuffle machinery IS
the tiered merge (map-side sort/spill → reduce-side merge), so we don't
hand-roll merge tiers.

Group-key choice (scale-critical): grouping by the full (term, stream,
shard, slice) would create one Arrow batch per term — millions of tiny
Python groups (measured 5× slower at sf0.1). Grouping by
(shard, slice, term_bucket) gives O(shards·slices·buckets) right-sized
groups; the per-term block encoding is a vectorized NumPy loop inside the
group. Raise n_slices/term_buckets with cluster size so the largest group
fits an executor.

Skew: slice is a hash of doc_id, so an ultra-common term ("def" in every
Python file) splits into n_slices independent groups — built-in salting.

Each posting also stores its BM25 partial
    partial = tf·(k1+1)/(tf + k1·(1−b+b·doclen/avgdl))
as float64 (score = idf · partial at query time). This denormalization
removes the per-query doc-table join entirely — the segment store is
self-sufficient for scoring, the way the reference's slice buffer is
self-sufficient for matching (/root/reference/src/Index/src/Slice.h:43-70).
The per-block max of partial is the block-max WAND bound (the analogue of
the reference's coarse rank-down rows, RankDownCompiler.cpp).

The segment table is partition-friendly for Iceberg/parquet: partition by
(shard, term_bucket) → a query's `term IN (...)` prunes partitions, and
parquet min/max stats on `term` prune row groups (rows are written
term-clustered).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bitfunnel_spark.config import BuildConfig
from bitfunnel_spark.operators.codec import encode_postings, varbyte_encode

SEGMENT_SCHEMA = (
    "term string, stream string, shard int, slice int, term_bucket int, "
    "block_id int, n int, first_doc long, last_doc long, max_partial double, "
    "docs_vb binary, tfs_vb binary, partials binary"
)
_SEGMENT_COLS = [
    "term", "stream", "shard", "slice", "term_bucket", "block_id",
    "n", "first_doc", "last_doc", "max_partial", "docs_vb", "tfs_vb", "partials",
]


def _term_bucket_py(term: str, term_buckets: int) -> int:
    """Stable, engine-independent bucket: first 8 hex chars of md5 mod B.

    (Not xxhash64: the driver-side planner must compute the same bucket for
    partition pruning, and md5 is identical everywhere.)
    """
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % term_buckets


def term_bucket_col(term_col, term_buckets: int):
    """Spark-side mirror of :func:`_term_bucket_py` (md5 hex → int mod B)."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long") % term_buckets
    ).cast("int")


def _encode_group(pdf: pd.DataFrame, block_size: int, k1: float, b: float, avgdl: float) -> pd.DataFrame:
    """Encode all terms of one (shard, slice, term_bucket) group.

    Vectorized: one sort of the whole group, partials computed for the whole
    group in one shot, then a per-term slice loop emitting blocks.
    """
    shard = int(pdf["shard"].iloc[0])
    slc = int(pdf["slice"].iloc[0])
    bucket = int(pdf["term_bucket"].iloc[0])
    pdf = pdf.sort_values(["term", "stream", "doc_id"], kind="stable")
    docs_all = pdf["doc_id"].to_numpy().astype(np.int64)
    tfs_all = pdf["tf"].to_numpy().astype(np.int64)
    dls_all = pdf["doclen"].to_numpy().astype(np.float64)
    partial_all = tfs_all * (k1 + 1.0) / (tfs_all + k1 * (1.0 - b + b * dls_all / avgdl))
    keys = (pdf["term"] + "\x00" + pdf["stream"]).to_numpy()
    # boundaries of each (term, stream) run
    change = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
    bounds = np.concatenate((change, [len(keys)]))
    terms = pdf["term"].to_numpy()
    streams = pdf["stream"].to_numpy()
    rows = []
    for gi in range(len(change)):
        lo, hi = bounds[gi], bounds[gi + 1]
        term, stream = terms[lo], streams[lo]
        for bid, start in enumerate(range(lo, hi, block_size)):
            end = min(start + block_size, hi)
            d = docs_all[start:end]
            t = tfs_all[start:end]
            p = partial_all[start:end]
            rows.append(
                (
                    term, stream, shard, slc, bucket, bid, end - start,
                    int(d[0]), int(d[-1]), float(p.max()),
                    encode_postings(d.astype(np.uint64)),
                    varbyte_encode(t.astype(np.uint64)),
                    p.tobytes(),
                )
            )
    return pd.DataFrame(rows, columns=_SEGMENT_COLS)


def build_segments(postings: DataFrame, avgdl: float, config: BuildConfig) -> DataFrame:
    """postings (term, stream, doc_id, tf, doclen, shard, slice) → segment blocks.

    One shuffle (the applyInPandas groupBy); encoding is Arrow-batched NumPy.
    """
    bm = config.bm25
    bs = config.block_size
    k1, b = bm.k1, bm.b

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, bs, k1, b, avgdl)

    withb = postings.withColumn("term_bucket", term_bucket_col(F.col("term"), config.term_buckets))
    return withb.groupBy("shard", "slice", "term_bucket").applyInPandas(fn, SEGMENT_SCHEMA)


def write_segments(segments: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist partitioned by (shard, term_bucket): a query's term filter
    prunes partitions; within a file, parquet min/max stats on `term` prune
    row groups (rows are written term-clustered)."""
    (
        segments.repartition("shard", "term_bucket")
        .sortWithinPartitions("term", "stream", "slice", "block_id")
        .write.mode(mode)
        .partitionBy("shard", "term_bucket")
        .parquet(path)
    )


def read_segments(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def decode_group(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate a term's blocks (block_id-ordered) → (docs, tfs, partials)."""
    from bitfunnel_spark.operators.codec import decode_postings, varbyte_decode

    rows = rows.sort_values("block_id")
    docs = [decode_postings(bytes(x)) for x in rows["docs_vb"]]
    tfs = [varbyte_decode(bytes(x)) for x in rows["tfs_vb"]]
    parts = [np.frombuffer(bytes(x), dtype=np.float64) for x in rows["partials"]]
    if not docs:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.float64)
    d = np.concatenate(docs).astype(np.int64)
    t = np.concatenate(tfs).astype(np.int64)
    p = np.concatenate(parts)
    if d.size > 1 and np.any(np.diff(d) < 0):
        # blocks from streaming increments interleave doc ranges — re-sort
        # (compaction restores monotone blocks; see streaming/ingest.py)
        order = np.argsort(d, kind="stable")
        d, t, p = d[order], t[order], p[order]
    return d, t, p
