"""Posting-segment construction — the persisted index structure.

Design (SURVEY §7 stage D / north_star): postings are shuffled ONCE by
(term, stream, shard, slice) and reduced into sorted, delta+varbyte-
compressed blocks with per-block metadata (first/last doc for range
skipping, block-max BM25 partial for WAND pruning). This one shuffle is the
"tiered repartition-and-reduce merge": Spark's shuffle machinery IS the
tiered merge (map-side sort/spill → reduce-side merge), so we don't
hand-roll merge tiers.

Skew: the group key *includes slice* (a hash of doc_id), so an ultra-common
term ("def" in every Python file) splits into n_slices independent reduce
groups — built-in salting; at cluster scale raise n_slices so the densest
(term, slice) group fits an executor.

The segment table schema is partition-friendly for Iceberg/parquet:
partition by (shard, term_bucket) → a query's `term IN (...)` prunes both
via partition pruning + min/max stats. The analogue in the reference is the
Slice buffer layout (/root/reference/src/Index/src/Slice.h:43-70) and
RowTable memory layout (RowTableDescriptor.h:36-48) — fixed bit-matrix
there, compressed blocks here, same role: the thing queries mmap/scan.

Per-block max_partial stores max over the block of
tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) — multiply by idf at query time to get
the block's BM25 upper bound (block-max WAND; the analogue of the
reference's coarse rank-down rows, RankDownCompiler.cpp).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bitfunnel_spark.config import BuildConfig
from bitfunnel_spark.operators.codec import encode_postings, varbyte_encode

SEGMENT_SCHEMA = (
    "term string, stream string, shard int, slice int, term_bucket int, "
    "block_id int, n int, first_doc long, last_doc long, max_partial double, "
    "docs_vb binary, tfs_vb binary"
)


def _encode_group(pdf: pd.DataFrame, block_size: int, k1: float, b: float, avgdl: float, term_buckets: int) -> pd.DataFrame:
    term = pdf["term"].iloc[0]
    stream = pdf["stream"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    slc = int(pdf["slice"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    docs = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["doclen"].to_numpy()[order].astype(np.float64)
    partial = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    bucket = _term_bucket_py(term, term_buckets)
    rows = []
    for bid, start in enumerate(range(0, len(docs), block_size)):
        d = docs[start : start + block_size]
        t = tfs[start : start + block_size]
        p = partial[start : start + block_size]
        rows.append(
            (
                term, stream, shard, slc, bucket, bid, len(d),
                int(d[0]), int(d[-1]), float(p.max()),
                encode_postings(d.astype(np.uint64)),
                varbyte_encode(t.astype(np.uint64)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "term", "stream", "shard", "slice", "term_bucket", "block_id",
            "n", "first_doc", "last_doc", "max_partial", "docs_vb", "tfs_vb",
        ],
    )


def _term_bucket_py(term: str, term_buckets: int) -> int:
    """Stable, engine-independent bucket: first 8 hex chars of md5 mod B.

    (Not xxhash64: Python must compute the same bucket driver-side for
    pruning, and md5 is identical everywhere.)
    """
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % term_buckets


def term_bucket_col(term_col, term_buckets: int):
    """Spark-side mirror of :func:`_term_bucket_py` (md5 hex → int mod B)."""
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long") % term_buckets
    ).cast("int")


def build_segments(postings: DataFrame, avgdl: float, config: BuildConfig) -> DataFrame:
    """postings (term, stream, doc_id, tf, doclen, shard, slice) → segment blocks.

    One shuffle (the applyInPandas groupBy); encoding is Arrow-batched NumPy.
    """
    bm = config.bm25
    bs, tb = config.block_size, config.term_buckets
    k1, b = bm.k1, bm.b

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, bs, k1, b, avgdl, tb)

    return postings.groupBy("term", "stream", "shard", "slice").applyInPandas(fn, SEGMENT_SCHEMA)


def write_segments(segments: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist partitioned by (shard, term_bucket): a query's term filter
    prunes partitions; within a file, parquet min/max stats on `term` prune
    row groups (lists are written clustered by term)."""
    (
        segments.repartition("shard", "term_bucket")
        .sortWithinPartitions("term", "stream", "slice", "block_id")
        .write.mode(mode)
        .partitionBy("shard", "term_bucket")
        .parquet(path)
    )


def read_segments(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def decode_group(rows: list[dict] | pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a term's blocks (must be block_id-ordered) → (docs, tfs)."""
    from bitfunnel_spark.operators.codec import decode_postings, varbyte_decode

    if isinstance(rows, pd.DataFrame):
        docs_bufs = rows["docs_vb"].tolist()
        tf_bufs = rows["tfs_vb"].tolist()
    else:
        docs_bufs = [r["docs_vb"] for r in rows]
        tf_bufs = [r["tfs_vb"] for r in rows]
    docs = [decode_postings(bytes(x)) for x in docs_bufs]
    tfs = [varbyte_decode(bytes(x)) for x in tf_bufs]
    if not docs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (
        np.concatenate(docs).astype(np.int64),
        np.concatenate(tfs).astype(np.int64),
    )
