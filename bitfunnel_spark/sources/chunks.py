"""Reference chunk-file corpus format — reader (source) + writer (sink).

Format (studied from /root/reference/src/Chunks/src/ChunkReader.cpp:38-199
and the sample corpus /root/reference/src/Data/src/Sonnets.cpp:36-60; clean
reimplementation, not a translation):

    file   := doc* '\\0'
    doc    := docid(16 lowercase hex) '\\0' stream* '\\0'
    stream := streamid(2 lowercase hex) '\\0' (token '\\0')* '\\0'

Stream ids in the reference corpora: 00 = body, 01 = title, 02 = url
(Sonnets.cpp:42,44,45). Canonical-corpus mapping used by
:func:`chunks_to_corpus`: body tokens (space-joined) → ``content``,
url → ``path``; title is preserved in the parsed form but has no canonical
column.

Scale design: chunk files are read distributed via Spark's ``binaryFile``
source (one row per file — the same unit the reference fans out to ingest
threads, ChunkEnumerator.cpp:31-55) and parsed inside ``mapInPandas``
(Arrow-batched; per-FILE python work, not per-row). The writer emits one
chunk file per partition — the manifest analogue.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

# (doc_id, {stream_id: [token, ...]})
ParsedDoc = tuple[int, dict[int, list[str]]]

BODY_STREAM, TITLE_STREAM, URL_STREAM = 0, 1, 2


def parse_chunk(data: bytes) -> list[ParsedDoc]:
    """Parse one chunk file's bytes. Raises ValueError on malformed input
    (the reader is strict, like the reference's FatalError paths)."""
    if not data:
        raise ValueError("empty chunk")
    # The grammar's only separator is NUL; split once and walk fields.
    if data[-1:] != b"\0":
        raise ValueError("chunk must end with NUL")
    fields = data.split(b"\0")
    # data ends with '\0' so split leaves a trailing '' sentinel; drop it
    fields.pop()
    pos = 0
    docs: list[ParsedDoc] = []
    while pos < len(fields):
        head = fields[pos]
        if head == b"":  # end-of-file marker
            if pos != len(fields) - 1:
                raise ValueError("data after end-of-file marker")
            return docs
        if len(head) != 16:
            raise ValueError(f"expected 16-hex docid, got {head!r}")
        doc_id = int(head, 16)
        pos += 1
        streams: dict[int, list[str]] = {}
        while pos < len(fields) and fields[pos] != b"":
            sid_field = fields[pos]
            if len(sid_field) != 2:
                raise ValueError(f"expected 2-hex streamid, got {sid_field!r}")
            sid = int(sid_field, 16)
            pos += 1
            toks: list[str] = []
            while pos < len(fields) and fields[pos] != b"":
                toks.append(fields[pos].decode("utf-8"))
                pos += 1
            if pos >= len(fields):
                raise ValueError("unterminated stream")
            pos += 1  # consume stream terminator
            streams[sid] = toks
        if pos >= len(fields):
            raise ValueError("unterminated document")
        pos += 1  # consume document terminator
        docs.append((doc_id, streams))
    raise ValueError("missing end-of-file marker")


def format_chunk(docs: Iterable[ParsedDoc]) -> bytes:
    """Inverse of :func:`parse_chunk` (the chunk-writer sink,
    ChunkWriters.cpp analogue)."""
    out = bytearray()
    for doc_id, streams in docs:
        out += f"{doc_id:016x}".encode() + b"\0"
        for sid, toks in streams.items():
            out += f"{sid:02x}".encode() + b"\0"
            for t in toks:
                out += t.encode("utf-8") + b"\0"
            out += b"\0"
        out += b"\0"
    out += b"\0"
    return bytes(out)


def read_chunks(spark: SparkSession, path: str) -> DataFrame:
    """Distributed chunk scan → (doc_id, stream_id, tokens) rows.

    One input row per chunk file (binaryFile source); parsing happens
    executor-side in mapInPandas.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for doc_id, streams in parse_chunk(bytes(content)):
                    for sid, toks in streams.items():
                        rows.append((doc_id, sid, toks))
            yield pd.DataFrame(rows, columns=["doc_id", "stream_id", "tokens"])

    return files.select("content").mapInPandas(
        parse, "doc_id long, stream_id int, tokens array<string>"
    )


def chunks_to_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Chunk files → the canonical corpus schema (doc_id, repo, path,
    commit, lang, content, content_sha256). body tokens are space-joined
    into `content`; re-tokenizing `content` with the engine tokenizer may
    differ from the chunk's token stream for tokens containing punctuation —
    exact-parity ingestion should index `read_chunks` output directly."""
    from pyspark.sql import functions as F

    rows = read_chunks(spark, path)
    body = rows.filter(F.col("stream_id") == BODY_STREAM).select(
        "doc_id", F.array_join("tokens", " ").alias("content")
    )
    url = rows.filter(F.col("stream_id") == URL_STREAM).select(
        "doc_id", F.array_join("tokens", " ").alias("path")
    )
    # Start from the full doc-id set: a document with no body stream (legal
    # per the grammar — e.g. title/url-only) must still survive the mapping,
    # with content coalesced to the empty string.
    ids = rows.select("doc_id").distinct()
    out = (
        ids.join(body, "doc_id", "left")
        .join(url, "doc_id", "left")
        .withColumn("content", F.coalesce(F.col("content"), F.lit("")))
    ).select(
        "doc_id",
        F.lit("chunk").alias("repo"),
        F.coalesce(F.col("path"), F.concat(F.lit("doc"), F.col("doc_id").cast("string"))).alias("path"),
        F.substring(F.sha2(F.col("content"), 256), 1, 40).alias("commit"),
        F.lit("txt").alias("lang"),
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )
    return out


def write_chunks(corpus: DataFrame, out_dir: str) -> int:
    """Canonical corpus → chunk files, one per partition (the manifest
    analogue). Returns the number of files written. Tokens are the engine
    tokenizer's output over `content`; `path` becomes the url stream.

    Executor-local writes — in cluster mode `out_dir` must be a shared
    filesystem (same contract as the reference's chunk output directory).
    """
    from pyspark.sql import functions as F

    from bitfunnel_spark.functions.tokenizer import tokenize

    os.makedirs(out_dir, exist_ok=True)
    toks = corpus.select(
        "doc_id", tokenize("content").alias("body"), tokenize("path").alias("url")
    )

    def write_partition(idx: int, it: Iterator) -> Iterator[int]:
        docs = [
            (int(r["doc_id"]), {BODY_STREAM: list(r["body"]), URL_STREAM: list(r["url"])})
            for r in it
        ]
        if not docs:
            return iter(())
        name = hashlib.md5(f"{idx}".encode()).hexdigest()[:8]
        with open(os.path.join(out_dir, f"chunk-{idx:05d}-{name}"), "wb") as f:
            f.write(format_chunk(docs))
        return iter((len(docs),))

    counts = toks.rdd.mapPartitionsWithIndex(write_partition).collect()
    return len(counts)
