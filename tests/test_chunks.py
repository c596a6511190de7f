"""Chunk-format source/sink: grammar round-trip, malformed input, Spark
read path, corpus mapping, sha256 invariant, write→read round-trip."""

import pytest

from bitfunnel_spark.sources.chunks import (
    BODY_STREAM,
    TITLE_STREAM,
    URL_STREAM,
    chunks_to_corpus,
    format_chunk,
    parse_chunk,
    read_chunks,
    write_chunks,
)

SAMPLE = [
    (1, {URL_STREAM: ["http://x/1"], TITLE_STREAM: ["alpha", "1"], BODY_STREAM: ["a", "b", "a"]}),
    (2, {URL_STREAM: ["http://x/2"], BODY_STREAM: ["c"]}),
    (0xDEADBEEF, {BODY_STREAM: []}),  # empty stream is legal
]


def test_round_trip():
    assert parse_chunk(format_chunk(SAMPLE)) == SAMPLE


def test_wire_bytes_exact():
    # grammar check against a hand-encoded doc (ChunkReader.cpp:38-199)
    data = b"0000000000000001\x00" b"00\x00" b"a\x00b\x00" b"\x00" b"\x00" b"\x00"
    assert parse_chunk(data) == [(1, {0: ["a", "b"]})]
    assert format_chunk([(1, {0: ["a", "b"]})]) == data


@pytest.mark.parametrize(
    "data",
    [
        b"",  # empty
        b"0000000000000001\x00",  # truncated doc
        b"xyz\x00\x00",  # bad docid
        b"0000000000000001\x00" b"0\x00\x00\x00" b"\x00",  # 1-char streamid
        b"0000000000000001\x00" b"00\x00a\x00\x00\x00",  # missing EOF marker
    ],
)
def test_malformed(data):
    with pytest.raises(ValueError):
        parse_chunk(data)


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunks")
    (d / "chunk0").write_bytes(format_chunk(SAMPLE[:2]))
    (d / "chunk1").write_bytes(format_chunk(SAMPLE[2:]))
    return str(d)


def test_read_chunks_spark(spark, chunk_dir):
    rows = read_chunks(spark, chunk_dir).collect()
    got = {(r["doc_id"], r["stream_id"]): list(r["tokens"]) for r in rows}
    assert got[(1, BODY_STREAM)] == ["a", "b", "a"]
    assert got[(1, TITLE_STREAM)] == ["alpha", "1"]
    assert got[(2, URL_STREAM)] == ["http://x/2"]
    assert got[(0xDEADBEEF, BODY_STREAM)] == []


def test_chunks_to_corpus(spark, chunk_dir):
    import hashlib

    out = {r["doc_id"]: r for r in chunks_to_corpus(spark, chunk_dir).collect()}
    assert out[1]["content"] == "a b a"
    assert out[1]["path"] == "http://x/1"
    assert out[0xDEADBEEF]["path"] == f"doc{0xDEADBEEF}"
    # per-row invariant: content sha256 equality
    assert out[2]["content_sha256"] == hashlib.sha256(b"c").hexdigest()


def test_write_read_round_trip(spark, corpus, tmp_path):
    out_dir = str(tmp_path / "out_chunks")
    small = corpus.filter("doc_id < 20").cache()
    n_files = write_chunks(small, out_dir)
    assert n_files >= 1
    back = read_chunks(spark, out_dir)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in back.filter(f"stream_id = {BODY_STREAM}").collect()
    }
    from bitfunnel_spark.functions.tokenizer import tokenize

    want = {
        r["doc_id"]: list(r["t"])
        for r in small.select("doc_id", tokenize("content").alias("t")).collect()
    }
    assert got == want


def test_bodyless_doc_survives(spark, tmp_path):
    """A document with no body stream (legal per the grammar) must survive
    chunks_to_corpus with content coalesced to the empty string."""
    d = tmp_path / "bodyless"
    d.mkdir()
    docs = [
        (7, {URL_STREAM: ["http://x/7"], TITLE_STREAM: ["only", "title"]}),
        (8, {BODY_STREAM: ["x", "y"]}),
    ]
    (d / "chunk0").write_bytes(format_chunk(docs))
    out = {r["doc_id"]: r for r in chunks_to_corpus(spark, str(d)).collect()}
    assert set(out) == {7, 8}
    assert out[7]["content"] == ""
    assert out[7]["path"] == "http://x/7"
    assert out[8]["content"] == "x y"
