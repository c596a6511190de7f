"""Fused single-shuffle build ≡ wordcount-postings build.

The fused path (segments.build_segments_fused + statistics.
term_stats_from_segments) must produce byte-identical segment blocks and an
identical term dictionary to the two-shuffle postings path, and identical
search results.
"""

import pytest

from bitfunnel_spark import BuildConfig, FullTextIndex


@pytest.fixture(scope="module")
def fused(spark, corpus):
    return FullTextIndex.build_fused(spark, corpus, BuildConfig(n_slices=4))


def _seg_key(r):
    return (r["term_key"], r["shard"], r["slice"], r["block_id"])


def test_segments_identical(index, fused):
    base = index.build_segments() if index.segments is None else index.segments
    a = {_seg_key(r): r for r in base.collect()}
    b = {_seg_key(r): r for r in fused.segments.collect()}
    assert set(a) == set(b)
    for k, ra in a.items():
        rb = b[k]
        assert bytes(ra["docs_vb"]) == bytes(rb["docs_vb"]), k
        assert bytes(ra["tfs_vb"]) == bytes(rb["tfs_vb"]), k
        assert bytes(ra["partials"]) == bytes(rb["partials"]), k
        assert ra["n"] == rb["n"] and ra["first_doc"] == rb["first_doc"], k
        assert ra["last_doc"] == rb["last_doc"], k
        assert abs(ra["max_partial"] - rb["max_partial"]) < 1e-12, k


def test_term_stats_identical(index, fused):
    a = {(r["term"], r["stream"]): (r["df"], round(r["idf"], 10), r["idf_x10"], r["treatment"])
         for r in index.term_stats.collect()}
    b = {(r["term"], r["stream"]): (r["df"], round(r["idf"], 10), r["idf_x10"], r["treatment"])
         for r in fused.term_stats.collect()}
    assert a == b


@pytest.mark.parametrize("q", ["data fast", "data -slow", "dup | vector", "lang:en data", '"batch batch"'])
def test_search_identical(index, fused, q):
    a = [(r["doc_id"], r["score"]) for r in index.search(q, k=10, mode="kernel").collect()]
    b = [(r["doc_id"], r["score"]) for r in fused.search(q, k=10, mode="kernel").collect()]
    assert a == b
