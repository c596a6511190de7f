"""Query generator (reference QueryGenerator.cpp parity)."""

from __future__ import annotations

import pytest

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.plans.generator import generate_queries, generate_query_log


@pytest.fixture(scope="module")
def built(spark, corpus):
    return FullTextIndex.build(spark, corpus.filter("doc_id < 120"), BuildConfig())


def test_deterministic(built):
    a = generate_queries(built.term_stats, 10, 2, seed=7)
    b = generate_queries(built.term_stats, 10, 2, seed=7)
    assert a == b
    assert len(a) == 10
    assert all(len(q.split(" ")) == 2 for q in a)


def test_seed_varies(built):
    a = generate_queries(built.term_stats, 10, 2, seed=1)
    b = generate_queries(built.term_stats, 10, 2, seed=2)
    assert a != b


def test_terms_come_from_vocabulary(built):
    vocab = {
        r["term"]
        for r in built.term_stats.filter("stream = 'body'").select("term").collect()
    }
    for q in generate_queries(built.term_stats, 20, 3, seed=3):
        for t in q.split(" "):
            assert t in vocab


def test_generated_queries_run(built):
    """Every generated query must parse and execute on the index it came
    from (the point of sampling the index's own vocabulary)."""
    for q in generate_query_log(built.term_stats, 8, seed=5):
        built.search(q, k=3, mode="kernel").collect()


def test_log_mix(built):
    log = generate_query_log(built.term_stats, 20, seed=9)
    assert len(log) == 20
    lens = sorted({len(q.split(" ")) for q in log})
    assert lens[0] == 1 and lens[-1] >= 3  # mixed lengths present


def test_empty_inputs(built, spark):
    assert generate_queries(built.term_stats, 0, 2) == []
    empty = built.term_stats.filter("stream = 'nope'")
    assert generate_queries(empty, 5, 2) == []
