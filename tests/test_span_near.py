"""Unordered proximity (Lucene SpanNearQuery, in_order=false):
plans/serving.span_near vs the DuckDB position-join oracle, both the
positional-kernel path and the tokenized-corpus fallback."""

import pytest

from bitfunnel_spark.plans import serving
from bitfunnel_spark.plans.oracle import oracle_span_near_sql

CASES = [
    (["row", "scan"], 0),
    (["row", "scan"], 2),
    (["key", "table", "value"], 1),
    (["data", "fast"], 3),
    # span_or inside the near: a slot filled by ANY of its alternatives
    ([["row", "key"], "scan"], 1),
    ([["data", "fast"], ["key", "value"]], 2),
    (["table", ["row", "scan", "value"]], 1),
]


@pytest.fixture(scope="module")
def pos_index(spark, corpus):
    from bitfunnel_spark import BuildConfig, FullTextIndex

    return FullTextIndex.build_fused(
        spark, corpus, BuildConfig(n_slices=4, positions=True)
    )


def _run(index, terms, slop, k=12):
    return [
        (r["doc_id"], r["score"])
        for r in serving.span_near(index, terms, slop=slop, k=k).collect()
    ]


def _oracle(duck, terms, slop, k=12):
    return [
        (d, pytest.approx(s, abs=2e-4))
        for d, s in duck.execute(oracle_span_near_sql(terms, slop=slop, k=k)).fetchall()
    ]


@pytest.mark.parametrize("terms,slop", CASES)
def test_span_near_positional_vs_oracle(pos_index, duck, terms, slop):
    assert _run(pos_index, terms, slop) == _oracle(duck, terms, slop)


@pytest.mark.parametrize("terms,slop", CASES)
def test_span_near_fallback_vs_oracle(index, duck, terms, slop):
    # session index builds positions=False -> tokenized-corpus fallback
    assert _run(index, terms, slop) == _oracle(duck, terms, slop)


def test_span_near_unordered_superset_of_ordered(pos_index):
    # every doc the ORDERED sloppy phrase matches, the unordered span
    # matches too (same window bound, order constraint dropped)
    slop = 2
    ordered = {
        r["doc_id"] for r in pos_index.match('"row scan"~2').collect()
    }
    near = {
        r["doc_id"]
        for r in serving.span_near(pos_index, ["row", "scan"], slop=slop, k=10**6).collect()
    }
    assert ordered <= near


def test_span_near_errors(index):
    with pytest.raises(ValueError):
        serving.span_near(index, ["data"], slop=1)
    with pytest.raises(ValueError):
        serving.span_near(index, ["data", "data"], slop=1)
    with pytest.raises(ValueError):
        serving.span_near(index, ["a", "b", "c", "d"], slop=50)


def test_span_or_slot_is_union_of_plain_nears(pos_index):
    # match-set semantics: a doc fills ([a|b], c) iff it matches (a, c)
    # or (b, c) as plain span_nears with the same slop
    alt = {r["doc_id"] for r in serving.span_near(
        pos_index, [["row", "key"], "scan"], slop=1, k=10**6).collect()}
    a = {r["doc_id"] for r in serving.span_near(
        pos_index, ["row", "scan"], slop=1, k=10**6).collect()}
    b = {r["doc_id"] for r in serving.span_near(
        pos_index, ["key", "scan"], slop=1, k=10**6).collect()}
    assert alt == a | b


def test_span_or_dsl_routing_and_standalone(pos_index):
    from bitfunnel_spark.plans.dsl import DslError, search_dsl

    body = {"query": {"span_near": {"clauses": [
        {"span_or": {"clauses": [{"span_term": {"body": "row"}},
                                 {"span_term": {"body": "key"}}]}},
        {"span_term": {"body": "scan"}}], "slop": 1, "in_order": False}},
        "size": 12}
    got = [(r["doc_id"], r["score"]) for r in search_dsl(pos_index, body).collect()]
    assert got == _run(pos_index, [["row", "key"], "scan"], 1)
    # standalone span_or == the plain OR ranking (every occurrence is a span)
    so = [(r["doc_id"], r["score"]) for r in search_dsl(
        pos_index, {"query": {"span_or": {"clauses": [
            {"span_term": {"body": "row"}},
            {"span_term": {"body": "scan"}}]}}, "size": 8}).collect()]
    assert so == [(r["doc_id"], r["score"]) for r in
                  pos_index.search("row | scan", k=8).collect()]
    with pytest.raises(DslError, match="distinct"):
        search_dsl(pos_index, {"query": {"span_near": {"clauses": [
            {"span_or": {"clauses": [{"span_term": {"body": "row"}},
                                     {"span_term": {"body": "row"}}]}},
            {"span_term": {"body": "scan"}}], "slop": 1}}})
    with pytest.raises(DslError, match="in_order=false"):
        search_dsl(pos_index, {"query": {"span_near": {"clauses": [
            {"span_or": {"clauses": [{"span_term": {"body": "row"}},
                                     {"span_term": {"body": "key"}}]}},
            {"span_term": {"body": "scan"}}], "slop": 1, "in_order": True}}})


def test_span_or_cross_slot_distinctness(index):
    with pytest.raises(ValueError, match="distinct across slots"):
        serving.span_near(index, [["row", "scan"], "scan"], slop=1)
