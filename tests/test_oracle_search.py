"""End-to-end engine-vs-oracle verification on the real testdata documents
table — the pattern of the reference's VerifyOneQuery
(/root/reference/src/Plan/src/VerifyOneQuery.cpp:47-125): independent
brute-force evaluation (DuckDB) vs the engine, demanding exact equality
(zero FP / zero FN — our index is exact, unlike the signature reference)."""

import pytest

from bitfunnel_spark.plans.oracle import oracle_match_sql, oracle_search_sql

QUERIES = [
    "data",
    "vector",
    "the fast",
    "spark & join",
    "data -slow",
    "dup | vector",
    "(dup | vector) join",
    "lang:en data",
    "repo:src3 key",
    "path:txt data",
    '"batch batch"',
    '"fast key order"',
    'data -"slow sort"',
    "customer window -stream",
    "nonexistenttoken | data",
]


@pytest.mark.parametrize("q", QUERIES)
def test_match_set_vs_oracle(index, duck, q):
    got = sorted(r["doc_id"] for r in index.match(q).collect())
    exp = [r[0] for r in duck.execute(oracle_match_sql(q)).fetchall()]
    assert got == exp, f"match set mismatch for {q!r}"


@pytest.mark.parametrize("q", QUERIES)
def test_topk_vs_oracle(index, duck, q):
    got = [(r["doc_id"], r["score"]) for r in index.search(q, k=10).collect()]
    exp = duck.execute(oracle_search_sql(q, k=10)).fetchall()
    assert [(d, pytest.approx(s, abs=2e-4)) for d, s in exp] == got, f"top-k mismatch for {q!r}"


def test_match_count_sanity(index, duck):
    # every doc contains at least one of the most common tokens
    n_docs = index.n_docs
    got = index.match("data | the | a | line | key | row | join | value | group | table").count()
    assert 0 < got <= n_docs
