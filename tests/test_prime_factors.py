"""Analytic property tests on the prime-factors corpus — the reference's
PrimeFactors trick (/root/reference/src/Mocks/src/PrimeFactorsDocument.cpp:52-70,
VerifyOneQuerySynthetic.cpp:49-110): doc d contains term p{f} per prime
factor f of d (with multiplicity), so exact match sets AND exact BM25 scores
are computable in closed form. Stricter than the reference: zero false
positives and zero false negatives (our index is exact)."""

import math

import pytest

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.sources.corpus import prime_factors_corpus

MAX_DOC = 400  # keep the fixture fast; factorization is trivially known


def factors(d):
    out, n, f = [], d, 2
    while f * f <= n:
        while n % f == 0:
            out.append(f)
            n //= f
        f += 1
    if n > 1:
        out.append(n)
    return out


@pytest.fixture(scope="module")
def pf_index(spark):
    corpus = prime_factors_corpus(spark, MAX_DOC).cache()
    return FullTextIndex.build(spark, corpus, BuildConfig(n_slices=2))


def match_set(pf_index, query):
    return {r["doc_id"] for r in pf_index.match(query).collect()}


def expected_docs(pred):
    return {d for d in range(1, MAX_DOC + 1) if pred(set(factors(d)))}


def test_and(pf_index):
    assert match_set(pf_index, "p2 p3") == expected_docs(lambda f: {2, 3} <= f)


def test_or(pf_index):
    assert match_set(pf_index, "p5 | p7") == expected_docs(lambda f: 5 in f or 7 in f)


def test_not(pf_index):
    assert match_set(pf_index, "p2 -p3") == expected_docs(lambda f: 2 in f and 3 not in f)


def test_nested(pf_index):
    assert match_set(pf_index, "(p2 | p3) -p5 p7") == expected_docs(
        lambda f: (2 in f or 3 in f) and 5 not in f and 7 in f
    )


def test_absent_term(pf_index):
    assert match_set(pf_index, "p9999991") == set()
    assert match_set(pf_index, "p2 p9999991") == set()
    assert match_set(pf_index, "p2 | p9999991") == expected_docs(lambda f: 2 in f)


def test_phrase_adjacency(pf_index):
    # content for d = "p2 p2 p3" style: factors ascending with multiplicity.
    # "p2 p3" adjacent iff content has ...p2 p3... — i.e. 2 and 3 both divide d
    # and the last 2 is immediately followed by the first 3 (always true when
    # both present, since factors are emitted sorted with multiplicity).
    got = match_set(pf_index, '"p2 p3"')
    assert got == expected_docs(lambda f: {2, 3} <= f)
    # "p3 p2" is never adjacent (ascending order) → empty
    assert match_set(pf_index, '"p3 p2"') == set()


def test_bm25_scores_closed_form(pf_index):
    """Exact BM25 for query `p2 p3`, computed in closed form."""
    k1, b = 1.2, 0.75
    n = MAX_DOC
    dls = {d: max(len(factors(d)), 1) for d in range(1, n + 1)}  # doc 1 has token "one"
    avgdl = sum(dls.values()) / n
    df2 = sum(1 for d in range(1, n + 1) if 2 in factors(d))
    df3 = sum(1 for d in range(1, n + 1) if 3 in factors(d))

    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def score(d):
        fs = factors(d)
        s = 0.0
        for p, dfp in ((2, df2), (3, df3)):
            tf = fs.count(p)
            s += idf(dfp) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        return round(s, 4)

    exp_docs = sorted(expected_docs(lambda f: {2, 3} <= f))
    expected = sorted(((score(d), d) for d in exp_docs), key=lambda x: (-x[0], x[1]))[:10]
    got = [(r["score"], r["doc_id"]) for r in pf_index.search("p2 p3", k=10).collect()]
    assert [(pytest.approx(s, abs=1e-4), d) for s, d in expected] == got


def test_sha256_invariant(pf_index):
    """content_sha256 survives the pipeline end-to-end (input_hint)."""
    from pyspark.sql import functions as F

    bad = (
        pf_index.doc_stats.join(pf_index.corpus.select("doc_id", "content"), "doc_id")
        .filter(F.sha2("content", 256) != F.col("content_sha256"))
        .count()
    )
    assert bad == 0
