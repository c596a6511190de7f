"""Position-level exclusion (Lucene SpanNotQuery): plans/serving.span_not
vs the DuckDB position oracle, both the positional-kernel path and the
tokenized-corpus fallback, plus hand-planted semantics cases."""

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.plans import serving
from bitfunnel_spark.plans.oracle import oracle_span_not_sql

CASES = [
    (["data"], "slow", 2, 2),
    (["data"], "slow", 8, 8),
    (["key", "value"], "table", 1, 1),
    (["row"], "scan", 0, 0),
]


@pytest.fixture(scope="module")
def pos_index(spark, corpus):
    from bitfunnel_spark import BuildConfig, FullTextIndex

    return FullTextIndex.build_fused(
        spark, corpus, BuildConfig(n_slices=4, positions=True)
    )


def _run(index, include, exclude, pre, post, k=12):
    return [
        (r["doc_id"], r["score"])
        for r in serving.span_not(index, include, exclude, pre=pre, post=post, k=k).collect()
    ]


def _oracle(duck, include, exclude, pre, post, k=12):
    return [
        (d, pytest.approx(s, abs=2e-4))
        for d, s in duck.execute(
            oracle_span_not_sql(include, exclude, pre=pre, post=post, k=k)
        ).fetchall()
    ]


@pytest.mark.parametrize("include,exclude,pre,post", CASES)
def test_span_not_positional_vs_oracle(pos_index, duck, include, exclude, pre, post):
    assert _run(pos_index, include, exclude, pre, post) == _oracle(
        duck, include, exclude, pre, post
    )


@pytest.mark.parametrize("include,exclude,pre,post", CASES)
def test_span_not_fallback_vs_oracle(index, duck, include, exclude, pre, post):
    # session index builds positions=False -> tokenized-corpus fallback
    assert _run(index, include, exclude, pre, post) == _oracle(
        duck, include, exclude, pre, post
    )


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        # phrase "alpha beta" with "bad" 2 after the end -> killed at post>=2
        (1, "alpha beta x bad filler filler filler"),
        # "bad" 1 before the start -> killed at pre>=1
        (2, "bad alpha beta filler filler filler filler"),
        # two occurrences: first killed, second clean -> survives
        (3, "bad alpha beta filler alpha beta clean filler"),
        # no exclude anywhere -> survives trivially
        (4, "alpha beta clean filler filler filler filler"),
        # exclude INSIDE the phrase window is impossible for adjacent
        # phrase, but directly after end (post=1) kills
        (5, "alpha beta bad filler filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from bitfunnel_spark import BuildConfig, FullTextIndex
    from bitfunnel_spark.sources.corpus import corpus_from_documents

    corpus = corpus_from_documents(
        df.select("doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"))
    )
    return FullTextIndex.build_fused(
        spark, corpus, BuildConfig(n_slices=2, positions=True)
    )


def test_span_not_semantics(planted):
    def ids(pre, post):
        return sorted(
            r["doc_id"]
            for r in serving.span_not(
                planted, ["alpha", "beta"], "bad", pre=pre, post=post, k=10
            ).collect()
        )

    # window 0/0: exclude never coincides with the phrase tokens -> all docs
    assert ids(0, 0) == [1, 2, 3, 4, 5]
    # post=1: kills doc 5 (bad right after end); doc 1's bad is 2 after
    assert ids(0, 1) == [1, 2, 3, 4]
    # post=2: kills doc 1 as well
    assert ids(0, 2) == [2, 3, 4]
    # pre=1 too: kills doc 2's only occurrence; doc 3 survives via its
    # second, clean occurrence
    assert ids(1, 2) == [3, 4]


def test_span_not_finer_than_boolean_not(planted):
    # boolean -bad drops every doc containing bad anywhere (1,2,3,5);
    # span_not keeps docs whose phrase occurrence is merely far from it
    boolean = sorted(r["doc_id"] for r in planted.match('"alpha beta" -bad').collect())
    assert boolean == [4]
    spans = sorted(
        r["doc_id"]
        for r in serving.span_not(planted, ["alpha", "beta"], "bad", pre=1, post=2, k=10).collect()
    )
    assert spans == [3, 4]


def test_span_not_validation(planted):
    with pytest.raises(ValueError):
        serving.span_not(planted, [], "bad")
    with pytest.raises(ValueError):
        serving.span_not(planted, ["a", "a"], "bad")
    with pytest.raises(ValueError):
        serving.span_not(planted, ["alpha"], "alpha")
    with pytest.raises(ValueError):
        serving.span_not(planted, ["alpha"], "bad", pre=-1)
