"""Skew-guard validation (SCALE.md "what breaks first" #4): with injected
boilerplate skew — the realistic 100 TB case being license headers shared by
most source files — the absolute df caps must (a) collapse the self-join
cost by orders of magnitude and (b) lose NO true near-duplicate pairs, which
share many rare shingles besides the boilerplate.

Why the caps are absolute counts, not corpus-relative fractions: a join key
with df = d costs d² candidate pairs regardless of corpus size, so the
per-key budget is scale-invariant; a relative cap (say 0.1%) would admit
df = 10^6 keys at 10^9 docs — 10^12 pairs from ONE key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.analytics import term_correlation
from bitfunnel_spark.operators.dedup import ngram_jaccard_pairs, shingle_sets

BOILER = "copyright acme corp all rights reserved licensed under apache"


@pytest.fixture(scope="module")
def skewed(spark):
    """600 docs, 80% starting with the same license boilerplate, plus three
    planted near-dup pairs whose distinctive text dominates their shingles."""
    rows = []
    for i in range(600):
        body = " ".join(f"tok{i}x{j} unique{i} word{(i * 7 + j) % 997}" for j in range(12))
        text = (BOILER + " " + body) if i % 5 != 4 else body
        rows.append((i, text))
    for a, b in [(1000, 1001), (1002, 1003), (1004, 1005)]:
        dup = " ".join(f"dup{a}w{j} shared{j} payload{j * 3}" for j in range(20))
        rows.append((a, BOILER + " " + dup))
        rows.append((b, BOILER + " " + dup + " trailing bit"))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _join_cost(df, cap):
    sdf = shingle_sets(df, "text", "doc_id", 3).groupBy("shingle").agg(
        F.count("*").alias("sdf")
    )
    kept = sdf if cap is None else sdf.filter(F.col("sdf") <= cap)
    return kept.agg(F.sum(F.col("sdf") * F.col("sdf"))).collect()[0][0]


def test_cap_collapses_join_cost_without_losing_neardups(spark, skewed):
    uncapped = _join_cost(skewed, None)
    capped = _join_cost(skewed, 100)
    # boilerplate shingles sit in ~480 docs: each costs ~230k pairs uncapped
    assert uncapped > 20 * capped
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(skewed, threshold=0.5, max_shingle_df=None)
        .select("doc_a", "doc_b").collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(skewed, threshold=0.5, max_shingle_df=100)
        .select("doc_a", "doc_b").collect()
    }
    planted = {(1000, 1001), (1002, 1003), (1004, 1005)}
    assert planted <= exact
    assert planted <= guarded  # the cut cannot lose true near-dups
    assert guarded <= exact  # guard only removes, never invents


def test_term_correlation_guard_drops_only_boilerplate_pairs(spark, skewed):
    """max_df removes pairs involving boilerplate terms; correlations among
    rare terms are untouched (same rows in both runs)."""
    from bitfunnel_spark.config import BuildConfig
    from bitfunnel_spark.operators import statistics as stats

    corpus = skewed.select(
        "doc_id", F.lit("r").alias("repo"), F.lit("p").alias("path"),
        F.lit("c").alias("commit"), F.lit("en").alias("lang"),
        F.col("text").alias("content"), F.sha2("text", 256).alias("content_sha256"),
    )
    postings = stats.postings(corpus, BuildConfig(n_slices=2)).cache()
    exact = term_correlation(postings, max_df=None)
    guarded = term_correlation(postings, max_df=100)
    boiler_terms = set(BOILER.split())
    exact_rare = {
        (r["term_a"], r["term_b"], r["n_docs"])
        for r in exact.collect()
        if r["term_a"] not in boiler_terms and r["term_b"] not in boiler_terms
    }
    got = {(r["term_a"], r["term_b"], r["n_docs"]) for r in guarded.collect()}
    assert got == exact_rare
