"""Persisted serve dictionary (statistics.write_dictionary): past the
driver-resident cap, per-query idf comes from a bucket-partitioned point
lookup — results identical to the in-memory map, and the physical read
touches only the queried buckets' partition directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.operators import statistics as stats
from bitfunnel_spark.operators.segments import _term_bucket_py, _term_key_py

CFG = BuildConfig(n_slices=2)


@pytest.fixture(scope="module")
def env(spark, corpus, tmp_path_factory):
    small = corpus.filter("doc_id < 200").cache()
    idx = FullTextIndex.build_fused(spark, small, CFG)
    path = str(tmp_path_factory.mktemp("dict") / "dictionary")
    stats.write_dictionary(idx.key_stats, path, CFG)
    return {"idx": idx, "path": path, "corpus": small}


def test_lookup_matches_driver_map(spark, env):
    base = env["idx"].idf_for_terms({("body", "data"), ("body", "the")})
    assert base  # driver-map path resolved something
    over = FullTextIndex.build_fused(spark, env["corpus"], CFG)
    over.key_stats = stats.read_dictionary(spark, env["path"])
    over.IDF_MAP_MAX_TERMS = 0  # force the past-cap serve path
    got = over.idf_for_terms({("body", "data"), ("body", "the")})
    assert over._idf_map_over_limit  # the fallback actually engaged
    assert got == pytest.approx(base)


def test_search_identical_past_cap(spark, env):
    want = env["idx"].search("data the", k=5, mode="kernel").collect()
    over = FullTextIndex.build_fused(spark, env["corpus"], CFG)
    over.key_stats = stats.read_dictionary(spark, env["path"])
    over.IDF_MAP_MAX_TERMS = 0
    got = over.search("data the", k=5, mode="kernel").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_lookup_prunes_to_queried_buckets(spark, env):
    """The physical lookup must open only the queried buckets' partition
    directories (directory pruning), not scan the dictionary."""
    key = _term_key_py("body", "data")
    bucket = _term_bucket_py(key, CFG.term_buckets)
    lookup = stats.read_dictionary(spark, env["path"]).filter(
        F.col("term_bucket").isin([bucket]) & F.col("term_key").isin([key])
    )
    files = [r[0] for r in lookup.select(F.input_file_name()).distinct().collect()]
    assert files  # the term exists
    assert all(f"term_bucket={bucket}/" in f for f in files)
