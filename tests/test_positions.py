"""Positional postings: encode/decode round trip and phrase parity.

The positions index must give phrase results identical to the corpus-scan
path (the correctness anchor) and the DataFrame executor, for single,
batched, and match queries.
"""

import numpy as np
import pytest

from bitfunnel_spark import BuildConfig, FullTextIndex
from bitfunnel_spark.functions.tokenizer import tokenize
from bitfunnel_spark.operators.segments import decode_group_positions

PHRASES = ['"batch batch"', '"fast key order"', 'data "key value"']


@pytest.fixture(scope="module")
def pos_index(spark, corpus):
    return FullTextIndex.build_fused(spark, corpus, BuildConfig(n_slices=4, positions=True))


def test_positions_round_trip(spark, corpus, pos_index):
    """Decoded positions must equal the token offsets recomputed from the
    corpus for a handful of terms."""
    from pyspark.sql import functions as F

    seg = pos_index.segments.filter("stream = 'body' AND term IN ('data', 'batch')")
    pdf = seg.toPandas()
    got: dict = {}
    for term, rows in pdf.groupby("term"):
        for (_, _), sub in rows.groupby(["shard", "slice"]):
            d, t, p = decode_group_positions(sub)
            bounds = np.concatenate(([0], np.cumsum(t)))
            for i, doc in enumerate(d):
                got[(term, int(doc))] = list(p[bounds[i] : bounds[i + 1]])
    toks = corpus.select("doc_id", tokenize("content").alias("t")).collect()
    for r in toks:
        for term in ("data", "batch"):
            want = [i for i, x in enumerate(r["t"]) if x == term]
            if want:
                assert got.get((term, r["doc_id"])) == want, (term, r["doc_id"])


@pytest.mark.parametrize("q", PHRASES)
def test_phrase_search_parity(index, pos_index, q):
    base = [(r["doc_id"], r["score"]) for r in index.search(q, k=10, mode="kernel").collect()]
    pos = [(r["doc_id"], r["score"]) for r in pos_index.search(q, k=10, mode="kernel").collect()]
    df = [(r["doc_id"], r["score"]) for r in pos_index.search(q, k=10, mode="dataframe").collect()]
    assert pos == base
    assert df == base


@pytest.mark.parametrize("q", ['"batch batch"', '-"batch batch" batch'])
def test_phrase_match_parity(index, pos_index, q):
    base = sorted(r["doc_id"] for r in index.match(q).collect())
    pos = sorted(r["doc_id"] for r in pos_index.match(q).collect())
    assert pos == base


def test_phrase_batch_parity(index, pos_index):
    base = {
        (r["query_id"], r["doc_id"], r["score"])
        for r in index.search_many(PHRASES, k=10).collect()
    }
    pos = {
        (r["query_id"], r["doc_id"], r["score"])
        for r in pos_index.search_many(PHRASES, k=10).collect()
    }
    assert pos == base


def test_no_positions_raises(index):
    """A segment store built without positions must fail loudly, not return
    wrong phrase results."""
    if index.segments is None:
        index.build_segments()
    rows = index.segments.filter("stream = 'body' AND term = 'data'").limit(3).toPandas()
    if len(rows) and int(rows["n"].sum()) > 0:
        with pytest.raises(ValueError):
            decode_group_positions(rows)