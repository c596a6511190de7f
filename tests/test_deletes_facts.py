"""Soft-delete tombstones + user-defined fact sets.

The reference ANDs a "document active" system row into every query
(Row.h:34-35) and exposes named per-doc boolean facts (IFactSet.h); ours:
a tombstone doc-id set masked in both executors, and fact doc-sets ANDed
into the match. Deleting a top-k doc must change the result to the oracle
of the filtered corpus (with epoch-frozen stats); facts must restrict both
paths identically.
"""

import dataclasses

import pytest
from pyspark.sql import functions as F


def _top(index, q, k=10, mode="kernel", facts=None):
    return [
        (r["doc_id"], r["score"])
        for r in index.search(q, k=k, mode=mode, facts=facts).collect()
    ]


@pytest.mark.parametrize("q", ["data fast", "dup | vector", '"batch batch"', "data -slow"])
def test_delete_top_doc_changes_results(index, q):
    base = _top(index, q)
    assert base
    victim = base[0][0]
    deleted = dataclasses.replace(index, tombstones=frozenset({victim}))
    for mode in ("kernel", "dataframe"):
        got = _top(deleted, q, mode=mode)
        assert victim not in [d for d, _ in got], mode
        # remaining ranking must equal the base ranking minus the victim,
        # extended by the next-best doc (epoch-frozen stats: scores unchanged)
        base_minus = [x for x in base if x[0] != victim]
        assert got[: len(base_minus)] == base_minus, mode


def test_delete_in_match_and_batch(index):
    base = sorted(r["doc_id"] for r in index.match("data").collect())
    victim = base[0]
    deleted = dataclasses.replace(index, tombstones=frozenset({victim}))
    got = sorted(r["doc_id"] for r in deleted.match("data").collect())
    assert got == [d for d in base if d != victim]
    from bitfunnel_spark.plans.kernel import match_kernel

    got_k = sorted(r["doc_id"] for r in match_kernel(deleted, "data").collect())
    assert got_k == got
    many = deleted.search_many(["data fast", "dup | vector"], k=10).collect()
    assert victim not in {r["doc_id"] for r in many}


def test_facts_restrict_both_paths(index):
    index.define_fact("even_doc", F.col("doc_id") % 2 == 0)
    for mode in ("kernel", "dataframe"):
        got = _top(index, "data", mode=mode, facts=["even_doc"])
        assert got and all(d % 2 == 0 for d, _ in got), mode
    # fact-restricted results == unrestricted results filtered to the fact
    # set and re-topped (scores unchanged)
    base_all = _top(index, "data", k=1000)
    want = [x for x in base_all if x[0] % 2 == 0][:10]
    assert _top(index, "data", facts=["even_doc"]) == want


def test_fact_and_delete_compose(index):
    index.define_fact("even_doc", F.col("doc_id") % 2 == 0)
    base = _top(index, "data", facts=["even_doc"])
    victim = base[0][0]
    deleted = dataclasses.replace(index, tombstones=frozenset({victim}))
    got = _top(deleted, "data", facts=["even_doc"])
    assert victim not in [d for d, _ in got]
    assert all(d % 2 == 0 for d, _ in got)


def test_unknown_fact_raises(index):
    with pytest.raises(KeyError):
        index.search("data", facts=["nope"]).collect()


def test_compact_drops_tombstones(spark, corpus, tmp_path):
    """Compaction must turn the soft-delete mask into a hard delete: the
    rebuilt store contains no postings for tombstoned docs and the new
    epoch's stats exclude them."""
    from bitfunnel_spark import BuildConfig, FullTextIndex
    from bitfunnel_spark.streaming import ingest

    root = str(tmp_path / "idx")
    cfg = BuildConfig(n_slices=2)
    small = corpus.filter("doc_id < 60").cache()
    ingest.compact(spark, root, cfg, small, tombstones=[1, 2, 3])
    live = ingest.read_live_segments(spark, root)
    idx = FullTextIndex.build(
        spark, small.filter("doc_id not in (1,2,3)"), cfg, segments=True
    )
    # every decoded posting doc of the compacted store must avoid 1..3
    import numpy as np

    from bitfunnel_spark.operators.segments import decode_group

    pdf = live.toPandas()
    for _, rows in pdf.groupby(["term_key", "shard", "slice"]):
        d, _t, _p = decode_group(rows)
        assert not np.isin([1, 2, 3], d).any()
    # and the rebuilt-on-filtered-corpus index matches the compacted store
    a = {
        (r["term_key"], r["shard"], r["slice"], r["block_id"], bytes(r["docs_vb"]))
        for r in live.collect()
    }
    b = {
        (r["term_key"], r["shard"], r["slice"], r["block_id"], bytes(r["docs_vb"]))
        for r in idx.segments.collect()
    }
    assert a == b
