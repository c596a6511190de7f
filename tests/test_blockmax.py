"""Block-max single-term top-k: pruned decode must be rank-identical to the
unpruned DataFrame executor, including under tiny blocks (many skip
opportunities) and rounding-boundary ties."""

import pytest

from bitfunnel_spark import BuildConfig, FullTextIndex


@pytest.fixture(scope="module")
def tiny_block_index(spark, corpus):
    # block_size=8 → common terms span many blocks → pruning actually skips
    return FullTextIndex.build_fused(spark, corpus, BuildConfig(n_slices=4, block_size=8))


@pytest.mark.parametrize("q", ["data", "the", "dup", "zzznotaterm"])
@pytest.mark.parametrize("k", [3, 10, 50])
def test_single_term_topk_parity(tiny_block_index, q, k):
    a = [(r["doc_id"], r["score"]) for r in tiny_block_index.search(q, k=k, mode="kernel").collect()]
    b = [(r["doc_id"], r["score"]) for r in tiny_block_index.search(q, k=k, mode="dataframe").collect()]
    assert a == b


def test_single_term_match_unpruned(tiny_block_index):
    # match has no k — the pruned path must not engage; the kernel-mode full
    # match set must equal the DataFrame executor's (the unpruned oracle)
    from bitfunnel_spark.plans.kernel import match_kernel

    a = sorted(r["doc_id"] for r in match_kernel(tiny_block_index, "data").collect())
    b = sorted(r["doc_id"] for r in tiny_block_index.match("data").collect())
    assert a == b and len(a) > 0