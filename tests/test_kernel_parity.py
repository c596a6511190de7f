"""Engine-vs-engine equivalence — the reference's ByteCode/NativeCode twin
strategy (/root/reference/src/Plan/test/ByteCodeVerifier.cpp,
NativeCodeVerifier.cpp): every query must produce identical results through
the DataFrame executor and the segment/kernel executor."""

import pytest

QUERIES = [
    "data",
    "spark & join",
    "data -slow",
    "dup | vector",
    "(dup | vector) join -merge",
    "lang:en data",
    "path:txt data fast",
    '"batch batch"',
    'data -"slow sort"',
    "nonexistenttoken | data",
]


@pytest.fixture(scope="module")
def seg_index(index):
    if index.segments is None:
        index.build_segments()
    return index


@pytest.mark.parametrize("q", QUERIES)
def test_search_parity(seg_index, q):
    df_res = [(r["doc_id"], r["score"]) for r in seg_index.search(q, k=10, mode="dataframe").collect()]
    k_res = [(r["doc_id"], r["score"]) for r in seg_index.search(q, k=10, mode="kernel").collect()]
    assert df_res == k_res, f"kernel/dataframe divergence for {q!r}"


@pytest.mark.parametrize("q", ["spark & join", "data -slow", "(dup | vector) join"])
def test_match_parity(seg_index, q):
    from bitfunnel_spark.plans.kernel import match_kernel

    df_res = sorted(r["doc_id"] for r in seg_index.match(q).collect())
    k_res = sorted(r["doc_id"] for r in match_kernel(seg_index, q).collect())
    assert df_res == k_res


def test_segments_roundtrip_postings(seg_index):
    """Decoding every segment must reproduce the exact posting multiset."""
    from bitfunnel_spark.operators.codec import decode_doc_block, varbyte_decode

    from bitfunnel_spark.operators.segments import _term_key_py

    seg_rows = seg_index.segments.collect()
    decoded = set()
    for r in sorted(seg_rows, key=lambda r: (r["term_key"], r["shard"], r["slice"], r["block_id"])):
        docs = decode_doc_block(bytes(r["docs_vb"]), r["enc"], int(r["first_doc"]))
        tfs = varbyte_decode(bytes(r["tfs_vb"]))
        assert len(docs) == len(tfs) == r["n"]
        assert int(docs[0]) == r["first_doc"] and int(docs[-1]) == r["last_doc"]
        for d, t in zip(docs, tfs):
            decoded.add((r["term_key"], int(d), int(t)))
    original = {
        (_term_key_py(r["stream"], r["term"]), r["doc_id"], r["tf"])
        for r in seg_index.postings.collect()
    }
    assert decoded == original
