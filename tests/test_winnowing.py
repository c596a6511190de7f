"""Winnowing (Schleimer et al.) correctness: the Spark HOF selection must
equal the definitional selected set (rightmost-min of every full window),
satisfy the every-window coverage guarantee, and make two-phase substring
dedup exact."""

import random

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.dedup import (
    substring_dup_candidates,
    substring_dup_spans,
    winnowed_fingerprints,
)

TESTDATA = "/root/testdata/sf0.001"


def _brute_select(h: list[int], w: int) -> set[int]:
    """Definitional winnowing: rightmost-min of every full w-window."""
    sel = set()
    for a in range(0, len(h) - w + 1):
        win = h[a : a + w]
        m = min(win)
        # rightmost occurrence of the min
        sel.add(a + max(i for i, v in enumerate(win) if v == m))
    return sel


@pytest.fixture(scope="module")
def rng():
    return random.Random(7)


def test_selection_matches_definition(spark, rng):
    # random token docs incl. adversarial monotone runs and ties
    docs = []
    for d in range(40):
        n = rng.randint(1, 60)
        toks = [f"t{rng.randint(0, 8)}" for _ in range(n)]
        if d % 5 == 0:  # repeated token -> tied hashes
            toks = ["same"] * n
        if d % 7 == 0:  # monotone-ish structure
            toks = [f"t{i}" for i in range(n)]
        docs.append((d, " ".join(toks)))
    K, W = 3, 5
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnowed_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add(r["pos"])
    # brute-force: compute the same xxhash64 k-gram values via Spark once
    hdf = df.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.size(F.split("text", " ")) - K),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.split("text", " "), i + 1, K))),
        ).alias("h"),
    ).filter(F.size(F.split("text", " ")) >= K)
    for r in hdf.collect():
        h = list(r["h"])
        want = _brute_select(h, W) if len(h) >= W else set()
        assert got.get(r["doc_id"], set()) == want, (r["doc_id"], h)


def test_every_window_covered(spark, rng):
    docs = [
        (d, " ".join(f"t{rng.randint(0, 50)}" for _ in range(rng.randint(20, 80))))
        for d in range(20)
    ]
    K, W = 4, 6
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sel: dict[int, set[int]] = {}
    for r in winnowed_fingerprints(df, k=K, w=W).collect():
        sel.setdefault(r["doc_id"], set()).add(r["pos"])
    for d, text in docs:
        m = len(text.split()) - K + 1
        for a in range(0, m - W + 1):
            assert any(p in sel.get(d, set()) for p in range(a, a + W)), (d, a)


def test_shared_run_shares_fingerprint(spark, rng):
    # two docs share a run of exactly w + k - 1 tokens in different
    # contexts -> they must share >= 1 winnowed fingerprint VALUE
    K, W = 5, 4
    run = " ".join(f"s{i}" for i in range(W + K - 1))
    for trial in range(5):
        pre = " ".join(f"a{rng.randint(0,99)}" for _ in range(rng.randint(0, 10)))
        post = " ".join(f"b{rng.randint(0,99)}" for _ in range(rng.randint(0, 10)))
        df = spark.createDataFrame(
            [(1, (pre + " " + run).strip()), (2, (run + " " + post).strip())],
            "doc_id long, text string",
        )
        rows = winnowed_fingerprints(df, k=K, w=W).collect()
        g1 = {r["g"] for r in rows if r["doc_id"] == 1}
        g2 = {r["g"] for r in rows if r["doc_id"] == 2}
        assert g1 & g2, (trial, pre, post)


def test_density_reduction(spark, rng):
    df = spark.createDataFrame(
        [(0, " ".join(f"t{rng.randint(0, 10**6)}" for _ in range(3000)))],
        "doc_id long, text string",
    )
    W = 10
    n_sel = winnowed_fingerprints(df, k=5, w=W).count()
    total = 3000 - 5 + 1
    # expected density 2/(w+1) ~ 0.18; allow generous slack
    assert n_sel < total * 0.35
    assert n_sel > total * 0.05


def test_two_phase_equals_global(spark):
    # exact spans computed only over winnow candidates == global spans
    # (every dup partner is itself a candidate)
    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    L, W = 15, 8
    cands = substring_dup_candidates(docs, min_len=L, w=W)
    subset = docs.join(cands, "doc_id", "left_semi")
    a = sorted(
        tuple(r) for r in substring_dup_spans(subset, min_len=L).collect()
    )
    b = sorted(
        tuple(r) for r in substring_dup_spans(docs, min_len=L).collect()
    )
    assert a == b and a
    # and the candidate set is a real reduction
    assert cands.count() < docs.count()
