"""Incremental (streaming-batch) dedup: exact + minhash batch filters vs
DuckDB, plus signature-level minhash parity (regression for the HOF
default-arg lambda bug — the signature itself must equal md5('i:'||g)
minima, not just the verified pair set)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators import dedup
from tests.conftest import TESTDATA

SPLIT = 250  # main: doc_id < SPLIT, new batch: doc_id >= SPLIT


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").cache()


def test_minhash_signature_matches_oracle(spark, docs):
    got = {
        r["doc_id"]: list(r["sig"])
        for r in dedup.minhash_signature(docs.limit(50), num_hashes=4).collect()
    }
    sig_cols = ", ".join(
        f"list_min(list_transform(sh, g -> md5('{i}:' || g))) AS h{i}" for i in range(4)
    )
    rows = duckdb.execute(f"""
        WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z_][a-z0-9_]*|[0-9]+') AS tk
                   FROM read_parquet('{TESTDATA}/documents.parquet') ORDER BY doc_id LIMIT 50),
        s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM d)
        SELECT doc_id, {sig_cols} FROM s WHERE len(sh) > 0
    """).fetchall()
    exp = {r[0]: list(r[1:]) for r in rows}
    assert set(got) == set(exp)
    assert got == exp  # bit-identical hash family across engines


def test_incremental_exact(spark):
    main = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "alpha beta"),   # dup of main -> dropped
         (11, "epsilon zeta"), # fresh -> kept
         (12, "epsilon zeta"), # dup of earlier new -> dropped
         (13, "eta theta")],   # fresh -> kept
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in dedup.incremental_exact_filter(new, main).collect()
    )
    assert got == [11, 13]


def test_incremental_minhash_vs_global_pairs(spark, docs):
    """With an id-ordered split, the incremental filter must equal the
    global LSH pair list's verdict: a new doc survives iff it is never the
    doc_b of a pair (partners always have lower ids)."""
    main = docs.filter(F.col("doc_id") < SPLIT)
    new = docs.filter(F.col("doc_id") >= SPLIT)
    got = sorted(
        r["doc_id"]
        for r in dedup.incremental_minhash_filter(new, main, threshold=0.5).collect()
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    victims = {
        r["doc_b"] for r in pairs.filter(F.col("doc_b") >= SPLIT).collect()
    }
    new_ids = sorted(r["doc_id"] for r in new.select("doc_id").collect())
    want = [d for d in new_ids if d not in victims]
    assert got == want
    assert len(want) < len(new_ids), "vacuous: no near-dups cross the split"
