"""Query generator — benchmark-workload synthesis from the index's own
document-frequency table.

Reference analogue: QueryGenerator samples term indices uniformly from the
DocumentFrequencyTable and joins `termCount` sampled terms with spaces
into an AND query (/root/reference/tools/BitFunnel/src/
QueryGenerator.cpp:60-96). A uniform index into that table is exactly a
uniform draw over distinct vocabulary entries — most of which are rare
terms — so the generated log mixes head and tail terms the way a real
workload does.

Spark-first shape: the vocabulary stays distributed; a seeded
`DataFrame.sample` pulls only a candidate pool of ~3× the needed terms to
the driver (no full-vocabulary collect, no global sort, no single-task
window at any scale), and a seeded NumPy generator — the analogue of the
reference's pre-generated random value pool — draws the per-query terms
from the pool with replacement. Deterministic for a given (dictionary,
seed, partitioning)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_pool(
    vocab: DataFrame, need: int, seed: int, size: int | None = None
) -> list[str]:
    size = size if size is not None else vocab.count()
    if size == 0:
        return []
    frac = min(1.0, (3.0 * need + 64.0) / float(size))
    pool = [r["term"] for r in vocab.select("term").sample(False, frac, seed).collect()]
    if not pool:  # tiny-vocab edge: sample may return nothing
        pool = [r["term"] for r in vocab.select("term").limit(need).collect()]
    return sorted(pool)  # stable order → deterministic rng.choice below


def generate_queries(
    term_stats: DataFrame,
    n_queries: int,
    terms_per_query: int = 2,
    seed: int = 0,
    stream: str = "body",
) -> list[str]:
    """Sample `n_queries` AND queries of `terms_per_query` terms each from a
    (term, stream, df) dictionary DataFrame."""
    if n_queries <= 0 or terms_per_query <= 0:
        return []
    vocab = term_stats.filter(F.col("stream") == stream)
    pool = _term_pool(vocab, n_queries * terms_per_query, seed)
    if not pool:
        return []
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(pool), size=n_queries * terms_per_query, replace=True)
    return [
        " ".join(pool[picks[q * terms_per_query + i]] for i in range(terms_per_query))
        for q in range(n_queries)
    ]


def generate_phrase_log(
    corpus: DataFrame,
    n_queries: int,
    seed: int = 0,
    phrase_len: tuple[int, ...] = (2, 3),
    pad_terms: DataFrame | None = None,
) -> list[str]:
    """Phrase-query log sampled from REAL adjacent token runs, so every
    generated phrase matches at least its source document — uniform random
    token pairs almost never co-occur adjacently, which would make a phrase
    fuzz vacuous. A seeded corpus sample pulls ~n docs; per doc, a seeded
    offset picks one adjacent run of ``phrase_len`` tokens (only those
    ≤4-token slices are collected — no document text reaches the driver).
    When ``pad_terms`` (a term_stats frame) is given, half the queries mix
    the phrase with a sampled unigram (AND / OR / NOT shapes)."""
    if n_queries <= 0:
        return []
    from bitfunnel_spark.functions.tokenizer import tokenize

    n_docs = corpus.count()
    if n_docs == 0:
        return []
    frac = min(1.0, (3.0 * n_queries + 16.0) / float(n_docs))
    max_len = max(phrase_len)
    rng = np.random.default_rng(seed)
    docs = (
        corpus.select("doc_id", tokenize("content").alias("tk"))
        .filter(F.size("tk") >= max_len)
        .sample(False, frac, seed)
        # seeded per-doc offset, computed JVM-side from the doc id
        .select(
            "doc_id",
            F.slice(
                "tk",
                (F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.size("tk") - max_len + 1) + 1),
                max_len,
            ).alias("run"),
        )
        .orderBy("doc_id")
        .limit(3 * n_queries)
        .collect()
    )
    if not docs:
        return []
    pool = (
        _term_pool(pad_terms.filter(F.col("stream") == "body"), n_queries, seed + 1)
        if pad_terms is not None
        else []
    )
    log: list[str] = []
    for i in range(n_queries):
        run = docs[int(rng.integers(len(docs)))]["run"]
        ln = int(phrase_len[int(rng.integers(len(phrase_len)))])
        toks = [t for t in run[:ln] if t]
        if len(toks) < 2:
            continue
        q = '"' + " ".join(toks) + '"'
        if pool and i % 2 == 1:
            pad = pool[int(rng.integers(len(pool)))]
            q = [f"{q} {pad}", f"{q} | {pad}", f"{q} -{pad}"][i % 3]
        log.append(q)
    return log


def generate_query_log(
    term_stats: DataFrame,
    n_queries: int,
    seed: int = 0,
    mix: tuple[tuple[int, float], ...] = ((1, 0.3), (2, 0.4), (3, 0.2), (4, 0.1)),
    stream: str = "body",
) -> list[str]:
    """A mixed-length query log (the shape QueryRunner consumes): `mix` is
    ((terms_per_query, fraction), ...). Deterministic per seed; the
    vocabulary is counted and sampled ONCE for the whole log."""
    if n_queries <= 0:
        return []
    vocab = term_stats.filter(F.col("stream") == stream)
    size = vocab.count()
    counts = [max(0, int(round(n_queries * frac))) for _, frac in mix]
    while sum(counts) > n_queries:
        counts[counts.index(max(counts))] -= 1
    while sum(counts) < n_queries:
        counts[0] += 1
    need = sum(c * tpq for (tpq, _), c in zip(mix, counts))
    pool = _term_pool(vocab, need, seed, size=size)
    if not pool:
        return []
    rng = np.random.default_rng(seed)
    log: list[str] = []
    for (tpq, _), cnt in zip(mix, counts):
        for _ in range(cnt):
            picks = rng.choice(len(pool), size=tpq, replace=True)
            log.append(" ".join(pool[i] for i in picks))
    return log
