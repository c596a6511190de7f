"""Corpus sources.

Canonical corpus schema (authoritative per BASELINE.json input_hint):
    doc_id:bigint, repo:string, path:string, commit:string, lang:string,
    content:string, content_sha256:string

The sha256 column is the per-row invariant that must survive the pipeline
end-to-end (input_hint). The reference's corpus source is the chunk file
format (/root/reference/src/Chunks/src/ChunkReader.cpp:38-199); ours is a
Parquet/Iceberg table — see sources/chunks.py for a parity reader of the
reference's format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ("doc_id", "repo", "path", "commit", "lang", "content", "content_sha256")


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the driver-generated documents table (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def corpus_from_documents(docs: DataFrame) -> DataFrame:
    """Map the testdata `documents` table onto the canonical corpus schema.

    repo <- source, path <- doc{doc_id}.txt, commit <- first 40 hex of
    sha256(text) (deterministic), content <- text.
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 40).alias("commit"),
        F.col("lang").alias("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )


def synthetic_corpus(
    spark: SparkSession,
    n_docs: int = 5000,
    seed: int = 42,
    vocab_size: int = 1000,
    mega_repo_frac: float = 0.3,
    n_repos: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic source-code corpus (FIXTURES.md F1).

    Generated fully distributed (spark.range → JVM-side expressions, no
    Python row loop): identifiers drawn from a Zipf-ish vocabulary via a
    hash-chain PRNG, one mega-repo holding ~``mega_repo_frac`` of rows to
    exercise skew salting, doclen spanning several length shards.

    Determinism: every column is a pure function of (doc_id, seed) built
    from xxhash64 — identical across runs, partitionings, and cluster sizes.
    """
    df = spark.range(0, n_docs, 1, partitions or max(8, n_docs // 10000)).withColumnRenamed(
        "id", "doc_id"
    )
    h = lambda *cols: F.abs(F.xxhash64(*cols, F.lit(seed)))  # noqa: E731

    # repo: mega-repo skew — frac of docs land in repo 0
    repo_idx = F.when(
        (h(F.col("doc_id"), F.lit("repo")) % 1000) < int(mega_repo_frac * 1000), F.lit(0)
    ).otherwise((h(F.col("doc_id"), F.lit("repo2")) % (n_repos - 1)) + 1)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ["py", "py", "py", "py", "java", "java", "java", "c", "c", "md"]]),
        (h(F.col("doc_id"), F.lit("lang")) % 10 + 1).cast("int"),
    )
    # doclen: 8..~520 tokens, log-ish spread so length shards are exercised
    doclen = (
        F.pow(F.lit(2.0), (h(F.col("doc_id"), F.lit("len")) % 600).cast("double") / 100.0 + 3.0)
    ).cast("int")

    # content: doclen tokens; token i is vocab[zipf(h(doc_id, i))]
    # zipf via squaring a uniform: rank = floor(u^2 * vocab_size) biases to low ranks
    u = F.transform(
        F.sequence(F.lit(0), doclen - 1),
        lambda i: (h(F.col("doc_id"), i, F.lit("tok")) % 100000).cast("double") / 100000.0,
    )
    token = F.transform(
        u, lambda x: F.concat(F.lit("id_"), F.floor(x * x * vocab_size).cast("string"))
    )
    content = F.concat(F.array_join(token, " "), F.lit("\n"))

    out = df.select(
        F.col("doc_id"),
        F.concat(F.lit("org"), (repo_idx % 10).cast("string"), F.lit("/repo"), repo_idx.cast("string")).alias("repo"),
        F.concat(
            F.lit("src/pkg_"),
            (h(F.col("doc_id"), F.lit("pkg")) % 20).cast("string"),
            F.lit("/mod_"),
            F.col("doc_id").cast("string"),
            F.lit("."),
            lang,
        ).alias("path"),
        F.substring(F.sha2(F.concat(F.lit("commit"), F.col("doc_id").cast("string"), F.lit(seed)), 256), 1, 40).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
    return out.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def prime_factors_corpus(spark: SparkSession, max_doc_id: int = 1664) -> DataFrame:
    """Analytic corpus: doc d contains token p{f} for each prime factor f of d,
    with multiplicity — so the exact match set AND exact BM25 score of any
    boolean query is computable in closed form in a test.

    Mirrors the reference's PrimeFactors mock
    (/root/reference/src/Mocks/src/PrimeFactorsDocument.cpp:52-70); 1664 docs
    matches c_maxDocId in ByteCodeInterpreterTest.cpp:47.

    Built with JVM-side higher-order functions (trial division via
    sequence/filter would be awkward, so we compute factors in plain Python
    on the driver — 1664 tiny rows — and parallelize the literal list; this
    is a test fixture, not a scale path).
    """
    rows = []
    for d in range(1, max_doc_id + 1):
        n, factors = d, []
        f = 2
        while f * f <= n:
            while n % f == 0:
                factors.append(f)
                n //= f
            f += 1
        if n > 1:
            factors.append(n)
        content = " ".join(f"p{f}" for f in factors) if factors else "one"
        rows.append((d, "primes", f"doc{d}.txt", "0" * 40, "txt", content))
    df = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, lang string, content string"
    )
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
