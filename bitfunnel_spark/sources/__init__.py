from bitfunnel_spark.sources.corpus import (
    corpus_from_documents,
    load_documents,
    prime_factors_corpus,
    synthetic_corpus,
)

__all__ = [
    "corpus_from_documents",
    "load_documents",
    "prime_factors_corpus",
    "synthetic_corpus",
]
