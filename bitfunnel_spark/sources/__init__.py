from bitfunnel_spark.sources.chunks import (
    chunks_to_corpus,
    format_chunk,
    parse_chunk,
    read_chunks,
    write_chunks,
)
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
    "parse_chunk",
    "format_chunk",
    "read_chunks",
    "write_chunks",
    "chunks_to_corpus",
]
