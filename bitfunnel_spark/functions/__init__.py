from bitfunnel_spark.functions.tokenizer import doc_term_freqs, ngrams, tokenize

__all__ = ["tokenize", "doc_term_freqs", "ngrams"]
