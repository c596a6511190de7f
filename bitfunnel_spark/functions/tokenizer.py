"""Tokenization — entirely JVM-side (no Python in the hot path).

The reference tokenizes in Document::ProcessToken → Term hash
(/root/reference/src/Chunks/src/Document.cpp:105-127,
/root/reference/src/Index/src/Term.cpp:333-345, MurmurHash64A). We keep the
token *text* (the reference cannot afford to) and tokenize with a code-aware
regex evaluated by Catalyst (`regexp_extract_all`), so the whole stage is
whole-stage-codegen'd — zero Python, zero shuffle.

Term frequency is computed per document with higher-order array functions
(array_distinct + size(filter(...))) instead of explode+groupBy: this keeps
tf computation map-side local to the document row and avoids an entire
shuffle at 100 TB scale (the explode→groupBy(doc,term) formulation shuffles
every posting; this formulation shuffles nothing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bitfunnel_spark.config import TOKEN_PATTERN


def tokenize(col: Column | str) -> Column:
    """Lowercased code-aware tokens of a text column, as array<string>.

    Shared contract with the DuckDB oracle:
    ``regexp_extract_all(lower(x), '[a-z_][a-z0-9_]*|[0-9]+')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def ngrams(tokens: Column, n: int) -> Column:
    """Order-dependent n-grams (space-joined) of a token array.

    The reference emits all grams up to maxGramSize via a ring buffer
    (/root/reference/src/Chunks/src/Document.cpp:152-165); phrase hash is
    order-dependent (Term.h:111-118). We join constituent tokens with a
    space — exact, order-dependent, reversible.
    """
    if n == 1:
        return tokens
    return F.when(F.size(tokens) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
        )
    )


def doc_term_freqs(tokens: Column) -> Column:
    """array<struct<term:string, tf:int>> — per-document term frequencies.

    Pure higher-order functions: O(u * n) per doc (u = distinct terms),
    fully JVM-side, no shuffle, no Python. The reference stores postings as
    a *set* (Document.cpp:178-181 — tf discarded); we keep tf because BM25
    needs it.
    """
    return F.transform(
        F.array_distinct(tokens),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(tokens, lambda x: x == t)).cast("int").alias("tf"),
        ),
    )
