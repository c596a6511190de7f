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

# Identifier-splitting rules (the code analyzer — Lucene/ES
# WordDelimiterGraphFilter semantics, generate_word_parts only /
# preserve_original=false). Applied to the RAW text BEFORE lowercasing
# (case transitions are the signal), each rule inserts a space at a
# boundary; the standard token extraction then yields the subtokens:
#   getUserName   -> get user name        (camel boundary)
#   XMLHttpRequest-> xml http request     (acronym-then-word)
#   HTTPServer2   -> http server 2        (acronym + digit transition)
#   parse_html    -> parse html           (snake_case)
#   v2Counter     -> v 2 counter          (letter/digit transitions)
# Rule order matters: acronym-run first (else ([a-z0-9])([A-Z]) would split
# XMLHttp as XMLHtt p), digit rules after case rules so residues like
# "1b" from "a1b2" get their own pass. Every rule is a plain Java/RE2
# regex evaluated identically by Catalyst and DuckDB (the oracle mirrors
# the chain verbatim — plans/oracle.code_body_sql).
CODE_SPLIT_RULES: tuple[tuple[str, str], ...] = (
    (r"([A-Z]+)([A-Z][a-z])", r"$1 $2"),
    (r"([a-z0-9])([A-Z])", r"$1 $2"),
    (r"([a-zA-Z])([0-9])", r"$1 $2"),
    (r"([0-9])([a-zA-Z])", r"$1 $2"),
    (r"_", r" "),
)


def code_split_text(col: Column | str) -> Column:
    """Raw text with identifier-boundary spaces inserted (pre-lowercase).

    The code analyzer's normalization pass; `tokenize(x, "code")` =
    standard tokenization of `code_split_text(x)`.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in CODE_SPLIT_RULES:
        c = F.regexp_replace(c, pat, rep)
    return c


def tokenize(col: Column | str, analyzer: str = "standard") -> Column:
    """Lowercased code-aware tokens of a text column, as array<string>.

    Shared contract with the DuckDB oracle:
    ``regexp_extract_all(lower(x), '[a-z_][a-z0-9_]*|[0-9]+')``.

    ``analyzer="code"`` additionally splits identifiers into subtokens
    (CODE_SPLIT_RULES) before extraction, so `server` matches a document
    containing `HTTPServer` — the physical design for source-code corpora
    (north-star input shape). Query text is NOT re-analyzed: query terms
    address the subtoken vocabulary directly (an ES `match` over a
    word_delimiter-analyzed field behaves the same for single-token
    queries; multi-subtoken query expansion is the caller's choice).
    """
    c = F.col(col) if isinstance(col, str) else col
    if analyzer == "code":
        c = code_split_text(c)
    elif analyzer != "standard":
        raise ValueError(f"unknown analyzer: {analyzer!r}")
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
    # n shifted slices zipped together — NOT `slice(tokens, i+1, n)` inside a
    # per-element lambda, which would re-evaluate the whole `tokens`
    # expression for every element (no CSE across HOF lambda boundaries →
    # O(len²) per row).
    m = F.size(tokens) - (n - 1)
    shifted = [F.slice(tokens, k + 1, m) for k in range(n)]
    zipped = F.arrays_zip(*shifted)
    fields = [str(k) for k in range(n)]
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f] for f in fields]))
    return F.when(F.size(tokens) < n, F.array().cast("array<string>")).otherwise(grams)


def doc_term_freqs(tokens: Column) -> Column:
    """array<struct<term:string, tf:int>> — per-document term frequencies.

    Pure higher-order functions: sort the token array once, then find the
    run boundaries and take run lengths as tf — O(n log n) per doc, fully
    JVM-side, no shuffle, no Python. (The naive formulation — for each
    distinct term, re-scan the array with `filter` — is O(u·n) per doc and
    was the measured build bottleneck on long documents.) The reference
    stores postings as a *set* (Document.cpp:178-181 — tf discarded); we
    keep tf because BM25 needs it.
    """
    # Single aggregate-fold over the sorted array. Crucial constraint: any
    # named intermediate (the sorted array, the run-starts array) referenced
    # from inside a lambda is re-evaluated per element by Catalyst — there is
    # no CSE across higher-order-function boundaries — so every formulation
    # that indexes back into a derived array is O(n²) per doc. The fold only
    # references its *lambda variables* (cheap bound references).
    empty = F.array().cast("array<struct<term:string,tf:int>>")

    def step(acc, x):
        last = F.get(acc, F.size(acc) - 1)  # NULL-safe on empty acc
        bump = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(x.alias("term"), (last["tf"] + 1).cast("int").alias("tf"))),
        )
        append = F.concat(acc, F.array(F.struct(x.alias("term"), F.lit(1).cast("int").alias("tf"))))
        return F.when(last["term"] == x, bump).otherwise(append)

    return F.aggregate(F.array_sort(tokens), empty, step)


# ---------------------------------------------------------------------------
# Python mirror with character offsets (Arrow batch path only)
#
# The JVM tokenizer above cannot report where in the ORIGINAL text each
# token came from (regexp_extract_all yields values, not offsets). The
# byte-exact span surgery in operators/dedup.py (Lee et al. ExactSubstr
# cuts duplicated spans from the original bytes, not from a re-joined
# token stream) needs those offsets, so this mirror re-runs the same
# pattern in Python inside an Arrow-batched UDF. Parity with the JVM
# path is tested (tests/test_substring_dedup.py::test_py_tokenize_parity).

import re as _re

_PY_TOKEN_RE = _re.compile(TOKEN_PATTERN)
_PY_CODE_RULES = tuple(
    (_re.compile(pat), rep.replace("$1", r"\1").replace("$2", r"\2"))
    for pat, rep in CODE_SPLIT_RULES
)


def _py_lower(text: str) -> str:
    # length-preserving lowercase: str.lower() can change length for a few
    # Unicode code points (e.g. 'İ'); keep such chars as-is so offsets in
    # the lowered string are offsets in the original.
    out = []
    for ch in text:
        low = ch.lower()
        out.append(low if len(low) == 1 else ch)
    return "".join(out)


def _py_code_split_map(text: str) -> tuple[str, list[int]]:
    """(split_text, posmap): code_split_text() in Python plus, for each
    split-text index, the originating original-text index (None-free:
    inserted spaces map to the original index of the NEXT char, which is
    only used via token-end arithmetic and never starts a token)."""
    split = text
    for pat, rep in _PY_CODE_RULES:
        split = pat.sub(rep, split)
    posmap = [0] * len(split)
    j = 0
    for i, ch in enumerate(split):
        if j < len(text) and ch == text[j]:
            posmap[i] = j
            j += 1
        elif ch == " " and j < len(text) and text[j] == "_":
            posmap[i] = j  # '_' replaced by ' '
            j += 1
        elif ch == " ":
            posmap[i] = j  # rule-inserted boundary space
        else:  # pragma: no cover - alignment invariant
            raise AssertionError("code-split alignment failed")
    return split, posmap


def py_token_spans(text: str, analyzer: str = "standard") -> list[tuple[int, int]]:
    """[(start_char, end_char)) per token, in ORIGINAL-text offsets, in
    token order — the exact token stream tokenize() produces."""
    if analyzer == "code":
        split, posmap = _py_code_split_map(text)
        return [
            (posmap[m.start()], posmap[m.end() - 1] + 1)
            for m in _PY_TOKEN_RE.finditer(_py_lower(split))
        ]
    if analyzer != "standard":
        raise ValueError(f"unknown analyzer: {analyzer!r}")
    return [(m.start(), m.end()) for m in _PY_TOKEN_RE.finditer(_py_lower(text))]


def py_tokenize(text: str, analyzer: str = "standard") -> list[str]:
    """The token VALUES of py_token_spans — must equal tokenize() exactly."""
    if analyzer == "code":
        split, _ = _py_code_split_map(text)
        return _PY_TOKEN_RE.findall(_py_lower(split))
    if analyzer != "standard":
        raise ValueError(f"unknown analyzer: {analyzer!r}")
    return _PY_TOKEN_RE.findall(_py_lower(text))


def analyze_text(spark, text: str, analyzer: str = "standard"):
    """ES ``_analyze`` API analogue: the token stream the index would emit
    for ``text`` under ``analyzer``, as DataFrame[(position, token)] with
    ES's 0-based token positions, ordered by position. The one public way
    to inspect the tokenizer contract (reference analogue: the chunk
    pipeline's Document::AddTerm stream, src/Chunks/src/Document.cpp)
    without building an index.

    Driver cost is one single-row DataFrame; tokenization is the same JVM
    regex expression the build uses, so what _analyze shows is exactly
    what the index stores."""
    df = spark.createDataFrame([(text,)], "text string")
    return (
        df.select(F.posexplode(tokenize("text", analyzer)).alias("position", "token"))
        .orderBy("position")
    )
