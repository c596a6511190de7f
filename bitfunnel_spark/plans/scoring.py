"""Pluggable similarities (query-time scoring flavors).

The engine's default is Okapi BM25 (config.BM25Params). Lucene lets a user
swap the similarity per field/query (TFIDFSimilarity/ClassicSimilarity,
BooleanSimilarity) — the reference itself has NO scorer (it returns an
unscored match set, /root/reference/inc/BitFunnel/Plan/ResultsBuffer.h:38-88),
so every similarity here is "beyond reference" serving surface.

Supported query-time flavors (``FullTextIndex.search(similarity=...)``):

- ``"bm25"``   — the default; unchanged fast paths (block-max WAND etc.).
- ``"classic"``— Lucene ClassicSimilarity (pre-7 default TF-IDF), without
  Lucene's lossy 1-byte norm quantization (we keep exact doclens; the
  deviation is documented):
      idf_c   = 1 + ln((N + 1) / (df + 1))
      contrib = (idf_c · idf_c · boost) · (sqrt(tf) / sqrt(doclen))
  (queryNorm and coord were removed in Lucene 7 — not reproduced.)
- ``"boolean"``— Lucene BooleanSimilarity: contrib = boost per matched
  scoring key (score == number of matched scoring terms when unboosted).

Design for zero storage change: the index persists only the BM25-shaped
dictionary (idf) and per-posting (tf, bm25_partial). Both are exact
*invertible encodings* of the integers they were computed from, so any
similarity can be evaluated at query time:

- df from idf:  idf = ln((N - df + .5)/(df + .5) + 1)  — monotone in the
  integer df, so ``df = rint((N + .5 - .5·E)/(1 + E))`` with E = e^idf - 1
  recovers it exactly.
- doclen from (tf, partial): partial = tf(k1+1)/(tf + D) with
  D = k1(1 - b + b·dl/avgdl), so ``dl = rint(((D/k1) - 1 + b)·avgdl/b)``
  recovers the integer doclen exactly (requires b > 0; the same inversion
  the blended-synonym scorer already uses for D itself).

Float contract: every path (DataFrame executor, Arrow kernel, DuckDB
oracle) computes contributions with the same operand association —
``((idf_c·idf_c)·boost)·(sqrt(tf)/sqrt(dl))`` — so float64 results agree
bit-for-bit before the 4-dp rounding, exactly like the BM25 paths.

Pruning note: block-max metadata (max_partial) bounds BM25 contributions
only, so non-BM25 similarities route to the exhaustive kernel path (Lucene
likewise stores per-similarity impacts; we don't duplicate the block
metadata per flavor). Blended synonym groups and combined-fields groups
are BM25-specific by construction and raise QueryPlanError under other
similarities.
"""

from __future__ import annotations

import math

SIMILARITIES = ("bm25", "classic", "boolean")


def check_similarity(similarity: str, plan, b: float) -> None:
    """Validate a query-time similarity choice against the plan/config."""
    from bitfunnel_spark.plans.planner import QueryPlanError

    if similarity not in SIMILARITIES:
        raise ValueError(f"unknown similarity {similarity!r} (one of {SIMILARITIES})")
    if similarity == "bm25":
        return
    if getattr(plan, "syn_groups", ()) or getattr(plan, "field_groups", ()):
        raise QueryPlanError(
            "blended synonym / combined-fields groups are BM25-specific; "
            f"re-run with similarity='bm25' (got {similarity!r})"
        )
    if similarity == "classic" and not b > 0.0:
        raise QueryPlanError(
            "similarity='classic' needs doclens recovered from BM25 partials, "
            "which requires config.bm25.b > 0"
        )


def df_from_bm25_idf(idf: float, n_docs: int) -> int:
    """Exact integer df from the stored BM25 idf (see module docstring)."""
    e = math.exp(idf) - 1.0
    return int(round((n_docs + 0.5 - 0.5 * e) / (1.0 + e)))


def classic_idf(df: int, n_docs: int) -> float:
    """Lucene ClassicSimilarity idf: 1 + ln((N + 1)/(df + 1))."""
    return 1.0 + math.log((n_docs + 1.0) / (df + 1.0))


def base_weight_map(
    idf: dict, similarity: str, n_docs: int
) -> dict:
    """Per-key base scoring weight under ``similarity``, derived from the
    BM25-idf dictionary slice (before query-time boosts fold in via
    planner.effective_idf — the shared multiply-in point):

    - bm25:    idf (unchanged)
    - classic: idf_c · idf_c   (the squared idf of the classic formula)
    - boolean: 1.0
    """
    if similarity == "bm25":
        return idf
    if similarity == "classic":
        out = {}
        for key, v in idf.items():
            c = classic_idf(df_from_bm25_idf(v, n_docs), n_docs)
            out[key] = c * c
        return out
    if similarity == "boolean":
        return {key: 1.0 for key in idf}
    raise ValueError(f"unknown similarity {similarity!r}")
