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
- ``"dot_tf"``  — sparse dot product with term-frequency impacts:
  contrib = boost · tf. The execution model of the Elasticsearch
  ``sparse_vector`` query (learned-sparse / SPLADE-shape retrieval:
  score = Σ_t query_weight(t) · stored_weight(t, d)) with the stored
  weight being the integer tf — the classic "impact" reading of a text
  index (Anh & Moffat's impact-ordered postings). Query weights arrive
  as Boost nodes, so they fold through planner.effective_idf like any
  boost.
- ``"lm_dirichlet"`` — Lucene LMDirichletSimilarity (μ = 2000), body
  field only (LM similarities are per-field; sumTotalTermFreq is a field
  statistic). Per matched body key:
      p(t)    = (ctf + 1) / (total_body_tokens + 1)
      contrib = max(boost · (ln(1 + tf/(μ·p)) + ln(μ/(doclen + μ))), 0)
  ctf (collection term frequency) is aggregated per query from the
  postings table (a partition-pruned scan of just the query's terms);
  total body tokens ≡ rint(n_docs·avgdl) — both integers, so every path
  folds identical constants. The per-posting ln is evaluated by each
  engine's libm (JVM / NumPy / DuckDB — each within 1 ulp); unlike the
  other flavors the contract here is 4-dp equality, not bit equality.

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

SIMILARITIES = ("bm25", "classic", "boolean", "lm_dirichlet", "dot_tf")

# Lucene LMDirichletSimilarity's default smoothing parameter
LMD_MU = 2000.0


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
    if similarity in ("classic", "lm_dirichlet") and not b > 0.0:
        raise QueryPlanError(
            f"similarity={similarity!r} needs doclens recovered from BM25 "
            "partials, which requires config.bm25.b > 0"
        )
    if similarity == "lm_dirichlet" and any(
        s != "body" for s, _t in getattr(plan, "scoring_keys", set())
    ):
        # Lucene's LM similarities are per-field (sumTotalTermFreq is a
        # field statistic); we model the body field. Field-boosted non-body
        # keys would need per-stream token totals the index doesn't keep.
        raise QueryPlanError(
            "similarity='lm_dirichlet' scores body-field terms only "
            "(non-body scoring keys present)"
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
    if similarity in ("boolean", "lm_dirichlet", "dot_tf"):
        # boolean: contribution IS the (boosted) weight. lm_dirichlet: the
        # weight is the boost multiplier on the per-posting LM term (the
        # smoothed-probability map ships separately — mu_p_map). dot_tf:
        # the weight multiplies the raw integer tf — the sparse
        # dot-product similarity (query weight × tf impact).
        return {key: 1.0 for key in idf}
    raise ValueError(f"unknown similarity {similarity!r}")


def mu_p_map(ctf: dict, total_tokens: int, mu: float = LMD_MU) -> dict:
    """Per-key μ·p(t) for LM Dirichlet: p(t) = (ctf + 1)/(total + 1) —
    Lucene LMSimilarity.LMStats collectionProbability with its +1
    smoothing. Computed driver-side once per query (float64), so every
    scoring path folds the exact same constants."""
    return {
        key: mu * ((c + 1.0) / (total_tokens + 1.0)) for key, c in ctf.items()
    }
