"""Kernel-path query executor — block-decoded NumPy matching over segments.

The scale path (SURVEY §3.1 "Our Spark lifecycle"): the query is parsed and
planned driver-side, a tiny descriptor (AST + per-term idf + top-k) is
broadcast by capture, and ONE job over the query's posting segments runs a
vectorized NumPy kernel per (shard, slice) group: decode → candidate
generation (rarest-first intersection for ANDs, union otherwise) → boolean
mask evaluation → BM25 from stored float64 partials (score = idf·partial —
no doc-table join; the segment store is self-sufficient) → per-group top-k.
A final global TakeOrdered merges k rows per group.

This mirrors the reference's execution shape exactly: compiled plan +
per-slice interpreter loop (ByteCodeInterpreter::Run per slice buffer —
/root/reference/src/Plan/src/ByteCodeQueryEngine.cpp:86-112) with
(shard, slice) as the parallel unit, except our "interpreter" is NumPy over
compressed blocks instead of quadword bit-ANDs, and we add scoring.

Parallelism = n_shards × n_slices groups — thousands at cluster scale
(config.n_slices). On a persisted index, the `term IN (...)` filter prunes
(shard, term_bucket) partitions before any shuffle. Block skipping inside
the kernel: first_doc/last_doc prunes decodes to the shrinking candidate
range (AND queries, rarest-first), and max_partial drives block-max top-k
pruning — single terms via _single_term_topk, flat multi-term AND/OR via
plans/wand.py (block-max WAND driver traversal for conjunctions, MaxScore
term/block skipping for disjunctions); phrases/NOTs/nested shapes use the
exhaustive candidate+mask path below.

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

from bitfunnel_spark.config import POS_BITS, POS_SAFE_DOCLEN
from bitfunnel_spark.operators.segments import decode_group, decode_group_positions
from bitfunnel_spark.plans.ast import And, FieldGroup, Node, Not, Or, Phrase, SynGroup, Term
from bitfunnel_spark.plans.executor import _as_plan, _phrase_doc_ids
from bitfunnel_spark.plans.planner import QueryPlan

_EMPTY = np.empty(0, dtype=np.int64)
_EMPTYF = np.empty(0, dtype=np.float64)
_OUT_EMPTY = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})


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


def _decode_pruned(rows: pd.DataFrame, lo: int | None = None, hi: int | None = None):
    """Decode a term's blocks, skipping blocks whose [first_doc, last_doc]
    range misses [lo, hi] — block-level skipping on the metadata columns."""
    if lo is not None:
        rows = rows[(rows["last_doc"] >= lo) & (rows["first_doc"] <= hi)]
    return decode_group(rows)


def _candidates_pruned(
    ast: Node, raw: dict, gram_phrases=frozenset(), fallback=frozenset()
) -> np.ndarray:
    """Candidate doc set with progressive block pruning.

    AND fast path: decode the rarest positive term fully (fewest postings —
    the MatchTreeRewriter 'cheapest first' intent), then intersect the other
    conjuncts decoding only blocks overlapping the shrinking candidate range.
    Otherwise: union of all positive terms' postings. Gram-matched phrases
    contribute their gram term as a conjunct (usually the rarest driver).
    """
    def total_n(key) -> int:
        rows = raw.get(key)
        return int(rows["n"].sum()) if rows is not None else 0

    def is_dense(key) -> bool:
        # dense-treatment lists never drive the intersection (demotion)
        rows = raw.get(key)
        return (
            rows is not None
            and "enc" in rows.columns
            and len(rows)
            and rows["enc"].iloc[0] == "gap32"
        )

    def docs_of(key, lo=None, hi=None):
        rows = raw.get(key)
        if rows is None:
            return _EMPTY
        return _decode_pruned(rows, lo, hi)[0]

    and_keys: list[tuple[str, str]] = []
    if isinstance(ast, Term):
        return docs_of((ast.stream, ast.text))
    if isinstance(ast, And):
        for c in ast.children:
            if isinstance(c, Term):
                and_keys.append((c.stream, c.text))
            elif isinstance(c, Phrase):
                and_keys.extend((c.stream, t) for t in c.tokens)
                if c in gram_phrases:
                    and_keys.append((c.stream, c.text))
                elif c in fallback:
                    and_keys.append((c.stream, _phrase_term(c)))
    elif isinstance(ast, Phrase):
        and_keys = [(ast.stream, t) for t in ast.tokens]
        if ast in gram_phrases:
            and_keys.append((ast.stream, ast.text))
        elif ast in fallback:
            and_keys.append((ast.stream, _phrase_term(ast)))
    if and_keys:
        and_keys.sort(key=lambda kk: (is_dense(kk), total_n(kk)))
        cand = docs_of(and_keys[0])
        for key in and_keys[1:]:
            if cand.size == 0:
                return cand
            other = docs_of(key, int(cand[0]), int(cand[-1]))
            cand = cand[_member(other, cand)]
        return cand
    pos = sorted(_positive_term_keys(ast))
    if not pos:
        return _EMPTY
    arrs = [docs_of(k) for k in pos]
    return np.unique(np.concatenate(arrs)) if arrs else _EMPTY


MAX_SLOP_PATTERNS = 512


def _slop_offset_vectors(n: int, slop: int) -> list[tuple[int, ...]]:
    """Every position pattern a sloppy phrase allows: strictly increasing
    offsets (0, o2, .., on) with on <= (n-1)+slop. C((n-1)+slop, n-1)
    vectors; bounded by MAX_SLOP_PATTERNS (a 2-term phrase allows slop up
    to 511, a 4-term phrase up to ~13 — beyond that the query is a
    different operator, not a phrase)."""
    from itertools import combinations
    from math import comb

    if comb(n - 1 + slop, n - 1) > MAX_SLOP_PATTERNS:
        raise ValueError(
            f"phrase slop {slop} over {n} tokens needs "
            f"{comb(n - 1 + slop, n - 1)} patterns (max {MAX_SLOP_PATTERNS})"
        )
    return [(0, *c) for c in combinations(range(1, n + slop), n - 1)]


def phrase_docs_from_positions(ph: Phrase, raw: dict) -> np.ndarray:
    """Docs (within one (shard, slice) group) containing the phrase,
    from positional postings — no corpus access.

    Exact phrase (slop 0): each occurrence of constituent k at position p
    supports a phrase start s = p - k; pack (doc, s) into one int64 key
    (doc << POS_BITS | s+off) and intersect the start-sets across
    constituents. Fully vectorized (np.repeat + np.isin). off =
    max(16, phrase_len + slop) keeps s+off >= 1 for every k (so long
    phrases never borrow from the doc-id field), and packed values >=
    2^POS_BITS are filtered out (indexes whose documents could reach that
    bound route phrases to the corpus path instead — see _descriptor /
    POS_SAFE_DOCLEN).

    Sloppy phrase (``"a b"~s``, ast.Phrase.slop): the same intersect run
    once per allowed offset vector (_slop_offset_vectors), union of the
    resulting doc sets. Constituent positions are decoded ONCE and reused
    across patterns."""
    n = len(ph.tokens)
    slop = int(getattr(ph, "slop", 0))
    off = max(16, n + slop)
    lim = np.int64(1) << np.int64(POS_BITS)
    occ: list[tuple[np.ndarray, np.ndarray]] = []
    for tok in ph.tokens:
        rows = raw.get((ph.stream, tok))
        if rows is None:
            return _EMPTY
        d, t, p = decode_group_positions(rows)
        if d.size == 0:
            return _EMPTY
        occ.append((np.repeat(d, t).astype(np.int64), p.astype(np.int64)))
    patterns = (
        [tuple(range(n))] if slop == 0 else _slop_offset_vectors(n, slop)
    )
    packed = []
    for offsets in patterns:
        keys = None
        for k in range(n):
            docs_k, p_k = occ[k]
            shifted = p_k - offsets[k] + off
            ok = shifted < lim  # keep the packed key inside the position field
            kk = (docs_k[ok] << np.int64(POS_BITS)) + shifted[ok]
            keys = kk if keys is None else keys[np.isin(keys, kk)]
            if keys.size == 0:
                keys = None
                break
        if keys is not None:
            packed.append(keys >> np.int64(POS_BITS))
    if not packed:
        return _EMPTY
    return np.unique(np.concatenate(packed))


def _group_phrase_docs(plan_phrases, raw: dict, descriptor: dict) -> dict:
    """Per-group phrase doc sets, by physical design precedence:
    positional-kernel evaluation (stored positions) > indexed-gram posting
    list > broadcast corpus-derived sets (the exact fallback)."""
    gram = descriptor.get("gram_phrases") or frozenset()
    fb = descriptor.get("fallback_phrases") or frozenset()
    out: dict = {}
    for ph, _neg in plan_phrases:
        if ph in out:
            continue
        if descriptor.get("use_positions"):
            out[ph] = phrase_docs_from_positions(ph, raw)
        elif ph in gram:
            rows = raw.get((ph.stream, ph.text))
            out[ph] = decode_group(rows)[0] if rows is not None else _EMPTY
        elif ph in fb:
            # synthetic posting rows from phrase_fallback_segments
            rows = raw.get((ph.stream, _phrase_term(ph)))
            out[ph] = decode_group(rows)[0] if rows is not None else _EMPTY
        else:
            out[ph] = descriptor.get("phrase_docs", {}).get(ph, _EMPTY)
    return out


def _mask(node: Node, cand: np.ndarray, postings, phrase_docs) -> np.ndarray:
    if isinstance(node, Term):
        return _member(postings.get((node.stream, node.text), (_EMPTY, _EMPTY, _EMPTYF))[0], cand)
    if isinstance(node, (SynGroup, FieldGroup)):  # matches like an OR of members
        out = np.zeros(cand.shape, dtype=bool)
        for key in node.keys:
            out |= _member(postings.get(key, (_EMPTY, _EMPTY, _EMPTYF))[0], cand)
        return out
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
        mm = getattr(node, "min_match", 1)
        if mm <= 1:
            out = np.zeros(cand.shape, dtype=bool)
            for c in node.children:
                out |= _mask(c, cand, postings, phrase_docs)
            return out
        # minimum-should-match: count matching children per candidate
        n = np.zeros(cand.shape, dtype=np.int32)
        for c in node.children:
            n += _mask(c, cand, postings, phrase_docs)
        return n >= mm
    raise TypeError(type(node))


def _score(
    cand: np.ndarray, postings, scoring_keys: list, idf: dict,
    syn_groups=(), k1: float = 1.2, field_groups=(),
    similarity: str = "bm25", b: float = 0.75, avgdl: float = 1.0,
    mu_p: dict | None = None,
) -> np.ndarray:
    """BM25 from stored partials: score = Σ over scoring (stream, term)
    keys of idf_key · partial_key(doc). Keys and idf are (stream, term)-
    keyed — body terms always, non-body keys when field-boosted.

    Blended synonym groups (Lucene SynonymQuery; plan.syn_groups) score as
    ONE pseudo-term: per doc, tf = Σ member tfs, saturated ONCE with the
    doc's norm, weighted by the blended idf = min over present members
    (idf is monotone-decreasing in df, so min idf ≡ idf of the max df —
    Lucene's blended docFreq). The norm denominator D = k1(1-b+b·dl/avgdl)
    is recovered from the max-tf member's stored (tf, partial) pair:
    D = tf(k1+1)/partial − tf — exactly inverting the build-time partial,
    so no doclen access is needed and the arithmetic is reproducible
    bit-for-bit by the DataFrame path and the SQL oracle (same op order)."""
    from bitfunnel_spark.plans.scoring import LMD_MU

    mu_p = mu_p or {}
    score = np.zeros(cand.shape, dtype=np.float64)
    for key in scoring_keys:
        docs, tfs_all, parts = postings.get(key, (_EMPTY, _EMPTY, _EMPTYF))
        if docs.size == 0:
            continue
        m = _member(docs, cand)
        if not m.any():
            continue
        idxs = np.searchsorted(docs, cand[m])
        if similarity == "bm25":
            score[m] += idf.get(key, 0.0) * parts[idxs]
        elif similarity in ("classic", "lm_dirichlet"):
            # plans/scoring.py: the per-key weight in `idf` is the boosted
            # base weight (idf_c² for classic, 1.0 for lm_dirichlet); the
            # per-posting factor needs the integer doclen, recovered
            # EXACTLY by inverting the stored BM25 partial — the same
            # inversion the blended-synonym scorer uses for D
            tf = tfs_all[idxs].astype(np.float64)
            part = parts[idxs]
            d_norm = tf * (k1 + 1.0) / part - tf
            dl = np.rint(((d_norm / k1) - 1.0 + b) * avgdl / b)
            if similarity == "classic":
                score[m] += idf.get(key, 0.0) * (np.sqrt(tf) / np.sqrt(dl))
            else:
                # Lucene LMDirichletSimilarity, per-term clamp at 0
                mp = mu_p.get(key)
                if mp is None:
                    continue
                contrib = idf.get(key, 0.0) * (
                    np.log(1.0 + tf / mp) + np.log(LMD_MU / (dl + LMD_MU))
                )
                score[m] += np.maximum(contrib, 0.0)
        elif similarity == "dot_tf":
            # sparse dot product: (weight·boost)·tf — tf is an exact small
            # integer in float64, so the product is bit-reproducible by
            # the DataFrame executor and the SQL oracle
            score[m] += idf.get(key, 0.0) * tfs_all[idxs].astype(np.float64)
        else:  # boolean: constant (boost) per matched scoring key
            score[m] += idf.get(key, 0.0)
    for group in syn_groups:
        # blended idf from GLOBAL stats (min idf ≡ idf of the max df): a
        # per-group constant, like Lucene's blended docFreq — never from
        # group-local or per-doc presence
        in_dict = [k for k in group if k in idf]
        if not in_dict:
            continue
        idf_blend = min(idf[k] for k in in_dict)
        present = [k for k in in_dict if postings.get(k, (_EMPTY,))[0].size]
        if not present:
            continue
        tfsum = np.zeros(cand.shape, dtype=np.float64)
        best_tf = np.zeros(cand.shape, dtype=np.float64)
        best_part = np.ones(cand.shape, dtype=np.float64)  # placeholder; unused where best_tf=0
        for key in present:
            docs, tfs, parts = postings[key]
            m = _member(docs, cand)
            if not m.any():
                continue
            idxs = np.searchsorted(docs, cand[m])
            tf = tfs[idxs].astype(np.float64)
            tfsum[m] += tf
            # deterministic D source: the member with maximal tf (ties are
            # harmless — equal tf ⇒ equal stored partial ⇒ equal D)
            better = np.zeros(cand.shape, dtype=bool)
            better[m] = tf > best_tf[m]
            sel = better[m]
            bm = m & better
            best_tf[bm] = tf[sel]
            best_part[bm] = parts[idxs][sel]
        matched = tfsum > 0
        if not matched.any():
            continue
        d_norm = best_tf[matched] * (k1 + 1.0) / best_part[matched] - best_tf[matched]
        score[matched] += idf_blend * (
            tfsum[matched] * (k1 + 1.0) / (tfsum[matched] + d_norm)
        )
    for group in field_groups:
        # combined-fields group (BM25F — ast.FieldGroup): tf̃ = Σ w·tf
        # accumulated in the group's fixed sorted-member order (exactly the
        # order the DataFrame executor and the SQL oracle fold in, so
        # float64 stays bit-identical), ONE saturation with the document's
        # shared body-length norm D (recovered from the max-raw-tf member's
        # stored partial — doclen is the body count on EVERY posting, so D
        # is a doc-level constant and any present member inverts to it),
        # weighted by the blended idf (min member idf ≡ max per-field df).
        in_dict = [(kk, w) for kk, w in group if kk in idf]
        if not in_dict:
            continue
        idf_blend = min(idf[kk] for kk, _w in in_dict)
        present = [
            (kk, w) for kk, w in in_dict if postings.get(kk, (_EMPTY,))[0].size
        ]
        if not present:
            continue
        tfsum = np.zeros(cand.shape, dtype=np.float64)
        best_tf = np.zeros(cand.shape, dtype=np.float64)
        best_part = np.ones(cand.shape, dtype=np.float64)  # unused where best_tf=0
        for kk, w in present:
            docs, tfs, parts = postings[kk]
            m = _member(docs, cand)
            if not m.any():
                continue
            idxs = np.searchsorted(docs, cand[m])
            tf = tfs[idxs].astype(np.float64)
            tfsum[m] += w * tf
            better = np.zeros(cand.shape, dtype=bool)
            better[m] = tf > best_tf[m]
            sel = better[m]
            bm = m & better
            best_tf[bm] = tf[sel]
            best_part[bm] = parts[idxs][sel]
        matched = tfsum > 0
        if not matched.any():
            continue
        d_norm = best_tf[matched] * (k1 + 1.0) / best_part[matched] - best_tf[matched]
        score[matched] += idf_blend * (
            tfsum[matched] * (k1 + 1.0) / (tfsum[matched] + d_norm)
        )
    return score


def _single_term_topk(rows: pd.DataFrame, idf: float, k: int) -> pd.DataFrame:
    """Block-max top-k for a single-term query — the max_partial metadata
    actually skips decodes: blocks are visited in descending max_partial
    order and decoding stops once k postings are held whose k-th best
    partial is ≥ the next block's max (no remaining block can contribute a
    better posting). The rank-down coarse-row analogue
    (/root/reference/src/Plan/src/RankDownCompiler.cpp) put to work for
    scoring."""
    order = rows.sort_values("max_partial", ascending=False)
    docs_l: list[np.ndarray] = []
    parts_l: list[np.ndarray] = []
    count = 0
    kth = -np.inf
    from bitfunnel_spark.operators.codec import decode_doc_block

    # margin: final scores round to 4 dp, so a partial within the rounding
    # epsilon of the k-th could still tie (and win on doc_id) — only skip
    # blocks strictly below kth minus the score-space epsilon
    eps = 1e-4 / idf if idf > 0 else 0.0
    for r in order.itertuples():
        if count >= k and float(r.max_partial) < kth - eps:
            break  # every remaining block's best partial is worse than our k-th
        docs_l.append(
            decode_doc_block(
                bytes(r.docs_vb), getattr(r, "enc", "vb") or "vb", int(r.first_doc)
            )
        )
        parts_l.append(np.frombuffer(bytes(r.partials), dtype=np.float64))
        count += docs_l[-1].size
        if count >= k:
            allp = np.concatenate(parts_l)
            kth = float(np.partition(allp, allp.size - k)[allp.size - k])
    if not docs_l:
        return _OUT_EMPTY
    docs = np.concatenate(docs_l)
    score = idf * np.concatenate(parts_l)
    if docs.size > k:
        r4 = np.round(score, 4)
        idx = np.lexsort((docs, -r4))[:k]
        docs, score = docs[idx], score[idx]
    return pd.DataFrame({"doc_id": docs, "score": score})


def _make_kernel(plan: QueryPlan, descriptor: dict):
    """Build the per-group kernel closure. `descriptor` is tiny (idf map +
    phrase doc arrays + k) and ships inside the serialized closure."""
    from bitfunnel_spark.plans.wand import BlockCache, route_units, units_topk

    ast = plan.ast
    scoring = sorted(plan.scoring_keys)

    gram_set = frozenset(descriptor.get("gram_phrases") or frozenset())
    fb_set = frozenset(descriptor.get("fallback_phrases") or frozenset())
    keymap = _keymap(
        set(plan.terms)
        | {(ph.stream, ph.text) for ph in gram_set}
        | {(ph.stream, _phrase_term(ph)) for ph in fb_set}
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _OUT_EMPTY
        raw = {
            keymap[int(key)]: rows
            for key, rows in pdf.groupby("term_key", sort=False)
            if int(key) in keymap
        }
        k0 = descriptor["k"]
        allow = descriptor.get("allow")
        deny = descriptor.get("deleted")
        after = descriptor.get("after")  # (score4, doc_id) pagination cursor
        restricted = allow is not None or (deny is not None and deny.size > 0)
        # block-max bounds: max_partial is BM25-shaped; dot_tf prunes via
        # the per-block max_tf metadata (BlockCache bound mode) — but only
        # under non-negative weights (w·max_tf is NOT an upper bound of
        # w·tf when w < 0; a negative boost through the public API must
        # fall back to the exhaustive scorer). Other similarities route
        # to the exhaustive scorer (plans/scoring.py).
        sim = descriptor.get("similarity", "bm25")
        prunable = sim == "bm25" or (
            sim == "dot_tf"
            and all(w >= 0.0 for w in descriptor["idf"].values())
        )
        if (
            k0 is not None
            and sim == "bm25"  # the sorted-by-partial fast path is BM25-only
            and not restricted
            and after is None
            and isinstance(ast, Term)
            and (ast.stream, ast.text) in plan.scoring_keys
            and descriptor["idf"].get((ast.stream, ast.text), 0.0) > 0
        ):
            rows = raw.get((ast.stream, ast.text))
            if rows is None:
                return _OUT_EMPTY
            return _single_term_topk(rows, descriptor["idf"][(ast.stream, ast.text)], k0)
        flat = route_units(ast) if (k0 is not None and prunable) else None
        if flat is not None and (
            flat[0] in ("and", "or")
            or (flat[0] == "term" and (restricted or after is not None))
        ):
            # multi-term block-max pruning (WAND/MaxScore — plans/wand.py);
            # blended syn/field groups ride the same traversal via the
            # subadditive saturation bound; fact sets AND in as `allow`,
            # tombstones mask via `deny` (the reference's fact rows +
            # "document active" row, Row.h:34-35)
            kind, units = flat
            cache = BlockCache(raw, bound=sim)
            return units_topk(
                kind, units, scoring, descriptor["idf"], k0, cache,
                allow=allow, deny=deny,
                syn_groups=plan.syn_groups,
                field_groups=getattr(plan, "field_groups", ()),
                k1=descriptor.get("k1", 1.2),
                after=after,
            )
        cand = _candidates_pruned(ast, raw, gram_set, fb_set)
        from bitfunnel_spark.plans.wand import restrict

        cand = restrict(cand, allow, deny)
        if cand.size == 0:
            return _OUT_EMPTY
        # decode every query term pruned to the candidate doc range — blocks
        # outside [cand_min, cand_max] are skipped via first/last_doc metadata
        # (the rank-down coarse-row analogue)
        lo, hi = int(cand[0]), int(cand[-1])
        postings = {key: _decode_pruned(rows, lo, hi) for key, rows in raw.items()}
        m = _mask(ast, cand, postings, _group_phrase_docs(plan.phrases, raw, descriptor))
        cand = cand[m]
        if cand.size == 0:
            return _OUT_EMPTY
        score = _score(
            cand, postings, scoring, descriptor["idf"],
            plan.syn_groups, descriptor.get("k1", 1.2),
            getattr(plan, "field_groups", ()),
            similarity=descriptor.get("similarity", "bm25"),
            b=descriptor.get("b", 0.75), avgdl=descriptor.get("avgdl", 1.0),
            mu_p=descriptor.get("mu_p"),
        )
        if after is not None:
            # deep pagination (search_after): keep docs strictly after the
            # (score desc, doc_id asc) cursor — compared on the rounded
            # score, the same key the ordering contract uses
            r4 = np.round(score, 4)
            keep = (r4 < after[0]) | ((r4 == after[0]) & (cand > after[1]))
            cand, score = cand[keep], score[keep]
            if cand.size == 0:
                return _OUT_EMPTY
        k = descriptor["k"]
        if k is not None and cand.size > k:
            # per-group partial top-k (heap analogue): order by (round desc, doc asc)
            r = np.round(score, 4)
            idx = np.lexsort((cand, -r))[:k]
            cand, score = cand[idx], score[idx]
        return pd.DataFrame({"doc_id": cand, "score": score})

    return kernel


def _segment_filter(index, terms: set[tuple[str, str]]):
    """Pushdown-friendly segment predicate for a query's terms.

    The store is keyed by int64 term keys (computed identically driver-side,
    segments._term_key_py), so the filter is two plain-column IN-lists:
    `term_bucket IN` prunes (shard, term_bucket) partitions of a persisted
    store, `term_key IN` prunes parquet row groups via min/max stats (rows
    are written key-clustered). No computed-column predicate anywhere."""
    from bitfunnel_spark.operators.segments import _term_bucket_py, _term_key_py

    keys = sorted(_term_key_py(s, t) for s, t in terms)
    buckets = sorted({_term_bucket_py(k, index.config.term_buckets) for k in keys})
    return F.col("term_bucket").isin(buckets) & F.col("term_key").isin(keys)


def _keymap(terms: set[tuple[str, str]]) -> dict:
    """{term_key: (stream, term)} for a query's terms — the kernels stay
    string-keyed internally; only the pdf boundary translates."""
    from bitfunnel_spark.operators.segments import _term_key_py

    return {_term_key_py(s, t): (s, t) for s, t in terms}


def _query_groups(index, plan: QueryPlan, descriptor: dict, k: int | None) -> DataFrame:
    seg = index.segments.filter(_segment_filter(index, filter_terms(index, plan)))
    fb = descriptor.get("fallback_phrases") or frozenset()
    if fb:
        seg = seg.unionByName(
            phrase_fallback_segments(
                index, sorted(fb, key=lambda p: (p.stream, p.text, p.slop))
            )
        )
    kernel = _make_kernel(plan, {**descriptor, "k": k})
    return seg.groupBy("shard", "slice").applyInPandas(
        lambda pdf: kernel(pdf), "doc_id long, score double"
    )


def _phrase_term(ph: Phrase) -> str:
    """Synthetic dictionary term for a fallback phrase's posting rows. The
    NUL marker guarantees no collision with real or gram terms (tokenizer
    output never contains NUL); slop is part of the key because "a b" and
    "a b"~2 have different doc sets."""
    return f"{ph.text}\x00~{int(getattr(ph, 'slop', 0) or 0)}"


def phrase_fallback_segments(index, phrases) -> "DataFrame":
    """Distributed exact-phrase fallback — replaces the old driver-side
    collect of phrase doc-ids. Each phrase's corpus-derived doc set becomes
    synthetic posting blocks keyed by ``_phrase_term(ph)``, unioned into the
    query's segment scan, so the phrase evaluates in-kernel exactly like an
    indexed gram term. No match-set-sized data ever reaches the driver; the
    phrase scan's output flows executor-to-executor through the same
    one-shuffle encode the build uses. (Reference analogue: once planned, a
    phrase is an ordinary row — RowSet semantics.)"""
    from functools import reduce as _reduce

    from bitfunnel_spark.operators.segments import build_segments

    parts = []
    for ph in phrases:
        docs = _phrase_doc_ids(index, ph, None)
        parts.append(
            docs.join(index.doc_stats, "doc_id").select(
                F.lit(_phrase_term(ph)).alias("term"),
                F.lit(ph.stream).alias("stream"),
                "doc_id",
                F.lit(1).alias("tf"),
                "doclen",
                "shard",
                "slice",
            )
        )
    postings = _reduce(lambda a, b: a.unionByName(b), parts)
    return build_segments(postings, index.avgdl, index.config)


def use_gram_phrase(index, ph: Phrase) -> bool:
    """True when the phrase matches via an indexed n-gram term (reference
    parity: grams up to maxGramSize are ordinary terms — Document.cpp:
    152-165): body-stream phrase, length within config.max_gram_size, and
    the positional path (which subsumes grams) not active."""
    return (
        1 < len(ph.tokens) <= int(getattr(index.config, "max_gram_size", 1))
        and ph.stream == "body"
        and getattr(ph, "slop", 0) == 0  # gram postings encode exact adjacency only
        and not use_positional_phrases(index)
    )


def filter_terms(index, plan: QueryPlan) -> set:
    """Segment-filter keys: the plan's terms plus the gram term of every
    gram-matched phrase (the gram's posting list must reach the kernel)."""
    terms = set(plan.terms)
    for ph, _neg in plan.phrases:
        if use_gram_phrase(index, ph):
            terms.add((ph.stream, ph.text))
    return terms


def use_positional_phrases(index) -> bool:
    """Phrases run in-kernel from stored positions iff the segments
    physically carry positions (fused build with positions=True) AND every
    document's positions fit the packed 20-bit field — otherwise the exact
    corpus-derived path runs, distributed, via phrase_fallback_segments."""
    return (
        bool(getattr(index.config, "positions", False))
        and bool(getattr(index, "segments_positional", True))
        and index.max_doclen < POS_SAFE_DOCLEN
    )


def _restriction_arrays(index, facts: list[str] | None) -> dict:
    """Descriptor entries for tombstones + fact sets: sorted int64 doc-id
    arrays shipped in the broadcast closure (the reference holds fact rows
    and the soft-delete row in memory the same way)."""
    out: dict = {}
    if index.tombstones:
        out["deleted"] = np.array(sorted(index.tombstones), dtype=np.int64)
    if facts:
        allow = index.fact_doc_ids(facts)
        out["allow"] = allow
    return out


def _descriptor(
    index, plan: QueryPlan, facts: list[str] | None = None,
    similarity: str = "bm25",
) -> dict:
    if getattr(index, "_restrict_docs", None) is not None:
        # a doc-metadata restriction (ES range filter) is a column
        # predicate only where postings are columnar rows — the
        # declarative executor serves it; silently ignoring it here would
        # return unfiltered results
        raise ValueError(
            "_restrict_docs is served by the declarative executor "
            "(plans/executor); route range-filtered queries there"
        )
    # driver-resident hash dictionary (TermTable analogue) when it fits,
    # else one filtered collect — index.idf_for_terms; query-time boosts
    # fold into idf here so every downstream scorer/bound sees (idf·boost).
    # Non-BM25 similarities (plans/scoring.py) swap the per-key base weight
    # driver-side, so the kernel scorer sees (weight·boost) the same way.
    from bitfunnel_spark.plans.planner import effective_idf
    from bitfunnel_spark.plans.scoring import base_weight_map, check_similarity

    if similarity != "bm25":
        check_similarity(similarity, plan, index.config.bm25.b)
    idf = effective_idf(
        plan,
        base_weight_map(index.idf_for_keys(plan.terms), similarity, index.n_docs),
    )
    mu_p: dict = {}
    if similarity == "lm_dirichlet":
        from bitfunnel_spark.plans.scoring import mu_p_map

        mu_p = mu_p_map(index.ctf_for_keys(plan.terms), index.body_total_tokens())
    gram_phrases: set = set()
    fallback: set = set()
    use_positions = use_positional_phrases(index)
    if not use_positions:
        for ph, _neg in plan.phrases:
            if ph in gram_phrases or ph in fallback:
                continue
            if use_gram_phrase(index, ph):
                gram_phrases.add(ph)  # matched from the gram posting list
            else:
                # exact adjacency via corpus — evaluated distributed as
                # synthetic posting rows (phrase_fallback_segments), never
                # collected to the driver
                fallback.add(ph)
    return {
        "idf": idf,
        "gram_phrases": frozenset(gram_phrases),
        "fallback_phrases": frozenset(fallback),
        "use_positions": use_positions,
        "k1": index.config.bm25.k1,  # blended-synonym norm recovery (_score)
        "similarity": similarity,
        # classic/LM-similarity doclen recovery from stored partials (_score)
        "b": index.config.bm25.b,
        "avgdl": index.avgdl,
        "mu_p": mu_p,  # lm_dirichlet per-key μ·p(t) (plans/scoring.mu_p_map)
        **_restriction_arrays(index, facts),
    }


def match_kernel(index, query, facts: list[str] | None = None) -> DataFrame:
    """Unscored boolean match set via the kernel path."""
    plan = _as_plan(query)
    if index.segments is None:
        index.build_segments()
    groups = _query_groups(index, plan, _descriptor(index, plan, facts), k=None)
    return groups.select("doc_id")


def search_kernel(
    index, query, k: int = 10, facts: list[str] | None = None,
    after: tuple[float, int] | None = None, similarity: str = "bm25",
) -> DataFrame:
    """BM25 top-k via the kernel path — rank-identical to search_dataframe.

    ``after=(score, doc_id)``: deep pagination (Elasticsearch search_after):
    return the k results strictly after the cursor in (score desc, doc_id
    asc) order. Pages stay k-row jobs at any depth — no window over the
    full result, no growing LIMIT. Cursored queries use the exhaustive
    kernel (cursor filter after scoring); page-1 fast paths are untouched."""
    plan = _as_plan(query)
    if index.segments is None:
        index.build_segments()
    desc = _descriptor(index, plan, facts, similarity)
    if after is not None:
        desc["after"] = (round(float(after[0]), 4), int(after[1]))
    groups = _query_groups(index, plan, desc, k=k)
    res = groups.select("doc_id", F.round(F.col("score"), 4).alias("score"))
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
