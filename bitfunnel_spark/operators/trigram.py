"""Trigram substring index — Zoekt / Google Code Search design.

Literal substring search over raw text (the `grep` workload of a
source-code search engine) accelerated by a character-trigram inverted
index, per R. Cox, "Regular Expression Matching with a Trigram Index"
(the russ-cox codesearch design Zoekt industrialized): a document can
contain the literal only if it contains every trigram of the literal, so
candidates = AND over the literal's trigram posting lists, then an exact
`contains` verify touches only candidates.

The reference engine has no substring search (BitFunnel terms are whole
tokens); this is the code-payload extension of the same posting-list
idea, with the planner trick every production implementation uses:
probe only the RAREST few trigrams (df-ordered) — correctness never
depends on which subset is probed because the verify is exact, so the
skewed common trigrams ("the", "  i") simply never drive a scan.

Scale shape: the index is one distinct-explode + (optional) write
bucketed by `tri_bucket` (pmod of xxhash64, same layout as the term
segment store, so a query's `tri_bucket IN (...) AND trigram IN (...)`
prunes files); candidacy is one pruned scan + groupBy(doc) count;
verify is a semi-joined `contains` filter over candidates only. The
df-lookup job collects <= len(literal) rows — never match-set-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_TRI_BUCKETS = 64
# probe the q rarest trigrams of the literal (Zoekt probes a rare pair;
# 3 keeps candidate sets small at negligible extra scan width)
DEFAULT_PROBES = 3


def trigram_expr(col: Column | str) -> Column:
    """Distinct character trigrams of lower(col), as array<string>.

    Three shifted char-slices zipped (the tokenizer.ngrams construction:
    lambdas only touch their own variables, so Catalyst never re-evaluates
    a derived array per element)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    chars = F.split(low, "")
    m = F.length(low) - 2
    z = F.arrays_zip(F.slice(chars, 1, m), F.slice(chars, 2, m), F.slice(chars, 3, m))
    tris = F.transform(z, lambda x: F.concat(x["0"], x["1"], x["2"]))
    return F.when(F.length(low) >= 3, F.array_distinct(tris)).otherwise(
        F.array().cast("array<string>")
    )


def tri_bucket_col(tri: Column, n_buckets: int = N_TRI_BUCKETS) -> Column:
    return F.pmod(F.xxhash64(tri), F.lit(n_buckets)).cast("int")


def build_trigram_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """(tri_bucket, trigram, doc_id): one row per distinct (doc, trigram).

    Map-side distinct-per-doc (array_distinct before the explode), so the
    exploded row count is bounded by distinct trigrams/doc, not text
    length. Persist partitioned by tri_bucket for file pruning at scale."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(trigram_expr(text_col)).alias("trigram")
    ).select(tri_bucket_col(F.col("trigram"), n_buckets).alias("tri_bucket"), "trigram", "doc_id")


def literal_trigrams(literal: str) -> list[str]:
    low = literal.lower()
    return sorted({low[i : i + 3] for i in range(len(low) - 2)})


def substring_search(
    postings: DataFrame,
    corpus: DataFrame,
    literal: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_probe: int = DEFAULT_PROBES,
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """doc_ids whose ``text_col`` contains ``literal`` (case-insensitive).

    Plan: (1) df-lookup of the literal's trigrams (collects <= |literal|
    rows); a trigram absent from the corpus proves zero matches with NO
    corpus scan. (2) candidates = docs containing all ``n_probe`` rarest
    trigrams — one bucket-and-trigram pruned scan + groupBy(doc) count.
    (3) exact verify: semi-joined `contains` over candidates only.
    Literals shorter than 3 chars fall back to a full verify scan
    (documented; the index cannot help them)."""
    low = literal.lower()
    verify = F.contains(F.lower(F.col(text_col)), F.lit(low))
    if len(low) < 3:
        return corpus.filter(verify).select(F.col(id_col).alias("doc_id"))
    tris = literal_trigrams(low)
    buckets = _buckets(corpus.sparkSession, tris, n_buckets)
    scan = postings.filter(
        F.col("tri_bucket").isin(sorted(set(buckets.values())))
        & F.col("trigram").isin(tris)
    )
    dfs = {r["trigram"]: r["df"] for r in
           scan.groupBy("trigram").agg(F.count("*").alias("df")).collect()}
    if len(dfs) < len(tris):  # some trigram occurs nowhere -> no doc matches
        return corpus.sparkSession.createDataFrame([], "doc_id long")
    probes = [t for t, _ in sorted(dfs.items(), key=lambda kv: (kv[1], kv[0]))[:n_probe]]
    cand = (
        postings.filter(
            F.col("tri_bucket").isin(sorted({buckets[t] for t in probes}))
            & F.col("trigram").isin(probes)
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") == len(probes))
        .select("doc_id")
    )
    return (
        corpus.join(cand.withColumnRenamed("doc_id", id_col).select(id_col), id_col, "left_semi")
        .filter(verify)
        .select(F.col(id_col).alias("doc_id"))
    )


def substring_search_many(
    postings: DataFrame,
    corpus: DataFrame,
    literals: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_probe: int = DEFAULT_PROBES,
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """(query, doc_id) for a batch of literals in ONE candidate scan.

    Per-literal rarest-probe selection shares a single df-lookup job (all
    literals' trigrams in one pruned agg), then a single (query, trigram)
    broadcast join drives candidacy for every literal at once — the
    percolator shape applied to substring search. Sub-trigram literals
    ride one extra full-verify pass."""
    short = [q for q in literals if len(q) < 3]
    longs = [q for q in literals if len(q) >= 3]
    spark = corpus.sparkSession
    out = None
    if longs:
        all_tris = sorted({t for q in longs for t in literal_trigrams(q)})
        buckets = _buckets(spark, all_tris, n_buckets)
        scan = postings.filter(
            F.col("tri_bucket").isin(sorted(set(buckets.values())))
            & F.col("trigram").isin(all_tris)
        )
        dfs = {r["trigram"]: r["df"] for r in
               scan.groupBy("trigram").agg(F.count("*").alias("df")).collect()}
        pairs, need = [], {}
        for q in longs:
            tris = literal_trigrams(q)
            if any(t not in dfs for t in tris):
                continue  # proven absent corpus-wide
            probes = [t for t, _ in sorted(((t, dfs[t]) for t in tris),
                                           key=lambda kv: (kv[1], kv[0]))[:n_probe]]
            need[q] = len(probes)
            pairs.extend((q, t) for t in probes)
        if pairs:
            pair_df = F.broadcast(spark.createDataFrame(pairs, "query string, trigram string"))
            need_df = F.broadcast(spark.createDataFrame(list(need.items()), "query string, need int"))
            cand = (
                scan.join(pair_df, "trigram")
                .groupBy("query", "doc_id")
                .agg(F.count("*").alias("c"))
                .join(need_df, "query")
                .filter(F.col("c") == F.col("need"))
                .select("query", "doc_id")
            )
            ver = cand.join(
                corpus.select(F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_t")),
                "doc_id",
            ).filter(F.expr("contains(_t, lower(query))")).select("query", "doc_id")
            out = ver
    if short:
        sdf = F.broadcast(spark.createDataFrame([(q,) for q in short], "query string"))
        sv = (
            corpus.select(F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_t"))
            .crossJoin(sdf)
            .filter(F.expr("contains(_t, lower(query))"))
            .select("query", "doc_id")
        )
        out = sv if out is None else out.unionByName(sv)
    if out is None:
        return spark.createDataFrame([], "query string, doc_id long")
    return out


_BUCKET_CACHE: dict[tuple[str, int], int] = {}


def _buckets(spark, tris: list[str], n_buckets: int) -> dict[str, int]:
    """tri_bucket values for literal trigrams, by evaluating the SAME
    Spark expression over a |tris|-row literal DataFrame (no corpus scan;
    memoized per trigram) — the IN-list pushed into the posting scan is
    exact-by-construction, no Python reimplementation of xxhash64."""
    missing = [t for t in tris if (t, n_buckets) not in _BUCKET_CACHE]
    if missing:
        rows = (
            spark.createDataFrame([(t,) for t in missing], "trigram string")
            .select("trigram", tri_bucket_col(F.col("trigram"), n_buckets).alias("b"))
            .collect()
        )
        for r in rows:
            _BUCKET_CACHE[(r["trigram"], n_buckets)] = int(r["b"])
    return {t: _BUCKET_CACHE[(t, n_buckets)] for t in tris}


# ---------------------------------------------------------------------------
# regex search over the trigram index — the second half of Cox's design
# ("Regular Expression Matching with a Trigram Index"): derive a boolean
# trigram query the regex IMPLIES (any matching text must satisfy it),
# evaluate it as candidacy over the posting table, verify candidates with
# the real regex. We extract REQUIRED LITERALS conservatively from the
# stdlib regex AST: concatenations collect maximal literal runs, a branch
# is the OR of its alternatives, anything uncertain (classes, repeats with
# min 0, lookarounds, backrefs) degrades to TRUE — never unsound, only
# less selective. TRUE anywhere that matters = full verify scan.

_TRUE = ("true",)


def _regex_candidate_tree(pattern: str):
    """('true',) | ('lit', s) | ('and', [...]) | ('or', [...]) — a boolean
    condition over document text that `text matches pattern` implies.
    Literals are lowercased (the index is lowercase; verification is
    case-insensitive by contract)."""
    import re._parser as sre

    def seq_info(seq):
        parts, run = [], []

        def flush():
            if run:
                parts.append(("lit", "".join(run)))
                run.clear()

        for op, av in seq:
            name = str(op)
            if name == "LITERAL":
                ch = chr(av)
                run.append(ch.lower())
                continue
            flush()
            if name == "BRANCH":
                alts = [seq_info(s) for s in av[1]]
                parts.append(_mk_or(alts))
            elif name == "SUBPATTERN":
                parts.append(seq_info(av[3]))
            elif name == "ATOMIC_GROUP":
                parts.append(seq_info(av))
            elif name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
                lo, _hi, sub = av
                parts.append(seq_info(sub) if lo >= 1 else _TRUE)
            else:
                # IN, ANY, AT, NOT_LITERAL, CATEGORY, ASSERT*, GROUPREF, ...
                parts.append(_TRUE)
        flush()
        return _mk_and(parts)

    try:
        return seq_info(sre.parse(pattern))
    except Exception:
        return _TRUE  # unparseable by the extractor -> full verify scan


def _prunable(node):
    """Rewrite the tree keeping only trigram-usable conditions: literals
    shorter than 3 chars carry no trigram and become TRUE."""
    kind = node[0]
    if kind == "lit":
        return node if len(node[1]) >= 3 else _TRUE
    if kind == "and":
        kids = [k for k in (_prunable(c) for c in node[1]) if k != _TRUE]
        return _mk_and(kids) if kids else _TRUE
    if kind == "or":
        kids = [_prunable(c) for c in node[1]]
        return _TRUE if any(k == _TRUE for k in kids) else _mk_or(kids)
    return _TRUE


def _mk_and(parts):
    parts = [p for p in parts if p != _TRUE]
    flat = []
    for p in parts:
        flat.extend(p[1] if p[0] == "and" else [p])
    if not flat:
        return _TRUE
    return flat[0] if len(flat) == 1 else ("and", flat)


def _mk_or(parts):
    if any(p == _TRUE for p in parts):
        return _TRUE
    flat = []
    for p in parts:
        flat.extend(p[1] if p[0] == "or" else [p])
    return flat[0] if len(flat) == 1 else ("or", flat)


def _tree_trigrams(node) -> list[str]:
    if node[0] == "lit":
        return literal_trigrams(node[1])
    if node[0] in ("and", "or"):
        out: set[str] = set()
        for c in node[1]:
            out.update(_tree_trigrams(c))
        return sorted(out)
    return []


def regex_search(
    postings: DataFrame,
    corpus: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """doc_ids whose ``text_col`` matches ``pattern`` anywhere
    (case-insensitive `grep -E`). Candidates come from evaluating the
    regex's required-literal tree over ONE pruned posting scan (per-doc
    collect_set of the needed trigrams, then the tree as nested
    array_contains boolean); verification is `rlike('(?i)' + pattern)`
    over candidates only. A tree that degrades to TRUE (no extractable
    literal >= 3 chars) verifies the full corpus — correct, just
    unaccelerated, exactly Cox's fallback."""
    tree = _prunable(_regex_candidate_tree(pattern))
    verify = F.lower(F.col(text_col)).rlike("(?i)" + pattern)
    if tree == _TRUE:
        return corpus.filter(verify).select(F.col(id_col).alias("doc_id"))
    tris = _tree_trigrams(tree)
    buckets = _buckets(corpus.sparkSession, tris, n_buckets)
    matched = (
        postings.filter(
            F.col("tri_bucket").isin(sorted(set(buckets.values())))
            & F.col("trigram").isin(tris)
        )
        .groupBy("doc_id")
        .agg(F.collect_set("trigram").alias("ts"))
    )

    cand = matched.filter(_tree_cond(tree)).select("doc_id")
    return (
        corpus.join(cand.withColumnRenamed("doc_id", id_col).select(id_col), id_col, "left_semi")
        .filter(verify)
        .select(F.col(id_col).alias("doc_id"))
    )


def regex_search_many(
    postings: DataFrame,
    corpus: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """(query, doc_id) for a batch of regex patterns in ONE shared
    candidate scan + ONE verify scan (the substring_search_many shape
    generalized to per-pattern required-literal trees).

    Every pattern's tree is evaluated as a boolean column over the SAME
    per-doc trigram set: one pruned posting scan feeds a single projection
    of (query, matched) structs — no per-pattern jobs, no joins to build
    candidacy. Verification is one `rlike` pass where the pattern is a
    per-row COLUMN (Spark compiles and caches the regex per distinct
    value), joined to candidates only. Patterns whose tree degrades to
    TRUE share one extra full-verify pass — batched, so P unprunable
    patterns still cost one corpus scan, not P."""
    spark = corpus.sparkSession
    trees = {p: _prunable(_regex_candidate_tree(p)) for p in dict.fromkeys(patterns)}
    full = sorted(p for p, t in trees.items() if t == _TRUE)
    pruned = {p: t for p, t in trees.items() if t != _TRUE}
    rx = lambda: F.expr("rlike(_t, concat('(?i)', query))")  # noqa: E731
    lowered = corpus.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_t")
    )
    out = None
    if pruned:
        all_tris = sorted({t for tr in pruned.values() for t in _tree_trigrams(tr)})
        buckets = _buckets(spark, all_tris, n_buckets)
        matched = (
            postings.filter(
                F.col("tri_bucket").isin(sorted(set(buckets.values())))
                & F.col("trigram").isin(all_tris)
            )
            .groupBy("doc_id")
            .agg(F.collect_set("trigram").alias("ts"))
        )
        evals = F.array(
            *[
                F.struct(F.lit(p).alias("query"), _tree_cond(t).alias("m"))
                for p, t in sorted(pruned.items())
            ]
        )
        cand = (
            matched.select("doc_id", F.explode(evals).alias("e"))
            .filter(F.col("e.m"))
            .select(F.col("e.query").alias("query"), "doc_id")
        )
        out = cand.join(lowered, "doc_id").filter(rx()).select("query", "doc_id")
    if full:
        pdf = F.broadcast(spark.createDataFrame([(p,) for p in full], "query string"))
        fv = lowered.crossJoin(pdf).filter(rx()).select("query", "doc_id")
        out = fv if out is None else out.unionByName(fv)
    if out is None:
        return spark.createDataFrame([], "query string, doc_id long")
    return out


def grep_many(
    postings: DataFrame,
    corpus: DataFrame,
    queries: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """(query, doc_id) for a MIXED grep log of ('lit', literal) and
    ('re', pattern) queries, all sharing one candidate scan + one verify.

    Literals are routed through the regex batch as ``re.escape(literal)``
    — their required-literal tree is the literal itself, so candidacy is
    AND over every trigram (strictly tighter than the rarest-probe subset,
    and it drops the per-batch df-lookup job the probe selection needs).
    The returned ``query`` column carries the ORIGINAL query text."""
    import re as _re

    mapped, back = [], {}
    for kind, q in queries:
        pat = _re.escape(q) if kind == "lit" else q
        if back.get(pat, q) != q:
            raise ValueError(
                f"grep_many: queries {back[pat]!r} and {q!r} compile to the "
                f"same pattern {pat!r} — results would merge; dedupe the log"
            )
        mapped.append(pat)
        back[pat] = q
    out = regex_search_many(postings, corpus, mapped, text_col, id_col, n_buckets)
    mapping = F.create_map(
        *[x for pat, q in back.items() for x in (F.lit(pat), F.lit(q))]
    )
    return out.select(mapping[F.col("query")].alias("query"), "doc_id")


def _tree_cond(node) -> Column:
    """The required-literal tree as a boolean over a per-doc trigram set
    column ``ts`` (array<string>)."""
    if node[0] == "lit":
        c = F.lit(True)
        for t in literal_trigrams(node[1]):
            c = c & F.array_contains("ts", t)
        return c
    kids = [_tree_cond(k) for k in node[1]]
    out = kids[0]
    for k in kids[1:]:
        out = (out & k) if node[0] == "and" else (out | k)
    return out


def substring_search_lines(
    postings: DataFrame,
    corpus: DataFrame,
    literal: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_probe: int = DEFAULT_PROBES,
    n_buckets: int = N_TRI_BUCKETS,
) -> DataFrame:
    """(doc_id, line_no, line) — `grep -n` over the corpus: every line of
    every matching document containing the literal (case-insensitive;
    line_no is 1-based). The line explode happens ONLY for candidate
    documents (semi-join first), so its cost scales with the match set,
    not the corpus."""
    matches = substring_search(
        postings, corpus, literal, text_col, id_col, n_probe, n_buckets
    )
    low = literal.lower()
    lines = (
        corpus.join(
            matches.withColumnRenamed("doc_id", id_col).select(id_col), id_col, "left_semi"
        )
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        )
        .filter(F.contains(F.lower("line"), F.lit(low)))
    )
    return lines.select("doc_id", (F.col("idx") + 1).alias("line_no"), "line")


def write_trigram_index(postings: DataFrame, path: str) -> None:
    """Persist the trigram postings partitioned by tri_bucket — the same
    file layout as the term segment store, so a search's
    `tri_bucket IN (...)` becomes partition pruning (files outside the
    literal's buckets are never opened)."""
    postings.write.mode("overwrite").partitionBy("tri_bucket").parquet(path)


def read_trigram_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
