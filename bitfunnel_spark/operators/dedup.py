"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection — all as
declarative DataFrame plans (joins/groupBys Catalyst can optimize), all with
exact DuckDB mirrors. Hashing is md5-hex (engine-independent); minhash
signatures are lexicographic minima of md5 strings, so Spark and the oracle
agree bit-for-bit.

Scale notes (100 TB): the pairwise joins here are candidate-generation joins
on shingle/band/bucket keys, never full cross joins. Skewed keys (a shingle
appearing in millions of docs) are the hazard — mitigations noted per op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bitfunnel_spark.functions.tokenizer import ngrams, tokenize


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: (content_md5, n_docs, canonical_id) for
    groups with >1 doc. One shuffle, map-side partial agg."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


def _shingles(text_col: str, n: int) -> Column:
    return F.array_distinct(ngrams(tokenize(text_col), n))


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(_shingles(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 5000,
) -> DataFrame:
    """All doc pairs (a < b) with n-gram Jaccard ≥ threshold.

    Candidate generation = self-join on shared shingles (docs sharing zero
    shingles can't pass any threshold > 0). Jaccard = |∩| / (|A|+|B|-|∩|).

    Scale: `max_shingle_df` drops ultra-common shingles from candidate
    generation (the classic stop-shingle cut that kills join skew) — ON BY
    DEFAULT with a conservative cap: a shingle present in >5000 docs would
    alone contribute >12.5M join pairs. Dropping them makes candidate recall
    approximate for thresholds near 0 but effectively exact for near-dup
    thresholds, since near-dups share many (rarer) shingles. Jaccard is
    still computed over ALL shingles. Pass None for the exact formulation
    (test scale / oracle mirroring).
    """
    sh = shingle_sets(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cand_sh = sh
    if max_shingle_df is not None:
        rare = sh.groupBy("shingle").agg(F.count("*").alias("sdf")).filter(
            F.col("sdf") <= max_shingle_df
        )
        cand_sh = sh.join(rare.select("shingle"), "shingle", "left_semi")
    a = cand_sh.alias("a")
    b = cand_sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination scan: (doc_id, n_shared) for every training
    doc sharing ≥ min_overlap distinct n-gram shingles with ANY eval doc.

    The standard held-out-set leak check for training corpora. Shape at
    100 TB: the eval side is a benchmark (KB–MB of distinct shingles), so
    it BROADCASTS; the scan over the training side is then one narrow
    semi-join + partial-aggregated count — no train-side self-join, no
    skew (each train doc contributes at most its own shingle count).
    """
    t = shingle_sets(train, text_col, id_col, n)
    ev = shingle_sets(eval_df, text_col, id_col, n).select("shingle").distinct()
    return (
        t.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))  # (doc_id, shingle) pairs are distinct
        .filter(F.col("n_shared") >= min_overlap)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Training corpus with contaminated docs removed (see
    :func:`contamination`)."""
    bad = contamination(train, eval_df, text_col, id_col, n, min_overlap)
    return train.join(
        bad.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """(doc_id, sig: array<string>) — sig[i] = min over shingles of
    md5(i || ':' || shingle). Lexicographic min of md5 hex ≡ min of the
    128-bit integer — a valid minwise family, and identical in any engine.
    Computed entirely with higher-order functions: no explode, no shuffle.

    NB: the per-i prefix is captured via a closure, never a lambda default
    arg — pyspark infers HOF arity from the parameter COUNT, so
    ``lambda g, i=i`` becomes a (element, index) binary lambda and the
    "prefix" silently renders as the index column's repr. That bug kept a
    valid (distinct-prefix) min-wise family, so verified pairs stayed
    correct, but broke the cross-engine md5('i:'||g) contract."""
    sh = _shingles(text_col, n)

    def _mh(i: int):
        pref = f"{i}:"
        return F.array_min(F.transform(sh, lambda g: F.md5(F.concat(F.lit(pref), g))))

    sig = F.array(*[_mh(i) for i in range(num_hashes)])
    return df.select(F.col(id_col).alias("doc_id"), sig.alias("sig")).filter(
        F.size(sh) > 0
    )


def band_rows(sig_df: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """(doc_id, band_id, band_key) — the LSH band index of a signature
    table. At scale this IS the persisted dedup artifact: append each new
    batch's bands, equi-join to find candidates; the corpus itself is
    never rescanned."""
    n_bands = num_hashes // band_size
    return sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[F.col("sig")[bi * band_size + j] for j in range(band_size)],
                        ).alias("band_key"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_id", "b.band_key")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup pairs: band the signature (num_hashes/band_size
    bands), self-join on (band_id, band_key), then verify candidates with the
    exact n-gram Jaccard ≥ threshold.

    Scale: the band join is the only shuffle that touches all docs; band keys
    are md5-min strings → uniformly distributed, no skew. Verification is a
    per-pair exact Jaccard computed ONLY on candidate pairs — each candidate
    joins to the two docs' distinct-shingle arrays and Jaccard is
    |array_intersect| / |array_union|; the full-corpus shingle self-join of
    the exact algorithm never runs (that was the whole point of banding).
    """
    assert num_hashes % band_size == 0
    sig = minhash_signature(df, text_col, id_col, n, num_hashes)
    bands = band_rows(sig, num_hashes, band_size)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh_doc = df.select(
        F.col(id_col).alias("doc_id"), _shingles(text_col, n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    a_sh = sh_doc.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b_sh = sh_doc.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(a_sh, "doc_a")
        .join(b_sh, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """(doc_id, simhash: bigint) — `bits`-bit SimHash over tf-weighted terms.

    Bit j of a term's hash = high bit of hex nibble j of md5(term); the
    fingerprint sets bit j iff Σ_terms tf·(±1) > 0. Pure column expressions
    (one explode + one groupBy); identical CASE arithmetic in the oracle.
    Near-dup docs differ in few bits (compare via popcount of XOR).
    """
    assert bits <= 32
    toks = tokenize(text_col)
    tf = df.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("term")
    ).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    high = tuple("89abcdef")
    bit_sums = [
        F.sum(
            F.when(F.substring(F.md5(F.col("term")), j + 1, 1).isin(*high), F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_distance: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — near-dup pairs whose SimHash fingerprints
    differ in ≤ max_distance bits, via band-join candidate generation (the
    SimHash analogue of minhash banding).

    The fingerprint is split into n_bands contiguous bit bands; candidates
    are pairs sharing ANY band. Pigeonhole: a pair at hamming distance
    d < n_bands has at least one band with zero differing bits, so with the
    default n_bands = max_distance + 1 recall is EXACT for d ≤ max_distance
    — the banding is a pure candidate filter, not an approximation. One
    explode (n_bands rows/doc) + one equi-join on (band_id, band_bits);
    popcount(xor) verifies candidates.
    """
    if n_bands is None:
        n_bands = max_distance + 1
    assert bits % n_bands == 0, "bits must divide evenly into bands"
    w = bits // n_bands
    mask = (1 << w) - 1
    fp = simhash(df, text_col, id_col, bits)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.shiftright(F.col("simhash"), bi * w)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_bits"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_id", "b.band_bits")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_distance
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b) with cosine ≥ threshold —
    EXACT all-pairs formulation: O(N²), the small-scale oracle only. The
    scale path is :func:`embedding_neardup_pairs_lsh` (per-bucket join)."""
    from bitfunnel_spark.operators.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return pairs.select("id_a", "id_b", F.round(cos, 4).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def embedding_neardup_pairs_lsh(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    dims: tuple[int, ...] | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup pairs: deterministic sign-LSH
    bucketing (operators/similarity.axis_bucket_expr), then an equi-join on
    the bucket — each bucket holds ~N/2^|dims| vectors, so the join is
    per-bucket quadratic instead of globally quadratic. High-cosine pairs
    agree on most coordinate signs, so recall is high for near-dup
    thresholds; pairs straddling a bucket boundary are missed by design
    (the oracle mirrors the same bucketing, so correctness is exact w.r.t.
    the algorithm)."""
    from bitfunnel_spark.operators.similarity import AXIS_DIMS, axis_bucket_expr, cosine_expr

    dims = dims or AXIS_DIMS
    withb = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        axis_bucket_expr(F.col(vec_col), dims).alias("bucket"),
    )
    a = withb.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = withb.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return pairs.select("id_a", "id_b", F.round(cos, 4).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTERS from a pair list: DataFrame[(node,
    cluster_id)] where cluster_id is the minimum node id of the connected
    component (the canonical representative). Only nodes that appear in a
    pair are returned — singletons are their own trivial cluster.

    Algorithm: min-label propagation with pointer-jumping. Each round
    (a) takes per node the minimum of its own and its neighbors' labels
    (one edge join + partial-agg groupBy) and (b) shortcuts each label to
    its label's label (one self-join) — the classic hook+shortcut scheme,
    so convergence is O(log diameter) rounds, not O(diameter). Every round
    ends in an EAGER ``localCheckpoint`` — without it the plan for round k
    embeds all k-1 predecessors and planning time balloons (measured: the
    cached-only variant grew 1s -> 12s+ per round by iteration 4); the
    checkpoint truncates lineage so per-round cost is flat. The driver
    sees ONE scalar per round (the change count), never data — the
    standard Spark shape for iterative graph algorithms (GraphFrames'
    label propagation loops the same way).
    """
    fwd = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    rev = pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = edges.join(
            labels.select(F.col("node").alias("b"), F.col("lbl").alias("nlbl")), "b"
        ).select(F.col("a").alias("node"), F.col("nlbl").alias("lbl"))
        hooked = labels.union(nbr).groupBy("node").agg(F.min("lbl").alias("lbl"))
        # shortcut: lbl <- lbl(lbl); labels only decrease, so lbl2 <= lbl
        new = (
            hooked.join(
                hooked.select(F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")),
                "lbl",
                "left",
            )
            .select("node", F.coalesce("lbl2", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.select("node", F.col("lbl").alias("old")), "node")
            .filter(F.col("lbl") < F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("node").alias("node"), F.col("lbl").alias("cluster_id"))


def neardup_drop_list(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b"
) -> DataFrame:
    """Documents a dedup pass should DROP: every clustered node except its
    cluster's canonical representative (the minimum id). The standard
    keep-one-per-cluster policy of LLM-corpus dedup pipelines."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


def incremental_exact_filter(
    new_df: DataFrame,
    main_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ids of NEW docs surviving exact dedup against MAIN plus earlier
    (lower-id) docs of the same batch — the per-batch step of a streaming
    dedup pipeline. One anti-join against main's content-hash set (at
    scale: a persisted, incrementally-appended hash table) + one keep-min
    per hash within the batch."""
    main_h = main_df.select(F.md5(F.col(text_col)).alias("h")).distinct()
    w = new_df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h"))
    survived = w.join(main_h, "h", "left_anti")
    first = survived.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return first.select("doc_id")


def incremental_minhash_filter(
    new_df: DataFrame,
    main_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Ids of NEW docs surviving near-dup filtering against an
    already-deduplicated MAIN corpus — the streaming-dedup batch step.

    A new doc is dropped when its exact n-gram Jaccard reaches
    ``threshold`` with ANY main doc or any EARLIER (lower-id) doc of the
    same batch (greedy streaming semantics: an earlier new doc kills
    later ones regardless of its own fate — the policy of C4/RefinedWeb
    style pipelines). Candidates come from the band index equi-join
    (new×main and new×new); MAIN is touched only through its band table —
    at scale a persisted artifact appended once per batch (band_rows) —
    and through the shingle arrays of candidate-bearing docs only.
    """
    sig_new = minhash_signature(new_df, text_col, id_col, n, num_hashes)
    sig_main = minhash_signature(main_df, text_col, id_col, n, num_hashes)
    bn = band_rows(sig_new, num_hashes, band_size)
    bm = band_rows(sig_main, num_hashes, band_size)

    v, p = bn.alias("v"), bm.alias("p")
    cand_nm = v.join(
        p,
        (F.col("v.band_id") == F.col("p.band_id"))
        & (F.col("v.band_key") == F.col("p.band_key")),
    ).select(F.col("v.doc_id").alias("victim"), F.col("p.doc_id").alias("partner"))
    a, b = bn.alias("a"), bn.alias("b")
    cand_nn = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("b.doc_id").alias("victim"), F.col("a.doc_id").alias("partner"))
    cand = cand_nm.union(cand_nn).distinct()

    sh_all = (
        new_df.select(F.col(id_col).alias("doc_id"), _shingles(text_col, n).alias("sh"))
        .union(
            main_df.select(F.col(id_col).alias("doc_id"), _shingles(text_col, n).alias("sh"))
        )
        .filter(F.size("sh") > 0)
    )
    vs = sh_all.select(F.col("doc_id").alias("victim"), F.col("sh").alias("sh_v"))
    ps = sh_all.select(F.col("doc_id").alias("partner"), F.col("sh").alias("sh_p"))
    jac = F.size(F.array_intersect("sh_v", "sh_p")).cast("double") / F.size(
        F.array_union("sh_v", "sh_p")
    )
    victims = (
        cand.join(vs, "victim")
        .join(ps, "partner")
        .filter(F.round(jac, 4) >= threshold)
        .select("victim")
        .distinct()
    )
    ids = new_df.select(F.col(id_col).alias("doc_id"))
    return ids.join(victims.withColumnRenamed("victim", "doc_id"), "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better" — the ExactSubstr variant). The suffix-array the
# paper builds on one machine becomes, distributed: every length-L token
# window emits a fingerprint; a window whose fingerprint occurs >= 2 times
# corpus-wide (same doc counts — self-repetition is a duplicate) is a
# duplicated position; per-doc runs of duplicated positions merge into
# maximal spans. Two shuffles total: groupBy(fingerprint) over ~one row per
# token (16-byte rows), then a per-doc window merge over only the duplicated
# positions. No pairwise join exists anywhere, so a boilerplate gram shared
# by millions of docs costs its row count, never a quadratic pair blowup —
# the skew hazard of the pair-emitting dedups does not apply.
#
# 100 TB refinement (documented, not default): winnowing (Schleimer et al.,
# MOSS) — keep only per-window-minimum fingerprints, guaranteeing any match
# of length >= L + w - 1 still shares a kept fingerprint, cutting shuffle
# volume ~2/(w+1). The exact all-positions form below IS the oracle.


def substring_gram_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, pos, g): the xxhash64 fingerprint of the ``min_len``-token
    window starting at 0-based token position ``pos``. One map-side explode,
    ~one output row per token; the window text itself never rides the
    shuffle (the 64-bit fingerprint does)."""
    toks = tokenize(text_col, analyzer)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk")).filter(
        F.size("tk") >= min_len
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("tk") - min_len),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice("tk", i + 1, min_len))).alias("g"),
        ),
    )
    return base.select("doc_id", F.explode(grams).alias("w")).select(
        "doc_id", F.col("w.pos").alias("pos"), F.col("w.g").alias("g")
    )


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): maximal token intervals
    [span_start, span_end) every position of which begins a ``min_len``-gram
    that occurs >= 2 times in the corpus — the removal targets of
    exact-substring dedup. span bounds are 0-based token offsets;
    n_windows is the count of duplicated window starts merged into the span.

    Fingerprint grouping stands in for text grouping (a 64-bit collision
    would need ~2^32 distinct grams per Birthday bound to appear at all and
    is absent by construction in tests); the DuckDB oracle groups by the
    window TEXT, so a cross-engine hash match also certifies
    collision-freeness on the checked corpus.
    """
    from pyspark.sql import Window

    grams = substring_gram_positions(df, text_col, id_col, min_len, analyzer)
    dup_g = grams.groupBy("g").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    dup_pos = grams.join(dup_g.select("g"), "g")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + min_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup_pos.withColumn(
        "new_span", (prev_max_end.isNull() | (F.col("pos") > prev_max_end)).cast("int")
    )
    spans = flagged.withColumn(
        "span_id", F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + min_len).alias("span_end"),
        F.count("*").alias("n_windows"),
    ).select("doc_id", "span_start", "span_end", "n_windows")


def substring_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    analyzer: str = "standard",
) -> DataFrame:
    """Input rows with every duplicated span CUT FROM THE ORIGINAL TEXT
    BYTES (Lee et al. ExactSubstr removes the span from the raw bytes, so
    unduplicated documents pass through byte-identical — casing,
    punctuation, and whitespace preserved). The cut range for a token span
    [s, e) is [start_char(token s), end_char(token e-1)); text between the
    surviving pieces is concatenated. Drop-all-copies policy;
    keep-one-canonical needs a global tie-break pass and is left to the
    caller via substring_dup_spans. Output: (doc_id, text,
    n_dropped_tokens).

    Note for the 'code' analyzer: cutting subtoken bytes out of an
    identifier can fuse the neighbours into a new identifier ("a1b" minus
    the "1" subtoken re-tokenizes as "ab") — inherent to byte surgery over
    split identifiers, same as cutting bytes in Lee et al."""
    spans = substring_dup_spans(df, text_col, id_col, min_len, analyzer).groupBy(
        "doc_id"
    ).agg(F.collect_list(F.struct("span_start", "span_end")).alias("spans"))
    return _cut_spans_bytes(df, spans, text_col, id_col, analyzer)


def winnowed_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 43,
    w: int = 8,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, pos, g): the WINNOWED subset of k-gram fingerprints
    (Schleimer et al., MOSS): position p is kept iff it is the
    rightmost-minimum of at least one full w-window of k-gram hashes.
    Guarantees: (1) every w consecutive positions contain >= 1 kept
    fingerprint; (2) selection at p depends only on the hashes inside the
    windows containing p, so two documents sharing a token run of length
    >= w + k - 1 keep at least one IDENTICAL fingerprint value. Density
    ~ 2/(w+1) of all positions — the shuffle-volume reducer for
    substring dedup at scale.

    Selection evaluates per position in O(w) pure-JVM work:
    r = length of the strictly-greater run to the right (capped at w-1);
    p is kept iff a full window ends inside [p, p+r]
    (p + r >= w - 1) and h[p] <= every hash in that window left of p.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = tokenize(text_col, analyzer)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk")).filter(
        F.size("tk") >= k
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("tk") - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice("tk", i + 1, k))),
    )
    hdf = base.select("doc_id", grams.alias("h"))
    m = F.size("h")

    def keep(p):
        hp = F.get("h", p)
        # strictly-greater run to the right, capped at w-1 and array end
        rseg = F.slice(F.col("h"), p + 2, F.least(F.lit(w - 1), m - 1 - p))
        hits = F.filter(
            F.transform(rseg, lambda x, i: F.when(x <= hp, i).otherwise(F.lit(-1))),
            lambda v: v >= 0,
        )
        r = F.when(F.size(hits) > 0, F.get(hits, 0)).otherwise(F.size(rseg))
        e = p + r  # rightmost full window endable at p
        lstart = F.greatest(e - (w - 1), F.lit(0))
        lseg = F.slice(F.col("h"), lstart + 1, p - lstart)
        left_ok = (F.size(lseg) == 0) | (F.array_min(lseg) >= hp)
        return (e >= w - 1) & left_ok

    sel = F.filter(F.sequence(F.lit(0), m - 1), keep)
    out = hdf.select(
        "doc_id",
        F.explode(
            F.transform(sel, lambda p: F.struct(p.cast("int").alias("pos"),
                                                F.get("h", p).alias("g")))
        ).alias("s"),
    )
    return out.select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))


def substring_dup_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    w: int = 8,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id): documents that MAY contain a duplicated token run of
    length >= min_len — the winnowed candidate phase of two-phase
    exact-substring dedup. Complete by the winnowing guarantee (k =
    min_len - w + 1, so any shared run >= w + k - 1 = min_len shares a
    kept fingerprint); may over-select docs sharing only >= k tokens.
    Run the exact `substring_dup_spans` on this subset: every dup
    partner is also a candidate, so spans over the subset EQUAL spans
    over the full corpus (tested)."""
    k = min_len - w + 1
    if k < 1:
        raise ValueError(f"min_len ({min_len}) must be >= w ({w})")
    fp = winnowed_fingerprints(df, text_col, id_col, k=k, w=w, analyzer=analyzer)
    dup = fp.groupBy("g").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    return fp.join(dup.select("g"), "g").select("doc_id").distinct()


def substring_match_spans(
    df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    min_len: int = 50,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): maximal token spans of
    ``df`` documents every L-window of which occurs VERBATIM somewhere in
    ``ref_df`` — span-level cross-corpus contamination (the n-gram
    decontamination of LLM eval hygiene: finer than the doc-level
    shingle-overlap `contamination`, which flags whole documents).

    Plan: ref grams dedup to DISTINCT fingerprints (one groupBy),
    train-side positions semi-join them on the 64-bit key, then the same
    per-doc merge as substring_dup_spans. Still no pairwise join; the ref
    side shuffles its distinct gram count once regardless of train size."""
    grams = substring_gram_positions(df, text_col, id_col, min_len, analyzer)
    rt = ref_text_col or text_col
    rid = id_col if id_col in ref_df.columns else ref_df.columns[0]
    ref_g = (
        substring_gram_positions(ref_df, rt, rid, min_len, analyzer)
        .select("g")
        .distinct()
    )
    hit = grams.join(ref_g, "g", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + min_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hit.withColumn(
        "new_span", (prev_max_end.isNull() | (F.col("pos") > prev_max_end)).cast("int")
    )
    spans = flagged.withColumn(
        "span_id", F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + min_len).alias("span_end"),
        F.count("*").alias("n_windows"),
    ).select("doc_id", "span_start", "span_end", "n_windows")


def decontaminate_spans(
    df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    min_len: int = 50,
    analyzer: str = "standard",
) -> DataFrame:
    """(doc_id, text, n_dropped_tokens): training rows with every
    ref-contaminated span CUT FROM THE ORIGINAL TEXT BYTES (see
    substring_scrub for the byte-surgery contract) — the span-surgical
    alternative to dropping whole contaminated documents."""
    spans = substring_match_spans(
        df, ref_df, text_col, id_col, ref_text_col, min_len, analyzer
    ).groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    return _cut_spans_bytes(df, spans, text_col, id_col, analyzer)


def _cut_spans_bytes(
    df: DataFrame,
    spans_by_doc: DataFrame,
    text_col: str,
    id_col: str,
    analyzer: str,
) -> DataFrame:
    """(doc_id, text, n_dropped_tokens): ``df`` rows with each token span
    in ``spans_by_doc`` (doc_id, spans: array<struct<span_start,
    span_end>>) removed from the ORIGINAL text by character range.

    Token→character offsets come from the Python tokenizer mirror
    (functions/tokenizer.py:py_token_spans — JVM regexp_extract_all
    reports values, not offsets), run inside an Arrow-batched mapInPandas.
    Docs with no spans never enter Python-side tokenization and pass
    through byte-identical; span rows are a k-row-per-dup-doc join, so the
    Python work is proportional to the DUPLICATED corpus slice only."""
    joined = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).join(spans_by_doc, "doc_id", "left")

    def cut(batches):
        import pandas as pd

        from bitfunnel_spark.functions.tokenizer import py_token_spans

        for pdf in batches:
            texts, dropped = [], []
            for text, spans in zip(pdf["__text"], pdf["spans"]):
                if spans is None or len(spans) == 0:
                    texts.append(text)
                    dropped.append(0)
                    continue
                offs = py_token_spans(text, analyzer)
                ivs = sorted(
                    (int(s["span_start"]), int(s["span_end"])) for s in spans
                )
                out, cur, nd = [], 0, 0
                for a, b in ivs:
                    b = min(b, len(offs))
                    if a >= b:
                        continue
                    ca, cb = offs[a][0], offs[b - 1][1]
                    if ca > cur:
                        out.append(text[cur:ca])
                    cur = max(cur, cb)
                    nd += b - a
                out.append(text[cur:])
                texts.append("".join(out))
                dropped.append(nd)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": pd.Series(texts, dtype="object"),
                    "n_dropped_tokens": pd.Series(dropped, dtype="int32"),
                }
            )

    return joined.mapInPandas(cut, "doc_id long, text string, n_dropped_tokens int")
