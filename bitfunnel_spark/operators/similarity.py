"""Similarity search over embedding columns (array<float>).

- brute_cosine_topk: exact baseline — broadcast the (small) query set,
  score every (query, candidate) pair with a JVM-side fold (zip_with +
  aggregate in strict left-to-right order, so float accumulation matches
  the sequential oracle), per-query top-k via window.
- axis-LSH bucketed variant: deterministic sign-bucket on fixed dims —
  cross-engine expressible (oracle-checked); candidates only within the
  query's bucket. The scale path for 10^9+ vectors.
- random-hyperplane LSH (numpy, mapInPandas): the stronger bucketing,
  engine-side only (rows-only correctness check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Strict sequential fold — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, cosine) — exact top-k neighbors per query
    (excluding self), ordered (cosine desc rounded 4dp, vec_id asc).

    The query side is broadcast (tiny); the candidate scan is
    embarrassingly parallel — no shuffle until the final per-query top-k,
    which is a window over k·|queries| rows after per-partition pruning.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("vec_id"))
    cos = F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 4)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def filtered_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    predicate: Column,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k under a metadata PRE-filter (the Elasticsearch
    kNN ``filter`` contract): candidates are restricted BEFORE scoring, so
    the result is the true top-k of the filtered subset — never a
    post-filtered (and therefore possibly short) list. Query vectors are
    taken from the UNFILTERED table (as in ES, where the query vector is
    external and need not satisfy its own filter).

    Same shape as brute_cosine_topk — broadcast queries, embarrassingly
    parallel candidate scan — with the predicate applied AT the scan, so
    Catalyst pushes it into the parquet read (fewer rows ever score).
    Returns (query_id, vec_id, cosine) ordered (query_id, cosine desc,
    vec_id asc), ≤k rows per query.
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.filter(predicate).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("vec_id"))
    cos = F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 4)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


AXIS_DIMS = (0, 8, 16, 24, 32, 40, 48, 56)


def axis_bucket_expr(vec: Column, dims: tuple[int, ...] = AXIS_DIMS) -> Column:
    """Deterministic sign-LSH bucket: bit i = (vec[dims[i]] > 0)."""
    out = F.lit(0)
    for i, d in enumerate(dims):
        out = out + F.when(F.element_at(vec, d + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return out.cast("int")


def lsh_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = AXIS_DIMS,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    Equi-join on bucket replaces the cross join — at scale the candidate set
    shrinks ~2^|dims|×. Recall is approximate by design; the oracle mirrors
    the same bucketing so correctness is exact w.r.t. the algorithm.

    ``multiprobe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's (the standard multi-probe LSH recall/cost
    dial: |dims|+1 buckets ≈ (|dims|+1)× candidates — still an equi-join,
    the query side explodes to |dims|+1 broadcast rows per query).
    Measured on the sf0.1 embeddings: recall@10 0.016 → 0.122 for ~9×
    the candidates (BENCH.md round-3 ANN table)."""
    withb = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        axis_bucket_expr(F.col(vec_col), dims).alias("bucket"),
    )
    q = withb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("cvec").alias("qvec"), "bucket"
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(len(dims))],
        )
        q = q.withColumn("bucket", F.explode(probes))
    pairs = F.broadcast(q).join(withb, "bucket").filter(F.col("query_id") != F.col("vec_id"))
    cos = F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 4)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    if multiprobe:  # a candidate can land in several probed buckets
        scored = scored.dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def recall_at_k(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    mode: str = "lsh",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **mode_kwargs,
) -> DataFrame:
    """Per-query recall@k of an ANN mode against the exact baseline →
    DataFrame[(query_id, n_exact, n_hit, recall)] ordered by query_id.

    The quality-verification harness of the ANN family — the analogue of
    the reference's oracle match verification
    (/root/reference/src/Plan/src/MatchVerifier.cpp:205-221, which replays
    every query against a brute-force oracle and records false
    negatives): ``recall = |approx ∩ exact| / |exact|``. Both sides are
    k·|queries|-row frames, so the overlap join is driver-scale work no
    matter the corpus size; the expensive part is exactly one exact scan
    + one ANN run, each already audited. ``mode`` is one of
    lsh / ivf / sq8 / pq / bbq; ``mode_kwargs`` pass through (n_probe,
    rescore_factor, multiprobe, ...)."""
    fns = {
        "lsh": lsh_cosine_topk,
        "ivf": ivf_cosine_topk,
        "sq8": sq8_cosine_topk,
        "pq": pq_cosine_topk,
        "bbq": bbq_cosine_topk,
    }
    if mode not in fns:
        raise ValueError(f"unknown ANN mode {mode!r} (one of {sorted(fns)})")
    exact = brute_cosine_topk(emb, query_ids, k=k, vec_col=vec_col, id_col=id_col)
    approx = fns[mode](
        emb, query_ids, k=k, vec_col=vec_col, id_col=id_col, **mode_kwargs
    )
    ex = exact.select("query_id", "vec_id")
    ap = approx.select("query_id", "vec_id").withColumn("hit", F.lit(1))
    joined = ex.join(ap, ["query_id", "vec_id"], "left")
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("int").alias("n_hit"),
        )
        .select(
            "query_id", "n_exact", "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 4).alias("recall"),
        )
        .orderBy("query_id")
    )


def _centroid_literal(cent_rows: list[tuple[int, list[float]]]) -> Column:
    """array<struct<cent_id, cvec, cnorm>> literal from driver-side
    centroids — folded into the plan itself, so assignment needs no join
    and no shuffle at all. ``cnorm`` is accumulated in the exact order of
    :func:`norm_expr`'s fold (sequential sum of squares, IEEE double), so
    the value is bit-identical to what the JVM fold would compute."""
    import math

    structs = []
    for cid, vec in cent_rows:
        acc = 0.0
        for x in vec:
            fx = float(x)
            acc += fx * fx
        structs.append(
            F.struct(
                F.lit(int(cid)).alias("cent_id"),
                F.array(*[F.lit(float(x)).cast("double") for x in vec]).alias("cvec"),
                F.lit(math.sqrt(acc)).alias("cnorm"),
            )
        )
    return F.array(*structs)


def train_kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 10,
    seed: int = 42,
    sample_size: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic sampled spherical k-means (Lloyd's) for the IVF coarse
    quantizer. A bounded, id-ordered sample is collected driver-side (the
    testdata's ids are a uniform permutation, so this is a uniform sample;
    at 10^9-vector scale a ~100k-row sample is still driver-trivial while
    the full-corpus *assignment* stays distributed in ivf_cosine_topk).
    Returns (n_centroids, dim) float64 centroids, L2-normalized.

    Deterministic: seeded init (rng.choice without replacement), fixed
    iteration count, empty clusters keep their previous centroid.
    """
    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(int(sample_size)).collect()
    )
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return kmeans_from_matrix(mat, n_centroids=n_centroids, n_iter=n_iter, seed=seed)


def kmeans_from_matrix(
    mat: np.ndarray, n_centroids: int = 16, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """The matrix-level core of :func:`train_kmeans_centroids` (seeded
    spherical Lloyd's over an UN-normalized (n, dim) float64 sample). Split
    out so the DuckDB oracle builder (entry_queries) can regenerate the
    IDENTICAL centroids from the raw parquet without a SparkSession and
    embed them as SQL literals — the seeded-literal oracle pattern."""
    norms = np.linalg.norm(mat, axis=1)
    mat = mat[norms > 0] / norms[norms > 0, None]
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    cents = mat[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ cents.T, axis=1)
        for j in range(len(cents)):
            members = mat[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cents[j] = c / n
    return cents


def ivf_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "np.ndarray | list | None" = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize every vector to its
    nearest centroid, probe only the query's ``n_probe`` nearest centroid
    cells. The scale path for 10^9+ vectors: the candidate join is an
    equi-join on ``cent_id`` (each cell holds ~N/n_centroids vectors), and
    the centroid table rides inside the plan as a literal array — the
    per-vector assignment is a pure column expression (argmax fold over the
    centroid array), ZERO shuffle and zero join on the corpus side. (The
    r2 design shuffled N·n_centroids rows through a window just to take a
    per-vector argmax; this replaces it.)

    The default coarse quantizer is DETERMINISTIC and cross-engine
    expressible — centroids are the vectors with id < n_centroids (ids are
    a uniform permutation of the corpus in the testdata, so this is a
    uniform sample). Pass ``centroids`` (e.g. from
    :func:`train_kmeans_centroids`) for trained cells — only the centroid
    literal changes, not the plan shape. Ties break by cent_id asc, so the
    oracle mirrors the assignment exactly. Recall is approximate by design;
    the oracle mirrors the identical algorithm."""
    if centroids is None:
        cent_rows = sorted(
            (int(r[id_col]), list(r[vec_col]))
            for r in emb.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
    else:
        cent_rows = [(i, list(v)) for i, v in enumerate(centroids)]
    cents_lit = _centroid_literal(cent_rows)
    base = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    vnorm = norm_expr(F.col("v"))
    # rounded cosine to each centroid, tie-broken by cent_id asc via the
    # negated id: struct comparison is lexicographic, so array_max picks
    # (max cosc, then min cent_id) — same order the r2 window used
    ranked = F.transform(
        cents_lit,
        lambda c: F.struct(
            F.round(dot_expr(F.col("v"), c["cvec"]) / (vnorm * c["cnorm"]), 6).alias(
                "cosc"
            ),
            (-c["cent_id"]).alias("n"),
        ),
    )
    assigned = base.select(
        "vec_id", "v", (-F.array_max(ranked)["n"]).cast("int").alias("cent_id")
    )
    # query probes: top n_probe cells per query — same literal array, a
    # sort_array + slice on the handful of query rows (no window, no join)
    top_cells = F.transform(
        F.slice(F.sort_array(ranked, asc=False), 1, n_probe),
        lambda s: (-s["n"]).cast("int"),
    )
    probes = (
        base.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qvec"),
            F.explode(top_cells).alias("cent_id"),
        )
    )
    pairs = F.broadcast(probes).join(assigned, "cent_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = F.round(cosine_expr(F.col("qvec"), F.col("v")), 4)
    scored = pairs.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def _hamming_rescore_topk(
    approx: DataFrame,
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    rescore_factor: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared BBQ tail: rank hamming candidates (asc, vec_id tiebreak),
    keep k·rescore_factor per query, rescore with exact full-precision
    cosine, return the per-query top-k. ``approx`` is
    DataFrame[(query_id, vec_id, ham)]."""
    w = Window.partitionBy("query_id").orderBy(F.asc("ham"), F.asc("vec_id"))
    cand = (
        approx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k * rescore_factor))
        .select("query_id", "vec_id")
    )
    full = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    qfull = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    rescored = (
        cand.join(full, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), F.asc("vec_id"))
    )


def ivfbbq_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    rescore_factor: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "np.ndarray | list | None" = None,
    dim: int = 64,
) -> DataFrame:
    """IVF × BBQ (the ES 8.16+ serving composition): the coarse quantizer
    prunes candidates to the query's ``n_probe`` cells, hamming over 1-bit
    sign codes ranks ONLY those candidates, and the ``k·rescore_factor``
    best rescore with exact full-precision cosine.

    Scale shape — the full 10^9-vector story assembled: cell assignment
    AND sign quantization are pure column expressions (centroid plan
    literal + bit packing — zero corpus-side shuffle/join); the hot scan
    reads (cent_id, dim/8 bytes) per vector and only for probed cells, so
    a query touches ~(n_probe/n_centroids) · 32×-compressed data; full
    vectors are fetched for k·rescore_factor rows via an id equi-join.
    Every stage is deterministic (rounded centroid cosines, integer
    hamming), so the DuckDB oracle mirrors the algorithm bit-for-bit.

    Defaults are the deterministic id-based centroids (SQL-expressible);
    pass trained centroids for quality — only the literal changes."""
    if centroids is None:
        cent_rows = sorted(
            (int(r[id_col]), list(r[vec_col]))
            for r in emb.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
    else:
        cent_rows = [(i, list(v)) for i, v in enumerate(centroids)]
    cents_lit = _centroid_literal(cent_rows)
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        quantize_binary_expr(F.col(vec_col), dim).alias("code"),
    )
    vnorm = norm_expr(F.col("v"))
    ranked = F.transform(
        cents_lit,
        lambda c: F.struct(
            F.round(dot_expr(F.col("v"), c["cvec"]) / (vnorm * c["cnorm"]), 6)
            .alias("cosc"),
            (-c["cent_id"]).alias("n"),
        ),
    )
    assigned = base.select(
        "vec_id", "code",
        (-F.array_max(ranked)["n"]).cast("int").alias("cent_id"),
    )
    top_cells = F.transform(
        F.slice(F.sort_array(ranked, asc=False), 1, n_probe),
        lambda s: (-s["n"]).cast("int"),
    )
    probes = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("code").alias("qcode"),
        F.explode(top_cells).alias("cent_id"),
    )
    pairs = F.broadcast(probes).join(assigned, "cent_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    approx = pairs.select(
        "query_id", "vec_id",
        hamming_expr(F.col("qcode"), F.col("code")).alias("ham"),
    )
    return _hamming_rescore_topk(
        approx, emb, query_ids, k, rescore_factor, vec_col, id_col
    )


def ivfpq_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    rescore_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "np.ndarray | list | None" = None,
    codebooks: "np.ndarray | list | None" = None,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ composition): the IVF coarse quantizer
    prunes the candidate set to the query's ``n_probe`` cells, the PQ/ADC
    sum scores ONLY those candidates from their m-byte codes, and the
    ``k·rescore_factor`` best rescore with exact full-precision cosine.

    Scale shape — the 10^9-vector serving path: per-vector cell assignment
    AND PQ encoding are pure column expressions over plan literals (zero
    corpus-side shuffle/join, the ivf/pq designs composed); the ADC scan
    reads (cent_id, m codes) per vector and only for probed cells, so per
    query it touches ~n_probe/n_centroids of the code table — itself 64×
    narrower than the float32 vectors; full vectors are fetched for
    k·rescore_factor rows via an id equi-join.

    Two encoding modes:

    - ``residual=False`` (default): PQ encodes the NORMALIZED VECTOR —
      cross-engine SQL-expressible (the hash-checked oracle mode).
    - ``residual=True`` (FAISS's by_residual shape): PQ encodes the
      residual vn − centroid(cell) with a SHARED codebook trained on
      residuals (:func:`train_ivfpq_residual_codebooks`), and the ADC
      adds the exact coarse term q·centroid — approx IP ≈ q·c + q·r̃.
      MEASURED (BENCH.md round-4 ANN note): at this corpus's dims and a
      small code budget (m=4, 16 codes, shared book) residual encoding
      UNDERPERFORMS direct encoding (recall@10 0.44 vs 0.54–0.60 at
      sf0.01) — the residual distribution is multi-modal across cells,
      so one shared book fits it worse than the raw normalized vectors;
      FAISS's by_residual gains need larger/per-cell code budgets. The
      option exists for shape parity and for regimes where it wins;
      rows-only checkable. Requires contiguous cell ids.

    Default centroids/codebooks are the deterministic id-based ones
    (SQL-expressible); pass trained arrays for quality — only the
    literals change, never the plan."""
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _normalize_expr(F.col(vec_col)).alias("vn"),
    )
    # --- IVF half: cell assignment + query probes from a centroid literal
    if centroids is None:
        cent_rows = sorted(
            (int(r[id_col]), list(r[vec_col]))
            for r in emb.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
    else:
        cent_rows = [(i, list(v)) for i, v in enumerate(centroids)]
    cents_lit = _centroid_literal(cent_rows)
    vnorm = norm_expr(F.col("v"))
    ranked = F.transform(
        cents_lit,
        lambda c: F.struct(
            F.round(dot_expr(F.col("v"), c["cvec"]) / (vnorm * c["cnorm"]), 6).alias(
                "cosc"
            ),
            (-c["cent_id"]).alias("n"),
        ),
    )
    cent_id = (-F.array_max(ranked)["n"]).cast("int")
    if residual:
        ids = [cid for cid, _ in cent_rows]
        if ids != list(range(len(ids))):
            raise ValueError("residual mode needs contiguous cell ids 0..n-1")
        cn = []
        for _cid, vec in cent_rows:
            arr = np.asarray(vec, dtype=np.float64)
            nrm = np.linalg.norm(arr)
            cn.append(arr / nrm if nrm > 0 else arr)
        cnorm_lit = F.array(
            *[F.array(*[F.lit(float(x)).cast("double") for x in v]) for v in cn]
        )
        # encode input: the residual in normalized space, from the SAME
        # cent_id expression the assignment produces (one projection)
        enc_col = F.zip_with(
            F.col("vn"),
            F.element_at(cnorm_lit, cent_id + 1),
            lambda a, b: a - b,
        )
    else:
        enc_col = F.col("vn")
    # --- PQ half: code columns from codebook literals (pq_cosine_topk's
    # encode expression, evaluated in the same projection as cent_id)
    if codebooks is None:
        rows = sorted(
            (int(r["vec_id"]), list(r["vn"]))
            for r in base.filter(F.col("vec_id") < n_codes)
            .select("vec_id", "vn")
            .collect()
        )
        dim = len(rows[0][1])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        books = [
            [(cid, vec[j * dsub : (j + 1) * dsub]) for cid, vec in rows]
            for j in range(m)
        ]
    else:
        cb = np.asarray(codebooks, dtype=np.float64)
        m, _, dsub = cb.shape
        books = [
            [(c, list(cb[j][c])) for c in range(cb.shape[1])] for j in range(m)
        ]
    vec_lits = [
        F.array(
            *[
                F.array(*[F.lit(float(x)).cast("double") for x in vec])
                for _, vec in books[j]
            ]
        )
        for j in range(m)
    ]
    id_lits = [F.array(*[F.lit(int(cid)) for cid, _ in books[j]]) for j in range(m)]

    def sub(col: Column, j: int) -> Column:
        return F.slice(col, j * dsub + 1, dsub)

    def _dist_pair(j: int):
        def fn(cvec, cid):
            return F.struct(
                F.round(l2sq_expr(sub(enc_col, j), cvec), 6).alias("d"),
                cid.alias("cid"),
            )

        return fn

    code_cols = []
    for j in range(m):
        pairs_j = F.zip_with(vec_lits[j], id_lits[j], _dist_pair(j))
        code_cols.append(F.array_min(pairs_j)["cid"].alias(f"c{j}"))
    codes = base.select("vec_id", cent_id.alias("cent_id"), *code_cols)

    top_cells = F.transform(
        F.slice(F.sort_array(ranked, asc=False), 1, n_probe),
        lambda s: (-s["n"]).cast("int"),
    )
    probes = base.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("vn").alias("qn"),
        F.explode(top_cells).alias("cent_id"),
    )
    # ADC over probed cells only — the equi-join replaces pq's crossJoin
    pairs = F.broadcast(probes).join(codes, "cent_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    adc = None
    for j in range(m):
        term = dot_expr(
            sub(F.col("qn"), j), F.element_at(vec_lits[j], F.col(f"c{j}") + 1)
        )
        adc = term if adc is None else adc + term
    if residual:
        # approx IP ≈ q·centroid (exact coarse term) + q·r̃ (ADC)
        adc = adc + dot_expr(
            F.col("qn"), F.element_at(cnorm_lit, F.col("cent_id") + 1)
        )
    approx = pairs.select("query_id", "vec_id", F.round(adc, 6).alias("adc"))
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    cand = (
        approx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k * rescore_factor))
        .select("query_id", "vec_id")
    )
    full = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    qfull = emb.filter(F.col(id_col).isin([int(i) for i in query_ids])).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    rescored = (
        cand.join(full, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("qvec"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def train_ivfpq_residual_codebooks(
    emb: DataFrame,
    centroids: "np.ndarray | list",
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 10,
    seed: int = 42,
    sample_size: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Shared residual codebooks for :func:`ivfpq_cosine_topk`
    ``residual=True`` (FAISS IVFPQ's by_residual training): assign the
    id-ordered sample to the given coarse centroids (cosine, ties to the
    smaller cell), subtract the assigned centroid in normalized space, run
    the same deterministic per-subspace Lloyd's as train_pq_codebooks on
    the residuals. Returns (m, n_codes, dim/m) float64."""
    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(int(sample_size)).collect()
    )
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    nz = norms > 0
    mat = mat[nz] / norms[nz, None]
    cents = np.asarray(centroids, dtype=np.float64)
    cnorms = np.linalg.norm(cents, axis=1)
    cents = np.where(cnorms[:, None] > 0, cents / np.maximum(cnorms, 1e-300)[:, None], cents)
    assign = np.argmax(mat @ cents.T, axis=1)
    res = mat - cents[assign]
    return _per_subspace_kmeans(res, m, n_codes, n_iter, seed)


def _per_subspace_kmeans(
    mat: np.ndarray, m: int, n_codes: int, n_iter: int, seed: int
) -> np.ndarray:
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        idx = rng.choice(len(sub), size=min(n_codes, len(sub)), replace=False)
        cents = sub[np.sort(idx)].copy()
        for _ in range(n_iter):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return np.stack(books)


def quantize_sq8_expr(vec: Column) -> Column:
    """Per-vector max-abs int8 scalar quantization (the SQ8 scheme every
    vector store ships): q_i = trunc(x_i * 127 / max_j|x_j|), kept as
    array<int>. Truncation toward zero is used (not rounding) because it
    is the one double→int conversion Spark and DuckDB perform identically
    — the oracle must produce bit-identical codes. A zero vector stays
    all-zero. Codes are stored as ``tinyint`` (bounded to ±127), so the
    candidate scan really is 4× narrower than float32."""
    v = _as_double(vec)
    maxabs = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    return F.when(
        maxabs == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    ).otherwise(F.transform(v, lambda x: (x * 127.0 / maxabs).cast("tinyint")))


_BBQ_WORD_BITS = 32  # 32-bit words: the packed value stays exact in a
# signed 64-bit integer in BOTH engines (64-bit packing would overflow
# DuckDB's BIGINT fold on the top bit)


def quantize_binary_expr(vec: Column, dim: int) -> Column:
    """1-bit (sign) quantization, packed into an array<long> of 32-bit
    words — the BBQ/RaBitQ storage shape (Elasticsearch 8.16 "Better
    Binary Quantization"): bit_i = 1 iff x_i > 0. 32× narrower than
    float32; hamming distance between codes is a pure bit_count(xor)
    fold. Sign quantization is exact and engine-independent (no rounding
    boundary), so the oracle reproduces codes bit-for-bit. Deviation from
    ES's BBQ documented at bbq_cosine_topk."""
    if dim <= 0 or dim % _BBQ_WORD_BITS:
        raise ValueError(
            f"binary quantization needs dim to be a positive multiple of "
            f"{_BBQ_WORD_BITS}, got {dim}"
        )
    v = _as_double(vec)
    words = [
        F.aggregate(
            F.slice(v, 1 + w * _BBQ_WORD_BITS, _BBQ_WORD_BITS),
            F.lit(0).cast("long"),
            lambda acc, x: acc * F.lit(2).cast("long")
            + F.when(x > 0.0, 1).otherwise(0).cast("long"),
        )
        for w in range(dim // _BBQ_WORD_BITS)
    ]
    return F.array(*words)


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two packed binary codes (array<long>):
    Σ bit_count(xor(word_a, word_b)) — whole-stage-codegen arithmetic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def bbq_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    rescore_factor: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Top-k by exact cosine with the candidate scan run over 1-bit
    binary codes (the ES 8.16 BBQ two-stage design): per query, the
    ``k·rescore_factor`` best candidates by hamming distance between sign
    codes are rescored with full-precision cosine, and the exact top-k of
    those is returned.

    Deviation from ES BBQ, documented: ES centers on per-dim means and
    scores queries asymmetrically (int4 query vs 1-bit docs). Sign codes
    without centering keep quantization exact and engine-independent (a
    mean is a float whose fold order differs across engines — a vector
    component near the mean could flip its bit on one side only), at the
    cost of recall on off-center data; rescore_factor default is higher
    than SQ8's (6 vs 4) to compensate for the coarser 1-bit candidates.

    Scale shape: the hot scan reads 32×-smaller codes (1 bit vs float32
    per dim — at 10^9 × 1024-dim that is 128 GB of codes vs 4 TB of
    floats); hamming is integer xor/popcount arithmetic inside
    whole-stage codegen; the full-precision table is touched only for
    k·rescore_factor rows per query via an id equi-join. All candidate
    scores are exact integers, so candidate selection is deterministic
    and the DuckDB oracle mirrors it bit-for-bit.
    """
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        quantize_binary_expr(F.col(vec_col), dim).alias("code"),
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("qcode")
    )
    pairs = F.broadcast(q).crossJoin(base).filter(
        F.col("query_id") != F.col("vec_id")
    )
    approx = pairs.select(
        "query_id", "vec_id",
        hamming_expr(F.col("qcode"), F.col("code")).alias("ham"),
    )
    return _hamming_rescore_topk(
        approx, emb, query_ids, k, rescore_factor, vec_col, id_col
    )


def sq8_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    rescore_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by exact cosine, with the candidate scan run over int8
    scalar-quantized codes (SQ8 + full-precision rescore — the standard
    two-stage ANN design): per query, the ``k·rescore_factor`` best
    candidates by quantized cosine are rescored with the full-precision
    vectors and the exact top-k of those is returned.

    Scale shape: the hot scan reads 4×-smaller codes (int8 vs float32 —
    at 10^9 vectors that is the difference between a memory-resident and a
    disk-bound scan); scales cancel in cosine so the quantized score needs
    no per-vector scale column; the full-precision table is touched only
    for k·rescore_factor rows per query via an id equi-join. Quantized
    dot products accumulate integer-valued doubles, so they are exact and
    order-independent — the oracle mirrors them bit-for-bit.

    Output matches brute_cosine_topk's schema/ordering; recall < 1 is
    possible by design (a true neighbor can miss the candidate list), and
    the oracle mirrors the identical two-stage algorithm.
    """
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        quantize_sq8_expr(F.col(vec_col)).alias("qv"),
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    codes = base.select("vec_id", "qv")
    pairs = F.broadcast(q).crossJoin(codes).filter(F.col("query_id") != F.col("vec_id"))
    qcos = F.round(cosine_expr(F.col("qq"), F.col("qv")), 6)
    approx = pairs.select("query_id", "vec_id", qcos.alias("qcos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("vec_id"))
    cand = (
        approx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k * rescore_factor))
        .select("query_id", "vec_id")
    )
    full = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    qfull = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    rescored = (
        cand.join(full, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("qvec"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return rescored.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k).drop("rn")


def random_hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, bucket) via seeded random-hyperplane LSH — numpy inside
    mapInPandas (Arrow-batched matrix multiply, no per-row Python). The
    planes are regenerated per executor from the seed: nothing to broadcast.
    Engine-side only (no SQL oracle; rows-only check)."""
    out_schema = "vec_id long, bucket int"

    def fn(batches):
        rng = np.random.default_rng(seed)
        dim_planes: np.ndarray | None = None
        weights = np.array([1 << i for i in range(n_planes)], dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if dim_planes is None:
                dim_planes = np.random.default_rng(seed).standard_normal((mat.shape[1], n_planes))
            signs = (mat @ dim_planes) > 0
            bucket = (signs @ weights).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(), "bucket": bucket})

    return emb.select(id_col, vec_col).mapInPandas(fn, out_schema)


def l2sq_expr(a: Column, b: Column) -> Column:
    """Squared L2 distance via the dot identity |a|² + |b|² − 2·a·b — every
    term is a :func:`dot_expr` fold, the ONE float reduction shape already
    proven bit-stable against DuckDB's list_dot_product (ann_cosine /
    ann_ivf oracles), so the SQL mirror is exact by construction."""
    return dot_expr(a, a) + dot_expr(b, b) - F.lit(2.0) * dot_expr(a, b)


def _normalize_expr(vec: Column) -> Column:
    """L2-normalized copy (float64); zero vectors pass through unchanged."""
    n = norm_expr(vec)
    return F.when(
        n == 0.0, F.transform(vec, lambda x: x.cast("double"))
    ).otherwise(F.transform(vec, lambda x: x.cast("double") / n))


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    n_iter: int = 10,
    seed: int = 42,
    sample_size: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic sampled per-subspace Lloyd's for product quantization:
    L2-normalize the id-ordered sample, split each vector into ``m``
    contiguous subvectors, run seeded k-means independently per subspace.
    Returns (m, n_codes, dim/m) float64 codebooks. Same determinism
    contract as :func:`train_kmeans_centroids` (seeded init, fixed
    iterations, empty clusters keep their centroid)."""
    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(int(sample_size)).collect()
    )
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return pq_books_from_matrix(mat, m=m, n_codes=n_codes, n_iter=n_iter, seed=seed)


def pq_books_from_matrix(
    mat: np.ndarray, m: int = 4, n_codes: int = 16, n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """The matrix-level core of :func:`train_pq_codebooks` (seeded
    per-subspace Lloyd's over an UN-normalized (n, dim) float64 sample).
    Split out so the oracle builder can regenerate the IDENTICAL codebooks
    from the raw parquet (no SparkSession) and embed them as SQL literals
    — same seeded-literal pattern as :func:`kmeans_from_matrix`."""
    norms = np.linalg.norm(mat, axis=1)
    nz = norms > 0
    mat = mat[nz] / norms[nz, None]
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        idx = rng.choice(len(sub), size=min(n_codes, len(sub)), replace=False)
        cents = sub[np.sort(idx)].copy()
        for _ in range(n_iter):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return np.stack(books)


def pq_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    rescore_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: "np.ndarray | list | None" = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance candidate scan +
    full-precision rescore (the IVF-PQ family's PQ half, á la FAISS):
    every L2-normalized vector encodes to ``m`` codebook ids (argmin
    squared-L2 per contiguous subspace, ties to the smaller code id); per
    query the approximate inner product is the ADC sum Σ_j q_j ·
    codebook[j][code_j]; the ``k·rescore_factor`` best candidates rescore
    with exact full-precision cosine.

    Scale shape: the codebooks ride inside the plan as literals (encoding
    is a pure column expression — ZERO shuffle and zero join on the corpus
    side, the ivf_cosine_topk assignment design), and the candidate scan
    reads ONLY the m-byte code tuple per vector — at 64-dim float32 and
    m=4 that is a 64× smaller scan (10^9 vectors: 4 GB of codes vs 256 GB
    of floats); full-precision vectors are touched for k·rescore_factor
    rows per query via an id equi-join.

    The default codebook is DETERMINISTIC and cross-engine expressible —
    codebook[j] = the j-th subvectors of the normalized vectors with
    id < n_codes (the ivf id-based quantizer convention), so the DuckDB
    oracle mirrors the whole pipeline exactly. Pass ``codebooks`` (from
    :func:`train_pq_codebooks`) for trained quality — only the literals
    change, not the plan. Recall < 1 by design; measured against brute
    cosine in tests/test_ops.py."""
    base = emb.select(
        F.col(id_col).alias("vec_id"), _normalize_expr(F.col(vec_col)).alias("vn")
    )
    if codebooks is None:
        rows = sorted(
            (int(r["vec_id"]), list(r["vn"]))
            for r in base.filter(F.col("vec_id") < n_codes).collect()
        )
        dim = len(rows[0][1])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        books = [
            [(cid, vec[j * dsub : (j + 1) * dsub]) for cid, vec in rows]
            for j in range(m)
        ]
    else:
        cb = np.asarray(codebooks, dtype=np.float64)
        m, _, dsub = cb.shape
        books = [
            [(c, list(cb[j][c])) for c in range(cb.shape[1])] for j in range(m)
        ]
    # per-subspace literals: the codebook vectors (ADC lookup) and the
    # code-id array (argmin tiebreak)
    vec_lits = [
        F.array(
            *[
                F.array(*[F.lit(float(x)).cast("double") for x in vec])
                for _, vec in books[j]
            ]
        )
        for j in range(m)
    ]
    id_lits = [
        F.array(*[F.lit(int(cid)) for cid, _ in books[j]]) for j in range(m)
    ]

    def sub(col: Column, j: int) -> Column:
        return F.slice(col, j * dsub + 1, dsub)

    # encode: argmin squared-L2 per subspace — array_min over
    # struct(round(d, 6), code_id) is lexicographic, so ties break to the
    # smaller code id (the SQL mirror orders the same way)
    def _dist_pair(j: int):
        def fn(cvec, cid):
            return F.struct(
                F.round(l2sq_expr(sub(F.col("vn"), j), cvec), 6).alias("d"),
                cid.alias("cid"),
            )

        return fn

    code_cols = []
    for j in range(m):
        pairs_j = F.zip_with(vec_lits[j], id_lits[j], _dist_pair(j))
        code_cols.append(F.array_min(pairs_j)["cid"].alias(f"c{j}"))
    codes = base.select("vec_id", *code_cols)

    q = base.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("vn").alias("qn")
    )
    pairs = F.broadcast(q).crossJoin(codes).filter(
        F.col("query_id") != F.col("vec_id")
    )
    adc = None
    for j in range(m):
        term = dot_expr(
            sub(F.col("qn"), j), F.element_at(vec_lits[j], F.col(f"c{j}") + 1)
        )
        adc = term if adc is None else adc + term
    approx = pairs.select(
        "query_id", "vec_id", F.round(adc, 6).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    cand = (
        approx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k * rescore_factor))
        .select("query_id", "vec_id")
    )
    full = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    qfull = emb.filter(F.col(id_col).isin([int(i) for i in query_ids])).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    rescored = (
        cand.join(full, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("qvec"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
