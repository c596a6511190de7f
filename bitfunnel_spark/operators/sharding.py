"""Length-based sharding.

The reference routes each document to the shard whose
[minPostings, nextShard.minPostings) bracket contains its posting count
(/root/reference/src/Common/Configuration/src/ShardDefinition.cpp:160-190,
applied at src/Index/src/Ingestor.cpp:210-220), and *optimizes* the shard
boundaries as a single-source shortest path over document-histogram vertices
with a memory-waste cost function
(/root/reference/src/Index/src/ShardDefinitionBuilder.cpp:33-76,
ShardCostFunction.cpp:54-146, SingleSourceShortestPath.cpp).

Spark design: `shard` is a column computed from doclen by a static boundary
list (a broadcast-free pure expression, also expressible in ANSI SQL for the
oracle). The optimizer runs driver-side on the *collected* doclen histogram
(tiny: one row per distinct doclen bucket) — same division of labor as the
reference, which also computes boundaries from the full histogram in one
process.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHARD_BOUNDARIES: tuple[int, ...] = (0, 24, 48, 96)


def shard_of(doclen: Column | str, boundaries: tuple[int, ...] = DEFAULT_SHARD_BOUNDARIES) -> Column:
    """shard i covers doclen in [boundaries[i], boundaries[i+1]); last is open.

    Pure CASE expression — identical semantics to the SQL emitted by
    :func:`shard_case_sql`.
    """
    c = F.col(doclen) if isinstance(doclen, str) else doclen
    expr = F.lit(len(boundaries) - 1)
    for i in range(len(boundaries) - 1, 0, -1):
        expr = F.when(c < F.lit(boundaries[i]), F.lit(i - 1)).otherwise(expr)
    return expr.cast("int")


def shard_case_sql(doclen_expr: str, boundaries: tuple[int, ...] = DEFAULT_SHARD_BOUNDARIES) -> str:
    """ANSI-SQL CASE expression mirroring :func:`shard_of` (for the DuckDB oracle)."""
    parts = [f"WHEN {doclen_expr} < {boundaries[i]} THEN {i - 1}" for i in range(1, len(boundaries))]
    return "CASE " + " ".join(parts) + f" ELSE {len(boundaries) - 1} END"


def doclen_histogram(doc_stats: DataFrame) -> DataFrame:
    """(doclen, doc_count) — exact histogram; the reference's
    DocumentHistogramBuilder (src/Index/src/DocumentHistogramBuilder.h:39-45)."""
    return doc_stats.groupBy("doclen").agg(F.count("*").alias("doc_count"))


def optimal_shard_boundaries(
    histogram: list[tuple[int, int]],
    max_shards: int = 8,
    shard_overhead: float = 0.0,
    min_shard_docs: int = 1,
) -> tuple[int, ...]:
    """Driver-side DP: choose shard boundaries minimizing memory waste.

    Cost of a shard covering histogram rows i..j (doclen ascending):
        docs(i..j) * max_doclen(i..j) - total_postings(i..j) + shard_overhead
    — the reference's ShardCostFunction (ShardCostFunction.cpp:54-146): a
    fixed-width slice sized for the longest doc wastes the difference. The
    reference solves it as a shortest path over histogram vertices
    (SingleSourceShortestPath.cpp); with ≤ max_shards layers that is exactly
    this O(V² · S) layered DP.

    `histogram` is [(doclen, doc_count)] (any order). Returns boundaries
    (b0=0, b1, ...) usable with :func:`shard_of`. Scale note: the histogram
    has at most ~thousands of distinct doclens after bucketing — collect()
    of it is O(KB) regardless of corpus size.
    """
    hist = sorted((int(l), int(c)) for l, c in histogram if c > 0)
    if not hist:
        return (0,)
    lens = [l for l, _ in hist]
    counts = [c for _, c in hist]
    postings = [l * c for l, c in hist]
    V = len(hist)
    pc = [0] * (V + 1)  # prefix counts
    pp = [0] * (V + 1)  # prefix postings
    for i in range(V):
        pc[i + 1] = pc[i] + counts[i]
        pp[i + 1] = pp[i] + postings[i]

    def seg_cost(i: int, j: int) -> float:  # rows i..j inclusive
        docs = pc[j + 1] - pc[i]
        if docs < min_shard_docs:
            return float("inf")
        return docs * lens[j] - (pp[j + 1] - pp[i]) + shard_overhead

    INF = float("inf")
    # dp[s][j] = min cost covering rows 0..j-1 with s shards
    dp = [[INF] * (V + 1) for _ in range(max_shards + 1)]
    back: list[list[int]] = [[-1] * (V + 1) for _ in range(max_shards + 1)]
    dp[0][0] = 0.0
    for s in range(1, max_shards + 1):
        for j in range(1, V + 1):
            for i in range(j):
                if dp[s - 1][i] == INF:
                    continue
                c = dp[s - 1][i] + seg_cost(i, j - 1)
                if c < dp[s][j]:
                    dp[s][j] = c
                    back[s][j] = i
    best_s = min(range(1, max_shards + 1), key=lambda s: dp[s][V])
    cuts = []
    j, s = V, best_s
    while s > 0:
        i = back[s][j]
        cuts.append(i)
        j, s = i, s - 1
    cuts.reverse()  # starting row index of each shard
    bounds = [0] + [lens[i] for i in cuts[1:]]
    return tuple(bounds)
