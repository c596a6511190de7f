"""Build and scoring configuration.

The reference's equivalents: BM25 has no counterpart (BitFunnel produces an
unscored match set — /root/reference/inc/BitFunnel/Plan/ResultsBuffer.h:38-88);
shard/treatment knobs mirror ShardDefinition
(/root/reference/src/Common/Configuration/src/ShardDefinition.cpp:160-190) and
ITermTreatment (/root/reference/inc/BitFunnel/Index/ITermTreatment.h:39-123).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """Standard Okapi BM25 (published formula; reference has no scorer).

    idf  = ln((N - df + 0.5) / (df + 0.5) + 1)
    norm = k1 * (1 - b + b * doclen / avgdl)
    s    = sum over matched scoring terms of idf * tf * (k1 + 1) / (tf + norm)
    """

    k1: float = 1.2
    b: float = 0.75


# Token pattern shared verbatim by the Spark engine and the DuckDB oracle
# (both Java regex and RE2 interpret it identically). Code-aware: identifiers
# (incl. underscore) and integer literals; applied to lowercased text.
TOKEN_PATTERN = "[a-z_][a-z0-9_]*|[0-9]+"


@dataclass(frozen=True)
class BuildConfig:
    """Physical-design knobs for the index build.

    - ``shard_boundaries``: length-based shards (reference caps at 16 —
      /root/reference/inc/BitFunnel/BitFunnelTypes.h:81-84). Docs are routed
      to a shard by doclen so BM25 length normalization stays cheap and
      posting lists within a shard have similar lengths.
    - ``n_slices``: hash-partitions of doc space *within* a shard — the
      parallel unit for query matching (the analogue of the reference's
      Slice, /root/reference/src/Index/src/Slice.h:43-70). Intersection of
      posting lists is complete within a (shard, slice) because slice is a
      pure function of doc_id. Scale this with cluster size (thousands at
      100 TB); tests use a small number.
    - ``block_size``: postings per compressed block; each block carries
      block-max metadata for WAND skipping (the analogue of the reference's
      rank-down coarse rows, /root/reference/src/Plan/src/RankDownCompiler.cpp).
    - ``term_buckets``: hash-bucket partition count of the segment store, so
      a query's `term IN (...)` prunes files (Iceberg/parquet partition
      column `term_bucket`).
    - treatment thresholds: df-band routing of terms to encodings (analogue
      of rank/row assignment, ITermTreatment.h) — see operators/treatments.py.
    """

    shard_boundaries: tuple[int, ...] = (0, 24, 48, 96)
    n_slices: int = 8
    block_size: int = 128
    term_buckets: int = 16
    # df/N below this → "rare": plain int32 arrays, no block structure needed
    rare_df_frac: float = 0.001
    # df/N above this → "dense": fixed-width gap32 encoding + demoted from
    # driving intersections. 0.02 is COST-DERIVED (round 3): the analytic
    # treatment_grid (operators/treatments.py, measured decode-cost model:
    # vb 220 / gap32 50 / raw 12 ns per posting) picks dense_bp=200 on the
    # test corpora, and the empirical sweep (scripts/treatment_sweep.py,
    # BENCH.md round-3 table) confirms −12% in-kernel query time vs the old
    # hand-set 0.25, for +3.6% doc-buffer bytes. Storage-constrained
    # deployments can raise it (vb is ~3.4× smaller than gap32).
    dense_df_frac: float = 0.02
    bm25: BM25Params = field(default_factory=BM25Params)
    max_gram_size: int = 1  # reference default gramSize=1 (StatisticsBuilder.cpp:75-79)
    # Positional postings (fused build only): store per-posting token
    # positions (delta+varbyte) so phrase adjacency evaluates inside the
    # distributed kernel — no corpus access at query time. The packed
    # (doc_id, position) phrase key holds positions up to 2^POS_BITS; when
    # any document's stream exceeds POS_SAFE_DOCLEN tokens the planner
    # routes phrases to the exact corpus-scan path instead (plans/kernel.py
    # _descriptor), so phrase semantics are always exact.
    positions: bool = False
    # Index-time analyzer for the body/path streams: "standard" (identifiers
    # kept whole) or "code" (identifiers split into subtokens at camelCase /
    # acronym / digit / snake_case boundaries — ES word_delimiter_graph
    # analogue; functions/tokenizer.CODE_SPLIT_RULES). The DuckDB oracle
    # mirrors the same regex chain (plans/oracle.code_body_sql).
    analyzer: str = "standard"


# positions fit in 20 bits → (doc_id, position) packs into one int64 key
# (doc_id < 2^43) for vectorized phrase adjacency. Packed value is
# pos - k + off with off = max(16, phrase_len), so it is always >= 1; the
# kernel filters packed values < 2^POS_BITS, and indexes whose longest
# document could cross that bound fall back to the corpus-scan phrase path.
POS_BITS = 20
# conservative doclen bound under which every packed phrase key fits
POS_SAFE_DOCLEN = (1 << POS_BITS) - 64
