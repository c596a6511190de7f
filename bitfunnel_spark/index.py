"""FullTextIndex — the engine facade.

Build pipeline (SURVEY §7): tokenize → doc stats + postings (no shuffle) →
term stats (one agg shuffle) → [optional] encoded posting segments
(operators/segments.py). Query: parse → plan → execute (plans/executor.py
DataFrame path, plans/kernel.py block-max WAND kernel path).

The reference's equivalent lifecycle is SimpleIndex + Ingestor
(/root/reference/src/Index/src/SimpleIndex.cpp, Ingestor.cpp:210-269) and
QueryRunner (/root/reference/src/Plan/src/QueryRunner.cpp:282-402).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from bitfunnel_spark.config import BuildConfig
from bitfunnel_spark.operators import statistics as stats


@dataclass
class FullTextIndex:
    spark: SparkSession
    config: BuildConfig
    corpus: DataFrame  # (doc_id, repo, path, commit, lang, content, content_sha256)
    doc_stats: DataFrame  # (doc_id, doclen, shard, slice, content_sha256)
    postings: DataFrame  # (term, stream, doc_id, tf, doclen, shard, slice)
    term_stats: DataFrame  # (term, stream, df, idf, idf_x10, treatment)
    n_docs: int
    avgdl: float
    max_doclen: int = 0  # gates the positional phrase path (POS_SAFE_DOCLEN)
    segments: DataFrame | None = None  # encoded posting segments (built on demand)
    _idf_map: dict | None = None  # driver-resident term dictionary (lazy)
    _idf_map_over_limit: bool = False  # memoized "dictionary too big" outcome
    tombstones: frozenset = frozenset()  # soft-deleted doc ids (delete_docs)

    # terms above this, fall back to per-query filtered collects rather than
    # holding the whole dictionary on the driver
    IDF_MAP_MAX_TERMS = 5_000_000

    def idf_map(self) -> dict | None:
        """Driver-resident {(stream, term): idf} — the reference keeps its
        TermTable in process memory the same way (SimpleIndex.cpp). Removes
        one Spark job per query. Returns None when the dictionary exceeds
        IDF_MAP_MAX_TERMS (the 10^12-doc path then uses per-query filtered
        lookups / a broadcast dictionary instead); that outcome is memoized
        so the vocabulary count job runs at most once per index."""
        if self._idf_map_over_limit:
            return None
        if self._idf_map is None:
            if self.term_stats.count() > self.IDF_MAP_MAX_TERMS:
                self._idf_map_over_limit = True
                return None
            rows = self.term_stats.select("stream", "term", "idf").collect()
            self._idf_map = {(r[0], r[1]): float(r[2]) for r in rows}
        return self._idf_map

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        config: BuildConfig | None = None,
        cache: bool = True,
        segments: bool = False,
    ) -> "FullTextIndex":
        config = config or BuildConfig()
        ds = stats.doc_stats(corpus, config)
        if cache:
            ds = ds.cache()
        p = stats.postings(corpus, config)
        if cache:
            p = p.cache()
        meta = stats.corpus_meta(ds)
        ts = stats.term_stats(p, meta["n_docs"], config)
        if cache:
            ts = ts.cache()
        idx = cls(
            spark=spark,
            config=config,
            corpus=corpus,
            doc_stats=ds,
            postings=p,
            term_stats=ts,
            n_docs=meta["n_docs"],
            avgdl=meta["avgdl"],
            max_doclen=meta["max_doclen"],
        )
        if segments:
            idx.build_segments(cache=cache)
        return idx

    @classmethod
    def build_fused(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        config: BuildConfig | None = None,
        cache: bool = True,
    ) -> "FullTextIndex":
        """The scale build: corpus → encoded segments in ONE shuffle
        (operators/segments.build_segments_fused); the term dictionary
        derives from block metadata. Row-form postings are left LAZY — they
        are only computed if a DataFrame-path query or analytics op asks
        for them (at 100 TB nobody materializes them; the segment store is
        the index)."""
        config = config or BuildConfig()
        ds = stats.doc_stats(corpus, config)
        if cache:
            ds = ds.cache()
        meta = stats.corpus_meta(ds)
        from bitfunnel_spark.operators.segments import build_segments_fused

        seg = build_segments_fused(corpus, meta["avgdl"], config)
        if cache:
            seg = seg.cache()
        ts = stats.term_stats_from_segments(seg, meta["n_docs"], config)
        if cache:
            ts = ts.cache()
        return cls(
            spark=spark,
            config=config,
            corpus=corpus,
            doc_stats=ds,
            postings=stats.postings(corpus, config),  # lazy, uncached
            term_stats=ts,
            n_docs=meta["n_docs"],
            avgdl=meta["avgdl"],
            max_doclen=meta["max_doclen"],
            segments=seg,
        )

    def build_segments(self, cache: bool = True) -> DataFrame:
        from bitfunnel_spark.operators.segments import build_segments

        seg = build_segments(self.postings, self.avgdl, self.config)
        if cache:
            seg = seg.cache()
        self.segments = seg
        return seg

    # ---- query API ----------------------------------------------------

    def match(self, query: str) -> DataFrame:
        """Reference semantics: the full unscored boolean match set
        (ResultsBuffer analogue) as DataFrame[doc_id]."""
        from bitfunnel_spark.plans.executor import match_dataframe

        return match_dataframe(self, query)

    def search(self, query: str, k: int = 10, mode: str = "dataframe") -> DataFrame:
        """BM25 top-k: DataFrame[(doc_id, score)], score rounded to 4 dp,
        ordered (score desc, doc_id asc)."""
        if mode == "dataframe":
            from bitfunnel_spark.plans.executor import search_dataframe

            return search_dataframe(self, query, k)
        if mode == "kernel":
            from bitfunnel_spark.plans.kernel import search_kernel

            return search_kernel(self, query, k)
        raise ValueError(f"unknown mode {mode!r}")

    def search_many(self, queries: list[str], k: int = 10) -> DataFrame:
        """Batched query-log evaluation in one job:
        DataFrame[(query_id, doc_id, score)] — see plans/batch.py."""
        from bitfunnel_spark.plans.batch import search_many

        return search_many(self, queries, k)
