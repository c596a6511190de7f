"""Benchmark harness — prints ONE JSON line.

Runs the full index build (tokenize → postings → compressed segments → term
stats) and the headline BM25 query set (kernel path) at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Reference analogue: QueryRunner's QPS/latency summary
(/root/reference/src/Plan/src/QueryRunner.cpp:282-402) + `statistics`
ingest wall-clock. Fields: value = total suite seconds (build + queries);
queries = per-query seconds; extras: build_sec, files_per_sec, qps,
query_p50_sec, n_docs.
"""

from __future__ import annotations

import json
import os
import statistics as pystats
import sys
import time


BENCH_QUERIES = [
    ("q_and2", "data fast"),
    ("q_and3", "spark join group"),
    ("q_and_rare", "vector dup"),
    ("q_or", "dup | vector"),
    ("q_not", "data -slow"),
    ("q_complex", "(dup | vector) join -merge"),
    ("q_field", "lang:en data"),
    ("q_phrase", '"batch batch"'),
    ("q_common", "the a data"),
    ("q_path", "path:txt key value"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from bitfunnel_spark import BuildConfig, FullTextIndex
    from bitfunnel_spark.session import get_spark
    from bitfunnel_spark.sources.corpus import corpus_from_documents, load_documents

    spark = get_spark("bitfunnel-bench", cores=cpus, shuffle_partitions=cpus)

    t_suite = time.time()
    corpus = corpus_from_documents(load_documents(spark, sf_dir)).cache()
    n_docs = corpus.count()
    # positional postings on: the default physical design (phrases evaluate
    # in-kernel from stored positions — no corpus access at query time)
    cfg = BuildConfig(n_slices=max(4, cpus // 4), positions=True)

    # untimed JIT warm-up: identical pipeline shape on a small slice (the
    # first execution of each stage shape pays one-time codegen + C2
    # compilation, worst at high thread counts; the reference warms its
    # cache before `query log` timings the same way)
    from pyspark.sql import functions as F

    warm = FullTextIndex.build_fused(spark, corpus.filter(F.col("doc_id") < 2000), cfg)
    warm.segments.count()
    warm.key_stats.count()
    warm.search("data", k=10, mode="kernel").collect()
    for df in (warm.doc_stats, warm.key_stats, warm.segments):
        df.unpersist()

    t0 = time.time()
    # fused single-shuffle build: corpus → encoded segments + term dict
    # (row-form postings never materialized — the scale path)
    idx = FullTextIndex.build_fused(spark, corpus, cfg)
    n_blocks = idx.segments.count()
    # key_stats is the SERVE dictionary (hash-keyed, from block metadata);
    # the string vocabulary is a separate analytics artifact, not built here
    idx.key_stats.count()
    build_sec = time.time() - t0

    # serve start: one shuffle re-partitions the cached store on the kernel
    # group key so every query below runs exchange-free (index.prepare_serve)
    idx.prepare_serve()

    # warm-up (JVM/Arrow path init — excluded, matches the reference warming
    # its cache before `query log` timings)
    idx.search("data", k=10, mode="kernel").collect()

    queries: dict[str, float] = {}
    for name, q in BENCH_QUERIES:
        tq = time.time()
        idx.search(q, k=10, mode="kernel").collect()
        queries[name] = round(time.time() - tq, 4)

    # batched query-log mode: whole set in one job (plans/batch.py)
    tb = time.time()
    idx.search_many([q for _, q in BENCH_QUERIES], k=10).collect()
    batch_sec = time.time() - tb

    # pruning instrumentation over the same query set (one job): blocks
    # decoded vs skipped — a regression here means block-max/WAND pruning
    # stopped engaging even if wall-times look fine at this SF
    from bitfunnel_spark.plans.profile import profile_many

    metrics, _ = profile_many(idx, [q for _, q in BENCH_QUERIES], k=10)
    prow = (
        metrics.groupBy()
        .agg(F.sum("blocks_total").alias("bt"), F.sum("blocks_decoded").alias("bd"))
        .collect()[0]
    )
    blocks_total = int(prow["bt"] or 0)
    blocks_decoded = int(prow["bd"] or 0)

    total = time.time() - t_suite
    lat = sorted(queries.values())
    out = {
        "metric": "suite_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "n_segment_blocks": n_blocks,
        "build_sec": round(build_sec, 3),
        "files_per_sec": round(n_docs / build_sec, 2),
        "query_p50_sec": round(pystats.median(lat), 4),
        "qps": round(len(lat) / sum(lat), 3),
        "batch_sec": round(batch_sec, 3),
        "qps_batched": round(len(BENCH_QUERIES) / batch_sec, 3),
        "blocks_total": blocks_total,
        "blocks_decoded": blocks_decoded,
        "skip_ratio": round(1.0 - blocks_decoded / max(blocks_total, 1), 4),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
