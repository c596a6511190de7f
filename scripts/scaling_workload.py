"""One scaling-run: full index build + query batch at a given core count.

Usage: python scripts/scaling_workload.py <cores> <n_docs> [corpus_path]
Prints one JSON line. Run by scripts/scaling.py at N and 4N cores over the
SAME pre-generated corpus parquet (north_rule: same job, two cluster sizes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitfunnel_spark import BuildConfig, FullTextIndex  # noqa: E402
from bitfunnel_spark.session import get_spark  # noqa: E402
from bitfunnel_spark.sources.corpus import synthetic_corpus  # noqa: E402

QUERIES = [
    "id_1 id_2",
    "id_3 -id_4",
    "id_10 | id_11",
    "(id_5 | id_6) id_0",
    "id_42 id_7",
    "lang:py id_1",
    "id_2 id_9 id_13",
    "id_100 | id_200 | id_300",
    "id_8 -id_15",
    "id_77 id_3",
]


def ensure_corpus(spark, path: str, n_docs: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    synthetic_corpus(spark, n_docs=n_docs, seed=42, partitions=128).write.mode(
        "overwrite"
    ).parquet(path)


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    corpus_path = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/bf_scaling_corpus_{n_docs}"
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores * 2)
    ensure_corpus(spark, corpus_path, n_docs)
    corpus = spark.read.parquet(corpus_path)

    cfg = BuildConfig(n_slices=16, term_buckets=16)
    t0 = time.time()
    idx = FullTextIndex.build(spark, corpus, cfg)
    t_stats = time.time()
    idx.postings.count()  # materialize the postings cache explicitly
    t_postings = time.time()
    idx.term_stats.count()
    t_terms = time.time()
    seg = idx.build_segments(cache=True)
    n_blocks = seg.count()
    t_seg = time.time()
    build_sec = t_seg - t0
    stages = {
        "stats_sec": round(t_stats - t0, 2),
        "postings_sec": round(t_postings - t_stats, 2),
        "term_stats_sec": round(t_terms - t_postings, 2),
        "segments_sec": round(t_seg - t_terms, 2),
    }

    idx.search("id_1", k=10, mode="kernel").collect()  # warm-up
    tq = time.time()
    for q in QUERIES:
        idx.search(q, k=10, mode="kernel").collect()
    query_sec = time.time() - tq

    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "build_sec": round(build_sec, 2),
                "files_per_sec": round(n_docs / build_sec, 2),
                "n_segment_blocks": n_blocks,
                "query_batch_sec": round(query_sec, 2),
                "qps": round(len(QUERIES) / query_sec, 3),
                **stages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
