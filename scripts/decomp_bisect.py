"""Bisect the decomposition regression: time the fused segments build at
one core count for several (n_slices, term_buckets, shuffle_partitions)
configs, same corpus, one JVM per config.

Usage: python scripts/decomp_bisect.py <cores> <n_docs> "s,b,p" "s,b,p" ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bitfunnel_spark import BuildConfig, FullTextIndex  # noqa: E402
from bitfunnel_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    configs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[3:]]
    corpus_path = f"/tmp/bf_scaling_corpus_{n_docs}"
    for s, b, p in configs:
        spark = get_spark(f"bisect-{s}-{b}-{p}", cores=cores, shuffle_partitions=p)
        from scripts.scaling_workload import ensure_corpus

        ensure_corpus(spark, corpus_path, n_docs)
        corpus = spark.read.parquet(corpus_path)
        cfg = BuildConfig(n_slices=s, term_buckets=b)
        warm = FullTextIndex.build_fused(
            spark, corpus.filter(F.col("doc_id") < 4000), cfg, cache=False
        )
        warm.segments.count()
        t0 = time.time()
        idx = FullTextIndex.build_fused(spark, corpus, cfg, cache=False)
        nb = idx.segments.count()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "cores": cores,
                    "slices": s,
                    "buckets": b,
                    "parts": p,
                    "segments_sec": round(dt, 2),
                    "n_blocks": nb,
                }
            ),
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()
