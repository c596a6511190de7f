"""Per-sub-stage scaling probe: which part of the fused build stops scaling?

Runs, at one core count, over the same pre-generated corpus:
  A. tok_count     — JVM-only map side: scan + tokenize + explode + xxhash64
                     (no exchange, no Python)
  B. tok_exchange  — A + shuffle + JVM count per group (no Python)
  C. full_build    — A + shuffle + Arrow→Python encode kernel (the real thing)

Usage: python scripts/scaling_probe.py <cores> <n_docs>
Prints one JSON line. Run at 2 and 8 to attribute the efficiency loss.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bitfunnel_spark import BuildConfig, FullTextIndex  # noqa: E402
from bitfunnel_spark.operators.segments import term_bucket_col  # noqa: E402
from bitfunnel_spark.operators.statistics import exploded_tokens  # noqa: E402
from bitfunnel_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    corpus_path = f"/tmp/bf_scaling_corpus_{n_docs}"
    spark = get_spark(f"probe-{cores}", cores=cores, shuffle_partitions=64)
    from scripts.scaling_workload import ensure_corpus  # noqa: E402

    ensure_corpus(spark, corpus_path, n_docs)
    for name in os.listdir(corpus_path):
        with open(os.path.join(corpus_path, name), "rb") as f:
            f.read()
    corpus = spark.read.parquet(corpus_path)
    cfg = BuildConfig(n_slices=16, term_buckets=16)

    def tok():
        return exploded_tokens(corpus, cfg, keyed=True).withColumn(
            "term_bucket", term_bucket_col(F.col("term_key"), cfg.term_buckets)
        )

    # warm-up (JIT/codegen), untimed
    small = corpus.filter(F.col("doc_id") < 4000)
    small_tok = exploded_tokens(small, cfg, keyed=True)
    small_tok.count()
    FullTextIndex.build_fused(spark, small, cfg, cache=False).segments.count()

    out = {"cores": cores, "n_docs": n_docs}
    t0 = time.time()
    out["tok_rows"] = tok().count()
    out["A_tok_count_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    tok().groupBy("shard", "slice", "term_bucket").agg(F.count("*")).collect()
    out["B_tok_exchange_sec"] = round(time.time() - t0, 2)
    # NB: B is NOT the build's exchange — partial agg collapses it to
    # ~n_groups rows before the shuffle. D below is the real thing: every
    # occurrence row crosses the exchange, gets group-sorted by the JVM and
    # handed to Python as Arrow batches, but the kernel is a no-op count —
    # so D - A = exchange + group sort + Arrow IPC, and C - D = numpy
    # encode kernel.
    import pyarrow as pa

    def _noop(tbl: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([tbl.num_rows], type=pa.int64())})

    t0 = time.time()
    (
        tok()
        .groupBy("shard", "slice", "term_bucket")
        .applyInArrow(_noop, "n long")
        .agg(F.sum("n"))
        .collect()
    )
    out["D_exchange_ipc_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    idx = FullTextIndex.build_fused(spark, corpus, cfg, cache=False)
    out["n_blocks"] = idx.segments.count()
    out["C_full_build_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
