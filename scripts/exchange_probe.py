"""Fine-grained exchange probe: which layer of the build's one shuffle
stops scaling? Over the same corpus, at one core count:

  D1  repartition(gkey) + count          — shuffle write + read only
  D2  D1 + sortWithinPartitions          — + Tungsten binary-row sort
  D3  groupBy(gkey).applyInArrow(noop)   — + group iteration + Arrow IPC
                                            + Python worker round-trip

Each for the PACKED 4-column layout and the legacy 7-column layout.
Usage: python scripts/exchange_probe.py <cores> <n_docs> [shuffle_partitions]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bitfunnel_spark import BuildConfig  # noqa: E402
from bitfunnel_spark.operators.segments import term_bucket_col  # noqa: E402
from bitfunnel_spark.operators.statistics import exploded_tokens  # noqa: E402
from bitfunnel_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    corpus_path = f"/tmp/bf_scaling_corpus_{n_docs}"
    spark = get_spark(f"xprobe-{cores}", cores=cores, shuffle_partitions=parts)
    from scripts.scaling_workload import ensure_corpus  # noqa: E402

    ensure_corpus(spark, corpus_path, n_docs)
    corpus = spark.read.parquet(corpus_path)
    cfg = BuildConfig(n_slices=16, term_buckets=16)

    def packed():
        return exploded_tokens(corpus, cfg, keyed=True, packed=True)

    def legacy():
        return exploded_tokens(corpus, cfg, keyed=True).withColumn(
            "term_bucket", term_bucket_col(F.col("term_key"), cfg.term_buckets)
        )

    import pyarrow as pa

    def _noop(tbl: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([tbl.num_rows], type=pa.int64())})

    def d1(tok, keys):
        tok.repartition(parts, *keys).write.format("noop").mode("overwrite").save()

    def d2(tok, keys):
        (
            tok.repartition(parts, *keys)
            .sortWithinPartitions(*keys)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def d3(tok, keys):
        (
            tok.groupBy(*keys)
            .applyInArrow(_noop, "n long")
            .agg(F.sum("n"))
            .collect()
        )

    def _noop_map(batches):
        n = 0
        for bt in batches:
            n += bt.num_rows
        yield pa.record_batch([pa.array([n], type=pa.int64())], names=["n"])

    def d4(tok, keys):
        # sorted-stream alternative to grouped applyInArrow: JVM pre-sorts,
        # kernel sees whole partitions (no per-group batch machinery)
        extra = ["term_key", "docpos"] if keys == ["gkey"] else ["term_key", "doc_id"]
        (
            tok.repartition(parts, *keys)
            .sortWithinPartitions(*keys, *extra)
            .mapInArrow(_noop_map, "n long")
            .agg(F.sum("n"))
            .collect()
        )

    # warm-up
    small = corpus.filter(F.col("doc_id") < 4000)
    exploded_tokens(small, cfg, keyed=True, packed=True).groupBy("gkey").applyInArrow(
        _noop, "n long"
    ).count()

    out = {"cores": cores, "n_docs": n_docs, "parts": parts}
    for label, tok_fn, keys in [
        ("packed", packed, ["gkey"]),
        ("legacy", legacy, ["shard", "slice", "term_bucket"]),
    ]:
        for name, fn in [("D1_shuffle", d1), ("D2_sort", d2), ("D3_arrow", d3), ("D4_maparrow", d4)]:
            t0 = time.time()
            fn(tok_fn(), keys)
            out[f"{label}_{name}_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
