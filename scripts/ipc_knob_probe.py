"""One-knob probe: does Arrow batch size move the applyInArrow cost?

Runs the packed grouped-noop (D3) and sorted-map-noop (D4) at one core
count for several spark.sql.execution.arrow.maxRecordsPerBatch values.
Usage: python scripts/ipc_knob_probe.py <cores> <n_docs>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bitfunnel_spark import BuildConfig  # noqa: E402
from bitfunnel_spark.operators.statistics import exploded_tokens  # noqa: E402
from bitfunnel_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    corpus_path = f"/tmp/bf_scaling_corpus_{n_docs}"
    out = {"cores": cores, "n_docs": n_docs}
    import pyarrow as pa

    def _noop(tbl: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([tbl.num_rows], type=pa.int64())})

    def _noop_map(batches):
        n = 0
        for bt in batches:
            n += bt.num_rows
        yield pa.record_batch([pa.array([n], type=pa.int64())], names=["n"])

    for recs in (10000, 65536, 262144):
        spark = get_spark(
            f"knob-{cores}-{recs}", cores=cores, shuffle_partitions=64,
            extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": str(recs)},
        )
        from scripts.scaling_workload import ensure_corpus  # noqa: E402

        ensure_corpus(spark, corpus_path, n_docs)
        corpus = spark.read.parquet(corpus_path)
        cfg = BuildConfig(n_slices=16, term_buckets=16)
        tok = exploded_tokens(corpus, cfg, keyed=True, packed=True)
        small = corpus.filter(F.col("doc_id") < 4000)
        exploded_tokens(small, cfg, keyed=True, packed=True).groupBy(
            "gkey"
        ).applyInArrow(_noop, "n long").count()
        t0 = time.time()
        tok.groupBy("gkey").applyInArrow(_noop, "n long").agg(F.sum("n")).collect()
        out[f"D3_recs{recs}_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        (
            tok.repartition(64, "gkey")
            .sortWithinPartitions("gkey", "term_key", "docpos")
            .mapInArrow(_noop_map, "n long")
            .agg(F.sum("n"))
            .collect()
        )
        out[f"D4_recs{recs}_sec"] = round(time.time() - t0, 2)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
