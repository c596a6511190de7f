"""Shuffle-layer knob battery for the 2→8 scaling gap (round-3 item 7).

Round-2 probes (BENCH.md "attributing the scaling loss") isolated the build's
efficiency loss to Spark's exchange + group-sort + Arrow-IPC layer (no-op
kernel D3 scaled 0.38 while the engine's map side scaled 1.00). This probe
re-times D3 at one core count under candidate knob sets, so a 2-vs-8 pair of
runs tells us whether any non-engine knob closes the gap:

  base       — engine defaults (session.get_spark)
  nocomp     — spark.shuffle.compress=false, spark.shuffle.spill.compress=false
               (shuffle dirs are tmpfs: lz4 is pure CPU spent compressing RAM)
  zstd       — spark.io.compression.codec=zstd (better ratio, more CPU)
  bigbuf     — 1 MB shuffle file buffers + 128 MB inMemSorter page
  nocomp+bigbuf

Usage: taskset -c 0-<cores-1> python scripts/shuffle_knob_probe.py <cores> <n_docs>
Prints one JSON line per knob set.
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

KNOBS: dict[str, dict[str, str]] = {
    "base": {},
    "nocomp": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "zstd": {"spark.io.compression.codec": "zstd"},
    "bigbuf": {
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
    },
    "nocomp_bigbuf": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
    },
}


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    parts = int(os.environ.get("SCALING_PARTS", "256"))
    corpus_path = f"/tmp/bf_scaling_corpus_{n_docs}"
    import pyarrow as pa

    def _noop(tbl: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([tbl.num_rows], type=pa.int64())})

    for name, extra in KNOBS.items():
        spark = get_spark(
            f"knob-{name}-{cores}", cores=cores, shuffle_partitions=parts,
            extra_conf=extra,
        )
        from scripts.scaling_workload import ensure_corpus

        ensure_corpus(spark, corpus_path, n_docs)
        corpus = spark.read.parquet(corpus_path)
        cfg = BuildConfig(n_slices=16, term_buckets=16)
        tok = exploded_tokens(corpus, cfg, keyed=True, packed=True)
        # warm-up: same shape, small slice
        small = exploded_tokens(
            corpus.filter(F.col("doc_id") < 4000), cfg, keyed=True, packed=True
        )
        small.groupBy("gkey").applyInArrow(_noop, "n long").agg(F.sum("n")).collect()
        times = []
        for _ in range(2):
            t0 = time.time()
            tok.groupBy("gkey").applyInArrow(_noop, "n long").agg(F.sum("n")).collect()
            times.append(round(time.time() - t0, 2))
        print(json.dumps({
            "knob": name, "cores": cores, "n_docs": n_docs, "parts": parts,
            "d3_sec": min(times), "d3_times": times,
        }))
        sys.stdout.flush()
        spark.stop()


if __name__ == "__main__":
    main()
