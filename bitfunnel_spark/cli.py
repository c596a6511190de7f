"""CLI — the `spark-submit --py-files` surface (north_rule).

Subcommands mirror the reference tool's verbs
(/root/reference/tools/BitFunnel/src/BitFunnelTool.cpp:87-116:
statistics / termtable / repl's `query one` and `query log`):

    build      corpus parquet → checkpointed index (resumable)
    query      one query against a built index → top-k to stdout
    querylog   a file of queries → per-query latency CSV + summary (QPS),
               like the reference's QuerySummaryStatistics
               (/root/reference/src/Plan/src/QueryRunner.cpp:67-92)
    compact    fold streaming increments into the main segment store

Example:
    spark-submit --py-files bitfunnel_spark.zip -m bitfunnel_spark.cli \\
        build --corpus /data/corpus --index /data/index
    python -m bitfunnel_spark.cli query --corpus ... --index ... "data -slow"
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(args):
    from bitfunnel_spark.session import get_spark

    return get_spark("bitfunnel-cli", cores=args.cores)


def _config():
    from bitfunnel_spark.config import BuildConfig

    return BuildConfig()


def _load(spark, args):
    from bitfunnel_spark.operators.checkpoint import CheckpointedBuild

    corpus = spark.read.parquet(args.corpus)
    return CheckpointedBuild(spark, args.index, _config()).load_index(corpus)


def cmd_build(args) -> None:
    from bitfunnel_spark.operators.checkpoint import CheckpointedBuild

    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    t0 = time.time()
    CheckpointedBuild(spark, args.index, _config()).build(corpus)
    n = corpus.count()
    dt = time.time() - t0
    print(json.dumps({"docs": n, "build_sec": round(dt, 2), "files_per_sec": round(n / dt, 2)}))


def cmd_query(args) -> None:
    spark = _spark(args)
    idx = _load(spark, args)
    for r in idx.search(args.query, k=args.k, mode=args.mode).collect():
        print(f"{r['doc_id']}\t{r['score']}")


def cmd_querylog(args) -> None:
    spark = _spark(args)
    idx = _load(spark, args)
    queries = [l.strip() for l in open(args.log) if l.strip() and not l.startswith("#")]
    idx.search(queries[0], k=args.k, mode=args.mode).collect()  # warm
    rows, t_all = [], time.time()
    for q in queries:
        t0 = time.time()
        n = len(idx.search(q, k=args.k, mode=args.mode).collect())
        rows.append((q, round(time.time() - t0, 4), n))
    elapsed = time.time() - t_all
    print("query\tlatency_sec\tmatches")
    for q, lat, n in rows:
        print(f"{q}\t{lat}\t{n}")
    lats = sorted(r[1] for r in rows)
    print(
        json.dumps(
            {
                "queries": len(rows),
                "elapsed_sec": round(elapsed, 2),
                "qps": round(len(rows) / elapsed, 3),
                "p50_sec": lats[len(lats) // 2],
                "p90_sec": lats[int(len(lats) * 0.9)],
            }
        ),
        file=sys.stderr,
    )


def cmd_compact(args) -> None:
    from bitfunnel_spark.streaming.ingest import compact

    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    compact(spark, args.index, _config(), corpus)
    print("compacted")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="bitfunnel_spark")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (default: $SPARK_GRAFT_CPUS)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--corpus", required=True)
    q.add_argument("--index", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="kernel", choices=["kernel", "dataframe"])
    q.add_argument("query")
    q.set_defaults(fn=cmd_query)

    ql = sub.add_parser("querylog")
    ql.add_argument("--corpus", required=True)
    ql.add_argument("--index", required=True)
    ql.add_argument("--k", type=int, default=10)
    ql.add_argument("--mode", default="kernel", choices=["kernel", "dataframe"])
    ql.add_argument("log")
    ql.set_defaults(fn=cmd_querylog)

    c = sub.add_parser("compact")
    c.add_argument("--corpus", required=True)
    c.add_argument("--index", required=True)
    c.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
