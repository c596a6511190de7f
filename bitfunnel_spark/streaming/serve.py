"""Continuous query serving — Structured Streaming over an append-only
query log.

The reference's serving loop is QueryRunner: a query log file fanned out
over N worker threads in one process
(/root/reference/src/Plan/src/QueryRunner.cpp:282-402). The Spark-native
analogue treats arriving queries as DATA: `readStream` over a query-log
directory; each micro-batch becomes ONE batched job (`plans/batch.py`
search_many — all plans in one broadcast descriptor, one pass over the
union of their terms' segments, per-query top-k by window), so scheduling
and Python-worker startup amortize across the whole batch exactly like the
offline path. With `index.prepare_serve()` the per-batch job is
exchange-free. Results land in per-batch directories committed atomically —
the same exactly-once recipe as ingest (checkpoint WAL + idempotent batch
dirs).

At scale this is the continuous serving tier: trigger interval bounds
latency, micro-batch size amortizes the job floor, and throughput is the
batched-QPS number bench.py reports (the per-query latency floor of
single-job mode never applies).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitfunnel_spark.sources import fsio

QUERY_LOG_DDL = "query_id long, query string"

RESULT_DDL = "query_id long, query string, rank int, doc_id long, score double"


def query_log_stream(spark: SparkSession, queries_dir: str) -> DataFrame:
    """Streaming source of queries: parquet files appearing under
    queries_dir with schema (query_id, query)."""
    return spark.readStream.schema(QUERY_LOG_DDL).parquet(queries_dir)


def serve_query_stream(
    spark: SparkSession,
    index,
    queries_dir: str,
    results_dir: str,
    k: int = 10,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    facts: list[str] | None = None,
):
    """Serve queries continuously: query-log files → per-batch result dirs.

    Each result row is (query_id, query, rank, doc_id, score), rank 1-based
    in (score desc, doc_id asc) order — the contract of `search`. A batch's
    query TEXTS are collected driver-side (a micro-batch of query strings
    is KB-scale at any realistic QPS — the plans must reach the broadcast
    descriptor anyway); the matching itself is the distributed batched
    kernel. Batches replayed by the checkpoint WAL after a restart are
    skipped idempotently, like ingest increments.
    """
    fsio.mkdirs(results_dir)
    checkpoint_dir = checkpoint_dir or fsio.join(results_dir, "_serve_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = fsio.join(results_dir, f"batch={batch_id}")
        if fsio.exists(out):  # replayed batch — idempotent skip
            return
        rows = batch_df.select("query_id", "query").collect()
        if not rows:
            return
        texts = [r["query"] for r in rows]
        res = index.search_many(texts, k=k, facts=facts)
        # positional engine id → the log's query_id (tiny broadcast map)
        mapping = batch_df.sparkSession.createDataFrame(
            [(i, int(r["query_id"]), r["query"]) for i, r in enumerate(rows)],
            "pos int, query_id long, query string",
        )
        w = F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        )
        ranked = (
            res.withColumnRenamed("query_id", "pos")
            .join(F.broadcast(mapping), "pos")
            .withColumn("rank", w)
            .select("query_id", "query", "rank", "doc_id", "score")
        )
        tmp = fsio.join(results_dir, f"_tmp_batch={batch_id}")
        if fsio.exists(tmp):
            fsio.delete(tmp)
        ranked.write.mode("overwrite").parquet(tmp)
        fsio.rename(tmp, out)

    writer = (
        query_log_stream(spark, queries_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def percolate_stream(
    spark: SparkSession,
    corpus_dir: str,
    queries: list[str],
    results_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    config=None,
):
    """Continuous percolation (the Elasticsearch watcher / saved-search
    alerting shape): documents ARRIVE as a stream; the standing query log is
    fixed. Each micro-batch builds a throwaway fused index over just the
    batch (cheap at micro-batch size — one shuffle over KBs..MBs) and
    evaluates the WHOLE log against it in ONE batched kernel job
    (plans/batch.percolate). Result rows are (query_id, doc_id): "standing
    query q fired on new document d" — exactly the ingest-time alert feed.
    Exactly-once by the same recipe as ingest: checkpoint WAL + idempotent
    per-batch result dirs committed by atomic rename (Hadoop FS — object
    store safe). At scale the standing log is thousands of queries and the
    batch is seconds of ingest; both ride the batched-kernel QPS numbers
    bench.py records (percolate_qps)."""
    from bitfunnel_spark.plans.batch import percolate
    from bitfunnel_spark.streaming.ingest import corpus_stream

    fsio.mkdirs(results_dir)
    checkpoint_dir = checkpoint_dir or fsio.join(results_dir, "_percolate_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = fsio.join(results_dir, f"batch={batch_id}")
        if fsio.exists(out):  # replayed batch — idempotent skip
            return
        if batch_df.isEmpty():
            return
        hits = percolate(batch_df.sparkSession, batch_df, queries, config=config)
        tmp = fsio.join(results_dir, f"_tmp_batch={batch_id}")
        if fsio.exists(tmp):
            fsio.delete(tmp)
        hits.write.mode("overwrite").parquet(tmp)
        fsio.rename(tmp, out)

    writer = (
        corpus_stream(spark, corpus_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def read_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """All served results so far (one globbed read of the batch dirs)."""
    out = spark.read.option("basePath", results_dir).parquet(
        fsio.join(results_dir, "batch=*")
    )
    if "batch" in out.columns:
        out = out.drop("batch")
    return out
