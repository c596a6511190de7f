"""Token-budget sequence packing for training pipelines.

The op every LLM data pipeline runs last: concatenate documents and chop the
token stream into fixed-size context windows ("sequences"), emitting which
token span of each document lands in which sequence. Semantics here are the
standard concat-and-split packing (a document may straddle a window
boundary), NOT bin packing — so the result is a pure function of
(bucket, doc order, token counts) and has an exact SQL mirror.

Scale shape: a single global token-offset cumsum would serialize on one
window partition. Instead docs are hashed into `n_buckets` independent
streams (bucket = doc_id % n_buckets) and packed per bucket: the window
function partitions by bucket, so the cumsum parallelizes across the
cluster and each bucket's sequences are independent units downstream
(shuffle keyed by bucket only — no skew, buckets are uniform by
construction). At 100 TB raise n_buckets to ~10× executor count; sequence
ids are (bucket, seq) pairs so no cross-bucket coordination exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bitfunnel_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> DataFrame:
    """(bucket, seq, doc_id, begin_tok, end_tok): document `doc_id`
    contributes its tokens to window `seq` of bucket `bucket` at in-sequence
    token positions [begin_tok, end_tok). Every sequence except the last of
    each bucket is exactly `budget` tokens; docs with zero tokens are
    dropped (they contribute no span).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            (F.col(id_col) % n_buckets).alias("bucket"),
            token_count(text_col).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    spans = toks.select(
        "bucket",
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
        F.sum("n_tokens").over(w).alias("end_off"),
    )
    first_seq = F.floor(F.col("start_off") / budget)
    last_seq = F.floor((F.col("end_off") - 1) / budget)
    return (
        spans.select(
            "bucket",
            "doc_id",
            "start_off",
            "end_off",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq"),
        )
        .select(
            "bucket",
            "seq",
            "doc_id",
            (F.greatest(F.col("start_off"), F.col("seq") * budget) - F.col("seq") * budget)
            .alias("begin_tok"),
            (F.least(F.col("end_off"), (F.col("seq") + 1) * budget) - F.col("seq") * budget)
            .alias("end_tok"),
        )
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bucket fill metrics: sequences, packed tokens, fill ratio
    (tokens / (n_seqs * budget)) — the number a pipeline monitors (only the
    final partial window of each bucket is ever under-full here, so fill
    approaches 1.0 as buckets grow)."""
    return (
        packed.groupBy("bucket")
        .agg(
            (F.max("seq") + 1).alias("n_seqs"),
            F.sum(F.col("end_tok") - F.col("begin_tok")).alias("n_tokens"),
        )
        .select(
            "bucket",
            "n_seqs",
            "n_tokens",
            F.round(F.col("n_tokens") / (F.col("n_seqs") * budget), 4).alias("fill"),
        )
    )
