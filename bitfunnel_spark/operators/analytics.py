"""Index-quality analytics — the reference's measurement operators.

- cumulative_term_counts: vocabulary-growth curve (unique terms vs docs
  ingested) — DocumentFrequencyTableBuilder's cumulative counts
  (/root/reference/src/Index/src/DocumentFrequencyTableBuilder.cpp:33-37,76-82).
- posting_density: per-(term, shard) posting-list density over the shard's
  docs — the RowTableAnalyzer's row densities
  (/root/reference/src/Index/src/Shard.cpp:614-660, RowTableAnalyzer.cpp:129-178);
  for an exact index "density" is df_shard / docs_shard.
- term_correlation: co-occurring term pairs — Correlate
  (/root/reference/src/Index/src/Correlate.cpp:76-169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_term_counts(
    postings: DataFrame, every: int = 1, n_buckets: int = 256
) -> DataFrame:
    """(ingest_order, cum_unique_terms): after ingesting docs 0..doc_id, how
    many distinct BODY terms exist. Exact formulation: each term 'appears' at
    its minimum doc_id; the curve is the running count of first appearances.

    Two-pass DISTRIBUTED cumulative sum (VERDICT r04 item 4): an
    unpartitioned ``Window.orderBy`` would funnel one row per distinct
    first-appearance doc — ~n_docs rows — through a single task at 100×
    scale (Spark's own `WindowExec: No Partition Defined` warning). Instead:

    1. range-bucket the per-doc new-term counts into ``n_buckets`` ordered
       doc-id ranges;
    2. collect the per-bucket PARTIAL sums (≤ n_buckets rows — tiny by
       construction, the same driver-side-bounds shape the shard planner
       uses) and turn them into exclusive prefix offsets;
    3. cumsum WITHIN each bucket via a window partitioned by bucket, and
       broadcast-join the bucket offset back on.

    Every task handles ~n_docs/n_buckets rows; no stage sees the whole
    curve. Values are identical to the single-window formulation
    (ft_cum_term_counts stays hash-green against the DuckDB oracle).
    """
    first_seen = (
        postings.filter(F.col("stream") == "body")
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_doc = first_seen.groupBy("first_doc").agg(F.count("*").alias("new_terms"))
    bounds = per_doc.agg(
        F.min("first_doc").alias("lo"), F.max("first_doc").alias("hi")
    ).first()
    spark = postings.sparkSession
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [], "ingest_order long, cum_unique_terms long"
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo) // int(n_buckets) + 1)
    bucketed = per_doc.withColumn(
        "bucket", F.expr(f"CAST((first_doc - {lo}) DIV {width} AS BIGINT)")
    )
    partials = {
        int(r["bucket"]): int(r["s"])
        for r in bucketed.groupBy("bucket").agg(F.sum("new_terms").alias("s")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(partials):
        offsets.append((b, acc))
        acc += partials[b]
    off_df = spark.createDataFrame(offsets, "bucket long, bucket_offset long")
    w = (
        Window.partitionBy("bucket")
        .orderBy("first_doc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = bucketed.withColumn("cum_in_bucket", F.sum("new_terms").over(w)).join(
        F.broadcast(off_df), "bucket"
    )
    return out.select(
        F.col("first_doc").alias("ingest_order"),
        (F.col("bucket_offset") + F.col("cum_in_bucket"))
        .cast("long")
        .alias("cum_unique_terms"),
    )


def posting_density(postings: DataFrame, doc_stats: DataFrame) -> DataFrame:
    """(term, shard, df, shard_docs, density) for BODY terms — density is the
    fraction of the shard's documents containing the term (the exact-index
    analogue of bit-row density)."""
    shard_docs = doc_stats.groupBy("shard").agg(F.count("*").alias("shard_docs"))
    df_per = (
        postings.filter(F.col("stream") == "body")
        .groupBy("term", "shard")
        .agg(F.count("*").alias("df"))
    )
    return df_per.join(F.broadcast(shard_docs), "shard").select(
        "term",
        "shard",
        F.col("df").cast("long").alias("df"),
        F.col("shard_docs").cast("long").alias("shard_docs"),
        F.round(F.col("df") / F.col("shard_docs"), 4).alias("density"),
    )


def term_correlation(
    postings: DataFrame, min_pair_count: int = 2, max_df: int | None = 10000
) -> DataFrame:
    """(term_a, term_b, n_docs) — co-occurrence counts for BODY term pairs
    (term_a < term_b). Self-join on doc_id; `max_df` drops ultra-common
    terms first — ON BY DEFAULT (a term in >10k docs contributes >10k rows
    per partner to the self-join; the reference's Correlate tool similarly
    runs over a truncated term list). Pass None for the exact all-terms
    formulation (test scale)."""
    body = postings.filter(F.col("stream") == "body").select("term", "doc_id")
    if max_df is not None:
        rare = body.groupBy("term").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
        body = body.join(rare.select("term"), "term", "left_semi")
    a, b = body.alias("a"), body.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.term") < F.col("b.term")))
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_pair_count)
    )


def index_stats(index) -> DataFrame:
    """Per-shard index statistics (the ES `_stats`/`_segments` observability
    surface): document count, distinct terms, posting count, block count,
    and stored segment bytes. One pass over segment METADATA plus one over
    doc_stats — postings themselves are never decoded (block `n` and the
    binary column sizes are plain columns, so the whole thing is two
    map-side-combined aggregations).

    Reference analogue: the reference prints per-shard row/term tables via
    StatisticsBuilder (src/Tools/StatisticsBuilder); doc/posting counts per
    shard are the same accounting."""
    seg = index.segments.groupBy("shard").agg(
        F.countDistinct("term_key").alias("n_terms"),
        F.sum("n").cast("long").alias("n_postings"),
        F.count("*").alias("n_blocks"),
        (
            F.sum(F.octet_length("docs_vb"))
            + F.sum(F.octet_length("tfs_vb"))
            + F.sum(F.octet_length("partials"))
            + F.sum(F.coalesce(F.octet_length("pos_vb"), F.lit(0)))
        ).cast("long").alias("segment_bytes"),
    )
    docs = index.doc_stats.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").cast("long").alias("sum_doclen"),
    )
    return docs.join(seg, "shard", "left").orderBy("shard")
