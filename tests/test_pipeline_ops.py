"""PII scrubbing, stratified domain sampling, and token-budget sequence
packing — the training-pipeline ops beyond the dedup/split family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.packing import pack_sequences, packing_stats
from bitfunnel_spark.operators.text import pii_count, scrub_pii, token_count
from bitfunnel_spark.sources.filters import band_threshold, stratified_sample


# ---------------------------------------------------------------------------
# PII scrub

def test_scrub_pii_redacts_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org or call +4915112345678 from 192.168.0.1"),
            (2, "no pii here just text"),
            (3, "two mails x@y.io and z@w.co; ip 10.0.0.255"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            scrub_pii("text").alias("scrubbed"),
            pii_count("text", "email").alias("e"),
            pii_count("text", "ip").alias("i"),
            pii_count("text", "phone").alias("p"),
        ).collect()
    }
    assert out[1]["scrubbed"] == "mail <EMAIL> or call <PHONE> from <IP>"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 1, 1)
    assert out[2]["scrubbed"] == "no pii here just text"
    assert out[3]["e"] == 2 and out[3]["i"] == 1 and out[3]["p"] == 0
    assert "<EMAIL>" in out[3]["scrubbed"] and "<IP>" in out[3]["scrubbed"]


def test_scrub_pii_email_before_ip_ordering(spark):
    # the dotted local/domain parts of an email must not be clipped as IPs
    df = spark.createDataFrame([(1, "v1.2.3.4@h5.6.7.8mx.com")], "doc_id long, text string")
    got = df.select(scrub_pii("text").alias("s")).first()["s"]
    assert got == "<EMAIL>"


# ---------------------------------------------------------------------------
# stratified sample

def test_stratified_sample_fractions_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, ["en", "zh", "de"][i % 3]) for i in range(3000)],
        "doc_id long, lang string",
    )
    frac = {"en": 0.5, "zh": 1.0}
    kept = stratified_sample(df, frac, default_fraction=0.1)
    counts = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert counts["zh"] == 1000  # fraction 1.0 keeps every row
    assert abs(counts["en"] / 1000 - 0.5) < 0.06
    assert abs(counts.get("de", 0) / 1000 - 0.1) < 0.04
    # partitioning-independent: identical doc_id set after repartition
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(17), frac, default_fraction=0.1).collect()
    )
    assert a == b


def test_stratified_sample_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample(df, {"en": 1.5})


def test_band_threshold_full_fraction_sorts_above_hex():
    assert band_threshold(1.0) > "ffffffff"
    assert band_threshold(0.5) == "80000000"


# ---------------------------------------------------------------------------
# sequence packing

@pytest.fixture(scope="module")
def packed_env(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range((i * 7) % 23 + 1))) for i in range(200)],
        "doc_id long, text string",
    )
    return {
        "df": df,
        "packed": pack_sequences(df, budget=16, n_buckets=4).cache(),
    }


def test_pack_spans_cover_each_doc_exactly(spark, packed_env):
    # summed span lengths per doc == the doc's token count
    spans = (
        packed_env["packed"]
        .groupBy("doc_id")
        .agg(F.sum(F.col("end_tok") - F.col("begin_tok")).alias("covered"))
    )
    toks = packed_env["df"].select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    bad = spans.join(toks, "doc_id").filter(F.col("covered") != F.col("n_tokens"))
    assert bad.count() == 0


def test_pack_every_sequence_is_exactly_budget_except_last(spark, packed_env):
    sizes = (
        packed_env["packed"]
        .groupBy("bucket", "seq")
        .agg(F.sum(F.col("end_tok") - F.col("begin_tok")).alias("n"))
    )
    last = sizes.groupBy("bucket").agg(F.max("seq").alias("seq")).withColumn("is_last", F.lit(True))
    full = sizes.join(last, ["bucket", "seq"], "left_anti")
    assert full.filter(F.col("n") != 16).count() == 0
    assert sizes.filter((F.col("n") <= 0) | (F.col("n") > 16)).count() == 0


def test_pack_spans_within_budget_and_ordered(spark, packed_env):
    bad = packed_env["packed"].filter(
        (F.col("begin_tok") < 0)
        | (F.col("end_tok") > 16)
        | (F.col("begin_tok") >= F.col("end_tok"))
    )
    assert bad.count() == 0


def test_pack_deterministic_under_repartition(spark, packed_env):
    again = pack_sequences(packed_env["df"].repartition(13), budget=16, n_buckets=4)
    a = sorted(map(tuple, packed_env["packed"].collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_packing_stats_fill(spark, packed_env):
    stats = packing_stats(packed_env["packed"], budget=16).collect()
    assert len(stats) == 4
    for r in stats:
        assert 0.8 < r["fill"] <= 1.0  # only the final window per bucket is partial


def test_pack_rejects_bad_budget(spark, packed_env):
    with pytest.raises(ValueError):
        pack_sequences(packed_env["df"], budget=0)


def test_quality_weighted_sample(spark, corpus, duck):
    from bitfunnel_spark.entry_queries import _sql_corpus_weighted
    from bitfunnel_spark.sources.filters import quality_weighted_sample

    kept = quality_weighted_sample(corpus, seed=17, floor=0.05)
    got = [(r["doc_id"], r["weight"]) for r in kept.select("doc_id", "weight").orderBy("doc_id").collect()]
    exp = duck.execute(_sql_corpus_weighted(seed=17, floor=0.05)).fetchall()
    assert got == [(d, pytest.approx(w, abs=1e-9)) for d, w in exp]
    n_total = corpus.count()
    # a real subsample, not empty / not everything
    assert 0 < len(got) < n_total
    # weights respect the floor and [0,1]+floor bound
    assert all(0.05 <= w <= 1.0 for _, w in got)
    # deterministic across repeat evaluation
    again = [(r["doc_id"], r["weight"]) for r in kept.select("doc_id", "weight").orderBy("doc_id").collect()]
    assert got == again
    # seed changes the kept set
    other = {r["doc_id"] for r in quality_weighted_sample(corpus, seed=18, floor=0.05).select("doc_id").collect()}
    assert other != {d for d, _ in got}
    # floor=1 keeps everything
    assert quality_weighted_sample(corpus, floor=1.0).count() == n_total
    with pytest.raises(ValueError):
        quality_weighted_sample(corpus, floor=1.5)
