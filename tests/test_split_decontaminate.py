"""Training-pipeline split + decontamination operators: deterministic hash
split (partitioning-independent, DuckDB-mirrored) and benchmark-leak removal
by shared-shingle count."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.dedup import contamination, decontaminate
from bitfunnel_spark.sources.filters import fraction_threshold_hex, hash_split


def test_hash_split_deterministic_and_partition_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(13)).collect()
    }
    assert a == b  # scheduling cannot move a doc between splits
    n = len(a)
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == n  # every row labeled
    assert abs(counts["train"] / n - 0.9) < 0.03
    assert abs(counts["val"] / n - 0.05) < 0.02
    assert abs(counts["test"] / n - 0.05) < 0.02


def test_hash_split_matches_duckdb(spark):
    """Engine-independence: the same md5-band rule in DuckDB produces the
    identical assignment (the oracle property the driver checks)."""
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    t_train, t_val = fraction_threshold_hex(0.9), fraction_threshold_hex(0.95)
    want = dict(
        duckdb.sql(
            f"""SELECT i, CASE WHEN substr(md5('42:' || CAST(i AS VARCHAR)),1,8) < '{t_train}' THEN 'train'
                 WHEN substr(md5('42:' || CAST(i AS VARCHAR)),1,8) < '{t_val}' THEN 'val'
                 ELSE 'test' END FROM range(300) t(i)"""
        ).fetchall()
    )
    assert got == want


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, weights=(("a", 0.5), ("b", 0.2)))


@pytest.fixture(scope="module")
def leak_env(spark):
    """Train set with one doc embedding a benchmark question verbatim, one
    doc sharing a single shingle (below threshold), and clean docs."""
    bench = [(100, "what is the capital of france paris obviously")]
    train = [
        (1, "the model should know what is the capital of france paris obviously said the doc"),
        (2, "capital of france mentioned once in passing here unrelated text follows now"),
        (3, "完全 unrelated clean document about spark shuffles and partitions"),
        (4, "another clean doc discussing posting lists and block max pruning"),
    ]
    return {
        "train": spark.createDataFrame(train, "doc_id long, text string"),
        "bench": spark.createDataFrame(bench, "doc_id long, text string"),
    }


def test_contamination_flags_verbatim_leak_only(spark, leak_env):
    hits = {
        r["doc_id"]: r["n_shared"]
        for r in contamination(leak_env["train"], leak_env["bench"], min_overlap=2).collect()
    }
    assert 1 in hits and hits[1] >= 2  # verbatim inclusion: many shared shingles
    assert 2 not in hits  # one shared shingle < min_overlap
    assert 3 not in hits and 4 not in hits


def test_decontaminate_removes_exactly_flagged(spark, leak_env):
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(leak_env["train"], leak_env["bench"], min_overlap=2).collect()
    )
    assert kept == [2, 3, 4]
