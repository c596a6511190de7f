"""Trigram substring index (Zoekt / Cox codesearch design): candidates =
AND over the literal's rarest trigram posting lists, exact contains()
verify over candidates only."""

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.trigram import (
    build_trigram_index,
    literal_trigrams,
    substring_search,
    substring_search_many,
    trigram_expr,
)

TESTDATA = "/root/testdata/sf0.001"


def test_trigram_expr(spark):
    rows = spark.createDataFrame(
        [("Hello",), ("ab",), ("",), ("aaaa",)], "t string"
    ).select(trigram_expr("t").alias("tri")).collect()
    assert rows[0]["tri"] == ["hel", "ell", "llo"]
    assert rows[1]["tri"] == []
    assert rows[2]["tri"] == []
    assert rows[3]["tri"] == ["aaa"]  # distinct


def test_literal_trigrams():
    assert literal_trigrams("DataX") == sorted({"dat", "ata", "tax"})
    assert literal_trigrams("ab") == []


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet").cache()


@pytest.fixture(scope="module")
def tri(docs):
    return build_trigram_index(docs).cache()


@pytest.mark.parametrize("lit", ["fast key", "key agg", "zzznope", "table", "row scan slow"])
def test_substring_vs_bruteforce(docs, tri, lit):
    got = sorted(r["doc_id"] for r in substring_search(tri, docs, lit).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(lit.lower()))).collect()
    )
    assert got == want


def test_substring_case_insensitive(docs, tri):
    a = sorted(r["doc_id"] for r in substring_search(tri, docs, "Fast KEY").collect())
    b = sorted(r["doc_id"] for r in substring_search(tri, docs, "fast key").collect())
    assert a == b and a


def test_short_literal_fallback(docs, tri):
    got = sorted(r["doc_id"] for r in substring_search(tri, docs, "ag").collect())
    want = sorted(
        r["doc_id"] for r in docs.filter(F.contains(F.lower("text"), F.lit("ag"))).collect()
    )
    assert got == want


def test_absent_trigram_short_circuits(docs, tri):
    # 'zzq' occurs nowhere -> empty result without a corpus scan
    out = substring_search(tri, docs, "zzqzzq")
    assert out.count() == 0


def test_search_many_matches_singles(docs, tri):
    lits = ["fast key", "table", "zz", "zzznope"]
    batch = {
        (r["query"], r["doc_id"])
        for r in substring_search_many(tri, docs, lits).collect()
    }
    singles = set()
    for q in lits:
        for r in substring_search(tri, docs, q).collect():
            singles.add((q, r["doc_id"]))
    assert batch == singles


def test_candidate_scan_is_pruned(docs, tri):
    # the probe scan must carry the trigram IN-list into the plan (filter
    # above the index relation), and the verify must be a semi-join —
    # never a full-corpus contains scan
    out = substring_search(tri, docs, "fast key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


# --- regex search (Cox trigram-query derivation) ---

from bitfunnel_spark.operators.trigram import (  # noqa: E402
    _prunable,
    _regex_candidate_tree,
    regex_search,
    regex_search_many,
)


def test_candidate_tree_shapes():
    t = _prunable(_regex_candidate_tree("fast (key|value)"))
    assert t == ("and", [("lit", "fast "), ("or", [("lit", "key"), ("lit", "value")])])
    # class breaks the run; repeat with min>=1 keeps its child
    assert _prunable(_regex_candidate_tree("gr[ae]y fa+st")) == ("lit", "y f")
    # optional prefix -> nothing required
    assert _prunable(_regex_candidate_tree("x?y")) == ("true",)
    # min-0 repeat -> TRUE inside AND is dropped, the literal remains
    assert _prunable(_regex_candidate_tree("data(x)*")) == ("lit", "data")
    # a TRUE branch poisons the whole OR
    assert _prunable(_regex_candidate_tree("(dataxyz|a?)")) == ("true",)
    # unparseable degrades to TRUE, never raises
    assert _regex_candidate_tree("((((") == ("true",)


REGEX_CASES = [
    "fast (key|value)",
    "(scan|data) slow",
    "key +agg",
    "row.scan",
    "zz+nope",
    "q?",  # no literals -> full verify scan
]


@pytest.mark.parametrize("pat", REGEX_CASES)
def test_regex_vs_bruteforce(docs, tri, pat):
    got = sorted(r["doc_id"] for r in regex_search(tri, docs, pat).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.lower("text").rlike("(?i)" + pat)).collect()
    )
    assert got == want


def test_regex_case_insensitive(docs, tri):
    a = sorted(r["doc_id"] for r in regex_search(tri, docs, "FAST (KEY|VALUE)").collect())
    b = sorted(r["doc_id"] for r in regex_search(tri, docs, "fast (key|value)").collect())
    assert a == b and a


def test_regex_many_matches_singles(docs, tri):
    # the batched path must equal the per-pattern path for every pattern,
    # including the full-verify one (tree degrades to TRUE) and a
    # corpus-absent one
    pats = REGEX_CASES + ["zzzabsent(xx|yy)"]
    many = regex_search_many(tri, docs, pats)
    got = {}
    for r in many.collect():
        got.setdefault(r["query"], []).append(r["doc_id"])
    for p in pats:
        single = sorted(r["doc_id"] for r in regex_search(tri, docs, p).collect())
        assert sorted(got.get(p, [])) == single, p


def test_regex_many_single_candidate_scan(docs, tri):
    # the pruned patterns share ONE posting aggregation: exactly one
    # collect_set aggregate appears in the plan regardless of pattern count
    many = regex_search_many(
        tri, docs, ["fast (key|value)", "(scan|data) slow", "key +agg"]
    )
    plan = many._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("collect_set") == 1


def test_regex_many_dedupes_patterns(docs, tri):
    out = regex_search_many(tri, docs, ["fast (key|value)", "fast (key|value)"])
    rows = out.collect()
    assert len(rows) == len({(r["query"], r["doc_id"]) for r in rows})


def test_grep_many_mixed_log(docs, tri):
    # mixed literal/regex log: literal results equal substring_search,
    # regex results equal regex_search; literals with regex metachars are
    # escaped (matched literally, not as a pattern)
    from bitfunnel_spark.operators.trigram import grep_many

    log = [("lit", "fast key"), ("re", "fast (key|value)"), ("lit", "a+b")]
    got = {}
    for r in grep_many(tri, docs, log).collect():
        got.setdefault(r["query"], []).append(r["doc_id"])
    assert sorted(got.get("fast key", [])) == sorted(
        r["doc_id"] for r in substring_search(tri, docs, "fast key").collect()
    )
    assert sorted(got.get("fast (key|value)", [])) == sorted(
        r["doc_id"] for r in regex_search(tri, docs, "fast (key|value)").collect()
    )
    assert sorted(got.get("a+b", [])) == sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit("a+b"))).collect()
    )


def test_substring_lines(spark, tri, docs):
    from bitfunnel_spark.operators.trigram import substring_search_lines

    df = spark.createDataFrame(
        [(900001, "alpha beta\ngamma fast key here\nfast keyhole\nnothing")],
        "doc_id long, text string",
    )
    # standalone mini-corpus with its own mini-index
    mini = build_trigram_index(df)
    rows = sorted(
        (r["doc_id"], r["line_no"], r["line"])
        for r in substring_search_lines(mini, df, "Fast Key").collect()
    )
    assert rows == [
        (900001, 2, "gamma fast key here"),
        (900001, 3, "fast keyhole"),
    ]
    # over real testdata: every reported line contains the literal, and the
    # doc set equals substring_search's
    out = substring_search_lines(tri, docs, "fast key")
    got = out.collect()
    assert got and all("fast key" in r["line"].lower() for r in got)
    assert {r["doc_id"] for r in got} == {
        r["doc_id"] for r in substring_search(tri, docs, "fast key").collect()
    }


def test_persisted_index_partition_pruning(spark, docs, tri, tmp_path):
    from bitfunnel_spark.operators.trigram import (
        read_trigram_index,
        write_trigram_index,
    )

    path = str(tmp_path / "tri")
    write_trigram_index(tri, path)
    disk = read_trigram_index(spark, path)
    # same results off disk
    got = sorted(r["doc_id"] for r in substring_search(disk, docs, "fast key").collect())
    want = sorted(r["doc_id"] for r in substring_search(tri, docs, "fast key").collect())
    assert got == want
    # the tri_bucket IN-list must reach the scan as a partition filter
    from bitfunnel_spark.operators.trigram import _buckets, literal_trigrams

    tris = literal_trigrams("fast key")
    bks = sorted(set(_buckets(spark, tris, 64).values()))
    scan = disk.filter(F.col("tri_bucket").isin(bks) & F.col("trigram").isin(tris))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "tri_bucket" in plan.split("PartitionFilters")[1][:200]
