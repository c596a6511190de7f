"""Exact-substring dedup (Lee et al. 2022 ExactSubstr, distributed form):
fingerprint every L-token window, positions whose window occurs >= 2 times
corpus-wide merge into maximal per-doc spans."""

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators.dedup import (
    substring_dup_spans,
    substring_gram_positions,
    substring_scrub,
)

BOILER = "the quick brown fox jumps over the lazy dog again and again"  # 12 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 1 and 2 share BOILER verbatim with distinct tails
        (1, BOILER + " alpha beta gamma delta"),
        (2, "intro words first " + BOILER + " omega"),
        # 3 repeats ITS OWN 12-gram twice (self-repetition is a duplicate)
        (3, BOILER + " filler filler filler " + BOILER),
        # 4 shares nothing 12 tokens long
        (4, "totally unrelated text with no twelve token overlap at all here ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_positions_shape(docs):
    g = substring_gram_positions(docs, min_len=12)
    rows = g.filter("doc_id = 1").count()
    # doc 1 has 16 tokens -> 5 windows of 12
    assert rows == 5
    # doc 4 has exactly 12 tokens -> 1 window (not duplicated anywhere)
    assert g.filter("doc_id = 4").count() == 1


def test_dup_spans(docs):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in substring_dup_spans(docs, min_len=12).collect()
    }
    # docs 1 and 2 each carry exactly the shared 12-token run
    assert (1, 0, 12) in spans and spans[(1, 0, 12)] == 1
    assert (2, 3, 15) in spans and spans[(2, 3, 15)] == 1
    # doc 3: both copies of the run are duplicated (with itself); they are
    # 12 + 3 tokens apart so they merge? start positions 0 and 15; first
    # span covers [0,12), second starts at 15 > 12 -> two spans
    assert (3, 0, 12) in spans and (3, 15, 27) in spans
    # doc 4 clean
    assert not any(d == 4 for d, _, _ in spans)


def test_scrub_removes_spans(docs):
    # byte-exact surgery: the span's character range is cut from the
    # ORIGINAL text; everything outside survives byte-identical (including
    # the whitespace that used to separate the span from its neighbours)
    out = {r["doc_id"]: r for r in substring_scrub(docs, min_len=12).collect()}
    assert out[1]["n_dropped_tokens"] == 12
    assert out[1]["text"] == " alpha beta gamma delta"
    assert out[2]["text"] == "intro words first  omega"
    assert out[3]["n_dropped_tokens"] == 24
    assert out[3]["text"] == " filler filler filler "
    assert out[4]["n_dropped_tokens"] == 0
    # a clean document passes through byte-identical
    assert out[4]["text"] == (
        "totally unrelated text with no twelve token overlap at all here ok"
    )


def test_scrub_preserves_original_bytes(spark):
    # casing / punctuation / odd whitespace outside the span survive
    run = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, "Keep, This!  " + run + "\ttail."), (2, run)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_scrub(df, min_len=12).collect()}
    assert out[1]["text"] == "Keep, This!  \ttail."
    assert out[2]["text"] == ""


def test_py_tokenize_parity(docs, spark):
    # the Python offset mirror must produce the exact JVM token stream,
    # and its char spans must slice back to the token (modulo case)
    from bitfunnel_spark.functions.tokenizer import py_token_spans, py_tokenize, tokenize

    rows = spark.createDataFrame(
        [
            (1, "getUserName parse_html XMLHttpRequest v2Counter a1b2"),
            (2, "Keep, This!  odd\twhitespace __dunder__ 123abc ABC"),
            (3, BOILER),
        ],
        "doc_id long, text string",
    )
    for analyzer in ("standard", "code"):
        got = rows.select("text", tokenize("text", analyzer).alias("tk")).collect()
        for r in got:
            assert py_tokenize(r["text"], analyzer) == list(r["tk"])
            spans = py_token_spans(r["text"], analyzer)
            assert len(spans) == len(r["tk"])
            for (a, b), tok in zip(spans, r["tk"]):
                assert b > a
                # the char slice, tokenized alone, is exactly that token
                assert py_tokenize(r["text"][a:b], analyzer) == [tok]


def test_overlapping_windows_merge(spark):
    # a 14-token duplicated run yields 3 overlapping 12-windows in each doc
    # -> ONE merged span of [start, start+14)
    run = " ".join(f"w{i}" for i in range(14))
    df = spark.createDataFrame(
        [(1, run + " x y z"), (2, "a b " + run)], "doc_id long, text string"
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in substring_dup_spans(df, min_len=12).collect()
    )
    assert spans == [(1, 0, 14, 3), (2, 2, 16, 3)]


def test_no_shuffle_before_fingerprint_group(docs):
    # the only wide dependencies are groupBy(g), the join back on g, and the
    # per-doc merge — the gram explode itself must be map-side (no Exchange
    # between scan and the fingerprint aggregate's partial stage)
    plan = substring_gram_positions(docs, min_len=12)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_scrub_plan_single_pass(docs):
    # byte surgery is one Arrow-batched mapInPandas over (text ⋈ spans) —
    # no extra explode/groupBy beyond the span computation itself
    out = substring_scrub(docs, min_len=12)
    assert out.filter(F.col("n_dropped_tokens") > 0).count() == 3


# --- span-level decontamination (cross-corpus) ---

from bitfunnel_spark.operators.dedup import (  # noqa: E402
    decontaminate_spans,
    substring_match_spans,
)


@pytest.fixture(scope="module")
def train_eval(spark):
    EVAL = "exact eval question tokens one two three four five six seven eight"  # 12
    train = spark.createDataFrame(
        [
            (1, "intro " + EVAL + " outro ending"),            # contaminated
            (2, "clean document with nothing shared at all beyond twelve tokens"),
            (3, EVAL),                                           # fully contaminated
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix words " + EVAL), (101, "unrelated eval row here")],
        "doc_id long, text string",
    )
    return train, ev


def test_match_spans_cross_corpus(train_eval):
    train, ev = train_eval
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_match_spans(train, ev, min_len=12).collect()
    )
    assert spans == [(1, 1, 13), (3, 0, 12)]


def test_decontaminate_spans(train_eval):
    train, ev = train_eval
    out = {r["doc_id"]: r for r in decontaminate_spans(train, ev, min_len=12).collect()}
    assert out[1]["text"] == "intro  outro ending"
    assert out[1]["n_dropped_tokens"] == 12
    assert out[2]["n_dropped_tokens"] == 0
    assert out[2]["text"] == (
        "clean document with nothing shared at all beyond twelve tokens"
    )
    assert out[3]["text"] == "" and out[3]["n_dropped_tokens"] == 12


def test_match_spans_not_symmetric_with_self_dups(train_eval, spark):
    # ref-side duplicates do NOT create train-side spans unless train holds
    # the gram: a train doc sharing nothing stays clean even if eval has
    # internal repetition
    train, _ = train_eval
    noisy_ref = spark.createDataFrame(
        [(1, "rep rep rep rep rep rep rep rep rep rep rep rep rep rep")],
        "doc_id long, text string",
    )
    assert substring_match_spans(train, noisy_ref, min_len=12).count() == 0
