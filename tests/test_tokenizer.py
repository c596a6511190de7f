from pyspark.sql import functions as F

from bitfunnel_spark.functions.tokenizer import doc_term_freqs, ngrams, tokenize


def test_tokenize_code_aware(spark):
    df = spark.createDataFrame(
        [("def foo_bar(x): return x+42 # Comment",), ("", ), ("A.b.C 007",)], "content string"
    )
    out = [r[0] for r in df.select(tokenize("content")).collect()]
    assert out[0] == ["def", "foo_bar", "x", "return", "x", "42", "comment"]
    assert out[1] == []
    assert out[2] == ["a", "b", "c", "007"]


def test_doc_term_freqs(spark):
    df = spark.createDataFrame([("a b a c b a",)], "content string")
    out = df.select(doc_term_freqs(tokenize("content")).alias("tf")).collect()[0][0]
    assert [(r["term"], r["tf"]) for r in out] == [("a", 3), ("b", 2), ("c", 1)]


def test_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a",)], "content string")
    out = [r[0] for r in df.select(ngrams(tokenize("content"), 2)).collect()]
    assert out[0] == ["a b", "b c", "c d"]
    assert out[1] == []


def test_tokenize_matches_duckdb(spark, duck):
    """The tokenizer contract: Spark regexp_extract_all ≡ DuckDB regexp_extract_all."""
    from tests.conftest import TESTDATA

    sdf = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    spark_tok = {
        r["doc_id"]: r["toks"]
        for r in sdf.select("doc_id", tokenize("text").alias("toks")).collect()
    }
    duck_tok = dict(
        duck.execute(
            "SELECT doc_id, regexp_extract_all(lower(text), '[a-z_][a-z0-9_]*|[0-9]+') FROM documents"
        ).fetchall()
    )
    assert spark_tok == duck_tok
