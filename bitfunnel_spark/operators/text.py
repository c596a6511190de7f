"""Text analysis operators for training-data pipelines.

All pure JVM-side column expressions (F.*) — no UDFs, no shuffles beyond
the caller's aggregations; every operator has an exact DuckDB-SQL mirror in
__spark_entry__.oracle_sql(). Cross-engine hashing uses md5 hex (identical
everywhere), never engine-native hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bitfunnel_spark.functions.tokenizer import ngrams, tokenize

# deterministic, tiny stopword lists (shared with the oracle SQL)
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "es": ("el", "la", "de", "los", "y", "es", "en"),
    "fr": ("le", "la", "et", "les", "des", "est", "en"),
}
LANG_ORDER = ("de", "en", "es", "fr")  # deterministic tie-break: lexicographic


def token_count(text: Column | str) -> Column:
    """Regex (code-aware) token count."""
    return F.size(tokenize(text))


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count (empty string → 0)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/underscore/whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9_\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = tokenize(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits.cast("double") / F.size(toks))


def quality_score(text: Column | str, rounded: bool = True) -> Column:
    """Deterministic heuristic quality in [0,1]: rewards moderate length and
    low punctuation noise; penalizes stopword-free (unnatural) text.
    score = round( least(n_tokens,200)/200 * 0.5
                 + (1 - punct_ratio) * 0.3
                 + least(stopword_ratio*5, 1) * 0.2 , 4)

    ``rounded=False`` returns the raw float64 (bit-identical across
    engines given the fixed op order) — used where a downstream consumer
    must compare/threshold the value itself (quality_weighted_sample):
    engine round() tie rules differ at exact .xxxx5 boundaries, so a
    pre-rounded value is the one thing that can diverge."""
    nt = token_count(text).cast("double")
    s = (
        F.least(nt, F.lit(200.0)) / 200.0 * 0.5
        + (1.0 - punct_ratio(text)) * 0.3
        + F.least(stopword_ratio(text) * 5.0, F.lit(1.0)) * 0.2
    )
    return F.round(s, 4) if rounded else s


def langid(text: Column | str) -> Column:
    """Stopword-profile language ID with deterministic tie-break.

    Returns the lang (LANG_ORDER) with the highest stopword hit count with
    multiplicity; 'und' if all zero; ties broken by LANG_ORDER position.
    """
    toks = tokenize(text)

    def _count(words: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    counts = {lang: _count(STOPWORDS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*[counts[l] for l in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column | str, shingle: int = 5, keep: int = 4) -> Column:
    """Document fingerprint: the `keep` lexicographically-smallest md5 hex
    digests of token `shingle`-grams, joined by ':'. A min-k sketch — the
    same construction as one minhash band; near-identical docs share it.
    Short docs (< shingle tokens) fall back to md5 of the joined tokens.
    """
    toks = tokenize(text)
    grams = ngrams(toks, shingle)
    hashes = F.array_sort(F.transform(grams, lambda g: F.md5(g)))
    return F.when(
        F.size(grams) > 0, F.array_join(F.slice(hashes, 1, keep), ":")
    ).otherwise(F.md5(F.array_join(toks, " ")))


# PII patterns — the common Java-regex/RE2 subset so the same pattern string
# runs verbatim in both Spark (Java) and DuckDB (RE2) with identical matches.
# Replacement order matters (emails contain dots that the IP pattern could
# otherwise clip): EMAIL → IP → PHONE.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
)


def pii_count(text: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind ('email' | 'ip' | 'phone')."""
    c = F.col(text) if isinstance(text, str) else text
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0))


def scrub_pii(text: Column | str) -> Column:
    """Redact emails, IPv4 addresses, and international phone numbers with
    typed placeholder tokens. A pure narrow map (chained JVM regexp_replace,
    no UDF, no shuffle): at 100 TB this runs at scan speed and pushes no
    data anywhere. The standard pre-training redaction pass."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc: the full analysis bundle."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        ws_token_count(text_col).alias("n_ws_tokens"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
        langid(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from Training
    Gopher", §A1.1 quality heuristics — the standard LLM-corpus repetition
    filters). One row per doc:

    - ``n_lines`` — newline-split line count
    - ``dup_line_frac`` — 1 - distinct_lines/lines (fraction of lines that
      repeat an earlier line)
    - ``top_bigram_frac`` — occurrences of the most frequent token bigram
      / total bigrams (0.0 when the doc has < 2 tokens)

    Scale shape: line metrics are pure narrow column expressions (scan
    speed, no shuffle). The bigram mode is explode -> two partial-agg
    groupBys keyed by doc_id — map-side combine collapses each doc's
    bigrams before the exchange, so shuffled rows ≈ distinct bigrams per
    doc, bounded by doc length; no skew (keys are doc-unique)."""
    lines = F.split(F.col(text_col), "\n", -1)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
            4,
        ).alias("dup_line_frac"),
        tokenize(text_col).alias("tk"),
    )
    bi = base.select(
        "doc_id",
        (F.size("tk") - 1).alias("n_bi"),
        F.explode(ngrams(F.col("tk"), 2)).alias("bigram"),
    )
    top = (
        bi.groupBy("doc_id", "n_bi", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_bi")
        .agg(F.max("c").alias("top_c"))
        .select(
            "doc_id",
            F.round(F.col("top_c").cast("double") / F.col("n_bi"), 4).alias(
                "top_bigram_frac"
            ),
        )
    )
    return (
        base.select("doc_id", "n_lines", "dup_line_frac")
        .join(top, "doc_id", "left")
        .fillna({"top_bigram_frac": 0.0})
    )


def unigram_logprob_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style language-model quality signal (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — filter/bucket documents by LM perplexity). The LM slot here is
    the corpus's own unigram distribution (self-contained, no external
    model); a KenLM n-gram model drops into the same join without changing
    the dataflow. Per doc: ``bits_per_token`` = mean over token
    occurrences of -log2 p(token), i.e. the unigram cross-entropy —
    high values = unusual token mix (noise, other languages, binary
    junk), the CCNet "tail" bucket.

    Scale shape: one explode + two partial-agg groupBys to train
    (occurrences -> term counts), one broadcast-or-shuffle join of
    occurrences against the |vocab|-row LM, one per-doc avg. The corpus
    total is the only driver scalar (2-scalar agg precedent:
    operators/statistics.corpus_meta)."""
    base = df.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    occ = base.select("doc_id", F.explode("tk").alias("term"))
    counts = occ.groupBy("term").agg(F.count("*").alias("c"))
    total = float(counts.agg(F.sum("c")).collect()[0][0] or 0.0)
    if total == 0:
        return base.select(
            "doc_id",
            F.lit(0).alias("n_tokens"),
            F.lit(0.0).alias("bits_per_token"),
        )
    lm = counts.select("term", (-F.log2(F.col("c") / F.lit(total))).alias("bits"))
    doc = (
        occ.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(F.avg("bits").alias("bpt"))
    )
    return (
        base.join(doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tk").alias("n_tokens"),
            F.coalesce(F.round("bpt", 4), F.lit(0.0)).alias("bits_per_token"),
        )
    )
