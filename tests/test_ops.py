"""Unit tests for training-data operators on tiny handcrafted frames
(the oracle-equivalence at sf scale is covered by the driver contract and
scripts/check_entry.py; these pin the semantics on known inputs)."""

import pytest
from pyspark.sql import functions as F

from bitfunnel_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog"),  # near dup
        (4, "completely different words entirely here now"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(toy):
    out = dedup.exact_duplicates(toy).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["canonical_id"] == 1


def test_ngram_jaccard(toy):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(toy, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0  # identical
    assert 0.3 <= pairs[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_exact_and_near(toy):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(toy, threshold=0.3).collect()}
    assert (1, 2) in pairs  # identical signature → must collide in every band


def test_simhash_close_for_neardups(toy):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(toy).collect()}
    ham12 = bin(fp[1] ^ fp[2]).count("1")
    ham13 = bin(fp[1] ^ fp[3]).count("1")
    ham14 = bin(fp[1] ^ fp[4]).count("1")
    assert ham12 == 0
    assert ham13 <= ham14


def test_langid(spark):
    rows = [
        (1, "the cat and the dog of it is in"),
        (2, "der hund und die katze ist ein"),
        (3, "el perro y la casa de los es"),
        (4, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lang"] for r in df.select("doc_id", text.langid("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_quality_and_counts(spark):
    df = spark.createDataFrame([(1, "the cat!!! ### sat."), (2, "")], "doc_id long, text string")
    prof = {r["doc_id"]: r for r in text.text_profile(df).collect()}
    assert prof[1]["n_tokens"] == 3
    assert prof[1]["n_ws_tokens"] == 4
    assert 0 < prof[1]["punct_ratio"] < 1
    assert prof[2]["n_tokens"] == 0 and prof[2]["quality"] == pytest.approx(0.3)


def test_fingerprint_stability(toy):
    fp = {r["doc_id"]: r["fp"] for r in toy.select("doc_id", text.fingerprint("text").alias("fp")).collect()}
    assert fp[1] == fp[2]  # identical docs → identical fingerprint
    assert fp[1] != fp[4]


def test_brute_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = [(r["vec_id"], r["cosine"]) for r in similarity.brute_cosine_topk(df, [0], k=2).collect()]
    assert out[0][0] == 1 and out[0][1] == pytest.approx(0.995, abs=1e-3)
    assert out[1][0] == 2


def test_rh_buckets_deterministic(spark):
    rows = [(i, [float(i % 7 - 3)] * 16) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted((r["vec_id"], r["bucket"]) for r in similarity.random_hyperplane_buckets(df, n_planes=6).collect())
    b = sorted((r["vec_id"], r["bucket"]) for r in similarity.random_hyperplane_buckets(df, n_planes=6).collect())
    assert a == b


def test_multimodal_features_and_stub(spark):
    docs = spark.createDataFrame([(1, "abcdefghij"), (2, "xy")], "doc_id long, text string")
    media = multimodal.media_from_documents(docs.withColumn("lang", F.lit("en")))
    feats = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert feats[1] == pytest.approx([ord(c) / 255.0 for c in "abcdefgh"])
    assert feats[2][:2] == pytest.approx([ord("x") / 255.0, ord("y") / 255.0])
    assert feats[2][2:] == [0.0] * 6
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00", "image")


def test_shard_optimizer():
    from bitfunnel_spark.operators.sharding import optimal_shard_boundaries

    # two tight clusters of lengths → optimizer should cut between them
    hist = [(10, 100), (12, 100), (500, 5), (510, 5)]
    bounds = optimal_shard_boundaries(hist, max_shards=4)
    assert bounds[0] == 0
    assert any(12 < b <= 500 for b in bounds[1:])
    # degenerate: single length
    assert optimal_shard_boundaries([(7, 42)], max_shards=4) == (0,)


def test_cumulative_term_counts(spark):
    from bitfunnel_spark.operators.analytics import cumulative_term_counts

    rows = [
        ("a", "body", 0), ("b", "body", 0),          # doc 0 introduces a, b
        ("a", "body", 1), ("c", "body", 1),          # doc 1 introduces c
        ("a", "body", 3),                             # doc 3 introduces nothing
        ("d", "body", 4), ("d", "path", 0),          # path stream ignored
    ]
    p = spark.createDataFrame(rows, "term string, stream string, doc_id long")
    out = {r["ingest_order"]: r["cum_unique_terms"] for r in cumulative_term_counts(p).collect()}
    assert out == {0: 2, 1: 3, 4: 4}


def test_cumulative_term_counts_multi_bucket(spark):
    """The two-pass distributed cumsum must agree with the naive running
    sum when the curve genuinely spans many range buckets (including empty
    buckets between sparse doc ids)."""
    from bitfunnel_spark.operators.analytics import cumulative_term_counts

    # term t{i} first appears at doc 7*i (sparse, 100 first-appearance
    # points); a second posting of an old term never adds a count
    rows = [(f"t{i}", "body", 7 * i) for i in range(100)]
    rows += [("t0", "body", 7 * i + 1) for i in range(1, 50)]
    p = spark.createDataFrame(rows, "term string, stream string, doc_id long")
    out = {
        r["ingest_order"]: r["cum_unique_terms"]
        for r in cumulative_term_counts(p, n_buckets=8).collect()
    }
    assert out == {7 * i: i + 1 for i in range(100)}
    # plan shape: the only window is partitioned (no single-task funnel)
    plan = cumulative_term_counts(p, n_buckets=8)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "bucket" in line, line


def test_posting_density(spark):
    from bitfunnel_spark.operators.analytics import posting_density

    p = spark.createDataFrame(
        [("a", "body", 1, 0), ("a", "body", 2, 0), ("b", "body", 1, 0), ("a", "body", 3, 1)],
        "term string, stream string, doc_id long, shard int",
    )
    ds = spark.createDataFrame([(1, 0), (2, 0), (3, 1), (4, 1)], "doc_id long, shard int")
    out = {(r["term"], r["shard"]): (r["df"], r["shard_docs"], r["density"])
           for r in posting_density(p, ds).collect()}
    assert out[("a", 0)] == (2, 2, 1.0)
    assert out[("b", 0)] == (1, 2, 0.5)
    assert out[("a", 1)] == (1, 2, 0.5)


def test_term_correlation(spark):
    from bitfunnel_spark.operators.analytics import term_correlation

    p = spark.createDataFrame(
        [("a", "body", 1), ("b", "body", 1), ("a", "body", 2), ("b", "body", 2), ("c", "body", 2)],
        "term string, stream string, doc_id long",
    )
    out = {(r["term_a"], r["term_b"]): r["n_docs"] for r in term_correlation(p, min_pair_count=1).collect()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    # max_df guard drops the ubiquitous pair members
    out2 = {(r["term_a"], r["term_b"]) for r in term_correlation(p, min_pair_count=1, max_df=1).collect()}
    assert out2 == set()  # only c has df<=1; no pairs remain


def test_corpus_filters(spark):
    from bitfunnel_spark.sources import filters

    rows = [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(40)]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    # posting-count range keeps docs with 5..10 distinct terms → doc_ids 4..9
    got = sorted(r["doc_id"] for r in filters.posting_count_filter(corpus, 5, 10).collect())
    assert got == list(range(4, 10))
    # cap keeps lowest doc_ids
    got = sorted(r["doc_id"] for r in filters.cap_filter(corpus, 3).collect())
    assert got == [0, 1, 2]
    # deterministic sample: stable across calls and partitionings
    a = sorted(r["doc_id"] for r in filters.deterministic_filter(corpus, 0.5, seed=7).collect())
    b = sorted(r["doc_id"] for r in filters.deterministic_filter(corpus.repartition(13), 0.5, seed=7).collect())
    assert a == b and 5 <= len(a) <= 35
    # composite applies sample -> range -> cap in order
    comp = filters.composite_filter(corpus, fraction=1.0, min_postings=5, max_postings=10, max_docs=2)
    assert sorted(r["doc_id"] for r in comp.collect()) == [4, 5]


def test_minhash_verification_is_candidate_only(toy, monkeypatch):
    """The LSH verify step must NOT run the full-corpus exact shingle
    self-join (that would defeat the banding entirely at scale)."""
    def boom(*a, **kw):  # pragma: no cover - should never fire
        raise AssertionError("minhash_lsh_pairs must not call ngram_jaccard_pairs")

    monkeypatch.setattr(dedup, "ngram_jaccard_pairs", boom)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.minhash_lsh_pairs(toy, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0


def test_simhash_pairs_band_join_exact(toy):
    """Band-join pair extraction must equal brute-force hamming <= d over
    the fingerprints (pigeonhole guarantees exactness for d < n_bands)."""
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(toy).collect()}
    d = 3
    want = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for a in fp for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= d
    }
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in dedup.simhash_pairs(toy, max_distance=d).collect()}
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 0  # exact dups collide at 0


def test_embedding_neardup_lsh_within_bucket(spark):
    """Bucketed near-dup must find same-bucket pairs and equal the exact
    all-pairs result restricted to shared buckets."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    # keep the bucketing dims well away from 0 so the perturbation can't
    # flip a sign bit (bucket stability is what the test pins)
    base[list(similarity.AXIS_DIMS)] = np.sign(base[list(similarity.AXIS_DIMS)]) + base[
        list(similarity.AXIS_DIMS)
    ]
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + rng.standard_normal(64) * 0.05]),  # near-dup of 0
        (2, [float(x) for x in rng.standard_normal(64)]),
        (3, [float(x) for x in -base]),  # anti-correlated → different bucket
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in dedup.embedding_neardup_pairs_lsh(emb, threshold=0.9).collect()}
    assert (0, 1) in got and got[(0, 1)] >= 0.9
    assert all(k == (0, 1) for k in got)


def test_repetition_profile(spark, duck):
    from bitfunnel_spark.operators.text import repetition_profile

    docs = spark.createDataFrame(
        [
            (0, "a b\na b\nc d"),        # 3 lines, one duplicate
            (1, "x y x y x y"),          # dominant bigram "x y"
            (2, "tok"),                  # single token: no bigrams
            (3, ""),                     # empty doc
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(docs).collect()}
    assert got[0]["n_lines"] == 3
    assert abs(got[0]["dup_line_frac"] - round(1 - 2 / 3, 4)) < 1e-9
    # "x y x y x y": bigrams = x y, y x, x y, y x, x y -> top 3/5
    assert abs(got[1]["top_bigram_frac"] - 0.6) < 1e-9
    assert got[1]["dup_line_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[3]["n_lines"] == 1 and got[3]["top_bigram_frac"] == 0.0


def test_unigram_logprob_profile(spark):
    import math

    from bitfunnel_spark.operators.text import unigram_logprob_profile

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "b c"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in unigram_logprob_profile(docs).collect()}
    # corpus counts: a=3, b=2, c=1, total=6
    bits = {t: -math.log2(c / 6) for t, c in [("a", 3), ("b", 2), ("c", 1)]}
    want0 = (3 * bits["a"] + bits["b"]) / 4
    want1 = (bits["b"] + bits["c"]) / 2
    assert got[0]["n_tokens"] == 4
    assert abs(got[0]["bits_per_token"] - round(want0, 4)) < 1e-9
    assert abs(got[1]["bits_per_token"] - round(want1, 4)) < 1e-9
    assert got[2] == {"doc_id": 2, "n_tokens": 0, "bits_per_token": 0.0}
    # rarer mix -> higher cross-entropy
    assert got[1]["bits_per_token"] > got[0]["bits_per_token"]


def test_sq8_quantize_codes(spark):
    rows = [(0, [1.0, -0.5, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["qv"]
        for r in df.select(
            "vec_id", similarity.quantize_sq8_expr(F.col("embedding")).alias("qv")
        ).collect()
    }
    # trunc toward zero: 127, -63 (not -64), 31, 0; zero vector stays zero
    assert got[0] == [127, -63, 31, 0]
    assert got[1] == [0, 0, 0, 0]


def test_sq8_topk_vs_oracle(spark, duck):
    from bitfunnel_spark.entry_queries import SQL_ANN_SQ8_TOPK

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in similarity.sq8_cosine_topk(emb, [0, 1, 2, 3, 4], k=10)
        .orderBy("query_id", F.desc("cosine"), "vec_id")
        .collect()
    ]
    exp = [
        (q, v, pytest.approx(c, abs=2e-4))
        for q, v, c in duck.execute(SQL_ANN_SQ8_TOPK).fetchall()
    ]
    assert exp == got


def test_filtered_cosine_topk_prefilter_semantics(spark, duck):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in similarity.filtered_cosine_topk(emb, [0, 1], F.col("label") == 1, k=5)
        .orderBy("query_id", F.desc("cosine"), "vec_id")
        .collect()
    ]
    exp = duck.execute("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
           FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1)),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cosine
  FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id AND e.label = 1
)
SELECT query_id, vec_id, cosine FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) <= 5
ORDER BY query_id, cosine DESC, vec_id""").fetchall()
    assert [(q, v, pytest.approx(c, abs=1e-9)) for q, v, c in exp] == got
    assert got
    # PRE-filter: exactly k survivors per query (not a post-filtered stub),
    # and every survivor satisfies the predicate
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    per_q = {}
    for q, v, _ in got:
        per_q[q] = per_q.get(q, 0) + 1
        assert labels[v] == 1
    assert all(n == 5 for n in per_q.values())


def test_filtered_cosine_pushes_predicate_to_scan(spark, tmp_path):
    # a private copy of the table: if another test cached the shared
    # embeddings read (the REPL fixture does), Spark substitutes the
    # InMemoryRelation and pushdown legitimately cannot appear — the
    # assertion is about the PARQUET scan, so read a cache-immune path
    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "emb_pushdown")
    src.write.parquet(path)
    emb = spark.read.parquet(path)
    df = similarity.filtered_cosine_topk(emb, [0], F.col("label") == 1, k=5)
    # sparkPlan (pre-AQE) prints the scan deterministically; the adaptive
    # executedPlan string can elide scan details mid-materialization
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "EqualTo(label,1)" in plan  # candidate-scan PushedFilters


def test_sq8_recall_vs_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_cosine_topk(emb, [0, 1], k=10).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.sq8_cosine_topk(emb, [0, 1], k=10, rescore_factor=4).collect()
    }
    # SQ8+rescore at 4x should recover nearly all exact neighbors
    assert len(exact & approx) >= int(0.8 * len(exact))


def test_ivf_assignment_zero_shuffle_and_oracle(spark, duck):
    """IVF assignment is a pure column expression over the centroid-array
    literal — the executed plan must contain NO Exchange keyed by vec_id
    (the r2 design shuffled N*n_centroids rows through a window)."""
    from bitfunnel_spark.entry_queries import _sql_ann_ivf, ANN_QUERY_IDS, _IVF_CENTROIDS, _IVF_PROBE

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = similarity.ivf_cosine_topk(
        emb, ANN_QUERY_IDS, k=10, n_centroids=_IVF_CENTROIDS, n_probe=_IVF_PROBE
    ).orderBy("query_id", F.desc("cosine"), "vec_id")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan
    got = [(r["query_id"], r["vec_id"], r["cosine"]) for r in res.collect()]
    exp = [
        (q, v, pytest.approx(c, abs=2e-4))
        for q, v, c in duck.execute(_sql_ann_ivf()).fetchall()
    ]
    assert exp == got


def test_ivf_kmeans_recall_improves(spark):
    """Trained (sampled spherical k-means) centroids must beat the id-based
    placeholder quantizer on recall@10 vs brute cosine."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [3, 17, 42, 99, 123]
    brute = {q: set() for q in qids}
    for r in similarity.brute_cosine_topk(emb, qids, k=10).collect():
        brute[r["query_id"]].add(r["vec_id"])

    def recall(df):
        hit = {q: set() for q in qids}
        for r in df.collect():
            hit[r["query_id"]].add(r["vec_id"])
        return sum(len(hit[q] & brute[q]) for q in qids) / (10.0 * len(qids))

    r_id = recall(similarity.ivf_cosine_topk(emb, qids, k=10, n_centroids=16, n_probe=4))
    cents = similarity.train_kmeans_centroids(emb, n_centroids=16)
    r_km = recall(
        similarity.ivf_cosine_topk(emb, qids, k=10, n_centroids=16, n_probe=4, centroids=cents)
    )
    assert r_km > r_id
    # determinism: retraining gives the identical centroid table
    cents2 = similarity.train_kmeans_centroids(emb, n_centroids=16)
    import numpy as np

    assert np.array_equal(cents, cents2)


def test_lsh_multiprobe_recall_and_no_dups(spark):
    """Multi-probe LSH must (a) return at most k unique rows per query,
    (b) never lose a single-bucket hit, (c) measurably improve recall vs
    the single bucket on the test embeddings."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [3, 17, 42, 99, 123]
    brute = {(r["query_id"], r["vec_id"]) for r in similarity.brute_cosine_topk(emb, qids, k=10).collect()}
    single = similarity.lsh_cosine_topk(emb, qids, k=10).collect()
    multi = similarity.lsh_cosine_topk(emb, qids, k=10, multiprobe=True).collect()
    pairs = [(r["query_id"], r["vec_id"]) for r in multi]
    assert len(pairs) == len(set(pairs))  # no duplicate candidates
    from collections import Counter

    assert all(c <= 10 for c in Counter(q for q, _ in pairs).values())
    r1 = len({(r["query_id"], r["vec_id"]) for r in single} & brute)
    rm = len(set(pairs) & brute)
    assert rm >= r1  # multiprobe recall never worse


def test_pq_topk_vs_oracle(spark, duck):
    """PQ (id-based codebooks) end-to-end — encode + ADC + rescore — must
    match the DuckDB mirror exactly; encoding must add NO shuffle keyed by
    vec_id (codebooks are plan literals, the IVF-assignment design)."""
    from bitfunnel_spark.entry_queries import ANN_QUERY_IDS, _sql_ann_pq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = similarity.pq_cosine_topk(
        emb, ANN_QUERY_IDS, k=10, m=4, n_codes=16, rescore_factor=4
    ).orderBy("query_id", F.desc("cosine"), "vec_id")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan
    got = [(r["query_id"], r["vec_id"], r["cosine"]) for r in res.collect()]
    exp = [
        (q, v, pytest.approx(c, abs=2e-4))
        for q, v, c in duck.execute(_sql_ann_pq()).fetchall()
    ]
    assert exp == got


def test_pq_recall_and_trained_codebooks(spark):
    """PQ+rescore recovers most exact neighbors; trained (per-subspace
    Lloyd's) codebooks must beat the id-based placeholder on recall@10;
    training is deterministic."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [3, 17, 42, 99, 123]
    brute = {q: set() for q in qids}
    for r in similarity.brute_cosine_topk(emb, qids, k=10).collect():
        brute[r["query_id"]].add(r["vec_id"])

    def recall(df):
        hit = {q: set() for q in qids}
        for r in df.collect():
            hit[r["query_id"]].add(r["vec_id"])
        return sum(len(hit[q] & brute[q]) for q in qids) / (10.0 * len(qids))

    # m=8 (8-dim subspaces) at rescore 8x: the regime where PQ is a real
    # approximation on this corpus (measured: id 0.74, trained 0.82)
    r_id = recall(
        similarity.pq_cosine_topk(emb, qids, k=10, m=8, n_codes=16, rescore_factor=8)
    )
    books = similarity.train_pq_codebooks(emb, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    r_tr = recall(
        similarity.pq_cosine_topk(
            emb, qids, k=10, m=8, n_codes=16, rescore_factor=8, codebooks=books
        )
    )
    assert r_tr >= r_id
    assert r_tr >= 0.6
    books2 = similarity.train_pq_codebooks(emb, m=8, n_codes=16)
    assert np.array_equal(books, books2)


def test_pq_dim_not_divisible(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        similarity.train_pq_codebooks(emb, m=7)


def test_index_stats(spark, corpus):
    from bitfunnel_spark import BuildConfig, FullTextIndex
    from bitfunnel_spark.operators.analytics import index_stats

    idx = FullTextIndex.build_fused(spark, corpus, BuildConfig(n_slices=2))
    rows = index_stats(idx).collect()
    assert rows and [r["shard"] for r in rows] == sorted(r["shard"] for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    assert total_docs == idx.doc_stats.count()
    for r in rows:
        assert r["n_postings"] >= r["n_terms"] > 0
        assert r["segment_bytes"] > 0 and r["n_blocks"] > 0


def test_ivfpq_zero_shuffle_and_oracle(spark, duck):
    """IVF-PQ: cell assignment AND PQ encoding are column expressions over
    plan literals (no Exchange keyed by vec_id on the corpus side); the
    composed pipeline must match the DuckDB mirror exactly."""
    from bitfunnel_spark.entry_queries import (
        ANN_QUERY_IDS,
        _IVF_CENTROIDS,
        _IVF_PROBE,
        _PQ_CODES,
        _PQ_FACTOR,
        _PQ_M,
        _sql_ann_ivfpq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = similarity.ivfpq_cosine_topk(
        emb, ANN_QUERY_IDS, k=10,
        n_centroids=_IVF_CENTROIDS, n_probe=_IVF_PROBE,
        m=_PQ_M, n_codes=_PQ_CODES, rescore_factor=_PQ_FACTOR,
    ).orderBy("query_id", F.desc("cosine"), "vec_id")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan
    got = [(r["query_id"], r["vec_id"], r["cosine"]) for r in res.collect()]
    exp = [
        (q, v, pytest.approx(c, abs=2e-4))
        for q, v, c in duck.execute(_sql_ann_ivfpq()).fetchall()
    ]
    assert exp == got


def test_ivfpq_recall_and_probe_monotonicity(spark):
    """IVF-PQ recall@10 vs brute cosine must be usable at the test dims and
    must not decrease when probing every cell (n_probe = n_centroids makes
    the IVF half exhaustive, leaving pure PQ+rescore error)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [3, 17, 42, 99, 123]
    brute = {q: set() for q in qids}
    for r in similarity.brute_cosine_topk(emb, qids, k=10).collect():
        brute[r["query_id"]].add(r["vec_id"])

    def recall(df):
        hit = {q: set() for q in qids}
        for r in df.collect():
            hit[r["query_id"]].add(r["vec_id"])
        return sum(len(hit[q] & brute[q]) for q in qids) / (10.0 * len(qids))

    r4 = recall(similarity.ivfpq_cosine_topk(emb, qids, k=10, n_probe=4))
    r_all = recall(similarity.ivfpq_cosine_topk(emb, qids, k=10, n_probe=16))
    assert r_all >= r4 > 0.3
    # trained halves compose: k-means centroids + Lloyd's codebooks
    cents = similarity.train_kmeans_centroids(emb, n_centroids=16)
    books = similarity.train_pq_codebooks(emb, m=4, n_codes=16)
    r_tr = recall(similarity.ivfpq_cosine_topk(
        emb, qids, k=10, n_probe=4, centroids=cents, codebooks=books
    ))
    assert r_tr > 0.3


def test_ivfpq_residual_mode(spark):
    """FAISS-style by_residual IVFPQ (trained centroids + shared residual
    codebooks, ADC = exact coarse term + residual lookup): the mechanism
    must produce usable exact-cosine-ordered results and a deterministic
    trainer. It does NOT assert superiority over direct encoding — the
    measured result (similarity.py docstring / BENCH.md) is that at this
    code budget the shared residual book loses to direct encoding."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [3, 17, 42, 99, 123]
    brute = {q: set() for q in qids}
    for r in similarity.brute_cosine_topk(emb, qids, k=10).collect():
        brute[r["query_id"]].add(r["vec_id"])

    def recall(df):
        hit = {q: set() for q in qids}
        for r in df.collect():
            hit[r["query_id"]].add(r["vec_id"])
        return sum(len(hit[q] & brute[q]) for q in qids) / (10.0 * len(qids))

    cents = similarity.train_kmeans_centroids(emb, n_centroids=16)
    plain_books = similarity.train_pq_codebooks(emb, m=4, n_codes=16)
    res_books = similarity.train_ivfpq_residual_codebooks(emb, cents, m=4, n_codes=16)
    r_plain = recall(similarity.ivfpq_cosine_topk(
        emb, qids, k=10, n_probe=8, centroids=cents, codebooks=plain_books
    ))
    r_res = recall(similarity.ivfpq_cosine_topk(
        emb, qids, k=10, n_probe=8, centroids=cents, codebooks=res_books,
        residual=True,
    ))
    # both modes usable; the comparison itself is recorded in BENCH.md
    assert r_plain > 0.4 and r_res > 0.3, (r_plain, r_res)
    # determinism of the trainer
    import numpy as np

    res_books2 = similarity.train_ivfpq_residual_codebooks(emb, cents, m=4, n_codes=16)
    assert np.array_equal(res_books, res_books2)


def test_recall_at_k_modes(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # exact-vs-exact recall is 1.0 by construction — use sq8 w/ big
    # rescore (near-exact) and lsh (lossy) to bracket the metric
    r_sq8 = {r.query_id: r.recall
             for r in similarity.recall_at_k(emb, [0, 1, 2], k=10, mode="sq8",
                                             rescore_factor=8).collect()}
    r_lsh = {r.query_id: r.recall
             for r in similarity.recall_at_k(emb, [0, 1, 2], k=10, mode="lsh").collect()}
    assert set(r_sq8) == set(r_lsh) == {0, 1, 2}
    assert all(0.0 <= v <= 1.0 for v in list(r_sq8.values()) + list(r_lsh.values()))
    assert sum(r_sq8.values()) >= sum(r_lsh.values())  # sq8+rescore beats lsh
    # hand-check one query against the two ops' own outputs
    ex = {r.vec_id for r in similarity.brute_cosine_topk(emb, [0], k=10).collect()}
    ap = {r.vec_id for r in similarity.lsh_cosine_topk(emb, [0], k=10).collect()}
    got = similarity.recall_at_k(emb, [0], k=10, mode="lsh").collect()[0]
    assert got.n_exact == len(ex) and got.n_hit == len(ex & ap)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity.recall_at_k(emb, [0], mode="hnsw")


def test_bbq_binary_pack_and_hamming(spark):
    import pandas as pd

    from bitfunnel_spark.operators.similarity import (
        hamming_expr,
        quantize_binary_expr,
    )
    from pyspark.sql import functions as F

    # 64-dim vector: first 32 dims positive -> word0 all ones; second 32
    # alternating starting positive -> 0b1010... (MSB first)
    v1 = [1.0] * 32 + [(1.0 if i % 2 == 0 else -1.0) for i in range(32)]
    v2 = [-1.0] * 64
    df = spark.createDataFrame(pd.DataFrame({"v": [v1, v2]}))
    codes = [r[0] for r in
             df.select(quantize_binary_expr(F.col("v"), 64)).collect()]
    assert codes[0][0] == (1 << 32) - 1
    alt = int("10" * 16, 2)
    assert codes[0][1] == alt
    assert codes[1] == [0, 0]
    ham = df.agg(
        hamming_expr(
            quantize_binary_expr(F.first("v"), 64),
            quantize_binary_expr(F.last("v"), 64),
        )
    ).collect()[0][0]
    assert ham == 32 + 16  # word0 differs in 32 bits, word1 in 16


def test_bbq_topk_recall_and_validation(spark):
    import pytest as _pytest

    from bitfunnel_spark.operators.similarity import (
        bbq_cosine_topk,
        quantize_binary_expr,
        recall_at_k,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2]
    rec = recall_at_k(emb, qids, k=5, mode="bbq", rescore_factor=8).collect()
    assert len(rec) == 3
    # 1-bit candidates + wide rescore must still find most true neighbors
    assert all(r["recall"] >= 0.4 for r in rec), [r["recall"] for r in rec]
    rows = bbq_cosine_topk(emb, qids, k=5).collect()
    assert {r.query_id for r in rows} == set(qids)
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
    with _pytest.raises(ValueError):
        quantize_binary_expr(F.col("x"), 63)  # not a multiple of 32


def test_ivfbbq_composition(spark):
    from bitfunnel_spark.operators.similarity import (
        bbq_cosine_topk,
        ivfbbq_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1]
    rows = ivfbbq_cosine_topk(
        emb, qids, k=5, n_centroids=8, n_probe=8, rescore_factor=8
    ).collect()
    # probing EVERY cell degenerates to plain BBQ over the whole corpus —
    # the composition must then agree with the uncomposed path exactly
    want = bbq_cosine_topk(emb, qids, k=5, rescore_factor=8).collect()
    assert [(r.query_id, r.vec_id, r.cosine) for r in rows] == [
        (r.query_id, r.vec_id, r.cosine) for r in want]
    # fewer probes: still k rows per query, candidates only from probed
    # cells (weaker recall is by design)
    few = ivfbbq_cosine_topk(
        emb, qids, k=5, n_centroids=8, n_probe=2, rescore_factor=8
    ).collect()
    assert {r.query_id for r in few} == set(qids)
    assert all(-1.0 <= r.cosine <= 1.0 for r in few)
