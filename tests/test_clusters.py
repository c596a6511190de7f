"""Near-dup clustering (dedup.connected_components / neardup_drop_list):
unit graphs incl. a multi-round chain, and engine-vs-DuckDB-recursive-CTE
parity over real embedding near-dup pairs."""

from __future__ import annotations

import duckdb
import pytest

from bitfunnel_spark.operators import dedup
from tests.conftest import TESTDATA


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components(df).collect()
    }


def test_cc_chain_and_island(spark):
    # chain 1-2-3-4 (diameter 3: needs multiple label rounds) + island 8-9
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (8, 9)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (8, 8), (9, 8)}


def test_cc_clique_and_reversed_edges(spark):
    got = _cc(spark, [(5, 3), (3, 7), (5, 7), (10, 2)])
    assert got == {(3, 3), (5, 3), (7, 3), (2, 2), (10, 2)}


def test_drop_list(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (8, 9)], "id_a long, id_b long")
    drops = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.neardup_drop_list(df).collect()
    }
    assert drops == {(2, 1), (3, 1), (9, 8)}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet")


def test_cc_vs_recursive_cte(spark, emb):
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.35)
    got = {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    cos = (
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(b.v, b.v)))"
    )
    sql = f"""WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM read_parquet('{TESTDATA}/embeddings.parquet')),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM e a JOIN e b
  ON a.vec_id < b.vec_id WHERE round({cos}, 4) >= 0.35),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e2.a, r.lbl FROM edges e2 JOIN reach r ON e2.b = r.node)
SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node"""
    exp = set(duckdb.execute(sql).fetchall())
    assert got, "vacuous: no near-dup pairs at threshold 0.35"
    assert got == exp
