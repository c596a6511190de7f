import os

import duckdb
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bitfunnel_spark.session import get_spark

    s = get_spark("bitfunnel-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = f"{TESTDATA}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def corpus(spark):
    from bitfunnel_spark.sources.corpus import corpus_from_documents, load_documents

    return corpus_from_documents(load_documents(spark, TESTDATA)).cache()


@pytest.fixture(scope="session")
def index(spark, corpus):
    from bitfunnel_spark import BuildConfig, FullTextIndex

    return FullTextIndex.build(spark, corpus, BuildConfig(n_slices=4))
