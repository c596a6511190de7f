"""North-rule evidence: the pipeline runs via `spark-submit --py-files`.

Packages `bitfunnel_spark/` into a zip the way a cluster deploy would,
then drives build + query through `spark-submit` subprocesses with the
package available ONLY from the zip (cwd is a temp dir, PYTHONPATH unset),
proving the CLI surface is cluster-deployable as documented in cli.py.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _make_zip(tmp_path) -> str:
    zpath = str(tmp_path / "bitfunnel_spark.zip")
    pkg = os.path.join(REPO, "bitfunnel_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_build_and_query(spark, corpus, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    corpus.filter("doc_id < 120").write.parquet(corpus_path)
    index_path = str(tmp_path / "index")
    zpath = _make_zip(tmp_path)
    cli = os.path.join(REPO, "bitfunnel_spark", "cli.py")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def submit(*args: str) -> str:
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zpath, cli, *args],
            capture_output=True,
            text=True,
            timeout=420,
            cwd=str(tmp_path),
            env=env,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        return out.stdout

    build_out = submit("build", "--corpus", corpus_path, "--index", index_path)
    assert '"files_per_sec"' in build_out
    assert os.path.exists(os.path.join(index_path, "segments"))

    query_out = submit(
        "query", "--corpus", corpus_path, "--index", index_path, "data -slow"
    )
    rows = [l for l in query_out.splitlines() if "\t" in l]
    assert rows, query_out
    # rank-identical to the in-process engine on the same corpus/index
    from bitfunnel_spark.operators.checkpoint import CheckpointedBuild
    from bitfunnel_spark.config import BuildConfig

    idx = CheckpointedBuild(spark, index_path, BuildConfig()).load_index(
        spark.read.parquet(corpus_path)
    )
    expect = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search("data -slow", k=10).collect()
    ]
    got = [
        (int(l.split("\t")[0]), round(float(l.split("\t")[1]), 6)) for l in rows
    ]
    assert got == expect
