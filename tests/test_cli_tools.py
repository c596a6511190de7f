"""CLI tool verbs: stats (reference `statistics`) and filterchunks
(FilterChunks tool) — in-process via cli.main(argv)."""

from __future__ import annotations

import os

from bitfunnel_spark import cli
from bitfunnel_spark.sources.chunks import chunks_to_corpus, write_chunks


def test_cli_stats(spark, corpus, tmp_path, capsys):
    cpath = str(tmp_path / "corpus")
    corpus.filter("doc_id < 60").write.parquet(cpath)
    cli.main(["stats", "--corpus", cpath, "--top", "5"])
    out = capsys.readouterr().out
    assert '"n_docs": 59' in out or '"n_docs": 60' in out
    assert "doclen\tdoc_count" in out
    lines = [l for l in out.splitlines() if "\tbody\t" in l]
    assert 1 <= len(lines) <= 5
    # head is df-descending
    dfs = [int(l.split("\t")[2]) for l in out.splitlines()[-5:] if "\t" in l]
    assert dfs == sorted(dfs, reverse=True)


def test_cli_filterchunks(spark, corpus, tmp_path, capsys):
    chunks_in = str(tmp_path / "chunks_in")
    chunks_out = str(tmp_path / "chunks_out")
    write_chunks(corpus.filter("doc_id < 60"), chunks_in)
    cli.main(
        [
            "filterchunks",
            "--input", chunks_in,
            "--out", chunks_out,
            "--fraction", "0.5",
            "--count", "10",
        ]
    )
    out = capsys.readouterr().out
    assert '"chunks_written"' in out
    filtered = chunks_to_corpus(spark, chunks_out)
    n = filtered.count()
    assert 0 < n <= 10
    # filtered docs are a subset of the originals, content preserved
    orig = {
        r["content_sha256"]
        for r in corpus.filter("doc_id < 60").select("content_sha256").collect()
    }
    got = {r["content_sha256"] for r in filtered.select("content_sha256").collect()}
    assert got <= orig
    assert os.listdir(chunks_out)


def test_cli_serving_verbs(spark, corpus, tmp_path, capsys):
    cpath = str(tmp_path / "corpus")
    ipath = str(tmp_path / "index")
    corpus.filter("doc_id < 60").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    cli.main(["facets", "--corpus", cpath, "--index", ipath, "data"])
    out = capsys.readouterr().out
    assert any(l.startswith("lang\t") for l in out.splitlines())
    assert any(l.startswith("repo\t") for l in out.splitlines())

    cli.main(["snippets", "--corpus", cpath, "--index", ipath, "--k", "3", "data"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "\t" in l]
    assert lines
    for l in lines:  # single-term query: every hit's snippet contains it
        assert "data" in l.split("\t")[2].split()

    cli.main(["mlt", "--corpus", cpath, "--index", ipath, "--k", "3", "5"])
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if "\t" in l]
    assert len(rows) == 3
    assert all(l.split("\t")[0] != "5" for l in rows)

    cli.main(["snapshots", "--index", ipath])
    assert capsys.readouterr().out == ""  # no snapshot log on a plain build


def test_cli_repl_vector_verbs(spark, corpus, tmp_path, capsys, monkeypatch):
    """REPL !sparse / !knn / !hybrid / !rerank drive the vector surface;
    input is monkeypatched stdin, EOF ends the loop."""
    cpath = str(tmp_path / "vcorpus")
    ipath = str(tmp_path / "vindex")
    corpus.filter("doc_id < 80").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    lines = iter([
        "!sparse data:2.5 fast:1.25",
        "!knn 7",
        "!hybrid 7 data fast",
        "!rerank 7 data fast",
        "!knn notanint",  # error path: repl reports and keeps looping
    ])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main([
        "repl", "--corpus", cpath, "--index", ipath, "--k", "3",
        "--emb", "/root/testdata/sf0.001/embeddings.parquet",
    ])
    out = capsys.readouterr().out
    blocks = out.split("bf> ") if "bf> " in out else [out]
    body = "\n".join(blocks)
    rows = [l for l in body.splitlines() if "\t" in l]
    # sparse(3) + knn(3) + hybrid(3) + rerank(3) result rows
    assert len(rows) >= 12
    # knn 7 top hit is vec 7 itself at cosine 1.0 (no self-exclusion)
    assert any(l.startswith("7\t1.0") for l in rows)


def test_cli_repl_vector_verbs_need_emb(spark, corpus, tmp_path, capsys, monkeypatch):
    cpath = str(tmp_path / "v2corpus")
    ipath = str(tmp_path / "v2index")
    corpus.filter("doc_id < 40").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()
    lines = iter(["!knn 7"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath])
    err = capsys.readouterr().err
    assert "--emb" in err  # loud, loop survives


def test_cli_repl_dsl_and_count(spark, corpus, tmp_path, capsys, monkeypatch):
    cpath = str(tmp_path / "dslcorpus")
    ipath = str(tmp_path / "dslindex")
    corpus.filter("doc_id < 60").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()
    lines = iter([
        '!dsl {"query": {"match": {"content": "data"}}, "size": 3}',
        '!dsl {"query": {"ids": {"values": [1, 2]}}}',
        '!count {"query": {"query_string": "data"}}',
        '!dsl {not json',  # error path keeps the loop alive
        '!count {"query": {"match_all": {}}}',
    ])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath, "--k", "3"])
    out = capsys.readouterr().out
    assert "(3 rows: doc_id, score)" in out
    assert "(2 rows: doc_id, score)" in out
    # counts: "data" matches and the match_all total (59 or 60 docs)
    tail_nums = [l for l in out.splitlines() if l.strip().isdigit()]
    assert len(tail_nums) == 2 and int(tail_nums[-1]) >= 59


def test_cli_repl_show_and_script(spark, corpus, tmp_path, capsys, monkeypatch):
    """!show prints dictionary + segment footprint for a term (ShowCommand
    analogue); !script replays a command file (ScriptCommand analogue) and
    a !quit inside it ends the session (later stdin never consumed)."""
    cpath = str(tmp_path / "shcorpus")
    ipath = str(tmp_path / "shindex")
    corpus.filter("doc_id < 60").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    script = tmp_path / "cmds.bf"
    script.write_text(
        "# comment lines are skipped\n"
        "\n"
        "!show data\n"
        "!show zzzznotaterm\n"
        "!quit\n"
    )
    consumed = []
    lines = iter([f"!script {script}", "!show data"])

    def fake_input(prompt=""):
        try:
            v = next(lines)
            consumed.append(v)
            return v
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath, "--k", "3"])
    out = capsys.readouterr().out
    # script lines echoed with the prompt
    assert "bf> !show data" in out and "bf> !quit" in out
    # !show output: stream-qualified term with df/treatment and the
    # physical footprint from segment metadata
    show = [l for l in out.splitlines() if l.startswith("body:data")]
    assert show, out
    assert "df=" in show[0] and "treatment=" in show[0]
    assert "blocks=" in show[0] and "postings=" in show[0]
    assert "'zzzznotaterm' not in dictionary" in out
    # !quit inside the script ended the session: the trailing interactive
    # "!show data" was never read
    assert consumed == [f"!script {script}"]


def test_cli_repl_analyze(spark, corpus, tmp_path, capsys, monkeypatch):
    """!analyze prints the (position, token) stream under the index's own
    analyzer — the ES _analyze inspector."""
    cpath = str(tmp_path / "ancorpus")
    ipath = str(tmp_path / "anindex")
    corpus.filter("doc_id < 40").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    lines = iter(["!analyze Fast KeyValue scan"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath])
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if "\t" in l and l.split("\t")[0].isdigit()]
    got = [tuple(l.split("\t")) for l in rows]
    assert got == [("0", "fast"), ("1", "keyvalue"), ("2", "scan")]


def test_cli_repl_threads(spark, corpus, tmp_path, capsys, monkeypatch):
    """!threads <n> retargets query-processing parallelism (ThreadsCommand
    analogue — tools/BitFunnel/src/ThreadsCommand.cpp): the session's
    shuffle-partition conf moves, and a query still runs after the change."""
    cpath = str(tmp_path / "thcorpus")
    ipath = str(tmp_path / "thindex")
    corpus.filter("doc_id < 40").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()
    before = spark.conf.get("spark.sql.shuffle.partitions")

    lines = iter(["!threads 7", "data"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    try:
        cli.main(["repl", "--corpus", cpath, "--index", ipath, "--k", "3"])
        out = capsys.readouterr().out
        assert "Matcher now using 7 shuffle partitions." in out
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        # the post-change query still produced scored hits
        assert any("\t" in l and l.split("\t")[0].isdigit() for l in out.splitlines())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_cli_repl_validate(spark, corpus, tmp_path, capsys, monkeypatch):
    """!validate compiles a DSL body without executing it (the ES
    _validate/query?explain=true shape): valid bodies echo the rewritten
    engine query, invalid bodies report instead of raising and the loop
    stays alive."""
    cpath = str(tmp_path / "vcorpus")
    ipath = str(tmp_path / "vindex")
    corpus.filter("doc_id < 40").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    lines = iter([
        '!validate {"query": {"bool": {"must": [{"match": {"content": '
        '"data"}}], "must_not": [{"match": {"content": "slow"}}]}}}',
        '!validate {"query": {"match": {}}}',
        '!validate {"query": {"banana": {"content": "x"}}}',
    ])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath, "--k", "3"])
    out = capsys.readouterr().out
    good = [l for l in out.splitlines() if l.startswith("valid: true")]
    bad = [l for l in out.splitlines() if l.startswith("valid: false")]
    assert len(good) == 1 and "data" in good[0] and "slow" in good[0]
    assert len(bad) == 2 and any("DslError" in l for l in bad)


def test_cli_repl_terms_and_fields(spark, corpus, tmp_path, capsys, monkeypatch):
    """!terms <prefix> [stream] enumerates dictionary terms in index order
    (_terms_enum); !fields lists searchable streams + stored columns
    (_field_caps/_mapping analogue)."""
    cpath = str(tmp_path / "tecorpus")
    ipath = str(tmp_path / "teindex")
    corpus.filter("doc_id < 40").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    lines = iter(["!terms s", "!fields"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath])
    out = capsys.readouterr().out
    terms = [l for l in out.splitlines()
             if l and "\t" not in l and l.startswith("s") and " " not in l]
    assert terms and terms == sorted(terms)
    assert "body\tsearchable stream" in out
    assert "content\tstored column\tstring" in out


def test_cli_repl_aggs_and_dbq_verbs(spark, corpus, tmp_path, capsys, monkeypatch):
    """REPL !aggs (generic run_aggs body) and !dbq (_delete_by_query):
    the agg answers arrive as rows; a delete reports its count and the
    next query sees the shrunken corpus."""
    cpath = str(tmp_path / "acorpus")
    ipath = str(tmp_path / "aindex")
    corpus.filter("doc_id < 80").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    lines = iter([
        '!aggs {"query": {"match": {"body": "data"}}, '
        '"aggs": {"x": {"avg": {"field": "doclen"}}}}',
        '!aggs {"query": {"bool": {"must": [{"match": {"body": "data"}}], '
        '"filter": [{"range": {"doclen": {"gte": 10}}}]}}, '
        '"aggs": {"t": {"terms": {"field": "lang"}}}}',
        '!count {"query": {"match": {"body": "data"}}}',
        '!dbq {"query": {"range": {"doc_id": {"lt": 10}}}}',
        '!count {"query": {"match": {"body": "data"}}}',
    ])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath, "--k", "5"])
    out = capsys.readouterr().out
    assert "deleted: " in out
    # the avg-metric row printed (n_docs \t value)
    assert any("\t" in l for l in out.splitlines())
    # counts before/after the delete: after <= before
    counts = [int(l) for l in out.splitlines() if l.strip().isdigit()]
    assert len(counts) == 2 and counts[1] <= counts[0]


def test_cli_repl_mget_verb(spark, corpus, tmp_path, capsys, monkeypatch):
    """!mget <ids> fetches docs by id in request order with found flags
    (the ES _mget endpoint over one pruned scan)."""
    cpath = str(tmp_path / "mgcorpus")
    ipath = str(tmp_path / "mgindex")
    corpus.filter("doc_id < 40").write.parquet(cpath)
    cli.main(["build", "--corpus", cpath, "--index", ipath])
    capsys.readouterr()

    lines = iter(["!mget 7, 999999, 3"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    cli.main(["repl", "--corpus", cpath, "--index", ipath])
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.split("\t")[0] in ("7", "999999", "3")]
    assert [l.split("\t")[0] for l in out] == ["7", "999999", "3"]
    assert "NOT FOUND" in out[1] and "NOT FOUND" not in out[0]
