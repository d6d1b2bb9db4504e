"""CLI surface: the no-Spark `analyze` subcommand with a dictionary
FILE (mirrors the reference's synonyms_path suite,
SynonymPluginTest.java:172-268 — rules loaded from a file behave
identically to inline rules)."""

from synspark.cli import main


def test_cli_analyze_with_dict_file(tmp_path, capsys):
    p = tmp_path / "syn.txt"
    p.write_text("# comment line\nあ,かき\n\n東京,とうきょう\n",
                 encoding="utf-8")
    rc = main(["analyze", "--text", "かきいうえお",
               "--synonyms", str(p)])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    # LUCENE-5252 boundary expansion, identical to the inline-dict
    # golden fixture
    assert out == ("かき,0,2,1/あ,0,2,0/い,2,3,1/いう,2,4,0/"
                   "うえ,3,5,1/えお,4,6,1")


def test_cli_analyze_no_dict(capsys):
    rc = main(["analyze", "--text", "あいう", "--no-expand"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "あい,0,2,1/いう,1,3,1"


def test_cli_delete_arg_validation(capsys):
    """delete requires exactly one of --ids / --keys, checked before
    any Spark session spins up."""
    assert main(["delete", "--index", "/nonexistent"]) == 2
    assert main(["delete", "--index", "/nonexistent",
                 "--ids", "1", "--keys", "/also"]) == 2
    assert "exactly one" in capsys.readouterr().err


def test_cli_snapshot_restore_roundtrip(spark, tmp_path, capsys):
    """snapshot + restore subcommands (no Spark inside the CLI path):
    the restored store reports the same stats as the source."""
    import json

    from synspark.index_store import build_index
    from synspark.tokenizer import TokenizerConfig
    corpus = spark.createDataFrame(
        [("r0", "f", "c", "data sort merge")],
        "repo string, path string, commit string, content string")
    store = build_index(spark, corpus, str(tmp_path / "idx"),
                        cfg=TokenizerConfig(n=2, expand=False),
                        n_shards=1, resume=False)
    rc = main(["snapshot", "--index", str(store.path),
               "--dest", str(tmp_path / "snap")])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out)
    assert out1["files_copied"] > 0
    rc = main(["restore", "--snapshot", str(tmp_path / "snap"),
               "--dest", str(tmp_path / "restored")])
    assert rc == 0
    got = json.loads(capsys.readouterr().out)
    assert got["n_docs"] == store.stats()["n_docs"]


def test_cli_query_string_and_grep(spark, tmp_path, capsys):
    """round-5c CLI surfaces: --query-string on the query subcommand
    and the grep subcommand (counts + lines) against a parquet
    source."""
    from synspark.index_store import build_index
    from synspark.tokenizer import TokenizerConfig
    rows = [(i, f"r{i}", "f", "c", "en",
             "data key order" if i % 2 == 0 else "sort merge")
            for i in range(6)]
    corpus = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, "
              "lang string, content string")
    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    store = build_index(spark, corpus, str(tmp_path / "idx"),
                        cfg=TokenizerConfig(n=2, expand=False),
                        n_shards=1, resume=False)
    rc = main(["query", "--index", str(store.path),
               "--query-string", '+data "key order"', "--no-expand"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all("\t" in ln for ln in out)
    assert {int(ln.split("\t")[0]) for ln in out} == {0, 2, 4}

    rc = main(["grep", "--index", str(store.path), "--source", src,
               "--pattern", "key [a-z]*order", "--no-expand"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert {ln.split("\t")[0] for ln in out} == {"0", "2", "4"}

    rc = main(["grep", "--index", str(store.path), "--source", src,
               "--pattern", "key", "--lines", "--no-expand"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert all(":1:" in ln for ln in out) and len(out) == 3
