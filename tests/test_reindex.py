"""ES _reindex / _update_by_query compositions: query-filtered copy
into a fresh index (with transform and analyzer-change hooks) and
match-transform-upsert. Oracles: the engine's own match/count
surfaces plus brute-force recomputation over the raw corpus."""

import pytest

from pyspark.sql import functions as F

from synspark.index_store import build_index
from synspark.query import count_matches, match_ids, search
from synspark.reindex import reindex, update_by_query
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        body = "data sort" if i % 3 == 0 else "merge key order"
        rows.append((f"r{i:03d}", f"p{i % 4}", "c0",
                     "en" if i % 2 == 0 else "ja",
                     body + f" fill{i % 5}"))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def rstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("reidx")
    corpus = _corpus(spark)
    store = build_index(spark, corpus, str(root / "src"), cfg=CFG,
                        n_shards=3, resume=False)
    return store, corpus, root


def test_reindex_subset_by_keys(spark, rstore):
    store, corpus, root = rstore
    dst = reindex(spark, store, corpus, str(root / "dst1"),
                  query="data", mode="and", n_shards=2)
    n_match = match_ids(spark, store, "data", mode="and").count()
    assert dst.meta().n_docs == n_match == 40
    # every doc in the new index matches; the others are gone
    assert count_matches(spark, dst, "data", mode="and") \
        .collect()[0].hits == n_match
    assert count_matches(spark, dst, "key order", mode="and") \
        .collect()[0].hits == 0
    # ranking on the subset index works end-to-end
    hits = search(spark, dst, "data sort", k=5, mode="and").collect()
    assert len(hits) == 5 and hits[0].score > 0


def test_reindex_doc_where_and_transform(spark, rstore):
    store, corpus, root = rstore
    dst = reindex(
        spark, store, corpus, str(root / "dst2"),
        query="data", mode="and", doc_where="lang = 'en'",
        transform=lambda df: df.withColumn(
            "content", F.concat(F.col("content"), F.lit(" extra"))),
        n_shards=2)
    want = match_ids(spark, store, "data", mode="and",
                     doc_where="lang = 'en'").count()
    assert dst.meta().n_docs == want > 0
    # the transform's new token is searchable in the new index
    assert count_matches(spark, dst, "extra", mode="and") \
        .collect()[0].hits == want


def test_reindex_analyzer_change(spark, rstore):
    """The ES reason to reindex: a NEW analyzer (n=3) applies to the
    copied docs."""
    store, corpus, root = rstore
    cfg3 = TokenizerConfig(n=3, expand=False, ignore_case=True)
    dst = reindex(spark, store, corpus, str(root / "dst3"),
                  query="data", mode="and", dst_cfg=cfg3, n_shards=2)
    assert dst.meta().cfg["n"] == 3
    assert count_matches(spark, dst, "dat", mode="and", cfg=cfg3) \
        .collect()[0].hits == dst.meta().n_docs


def test_reindex_densifies_native_ids(spark, rstore, tmp_path):
    store, corpus, root = rstore
    with_ids = corpus.join(
        store.docmap(spark).select("doc_id", "repo"), "repo")
    dst = reindex(spark, store, with_ids, str(tmp_path / "dst"),
                  query="data", mode="and", n_shards=2)
    ids = sorted(r.doc_id for r in dst.docmap(spark).collect())
    assert ids == list(range(dst.meta().n_docs))
    # mapping: new id = rank of the original id among matches
    orig = sorted(r.doc_id for r in
                  match_ids(spark, store, "data", mode="and")
                  .collect())
    dm_new = {r.repo: r.doc_id for r in dst.docmap(spark).collect()}
    dm_old = {r.doc_id: r.repo for r in
              store.docmap(spark).collect()}
    for rank, oid in enumerate(orig):
        assert dm_new[dm_old[oid]] == rank


def test_update_by_query(spark, rstore, tmp_path):
    _store, corpus, _root = rstore
    store = build_index(spark, corpus, str(tmp_path / "src"),
                        cfg=CFG, n_shards=3, resume=False)
    n_data = count_matches(spark, store, "data", mode="and") \
        .collect()[0].hits
    n_docs = store.meta().n_docs
    update_by_query(
        spark, store, corpus,
        transform=lambda df: df.withColumn(
            "content",
            F.regexp_replace("content", "data", "info")),
        query="data", mode="and", key_cols=["repo"],
        batch_tag="ubq1")
    assert count_matches(spark, store, "data", mode="and") \
        .collect()[0].hits == 0
    assert count_matches(spark, store, "info", mode="and") \
        .collect()[0].hits == n_data
    # untouched docs still live and matching
    assert count_matches(spark, store, "key order", mode="and") \
        .collect()[0].hits == n_docs - n_data
    # replay no-ops (same batch_tag)
    update_by_query(
        spark, store, corpus,
        transform=lambda df: df.withColumn(
            "content", F.lit("clobber")),
        query="info", mode="and", key_cols=["repo"],
        batch_tag="ubq1")
    assert count_matches(spark, store, "clobber", mode="and") \
        .collect()[0].hits == 0


def test_matched_rows_requires_alignment(spark, rstore, tmp_path):
    store, corpus, _root = rstore
    bad = corpus.select("lang", "content")
    with pytest.raises(ValueError):
        reindex(spark, store, bad, str(tmp_path / "x"), query="data")
