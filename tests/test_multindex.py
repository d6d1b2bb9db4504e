"""Cross-index search (ES multi-index / alias): dfs_query_then_fetch
combined-statistics scoring vs the query_then_fetch local-stats
default, plus the sliced-scroll surface.

Truth anchor: the public dfs contract — with distributed frequencies
the merged ranking equals ONE index holding the union corpus — so the
oracle is literally the engine itself on an unsplit index. Local-stats
mode is pinned against per-store searches merged by score.
"""

import pytest

from pyspark.sql import functions as F

from synspark.index_store import build_index
from synspark.multindex import plan_dfs, search_indices
from synspark.query import match_ids, search
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)
WORDS = ["data", "sort", "merge", "key", "order", "scan"]
QUERY = "data sort"


def _rows(n=160):
    out = []
    for i in range(n):
        ws = [w for j, w in enumerate(WORDS) if (i >> j) & 1 or i % 6 == j]
        ws = ws or ["data"]
        out.append((f"r{i:03d}", "f", "c", "en",
                    " ".join(ws) + f" fill{i % 7} " + "data " * (i % 3)))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("multidx")
    rows = _rows()
    whole = build_index(spark, _df(spark, rows), str(root / "whole"),
                        cfg=CFG, n_shards=4, resume=False)
    a = build_index(spark, _df(spark, rows[::2]), str(root / "a"),
                    cfg=CFG, n_shards=2, resume=False)
    b = build_index(spark, _df(spark, rows[1::2]), str(root / "b"),
                    cfg=CFG, n_shards=2, resume=False)
    return whole, a, b


def _key_scores(spark, store, df):
    """{repo: rounded score} via the store's docmap."""
    dm = store.docmap(spark).select("doc_id", "repo")
    return {r.repo: round(r.score, 9)
            for r in df.join(dm, "doc_id").collect()}


def test_dfs_equals_merged_index(spark, stores):
    whole, a, b = stores
    want = _key_scores(
        spark, whole, search(spark, whole, QUERY, k=25, mode="and"))
    hits = search_indices(spark, {"a": a, "b": b}, QUERY, k=25,
                          mode="and", dfs=True)
    got = {}
    for name, s in (("a", a), ("b", b)):
        part = hits.filter(F.col("index") == name) \
                   .select("doc_id", "score")
        got.update(_key_scores(spark, s, part))
    assert set(got) == set(want)
    for k_, v in want.items():
        assert got[k_] == pytest.approx(v, rel=1e-9)


def test_dfs_plan_combines_stats(spark, stores):
    whole, a, b = stores
    from synspark.query import plan_query
    pw = plan_query(spark, whole, QUERY, cfg=CFG)
    pc = plan_dfs(spark, [a, b], QUERY, cfg=CFG)
    assert pc.n_docs == pw.n_docs
    assert pc.avgdl == pytest.approx(pw.avgdl, rel=1e-12)
    assert pc.idfs == pytest.approx(pw.idfs, rel=1e-12)


def test_local_mode_merges_per_store_searches(spark, stores):
    _whole, a, b = stores
    hits = search_indices(spark, {"a": a, "b": b}, QUERY, k=10,
                          mode="and", dfs=False).collect()
    per = []
    for name, s in (("a", a), ("b", b)):
        per += [(r.score, name, r.doc_id) for r in
                search(spark, s, QUERY, k=10, mode="and").collect()]
    want = sorted(per, key=lambda t: (-t[0], t[1], t[2]))[:10]
    assert [(r.score, r["index"], r.doc_id) for r in hits] == want
    # local stats differ from dfs stats on an uneven split
    dfs_hits = search_indices(spark, {"a": a, "b": b}, QUERY, k=10,
                              mode="and", dfs=True).collect()
    assert [r.score for r in hits] != [r.score for r in dfs_hits]


def test_incompatible_stores_raise(spark, stores, tmp_path_factory):
    _whole, a, _b = stores
    root = tmp_path_factory.mktemp("multidx_bad")
    other = build_index(
        spark, _df(spark, _rows(40)), str(root / "n3"),
        cfg=TokenizerConfig(n=3, expand=False, ignore_case=True),
        n_shards=2, resume=False)
    with pytest.raises(ValueError):
        search_indices(spark, [a, other], QUERY, k=5)
    with pytest.raises(ValueError):
        search_indices(spark, [], QUERY)


def test_sliced_scroll_partitions(spark, stores):
    whole, _a, _b = stores
    full = {r.doc_id for r in
            match_ids(spark, whole, QUERY, mode="or").collect()}
    slices = [
        {r.doc_id for r in
         match_ids(spark, whole, QUERY, mode="or",
                   sliced=(i, 3)).collect()}
        for i in range(3)]
    assert set().union(*slices) == full
    assert sum(len(s) for s in slices) == len(full)   # disjoint
    for i, s in enumerate(slices):
        assert all(d % 3 == i for d in s)
    with pytest.raises(ValueError):
        match_ids(spark, whole, QUERY, sliced=(3, 3)).collect()


def test_indices_boost(spark, stores):
    _whole, a, b = stores
    base = search_indices(spark, {"a": a, "b": b}, QUERY, k=10,
                          mode="and", dfs=True).collect()
    boosted = search_indices(spark, {"a": a, "b": b}, QUERY, k=10,
                             mode="and", dfs=True,
                             indices_boost={"b": 3.0}).collect()
    bb = {(r["index"], r.doc_id): r.score for r in boosted}
    for r in base:
        key = (r["index"], r.doc_id)
        if key in bb:
            want = r.score * (3.0 if r["index"] == "b" else 1.0)
            assert bb[key] == pytest.approx(want, rel=1e-12)
    # boosting index b ranks its docs above equal-scored a docs
    assert any(r["index"] == "b" for r in boosted[:3])
    with pytest.raises(ValueError):
        search_indices(spark, {"a": a}, QUERY,
                       indices_boost={"a": 0.0})


def test_min_score_filter(spark, stores):
    whole, _a, _b = stores
    full = search(spark, whole, QUERY, k=20, mode="and").collect()
    floor = full[len(full) // 2].score
    got = search(spark, whole, QUERY, k=20, mode="and",
                 min_score=floor).collect()
    want = [(r.doc_id, r.score) for r in full if r.score >= floor]
    assert [(r.doc_id, r.score) for r in got] == want


def test_indices_boost_unknown_name_raises(spark, stores):
    _whole, a, b = stores
    with pytest.raises(ValueError):
        search_indices(spark, {"a": a, "b": b}, QUERY,
                       indices_boost={"typo": 2.0})
