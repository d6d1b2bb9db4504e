"""ES ``bool`` query surface: must / should / must_not clauses with
``minimum_should_match`` over the WAND top-k, count, and match-ids
paths. Truth anchors are public Lucene/ES semantics:

- BooleanClause.Occur — MUST is required and scores, SHOULD is
  optional and scores when matched, MUST_NOT excludes and never
  scores (ReqExclScorer contributes nothing to the score);
- BooleanQuery.setMinimumNumberShouldMatch — at least m SHOULD
  clauses must match; ES defaults m to 0 when must clauses exist,
  else 1;
- an ES ``match`` clause compiles to a BooleanQuery of per-position
  subqueries, so feeding analyzed texts into plan_bool mirrors the
  ``bool`` + ``match`` composition end-to-end.

The oracle is score_naive(plan=...) — the declarative Catalyst path
with the same ordered left-fold accumulation, rank- and bit-identical
to the WAND workers.
"""

import numpy as np
import pytest

from pyspark.sql import functions as F

from synspark.deletes import delete_docs, merge_shards
from synspark.index_store import build_index
from synspark.query import (count_matches, match_ids, plan_bool,
                            score_naive, search, search_bool)
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)

WORDS = ["data", "sort", "merge", "key", "order", "index", "block"]


def _corpus(spark, n=240):
    """Deterministic mixed corpus: every doc draws a different subset
    of WORDS so bool combinations split the corpus many ways."""
    rows = []
    for i in range(n):
        ws = [w for j, w in enumerate(WORDS) if (i >> j) & 1 or i % 7 == j]
        ws = ws or ["data"]
        text = " ".join(ws) + f" filler{i % 11} " + ("data " * (i % 4))
        rows.append((f"r{i:03d}", "f", "c", "t", text))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def booled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bool")
    store = build_index(spark, _corpus(spark), str(root / "idx"),
                        cfg=CFG, n_shards=4, resume=False)
    return store


def _pairs(df):
    return [(r.doc_id, r.score) for r in df.collect()]


CASES = [
    dict(must="data", should="merge", must_not="key"),
    dict(must="data sort", should=["merge", "order"], must_not=None),
    dict(must=None, should=["data", "merge", "order"],
         min_should_match=2, must_not="key"),
    dict(must="index", should=None, must_not="block"),
    dict(must=None, should="data sort merge", min_should_match=5,
         must_not=None),
    dict(must=["data", "block"], should=["sort", "order", "merge"],
         min_should_match=1, must_not="key"),
]


@pytest.mark.parametrize("case", CASES)
def test_search_bool_rank_and_score_identity(spark, booled, case):
    """WAND bool path ≡ declarative oracle: same docs, bit-identical
    scores, same (score DESC, doc_id ASC) order — at a k deep enough
    to expose mid-pack ties."""
    kw = dict(case)
    msm = kw.pop("min_should_match", None)
    plan = plan_bool(spark, booled, kw["must"], kw["should"],
                     kw["must_not"], min_should_match=msm)
    got = _pairs(search_bool(spark, booled, kw["must"], kw["should"],
                             kw["must_not"], k=40,
                             min_should_match=msm))
    exp = _pairs(score_naive(spark, booled, "", k=40, mode="or",
                             plan=plan))
    assert got == exp


@pytest.mark.parametrize("msm", [1, 3, 6, 10])
def test_min_should_match_on_search(spark, booled, msm):
    """search(mode='or', min_should_match=m) is the ES match-query
    m-of-n operator; msm == n_groups coincides with mode='and'."""
    text = "data sort merge"
    plan = plan_bool(spark, booled, should=text, min_should_match=msm)
    got = _pairs(search(spark, booled, text, k=40, mode="or",
                        min_should_match=msm))
    exp = _pairs(score_naive(spark, booled, "", k=40, mode="or",
                             plan=plan))
    assert got == exp
    if msm == 10:  # all 10 distinct bigrams required ⇒ AND semantics
        assert got == _pairs(search(spark, booled, text, k=40,
                                    mode="and"))


def test_bool_count_and_match_ids(spark, booled):
    """count/match-ids with a kinds-tagged plan: the distributed set
    algebra path agrees doc-for-doc with the scoring oracle."""
    plan = plan_bool(spark, booled, must="data", should="merge order",
                     must_not="key", min_should_match=1)
    hits = count_matches(spark, booled, plan=plan).collect()[0].hits
    ids = sorted(r.doc_id for r in
                 match_ids(spark, booled, plan=plan).collect())
    exp = sorted(r.doc_id for r in score_naive(
        spark, booled, "", k=10**6, mode="or", plan=plan).collect())
    assert hits == len(exp) and ids == exp and hits > 0


def test_msm_count_matches(spark, booled):
    plan = plan_bool(spark, booled, should="data sort merge",
                     min_should_match=4)
    hits = count_matches(spark, booled, "data sort merge", mode="or",
                         min_should_match=4).collect()[0].hits
    exp = score_naive(spark, booled, "", k=10**6, mode="or",
                      plan=plan).count()
    assert hits == exp > 0


def test_bool_errors(spark, booled):
    with pytest.raises(ValueError, match="must, should"):
        plan_bool(spark, booled, must_not="data")
    with pytest.raises(ValueError, match="exceeds"):
        plan_bool(spark, booled, should="data", min_should_match=99)
    with pytest.raises(ValueError, match="min_should_match"):
        search(spark, booled, "data", mode="and", min_should_match=1)
    with pytest.raises(ValueError, match="out of range"):
        search(spark, booled, "data sort", mode="or",
               min_should_match=40)


def test_bool_after_cursor_pagination(spark, booled):
    """search_bool pagination: page2 via after ≡ rows 10..19 of a
    deep single query (the search_after contract on the bool path)."""
    kw = dict(must="data", should="merge", must_not="key")
    deep = _pairs(search_bool(spark, booled, k=20, **kw))
    page1 = _pairs(search_bool(spark, booled, k=10, **kw))
    cursor = (page1[-1][1], page1[-1][0])      # (score, doc_id)
    page2 = _pairs(search_bool(spark, booled, k=10, after=cursor, **kw))
    assert page1 + page2 == deep


def test_bool_respects_deletes_and_merge(spark, tmp_path_factory):
    """Tombstoned docs never surface through the bool path, and idf
    N follows n_docs - n_purged after an incremental merge — the same
    maxDoc contract the single-path queries pin."""
    root = tmp_path_factory.mktemp("booldel")
    store = build_index(spark, _corpus(spark, 160),
                        str(root / "idx"), cfg=CFG, n_shards=4,
                        resume=False)
    kw = dict(must="data", should="merge", must_not="key")
    before = search_bool(spark, store, k=10, **kw).collect()
    victims = [r.doc_id for r in before[:3]]
    delete_docs(spark, store, doc_ids=victims)
    after = search_bool(spark, store, k=200, **kw).collect()
    assert not set(victims) & {r.doc_id for r in after}
    merge_shards(spark, store, min_deleted_fraction=0.0)
    assert store.meta().n_purged >= 3
    plan = plan_bool(spark, store, **kw)
    assert plan.n_docs == store.meta().n_docs - store.meta().n_purged
    got = _pairs(search_bool(spark, store, k=40, **kw))
    exp = _pairs(score_naive(spark, store, "", k=40, mode="or",
                             plan=plan))
    assert got == exp and not set(victims) & {d for d, _ in got}


def test_bool_window_pruning_still_fires(spark, booled):
    """The bool window gates (must-alive ∧ msm-alive) are pruning
    extensions, not disablers: a must group concentrated in one doc
    range must keep far windows dead. Checked at the plan level via
    the pure-function worker on one shard's blocks."""
    from synspark.query import _wand_shard
    import pandas as pd
    blocks = booled.segments(spark)
    one = blocks.filter(blocks.shard == 0).toPandas()
    plan = plan_bool(spark, booled, must="data", should="merge",
                     must_not="key")
    out = _wand_shard(one, plan, 5, "or")
    assert len(out) <= 5 and (np.diff(-out["score"].to_numpy()) >= 0).all()


def test_terms_agg_buckets(spark, booled):
    """ES terms aggregation over a bool match set: bucket counts equal
    a brute-force docmap join on the oracle's matching ids, in ES
    bucket order (doc_count DESC, key ASC)."""
    from synspark.query import terms_agg
    plan = plan_bool(spark, booled, must="data", must_not="key")
    got = [(r.repo, r.doc_count) for r in
           terms_agg(spark, booled, "repo", plan=plan, size=5).collect()]
    ids = {r.doc_id for r in score_naive(
        spark, booled, "", k=10**6, mode="or", plan=plan).collect()}
    dm = {r.doc_id: r.repo
          for r in booled.docmap(spark).select("doc_id", "repo").collect()}
    from collections import Counter
    cnt = Counter(dm[i] for i in ids)
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(k, v) for k, v in exp] and got


def test_terms_agg_follows_deletes(spark, tmp_path_factory):
    """Aggregation buckets shrink with tombstones (ES aggs count live
    docs only)."""
    from synspark.query import terms_agg
    root = tmp_path_factory.mktemp("agg")
    store = build_index(spark, _corpus(spark, 120), str(root / "idx"),
                        cfg=CFG, n_shards=4, resume=False)
    before = {r.repo: r.doc_count for r in
              terms_agg(spark, store, "repo", "data", mode="and",
                        size=200).collect()}
    victim = next(iter(before))
    vid = [r.doc_id for r in store.docmap(spark)
           .filter(F.col("repo") == victim).collect()]
    delete_docs(spark, store, doc_ids=vid)
    after = {r.repo: r.doc_count for r in
             terms_agg(spark, store, "repo", "data", mode="and",
                       size=200).collect()}
    assert victim not in after
    assert all(after[k] == v for k, v in before.items() if k != victim)


def test_phrase_guards(spark, booled):
    from synspark.query import count_matches, plan_bool
    with pytest.raises(ValueError, match="phrase"):
        search(spark, booled, "data sort", mode="or", phrase=True,
               min_should_match=2)
    with pytest.raises(ValueError, match="phrase"):
        count_matches(spark, booled, phrase=True,
                      plan=plan_bool(spark, booled, must="data"))


def test_bool_clause_boosts(spark, booled):
    """(clause, boost) tuples multiply the clause's group scores
    (Lucene BoostQuery folded into group idf): WAND ≡ oracle with
    boosts, boost=1 ≡ unboosted, and a dominant boost reorders ranks
    toward its clause."""
    kw = dict(must=("data", 2.0), should=[("merge", 3.0), "order"],
              must_not="key")
    plan = plan_bool(spark, booled, kw["must"], kw["should"],
                     kw["must_not"])
    got = _pairs(search_bool(spark, booled, kw["must"], kw["should"],
                             kw["must_not"], k=40))
    exp = _pairs(score_naive(spark, booled, "", k=40, mode="or",
                             plan=plan))
    assert got == exp
    base = _pairs(search_bool(spark, booled, must=("data", 1.0), k=40))
    unb = _pairs(search_bool(spark, booled, must="data", k=40))
    assert base == unb
    with pytest.raises(ValueError, match="boost"):
        plan_bool(spark, booled, must=("data", 0.0))
    # dominant should-boost pulls a merge-matching doc above a pure
    # data-heavy doc relative to the unboosted ordering
    heavy = _pairs(search_bool(spark, booled, must="data",
                               should=("merge", 50.0), k=40))
    plain = _pairs(search_bool(spark, booled, must="data",
                               should="merge", k=40))
    assert [d for d, _ in heavy] != [d for d, _ in plain]


def test_filter_context(spark, booled):
    """ES filter context: required like must, never scores (Lucene
    FILTER occur). WAND ≡ oracle; filter tightens the match set
    without changing surviving docs' scores; filter-only matching
    goes through match_ids/count."""
    from synspark.query import count_matches, match_ids
    plan = plan_bool(spark, booled, must="data", filter="sort",
                     must_not="key")
    got = _pairs(search_bool(spark, booled, must="data",
                             filter="sort", must_not="key", k=40))
    exp = _pairs(score_naive(spark, booled, "", k=40, mode="or",
                             plan=plan))
    assert got == exp and got
    # scores of surviving docs equal the filter-free query's scores
    free = dict(_pairs(search_bool(spark, booled, must="data",
                                   must_not="key", k=400)))
    assert all(free[d] == s for d, s in got)
    assert set(d for d, _ in got) < set(free)
    # filter-only: counts + ids work, ranked search refuses
    fplan = plan_bool(spark, booled, filter="sort merge")
    hits = count_matches(spark, booled, plan=fplan).collect()[0].hits
    ids = sorted(r.doc_id for r in
                 match_ids(spark, booled, plan=fplan).collect())
    exp_ids = sorted(r.doc_id for r in score_naive(
        spark, booled, "", k=10**6, mode="or", plan=fplan).collect())
    assert hits == len(exp_ids) and ids == exp_ids and hits > 0
    with pytest.raises(ValueError, match="scoring"):
        search_bool(spark, booled, filter="sort")


def test_filter_msm_default_follows_es(spark, booled):
    """ES default: msm=1 only when should exists with no must/filter;
    {should, filter} defaults to msm=0 — the filter alone qualifies a
    doc (score 0), and count_matches reflects the full ES match set."""
    from synspark.query import count_matches
    fs = plan_bool(spark, booled, should="merge", filter="data")
    assert fs.msm == 0
    f_only = plan_bool(spark, booled, filter="data")
    hits_fs = count_matches(spark, booled, plan=fs).collect()[0].hits
    hits_f = count_matches(spark, booled,
                           plan=f_only).collect()[0].hits
    assert hits_fs == hits_f  # should is optional: same match set


def test_search_batch_with_bool_plans(spark, booled):
    """A mixed batch of bool / msm / plain plans runs in ONE job and
    is rank- and score-identical to the per-query paths."""
    from synspark.query import plan_query, search_batch
    p1 = plan_bool(spark, booled, must="data", should="merge",
                   must_not="key")
    p2 = plan_bool(spark, booled, should="data sort merge",
                   min_should_match=4)
    p3 = plan_query(spark, booled, "data sort")
    out = search_batch(spark, booled, [], k=15,
                       plans=[p1, p2, p3]).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert by_q[0] == _pairs(search_bool(
        spark, booled, must="data", should="merge", must_not="key",
        k=15))
    assert by_q[1] == _pairs(search(
        spark, booled, "data sort merge", k=15, mode="or",
        min_should_match=4))
    # kinds-None plan under the batch's default mode="and"
    assert by_q[2] == _pairs(search(
        spark, booled, "data sort", k=15, mode="and"))
    with pytest.raises(ValueError, match="texts or plans"):
        search_batch(spark, booled, ["x"], plans=[p1])
    with pytest.raises(ValueError, match="phrase"):
        search_batch(spark, booled, [], phrase=True, plans=[p1])
