"""ES ``prefix`` query: term-dictionary expansion + the two Lucene
MultiTermQuery rewrites — constant_score (doc-set union, no scoring;
the ES default) and scoring_boolean / top_terms_N (every expanded
term its own scored SHOULD clause, capped by max_expansions with
highest-df-first selection).

Truth anchors: Lucene MultiTermQuery.CONSTANT_SCORE_REWRITE /
SCORING_BOOLEAN_REWRITE / TopTermsScoringBooleanQueryRewrite
(top-N terms by docFreq). Oracles are brute-force recomputation over
the corpus and score_naive with identical groups.
"""

import pytest
from pyspark.sql import functions as F

from synspark.index_store import build_index
from synspark.query import (count_prefix, prefix_ids, prefix_terms,
                            score_naive, search_prefix)
from synspark.tokenizer import TokenizerConfig, tokenize

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)


def _corpus(spark, n=160):
    words = ["data", "dome", "dust", "dirt", "sort", "merge", "key"]
    rows = []
    for i in range(n):
        ws = [w for j, w in enumerate(words) if (i >> j) & 1]
        ws = ws or ["sort"]
        rows.append((f"r{i:03d}", "f", "c", "t",
                     " ".join(ws) + f" x{i % 13}"))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def pstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("prefix")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=4, resume=False)


def _brute(spark, prefix):
    """doc content -> set of matching grams per row, brute-force from
    the tokenizer itself (the same gram definition the index uses)."""
    per_row = []
    for r in _corpus(spark).collect():
        grams = {w for w, *_ in tokenize(r.content, CFG, None)}
        per_row.append((r.repo, {g for g in grams
                                 if g.startswith(prefix)}))
    return per_row


def test_expansion_selection_deterministic(spark, pstore):
    all_terms = prefix_terms(spark, pstore, "d")
    assert all(t.startswith("d") for t in all_terms)
    assert len(all_terms) >= 3          # da/do/du/di from the d-words
    top2 = prefix_terms(spark, pstore, "d", max_expansions=2)
    assert len(top2) == 2 and set(top2) <= set(all_terms)
    # top-df selection: every selected term's df >= every excluded's
    ts = {r.term: r.df for r in pstore.termstats(spark).collect()
          if r.term.startswith("d")}
    excluded = set(all_terms) - set(top2)
    assert min(ts[t] for t in top2) >= max(ts[t] for t in excluded)


def test_constant_score_count_matches_brute_force(spark, pstore):
    brute = _brute(spark, "d")
    expect = sum(1 for _, gs in brute if gs)
    got = count_prefix(spark, pstore, "d").collect()[0]["hits"]
    assert got == expect
    assert prefix_ids(spark, pstore, "d").count() == expect


def test_scoring_boolean_matches_naive(spark, pstore):
    terms = prefix_terms(spark, pstore, "d", max_expansions=4)
    wand = search_prefix(spark, pstore, "d", k=40, max_expansions=4)
    naive = score_naive(spark, pstore, "", k=40, mode="or",
                        groups=[[t] for t in terms])
    w = [(r.doc_id, round(r.score, 9)) for r in wand.collect()]
    n = [(r.doc_id, round(r.score, 9)) for r in naive.collect()]
    assert w == n


def test_no_match_prefix(spark, pstore):
    assert count_prefix(spark, pstore, "zz").collect()[0]["hits"] == 0
    assert search_prefix(spark, pstore, "zz").count() == 0
    assert prefix_ids(spark, pstore, "zz").count() == 0


def test_empty_prefix_raises(spark, pstore):
    with pytest.raises(ValueError, match="non-empty"):
        prefix_terms(spark, pstore, "")
