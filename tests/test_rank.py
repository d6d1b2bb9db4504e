"""Score-shaping surfaces (synspark.rank): ES ``collapse``,
``top_hits``, ``function_score`` (field_value_factor),
``constant_score`` and ``boosting``.

Truth anchors are public ES semantics:
- collapse keeps exactly the best-scoring doc per key and ranks those
  winners by their own scores (dedup-by-key over the full match set);
- top_hits returns each bucket's best docs, bucket order = terms-agg
  order (doc_count DESC, key ASC);
- function_score(field_value_factor) combines modifier(factor*field)
  with the query score by boost_mode; missing fields use ``missing``;
- constant_score gives every match the flat boost and never touches
  tf/dl; boosting demotes (never excludes) negative matches.

The in-repo oracle is brute-force recomputation from score_matches /
match_ids (both driver-hash-pinned), so these tests pin COMPOSITION,
plus the score_matches ≡ search rank-identity bridge itself.
"""

import math

import pytest
from pyspark.sql import functions as F

from synspark.index_store import build_index
from synspark.query import match_ids, score_matches, search
from synspark.rank import (boosting, constant_score, function_score,
                           search_collapsed, top_hits_agg)
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)
LANGS = ["en", "de", "ja", "fr", "es"]
QUERY = "data sort"
NEG = "merge key"


def _corpus(spark, n=200):
    rows = []
    for i in range(n):
        body = "data sort " + ("merge key order " * (1 + (i * 7) % 5)) \
            + ("padding words here " * (i % 11))
        if i % 6 == 0:
            body = "data sort only short"       # no negative match
        if i % 13 == 0:
            body = "unrelated filler body"      # no positive match
        rows.append((f"r{i:03d}", "f", "c", LANGS[i % len(LANGS)], body))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def rstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rank")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=4, resume=False)


def _truth(spark, rstore):
    """(doc_id, score_r, lang, dl) for every AND match, brute-force."""
    sm = score_matches(spark, rstore, QUERY, mode="and")
    j = (sm.join(rstore.docmap(spark).select("doc_id", "lang"),
                 "doc_id")
         .join(rstore.docstats(spark), "doc_id")
         .withColumn("score_r", F.round("score", 6)))
    return [(r.doc_id, r.score_r, r.lang, r.dl) for r in j.collect()]


def test_score_matches_rank_identical_to_search(spark, rstore):
    """The score-all frame's top-k == WAND search's top-k (ids AND
    scores) — the bridge every rank surface stands on."""
    sm = score_matches(spark, rstore, QUERY, mode="and")
    top = sorted(((r.doc_id, round(r.score, 9)) for r in sm.collect()),
                 key=lambda t: (-t[1], t[0]))[:10]
    wand = [(r.doc_id, round(r.score, 9))
            for r in search(spark, rstore, QUERY, k=10,
                            mode="and").collect()]
    assert top == wand


def test_collapse_one_per_key_and_best(spark, rstore):
    rows = search_collapsed(spark, rstore, "lang", QUERY, mode="and",
                            k=5).collect()
    truth = _truth(spark, rstore)
    best = {}
    for did, s, lang, _dl in truth:
        cur = best.get(lang)
        if cur is None or (s, -did) > (cur[1], -cur[0]):
            best[lang] = (did, s)
    expect = sorted(((d, lang, s) for lang, (d, s) in best.items()),
                    key=lambda t: (-t[2], t[0]))[:5]
    assert [(r.doc_id, r.lang, r.score_r) for r in rows] == expect
    assert len({r.lang for r in rows}) == len(rows)


def test_top_hits_buckets_and_ranks(spark, rstore):
    rows = top_hits_agg(spark, rstore, "lang", QUERY, mode="and",
                        n_buckets=3, n_hits=2).collect()
    truth = _truth(spark, rstore)
    byl = {}
    for did, s, lang, _dl in truth:
        byl.setdefault(lang, []).append((did, s))
    sizes = sorted(((len(v), lang) for lang, v in byl.items()),
                   key=lambda t: (-t[0], t[1]))[:3]
    expect = []
    for cnt, lang in sizes:
        hits = sorted(byl[lang], key=lambda t: (-t[1], t[0]))[:2]
        expect += [(lang, cnt, i + 1, d, s)
                   for i, (d, s) in enumerate(hits)]
    assert [(r.lang, r.doc_count, r.rank, r.doc_id, r.score_r)
            for r in rows] == expect


def test_function_score_combines_and_missing(spark, rstore):
    rows = function_score(spark, rstore, QUERY, "dl", factor=1.0,
                          modifier="log1p", boost_mode="multiply",
                          k=10).collect()
    truth = _truth(spark, rstore)
    sm = {d: s for d, s, _l, _dl in truth}
    dl = {d: v for d, _s, _l, v in truth}
    # recompute from UNROUNDED scores the same way the engine does
    raw = {r.doc_id: r.score for r in
           score_matches(spark, rstore, QUERY, mode="and").collect()}
    expect = sorted(
        ((d, round(raw[d] * math.log10(1.0 * dl[d] + 1.0), 6))
         for d in sm),
        key=lambda t: (-t[1], t[0]))[:10]
    assert [(r.doc_id, r.score_r) for r in rows] == expect

    # sum / replace boost modes
    srows = function_score(spark, rstore, QUERY, "dl", factor=2.0,
                           modifier="none", boost_mode="sum",
                           k=5).collect()
    sexp = sorted(((d, round(raw[d] + 2.0 * dl[d], 6)) for d in sm),
                  key=lambda t: (-t[1], t[0]))[:5]
    assert [(r.doc_id, r.score_r) for r in srows] == sexp
    rrows = function_score(spark, rstore, QUERY, "dl", factor=1.0,
                           modifier="sqrt", boost_mode="replace",
                           k=5).collect()
    rexp = sorted(((d, round(math.sqrt(dl[d]), 6)) for d in sm),
                  key=lambda t: (-t[1], t[0]))[:5]
    assert [(r.doc_id, r.score_r) for r in rrows] == rexp

    with pytest.raises(ValueError):
        function_score(spark, rstore, QUERY, "dl", modifier="exp")
    with pytest.raises(ValueError):
        function_score(spark, rstore, QUERY, "dl", boost_mode="avg")


def test_constant_score_flat_and_unscored(spark, rstore):
    rows = constant_score(spark, rstore, QUERY, mode="and", boost=2.5,
                          k=7).collect()
    ids = sorted(r.doc_id for r in
                 match_ids(spark, rstore, QUERY, mode="and").collect())
    assert [r.doc_id for r in rows] == ids[:7]
    assert {r.score_r for r in rows} == {2.5}


def test_boosting_demotes_not_excludes(spark, rstore):
    k = 400  # everything
    rows = boosting(spark, rstore, QUERY, NEG, negative_boost=0.1,
                    k=k).collect()
    raw = {r.doc_id: r.score for r in
           score_matches(spark, rstore, QUERY, mode="and").collect()}
    neg = {r.doc_id for r in
           match_ids(spark, rstore, NEG, mode="and").collect()}
    expect = sorted(
        ((d, round(s * 0.1, 6) if d in neg else round(s, 6))
         for d, s in raw.items()),
        key=lambda t: (-t[1], t[0]))
    assert [(r.doc_id, r.score_r) for r in rows] == expect
    # demoted docs are still present
    assert neg & {r.doc_id for r in rows} == neg & set(raw)
    # and every demoted doc scores below its undemoted self
    got = dict(expect)
    for d in neg & set(raw):
        assert got[d] < round(raw[d], 6) or raw[d] == 0
