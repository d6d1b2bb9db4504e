"""Re-analysis (fielddata) surfaces: ES ``significant_terms`` (JLH)
and the ``_termvectors`` API.

Truth anchors are public ES semantics:
- significant_terms scores foreground-vs-background lift with JLH
  ``(fg% − bg%)·(fg%/bg%)``, zero when fg% ≤ bg% — a term enriched in
  the matching docs must outrank a uniformly common term;
- foreground = the query's LIVE matches, background = the whole index
  (pre-merge Lucene counts);
- _termvectors re-derives tf from _source with the index analyzer and
  (term_statistics=true) reports collection df/ttf.

Oracles are brute-force python recomputation over the same corpus.
"""

import pytest
from pyspark.sql import functions as F

from synspark.fielddata import significant_terms_agg, term_vectors
from synspark.index_store import build_index
from synspark.query import match_ids
from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig, tokenize

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)
QUERY = "data sort"


def _bodies(n=120):
    out = []
    for i in range(n):
        if i % 3 == 0:
            # matching docs, enriched with the marker word "zq"
            out.append("data sort zq common words here")
        elif i % 3 == 1:
            out.append("data only common words here")
        else:
            out.append("common words here nothing else")
    return out


def _corpus(spark, bodies):
    rows = [(f"r{i:03d}", "f", "c", b) for i, b in enumerate(bodies)]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, content string")


@pytest.fixture(scope="module")
def fstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fielddata")
    bodies = _bodies()
    corpus = _corpus(spark, bodies)
    store = build_index(spark, corpus, str(root / "idx"), cfg=CFG,
                        n_shards=4, resume=False)
    return store, corpus, bodies


def _grams(body):
    return [w for w, *_ in tokenize(body, CFG, None)]


def test_sig_terms_jlh_exact(spark, fstore):
    store, corpus, bodies = fstore
    rows = significant_terms_agg(spark, store, corpus, QUERY,
                                 mode="and", size=50).collect()
    # brute force: fg = docs containing ALL query bigrams
    qt = set(_grams(QUERY))
    docs = [set(_grams(b)) for b in bodies]
    fg_ids = [i for i, d in enumerate(docs) if qt <= d]
    fgn, n = float(len(fg_ids)), float(len(docs))
    vocab = {t for d in docs for t in d}
    expect = []
    for t in vocab:
        fgc = sum(1 for i in fg_ids if t in docs[i])
        bgc = sum(1 for d in docs if t in d)
        if fgc == 0:
            continue
        fgp, bgp = fgc / fgn, bgc / n
        s = round((fgp - bgp) * (fgp / bgp), 6) if fgp > bgp else 0.0
        if s > 0:
            expect.append((t, fgc, bgc, s))
    expect.sort(key=lambda r: (-r[3], r[0]))
    got = [(r.term, r.doc_count, r.bg_count, r.score_r) for r in rows]
    assert got == expect[:50]
    # the enriched marker's bigram dominates a uniformly common term
    terms = [r.term for r in rows]
    assert "zq" in terms
    assert terms.index("zq") < len(terms)  # present and scored > 0
    assert "co" not in terms  # in every doc: fg% == bg% -> score 0


def test_sig_terms_respects_min_doc_count(spark, fstore):
    store, corpus, _ = fstore
    lo = significant_terms_agg(spark, store, corpus, QUERY,
                               mode="and", size=50,
                               min_doc_count=10 ** 6)
    assert lo.count() == 0


def test_term_vectors_tf_df_ttf(spark, fstore):
    store, corpus, bodies = fstore
    # internal doc ids are indexer-assigned; map repo key -> doc_id
    dm = {r.repo: r.doc_id for r in
          store.docmap(spark).select("doc_id", "repo").collect()}
    ids = [dm["r000"], dm["r004"]]
    rows = term_vectors(spark, store, corpus, ids).collect()
    docs = [_grams(b) for b in bodies]
    expect = []
    for did, row in ((ids[0], 0), (ids[1], 4)):
        seen = {}
        for t in docs[row]:
            seen[t] = seen.get(t, 0) + 1
        for t, tf in seen.items():
            df = sum(1 for d in docs if t in set(d))
            ttf = sum(d.count(t) for d in docs)
            expect.append((did, t, tf, df, ttf))
    expect.sort(key=lambda r: (r[0], r[1]))
    assert [(r.doc_id, r.term, r.tf, r.df, r.ttf)
            for r in rows] == expect


def test_term_vectors_without_stats(spark, fstore):
    store, corpus, _ = fstore
    rows = term_vectors(spark, store, corpus, [0],
                        term_statistics=False)
    assert rows.columns == ["doc_id", "term", "tf"]
    assert rows.count() > 0


def test_fielddata_uses_index_analyzer_with_synonyms(spark, tmp_path):
    """Re-analysis must run the SAME analyzer as indexing — with a
    synonym dict, term vectors carry the synonym-anchor tokens."""
    syn = SynonymDict.parse("ab,xy")
    cfg = TokenizerConfig(n=2, expand=True, ignore_case=True)
    corpus = _corpus(spark, ["ab here", "xy here", "plain here"])
    store = build_index(spark, corpus, str(tmp_path / "idx"), cfg=cfg,
                        syn=syn, n_shards=2, resume=False)
    did = store.docmap(spark).filter(F.col("repo") == "r000") \
        .select("doc_id").collect()[0][0]
    tv = term_vectors(spark, store, corpus, [did], syn=syn,
                      term_statistics=False).collect()
    terms = {r.term for r in tv}
    # expand=True emits the anchor AND its alternative at the match
    assert "ab" in terms and "xy" in terms


def test_sig_terms_foreground_is_live_matches(spark, fstore):
    """Foreground == match_ids output: a doc_where filter shrinks the
    foreground and the counts follow."""
    store, corpus, bodies = fstore
    all_rows = {r.term: r.doc_count for r in significant_terms_agg(
        spark, store, corpus, QUERY, mode="and", size=500).collect()}
    n_fg = match_ids(spark, store, QUERY, mode="and").count()
    # query bigrams that are NOT corpus-wide (positive lift) are in
    # every fg doc; 'or' (also in "words", i.e. every doc) has
    # fg% == bg% -> JLH 0 and must be absent
    docs = [set(_grams(b)) for b in bodies]
    for t in set(_grams(QUERY)):
        bg = sum(1 for d in docs if t in d)
        if bg < len(docs):
            assert all_rows.get(t, 0) == n_fg
        else:
            assert t not in all_rows


def test_sig_terms_sampler_restricts_foreground(spark, fstore):
    """sample_size=N: the foreground is the N best-scoring matches —
    query-term doc_counts equal N (every sampled doc matches), and the
    fg set equals the rounded-score top-N."""
    store, corpus, bodies = fstore
    n = 10
    rows = significant_terms_agg(spark, store, corpus, QUERY,
                                 mode="and", size=500,
                                 sample_size=n).collect()
    counts = {r.term: r.doc_count for r in rows}
    qt = set(_grams(QUERY))
    docs = [set(_grams(b)) for b in bodies]
    n_match = sum(1 for d in docs if qt <= d)
    assert n < n_match  # the sample is a strict subset
    for t in qt:
        bg = sum(1 for d in docs if t in d)
        if bg < len(docs):
            assert counts.get(t, 0) == n
