"""ES ``more_like_this``: interesting-term selection (tf·idf ranked,
min_term_freq / min_doc_freq / max_query_terms gates — the ES
defaults are 2 / 5 / 25) feeding a scored disjunction, with the liked
document excluded (ES ``include: false``).

Truth anchor: Lucene MoreLikeThis builds exactly this BooleanQuery of
the doc's top tf·idf terms. Oracles: brute-force selection from the
tokenizer + score_naive with identical groups.
"""

import pytest

from synspark.index_store import build_index
from synspark.query import (mlt_terms, more_like_this, score_naive,
                            idf)
from synspark.tokenizer import TokenizerConfig, tokenize

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)


def _corpus(spark, n=200):
    words = ["data", "sort", "merge", "key", "order", "scan", "row"]
    rows = []
    for i in range(n):
        ws = []
        for j, w in enumerate(words):
            ws += [w] * (((i >> j) & 3))
        ws = ws or ["data"]
        rows.append((f"r{i:03d}", "f", "c", "t", " ".join(ws)))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def mstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mlt")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=3, resume=False)


LIKE_TEXT = "data data sort sort sort merge key xq"


def _brute_terms(spark, mstore, text, mqt=25, mtf=2, mdf=5):
    toks = [w for w, *_ in tokenize(text, CFG, None)]
    tf = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    meta = mstore.meta()
    dfs = mstore.term_dfs(spark, sorted(tf), build_id=meta.build_id)
    n = meta.n_docs - meta.n_purged
    cand = [(round(tf[t] * idf(n, dfs.get(t, 0)), 6), t) for t in tf
            if tf[t] >= mtf and dfs.get(t, 0) >= mdf]
    cand.sort(key=lambda x: (-x[0], x[1]))
    return [t for _s, t in cand[:mqt]]


def test_term_selection_gates_and_ranking(spark, mstore):
    got = mlt_terms(spark, mstore, LIKE_TEXT, max_query_terms=3)
    expect = _brute_terms(spark, mstore, LIKE_TEXT, mqt=3)
    assert got == expect
    assert len(got) == 3
    # min_term_freq gate: the singleton gram of "xq" never qualifies
    all_sel = mlt_terms(spark, mstore, LIKE_TEXT)
    toks = [w for w, *_ in tokenize(LIKE_TEXT, CFG, None)]
    singles = {t for t in set(toks) if toks.count(t) < 2}
    assert not (set(all_sel) & singles)
    # min_doc_freq gate: raising it can only shrink the selection
    tight = mlt_terms(spark, mstore, LIKE_TEXT, min_doc_freq=10**6)
    assert tight == []


def test_mlt_text_matches_naive_disjunction(spark, mstore):
    terms = mlt_terms(spark, mstore, LIKE_TEXT)
    wand = more_like_this(spark, mstore, LIKE_TEXT, k=30)
    naive = score_naive(spark, mstore, "", k=30, mode="or",
                        groups=[[t] for t in terms])
    w = [(r.doc_id, round(r.score, 9)) for r in wand.collect()]
    n = [(r.doc_id, round(r.score, 9)) for r in naive.collect()]
    assert w == n


def test_mlt_by_doc_excludes_self(spark, mstore):
    corpus = _corpus(spark)
    # doc 150 has rich term mix (high bits set)
    hits = more_like_this(spark, mstore, 150, corpus=corpus, k=15)
    ids = [r.doc_id for r in hits.collect()]
    assert 150 not in ids
    assert len(ids) == 15
    # the same doc's text WITHOUT exclusion ranks the doc itself
    # (engine id -> docmap keys -> corpus row, the fetch_sources path)
    dm = mstore.docmap(spark).filter("doc_id = 150") \
        .select("repo", "path", "commit")
    text = dm.join(corpus, ["repo", "path", "commit"]) \
        .collect()[0]["content"]
    with_self = more_like_this(spark, mstore, text, k=15)
    assert 150 in [r.doc_id for r in with_self.collect()]


def test_mlt_missing_doc_and_missing_corpus(spark, mstore):
    with pytest.raises(ValueError, match="needs the corpus"):
        more_like_this(spark, mstore, 3)
    with pytest.raises(ValueError, match="not found"):
        more_like_this(spark, mstore, 10**9, corpus=_corpus(spark))


def test_mlt_no_qualifying_terms(spark, mstore):
    out = more_like_this(spark, mstore, "zz zz qq", k=5)
    assert out.count() == 0
