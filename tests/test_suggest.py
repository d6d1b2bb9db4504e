"""ES term + completion suggesters.

Truth anchors: Lucene DirectSpellChecker (max 2 edits, shared prefix
default 1, similarity-then-frequency sort, suggest modes) and the ES
completion suggester's weight-ordered prefix lookup. Oracle:
brute-force recomputation over the corpus vocabulary.
"""

import pytest

from synspark.index_store import build_index
from synspark.suggest import suggest_completion, suggest_terms
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=1 << 20, expand=False, ignore_case=True)

WORDS = ["query", "key", "table", "tablet", "sort", "sport",
         "merge", "scan", "span", "spam"]


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        ws = [w for j, w in enumerate(WORDS[:6]) if (i >> j) & 1]
        ws.append(WORDS[i % len(WORDS)])
        rows.append((f"r{i:03d}", "f", "c", "t", " ".join(ws)))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def sstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("suggest")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=4, resume=False)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_term_suggester_missing_mode(spark, sstore):
    # 'tble' is missing -> corrected; 'scan' exists -> untouched
    out = suggest_terms(spark, sstore, "tble scan").collect()
    toks = {r.token for r in out}
    assert toks == {"tble"}
    sugg = [r.suggestion for r in out]
    assert "table" in sugg
    for r in out:
        d = _lev(r.suggestion, "tble")
        assert 1 <= d <= 2
        assert r.suggestion[0] == "t"          # prefix_length=1
        assert r.score == pytest.approx(
            1.0 - d / min(len(r.suggestion), 4), rel=1e-12)


def test_term_suggester_orders_similarity_then_df(spark, sstore):
    out = suggest_terms(spark, sstore, "spon", size=10).collect()
    # brute-force expected ranking: dist<=2, shared first char,
    # (similarity DESC, df DESC, term ASC)
    dfs = {}
    for r in _corpus(spark).collect():
        for w in set(r.content.split()):
            dfs[w] = dfs.get(w, 0) + 1
    cand = [(1.0 - _lev(w, "spon") / min(len(w), 4), dfs[w], w)
            for w in WORDS
            if 1 <= _lev(w, "spon") <= 2 and w[0] == "s"]
    cand.sort(key=lambda x: (-x[0], -x[1], x[2]))
    assert [r.suggestion for r in out] == [w for _s, _d, w in cand]
    assert [r.df for r in out] == [d for _s, d, _w in cand]
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_term_suggester_min_word_length_and_size(spark, sstore):
    # 'kee' (len 3) is below min_word_length=4 -> never corrected
    assert suggest_terms(spark, sstore, "kee").count() == 0
    out = suggest_terms(spark, sstore, "spon", size=1).collect()
    assert len(out) == 1


def test_term_suggester_always_and_popular(spark, sstore):
    # 'span' exists: missing-mode silent, always-mode suggests
    assert suggest_terms(spark, sstore, "span").count() == 0
    alw = suggest_terms(spark, sstore, "span",
                        suggest_mode="always").collect()
    assert {r.suggestion for r in alw} >= {"spam", "scan"}
    assert all(r.suggestion != "span" for r in alw)  # never itself
    # popular: only candidates with df > token's df
    pop = suggest_terms(spark, sstore, "span",
                        suggest_mode="popular").collect()
    span_df = [r for r in suggest_completion(
        spark, sstore, "span", size=1).collect()][0].weight
    assert all(r.df > span_df for r in pop)


def test_term_suggester_rejects_bad_args(spark, sstore):
    with pytest.raises(ValueError):
        suggest_terms(spark, sstore, "spon", suggest_mode="weird")
    with pytest.raises(ValueError):
        suggest_terms(spark, sstore, "spon", max_edits=3)


def test_completion_suggester_weight_order(spark, sstore):
    out = suggest_completion(spark, sstore, "s", size=3).collect()
    assert len(out) == 3
    assert all(r.suggestion.startswith("s") for r in out)
    weights = [r.weight for r in out]
    assert weights == sorted(weights, reverse=True)
    # exhaustive check against the vocabulary
    allout = suggest_completion(spark, sstore, "sp", size=10).collect()
    assert {r.suggestion for r in allout} == {"span", "spam", "sport"}
