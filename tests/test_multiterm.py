"""ES fuzzy / wildcard / regexp multi-term queries: dictionary
expansion + constant_score / scoring_boolean rewrites.

Truth anchors: Lucene FuzzyQuery (LevenshteinAutomata ≤ 2 edits,
FuzzyTermsEnum similarity boost 1 − d/min(len)), WildcardQuery,
RegexpQuery (anchored full-term match), ES Fuzziness.AUTO breakpoints
(0–2 → 0, 3–5 → 1, ≥ 6 → 2). Oracles: brute-force recomputation over
the corpus vocabulary and score_naive with the identical boosted plan.
"""

import pytest
from pyspark.sql import functions as F

from synspark.index_store import build_index
from synspark.multiterm import (auto_fuzziness, count_fuzzy,
                                count_regexp, count_wildcard,
                                expanded_ids, fuzzy_terms,
                                regexp_terms, search_fuzzy,
                                search_regexp, search_wildcard,
                                wildcard_terms, wildcard_to_like)
from synspark.query import plan_bool, score_naive
from synspark.tokenizer import TokenizerConfig

# whole-word tokens (n larger than any block)
CFG = TokenizerConfig(n=1 << 20, expand=False, ignore_case=True)

WORDS = ["query", "key", "table", "tablet", "sort", "sport",
         "merge", "scan", "span", "spam"]


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        # bitmask over the first 6 words gives tf/df variety; the
        # rotating tail guarantees every word (incl. scan/span/spam)
        # enters the dictionary
        ws = [w for j, w in enumerate(WORDS[:6]) if (i >> j) & 1]
        ws.append(WORDS[i % len(WORDS)])
        rows.append((f"r{i:03d}", "f", "c", "t", " ".join(ws)))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def mstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("multiterm")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=4, resume=False)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _docs_with_any(spark, terms):
    hit = set()
    for r in _corpus(spark).collect():
        if set(r.content.split()) & set(terms):
            hit.add(r.repo)
    return hit


# ------------------------------------------------------------------
# fuzziness semantics
# ------------------------------------------------------------------

def test_auto_fuzziness_breakpoints():
    assert auto_fuzziness("ab") == 0
    assert auto_fuzziness("abc") == 1
    assert auto_fuzziness("abcde") == 1
    assert auto_fuzziness("abcdef") == 2


def test_fuzzy_expansion_matches_brute_force(spark, mstore):
    for q, f in [("qery", 2), ("tble", 2), ("sprt", 1),
                 ("scan", 1), ("span", 2), ("merge", 0)]:
        got = fuzzy_terms(spark, mstore, q, fuzziness=f)
        want = sorted((w, _lev(w, q)) for w in WORDS
                      if _lev(w, q) <= f)
        assert got == want, (q, f, got, want)


def test_fuzzy_auto_uses_length(spark, mstore):
    # "qery" len 4 -> AUTO fuzziness 1 -> only "query" (dist 1),
    # not "key" (dist 2)
    got = fuzzy_terms(spark, mstore, "qery")
    assert got == [("query", 1)]


def test_fuzzy_prefix_length_gates_expansion(spark, mstore):
    # dist<=1 of "spam": spam(0), span(1), scan? dist 2 no, sport? no
    all_t = [t for t, _ in fuzzy_terms(spark, mstore, "spam",
                                       fuzziness=1)]
    assert all_t == ["spam", "span"]
    # prefix_length=3 requires "spa" literal: same here; prefix 4 "spam"
    only = [t for t, _ in fuzzy_terms(spark, mstore, "spam",
                                      fuzziness=1, prefix_length=4)]
    assert only == ["spam"]


def test_fuzzy_max_expansions_prefers_close_then_df(spark, mstore):
    # "span" f=2 expands to span(0), scan(1), spam(1), sport(2)...
    full = fuzzy_terms(spark, mstore, "span", fuzziness=2)
    assert ("span", 0) in full and ("scan", 1) in full
    top1 = fuzzy_terms(spark, mstore, "span", fuzziness=2,
                       max_expansions=1)
    assert top1 == [("span", 0)]       # closest always survives cap


def test_fuzzy_rejects_bad_fuzziness(spark, mstore):
    with pytest.raises(ValueError):
        fuzzy_terms(spark, mstore, "span", fuzziness=3)


# ------------------------------------------------------------------
# fuzzy matching + scoring
# ------------------------------------------------------------------

def test_count_fuzzy_constant_score(spark, mstore):
    hits = count_fuzzy(spark, mstore, "qery",
                       fuzziness=2).collect()[0].hits
    want = _docs_with_any(spark, ["query", "key"])
    assert hits == len(want)


def test_search_fuzzy_matches_naive_boosted_plan(spark, mstore):
    exp = fuzzy_terms(spark, mstore, "qery", fuzziness=2)
    assert [t for t, _ in exp] == ["key", "query"]
    clauses = [([t], 1.0 if d == 0 else 1.0 - d / min(len(t), 4))
               for t, d in exp]
    plan = plan_bool(spark, mstore, should=clauses,
                     min_should_match=1)
    want = {r.doc_id: r.score
            for r in score_naive(spark, mstore, "", k=500,
                                 plan=plan).collect()}
    got = search_fuzzy(spark, mstore, "qery", k=500,
                       fuzziness=2).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.score == pytest.approx(want[r.doc_id], rel=1e-12)


def test_search_fuzzy_empty_expansion(spark, mstore):
    out = search_fuzzy(spark, mstore, "zzz", fuzziness=1)
    assert out.count() == 0
    assert count_fuzzy(spark, mstore, "zzz",
                       fuzziness=1).collect()[0].hits == 0


# ------------------------------------------------------------------
# wildcard
# ------------------------------------------------------------------

def test_wildcard_to_like_translation_and_escapes():
    assert wildcard_to_like("s*t") == "s%t"
    assert wildcard_to_like("s?an") == "s_an"
    assert wildcard_to_like("100%") == "100\\%"
    assert wildcard_to_like("a_b") == "a\\_b"
    assert wildcard_to_like(r"lit\*eral") == "lit*eral"
    assert wildcard_to_like(r"a\\b") == "a\\\\b"


def test_wildcard_expansion(spark, mstore):
    assert wildcard_terms(spark, mstore, "s*") == \
        ["scan", "sort", "spam", "span", "sport"]
    assert wildcard_terms(spark, mstore, "s?an") == ["scan", "span"]
    assert wildcard_terms(spark, mstore, "tab*") == ["table", "tablet"]
    assert wildcard_terms(spark, mstore, "table?") == ["tablet"]
    assert wildcard_terms(spark, mstore, "*") == sorted(WORDS)


def test_wildcard_count_and_ids(spark, mstore):
    want = _docs_with_any(spark, ["scan", "span"])
    hits = count_wildcard(spark, mstore, "s?an").collect()[0].hits
    assert hits == len(want)
    ids = expanded_ids(
        spark, mstore,
        wildcard_terms(spark, mstore, "s?an"))
    assert ids.count() == len(want)


def test_search_wildcard_matches_naive(spark, mstore):
    terms = wildcard_terms(spark, mstore, "s*", max_expansions=3)
    want = {r.doc_id: r.score
            for r in score_naive(spark, mstore, "", k=500, mode="or",
                                 groups=[[t] for t in terms])
            .collect()}
    got = search_wildcard(spark, mstore, "s*", k=500,
                          max_expansions=3).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.score == pytest.approx(want[r.doc_id], rel=1e-12)


# ------------------------------------------------------------------
# regexp
# ------------------------------------------------------------------

def test_regexp_is_anchored(spark, mstore):
    # unanchored "pan" would substring-match span/spam
    assert regexp_terms(spark, mstore, "pan") == []
    assert regexp_terms(spark, mstore, "s.an") == ["scan", "span"]
    assert regexp_terms(spark, mstore, "sp(an|am)") == ["spam", "span"]
    assert regexp_terms(spark, mstore, "tablet?") == \
        ["table", "tablet"]
    assert regexp_terms(spark, mstore, ".*or.*") == ["sort", "sport"]


def test_regexp_count_and_topk(spark, mstore):
    want = _docs_with_any(spark, ["sort", "sport"])
    assert count_regexp(spark, mstore,
                        ".*or.*").collect()[0].hits == len(want)
    top = search_regexp(spark, mstore, "s.an", k=5).collect()
    assert len(top) == 5
    assert all(r.score > 0 for r in top)


def test_regexp_invalid_pattern_fails_fast(spark, mstore):
    with pytest.raises(Exception):
        regexp_terms(spark, mstore, "[unclosed")
