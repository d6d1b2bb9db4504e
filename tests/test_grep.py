"""Gram-accelerated regex grep: required-gram extraction soundness,
prefilter ≡ full-scan equivalence, line output, metadata scoping.

Truth anchors: the public trigram-index regex design (R. Cox,
"Regular Expression Matching with a Trigram Index"; Zoekt) — the
prefilter must NEVER lose a match (false negatives impossible), only
admit extra candidates the verify step rejects. Oracle: Python re
over the raw corpus.
"""

import re

import pytest

from synspark.grep import (grep_count, grep_lines, grep_search,
                           required_grams)
from synspark.index_store import build_index
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)


def _corpus(spark, n=150):
    rows = []
    for i in range(n):
        parts = ["data", "sort", "merge"]
        if i % 3 == 0:
            parts.append("key order")
        if i % 4 == 0:
            parts.append("key minor order")
        if i % 5 == 0:
            parts.append("keyboard order42")
        body = " ".join(parts) + f"\nline2 fill{i % 7}"
        if i % 6 == 0:
            body += "\nkey xorder"
        rows.append((f"r{i:03d}", "f", "c",
                     "en" if i % 2 == 0 else "ja", body))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def gstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("grep")
    corpus = _corpus(spark)
    store = build_index(spark, corpus, str(root / "idx"),
                        cfg=CFG, n_shards=4, resume=False)
    dm = {r.repo: r.doc_id for r in store.docmap(spark).collect()}
    texts = {dm[r[0]]: r[4] for r in corpus.collect()}
    return store, corpus.join(
        store.docmap(spark).select("doc_id", "repo"), "repo"), texts


# ------------------------------------------------------------------
# required_grams soundness: every gram claimed required must appear
# in every matching text's gram set
# ------------------------------------------------------------------

SOUND_CASES = [
    ("key [a-z]*order", ["key order", "key minorder", "key xorder"]),
    ("ab*cd", ["acd", "abbcd"]),
    (r"foo\.bar", ["foo.bar"]),
    (r"x\.+y", ["x.y", "x..y"]),
    ("(foo)bar", ["foobar"]),
    ("so+rt", ["sort", "soort"]),
    ("merge +sort", ["merge sort", "merge  sort"]),
]


def _grams_of(text, n=2):
    out = set()
    for blk in re.split(r"[ \t\n\r　]+", text.lower()):
        if not blk:
            continue
        if len(blk) < n:
            out.add(blk)
        out |= {blk[i:i + n] for i in range(len(blk) - n + 1)}
    return out


@pytest.mark.parametrize("pat,texts", SOUND_CASES)
def test_required_grams_sound(pat, texts):
    req = required_grams(pat)
    for t in texts:
        assert re.search(pat, t), f"fixture text {t!r} must match"
        if req is not None:
            missing = set(req) - _grams_of(t)
            assert not missing, (pat, t, missing)


@pytest.mark.parametrize("pat", [
    "data|info", "(?=foo)bar", "(abc)?def", "a.b", "x?y?",
])
def test_required_grams_degrades(pat):
    assert required_grams(pat) is None


def test_required_grams_splits_on_delimiters():
    req = required_grams("key order")
    assert req is not None and "y " not in "".join(req)
    assert set(req) == {"ke", "ey", "or", "rd", "de", "er"}


# ------------------------------------------------------------------
# end-to-end vs python re
# ------------------------------------------------------------------

@pytest.mark.parametrize("pat", [
    "key [a-z]*order", "order42", "data|info", r"fill[0-3]\b",
])
def test_grep_matches_re(spark, gstore, pat):
    store, corpus, texts = gstore
    want = {d: len(re.findall(pat, t)) for d, t in texts.items()
            if re.search(pat, t)}
    got = {r.doc_id: r.n_matches for r in
           grep_search(spark, store, corpus, pat).collect()}
    assert got == want
    assert grep_count(spark, store, corpus, pat) \
        .collect()[0].hits == len(want)


def test_grep_lines(spark, gstore):
    store, corpus, texts = gstore
    pat = "key xorder"
    rows = grep_lines(spark, store, corpus, pat).collect()
    want = [(d, i + 1, ln) for d, t in sorted(texts.items())
            for i, ln in enumerate(t.split("\n")) if re.search(pat, ln)]
    assert [(r.doc_id, r.line_no, r.line) for r in rows] == want
    assert want and all(no == 3 for _d, no, _l in want)


def test_grep_doc_where(spark, gstore):
    store, corpus, texts = gstore
    dm = {r.doc_id: r.lang for r in
          store.docmap(spark).select("doc_id", "lang").collect()}
    pat = "key [a-z]*order"
    got = {r.doc_id for r in
           grep_search(spark, store, corpus, pat,
                       doc_where="lang = 'en'").collect()}
    want = {d for d, t in texts.items()
            if re.search(pat, t) and dm[d] == "en"}
    assert got == want and got
    # fallback path honors the filter too
    gf = {r.doc_id for r in
          grep_search(spark, store, corpus, "data|key xorder",
                      doc_where="lang = 'en'").collect()}
    wf = {d for d, t in texts.items()
          if re.search("data|key xorder", t) and dm[d] == "en"}
    assert gf == wf


def test_grep_errors(spark, gstore):
    store, corpus, _texts = gstore
    with pytest.raises(re.error):
        grep_count(spark, store, corpus, "ab[")
    with pytest.raises(ValueError):
        grep_count(spark, store, corpus.drop("doc_id"), "abc")


def test_dict_anchored_index_disables_prefilter(spark, tmp_path):
    """On an expand/dict index a literal run overlapping a dict
    surface loses its boundary-straddling grams (anchors never let
    grams cross the match edge), so the AND prefilter would
    false-negative — grep must degrade to the verified full scan and
    still find every match."""
    from synspark.synonyms import SynonymDict
    syn = SynonymDict.parse("data,info")
    cfg = TokenizerConfig(n=2, expand=True, ignore_case=True)
    rows = [(f"r{i}", "f", "c", "en", "xdatax sort")
            for i in range(4)]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    store = build_index(spark, corpus, str(tmp_path / "idx"),
                        cfg=cfg, syn=syn, n_shards=1, resume=False)
    cj = corpus.join(store.docmap(spark).select("doc_id", "repo"),
                     "repo")
    # 'xdatax' straddles the 'data' anchor: grams xd/ax are NOT in
    # the index; a naive prefilter would return 0 docs
    got = grep_search(spark, store, cj, "xdatax").collect()
    assert len(got) == 4 and all(r.n_matches == 1 for r in got)


def test_escaped_bracket_in_class_is_sound():
    """r'[a\\]bc]x' — the class contains an escaped ']'; its interior
    chars must NOT leak into the required runs (review finding)."""
    req = required_grams(r"[a\]bc]x")
    t = "ax"
    assert re.search(r"[a\]bc]x", t)
    if req is not None:
        assert set(req) <= _grams_of(t), req
