"""Token-level synonym filter (SURVEY §2.3) + WordNet dict format.

Token tuples are (word, pos_inc, pos_len); outputs stack at match
START and the last word of an output absorbs the remaining match span
(classic Lucene SynonymFilter semantics — SynonymFilter.java:472-526,
544-644)."""

import pytest

from synspark.synonyms import SynonymDict
from synspark.synfilter import (expand_tokens, expand_tokens_df,
                                phrase_match)

pytestmark = pytest.mark.spark


def toks(*words):
    return [(w, 1) for w in words]


def test_single_token_expand():
    syn = SynonymDict.parse("fast,quick,speedy")
    out = expand_tokens(toks("a", "fast", "car"), syn)
    assert out == [("a", 1, 1), ("fast", 1, 1), ("quick", 0, 1),
                   ("speedy", 0, 1), ("car", 1, 1)]


def test_multi_token_match_stacks_at_start():
    syn = SynonymDict.parse("wi fi,wifi,wireless")
    out = expand_tokens(toks("my", "wi", "fi", "router"), syn)
    # alternatives stack at the match START with pos_len spanning the
    # whole 2-token match (so downstream phrase queries traverse them)
    assert out == [("my", 1, 1), ("wi", 1, 1), ("wifi", 0, 2),
                   ("wireless", 0, 2), ("fi", 1, 1), ("router", 1, 1)]


def test_multi_word_output():
    # '=>' rules REPLACE the original (keepOrig=false in Lucene terms)
    syn = SynonymDict.parse("usa => united states of america")
    out = expand_tokens(toks("visit", "usa", "now"), syn)
    assert out == [("visit", 1, 1),
                   ("united", 1, 1), ("states", 1, 1), ("of", 1, 1),
                   ("america", 1, 1),
                   ("now", 1, 1)]


def test_earliest_longest_priority():
    syn = SynonymDict.parse("a b,ab\nb c,bc")
    out = expand_tokens(toks("a", "b", "c"), syn)
    # 'a b' matches first (earliest), consuming b; 'b c' can't match
    assert out == [("a", 1, 1), ("ab", 0, 2), ("b", 1, 1), ("c", 1, 1)]


def test_ignore_case_filter():
    syn = SynonymDict.parse("fast,quick")
    out = expand_tokens(toks("FAST"), syn, ignore_case=True)
    assert out == [("FAST", 1, 1), ("quick", 0, 1)]


def test_contract_mode_replaces():
    # parser expand=False: a,b,c -> every term maps to [a] only
    syn = SynonymDict.parse("fast,quick", expand=False)
    out = expand_tokens(toks("quick"), syn)
    assert out == [("fast", 1, 1)]


def test_poslen_multiword_phrase_queries():
    """The reason posLen exists: phrase queries traverse single-word
    synonyms of multi-word surfaces and vice versa."""
    syn = SynonymDict.parse("new york,ny")
    stream = expand_tokens(toks("in", "new", "york", "city"), syn)
    assert phrase_match(stream, ["in", "new", "york", "city"])
    assert phrase_match(stream, ["in", "ny", "city"])       # via posLen=2
    assert not phrase_match(stream, ["in", "ny", "york"])   # ny spans both
    assert not phrase_match(stream, ["new", "city"])
    # reverse direction: single-word surface, multi-word output
    stream2 = expand_tokens(toks("visit", "ny", "today"), syn)
    assert phrase_match(stream2, ["visit", "new", "york"])
    assert phrase_match(stream2, ["visit", "ny"])
    # classic (non-graph) SynonymFilter parity: the inserted 'york'
    # position shifts the following token — 'ny today' adjacency breaks
    # exactly as in the reference's forked filter
    assert not phrase_match(stream2, ["ny", "today"])
    assert phrase_match(stream2, ["new", "york", "today"])


def test_entry_tokenizer_configurable():
    """Dict entries analyzed by a configurable tokenizer (reference
    factory default whitespace; SynonymTokenFilterFactory.java:45-52)."""
    syn = SynonymDict.parse("wi-fi,wireless")
    # default whitespace tokenizer: 'wi-fi' is ONE token
    out = expand_tokens(toks("wi-fi"), syn)
    assert ("wireless", 0, 1) in out
    # custom tokenizer splitting on '-': the entry is a 2-token key
    out2 = expand_tokens(toks("wi", "fi"), syn,
                         entry_tokenizer=lambda s: s.split("-"))
    assert out2 == [("wi", 1, 1), ("wireless", 0, 2), ("fi", 1, 1)]


def test_missing_dict_fails_fast(spark):
    """No dictionary -> configuration error (reference factory throws,
    SynonymTokenFilterFactory.java:55-63), never a silent no-op."""
    with pytest.raises(ValueError, match="requires a dictionary"):
        expand_tokens(toks("a"), None)
    with pytest.raises(ValueError, match="requires a dictionary"):
        expand_tokens_df(spark.range(0), SynonymDict.parse(""))


def test_wordnet_parse():
    rules = """
s(100001740,1,'entity',n,1,11).
s(100001740,2,'thing',n,1,11).
s(200001740,1,'fast',a,1,1).
s(200001740,2,'quick',a,1,1).
"""
    d = SynonymDict.parse_wordnet(rules)
    assert d.mapping["entity"] == ["entity", "thing"]
    assert d.alternatives("fast") == ["quick"]
    assert d.longest_match_end("quickly", 0) == 5
    assert SynonymDict.parse_wordnet("") is None


def test_expand_tokens_df(spark):
    from synspark.indexer import tokenize_corpus
    from synspark.tokenizer import TokenizerConfig
    docs = spark.createDataFrame(
        [(0, "fast car"), (1, "slow boat")], "doc_id long, content string")
    # word-level tokens: use n large so each block = one token
    toks_df = tokenize_corpus(docs, TokenizerConfig(n=99, expand=False), None)
    syn = SynonymDict.parse("fast,quick")
    out = expand_tokens_df(toks_df, syn)
    rows = sorted(map(tuple, out.collect()))
    assert (0, "quick", 0, 0, 1) in rows
    assert (0, "fast", 0, 1, 1) in rows
    assert (1, "slow", 0, 1, 1) in rows


def test_expand_tokens_graph_invariants():
    """Property: pos_len >= 1 everywhere, pos_inc chain stays
    reconstructible, and the ORIGINAL word path always phrase-matches
    its own expanded stream (keepOrig identity mappings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    syn = SynonymDict.parse("new york,ny\na b,ab\nfast,quick")

    # NOTE 'ny' is excluded from the inputs: when an alternative has
    # MORE words than the matched surface (ny -> new york), the classic
    # (non-graph) SynonymFilter inserts positions and breaks
    # following-token adjacency — reference parity, pinned explicitly
    # in test_poslen_multiword_phrase_queries. For all non-inserting
    # expansions the original path must survive.
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from(
        ["a", "b", "c", "new", "york", "fast", "x"]), max_size=8))
    def run(words):
        out = expand_tokens([(w, 1) for w in words], syn)
        assert all(pl >= 1 for _, _, pl in out)
        assert all(pi in (0, 1) for _, pi, _ in out)
        if words:
            # the original surface path survives expansion
            assert phrase_match(out, words), (words, out)
            # no insertions -> position count preserved exactly
            assert sum(pi for _, pi, _ in out) == len(words)

    run()
