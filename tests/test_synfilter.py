"""Token-level synonym filter (SURVEY §2.3) + WordNet dict format."""

import pytest

from synspark.synonyms import SynonymDict
from synspark.synfilter import expand_tokens, expand_tokens_df

pytestmark = pytest.mark.spark


def toks(*words):
    return [(w, 1) for w in words]


def test_single_token_expand():
    syn = SynonymDict.parse("fast,quick,speedy")
    out = expand_tokens(toks("a", "fast", "car"), syn)
    assert out == [("a", 1), ("fast", 1), ("quick", 0), ("speedy", 0),
                   ("car", 1)]


def test_multi_token_match():
    syn = SynonymDict.parse("wi fi,wifi,wireless")
    out = expand_tokens(toks("my", "wi", "fi", "router"), syn)
    # originals kept, alternatives stacked at match start
    assert out == [("my", 1), ("wi", 1), ("fi", 1), ("wifi", 0),
                   ("wireless", 0), ("router", 1)]


def test_multi_word_output():
    # '=>' rules REPLACE the original (keepOrig=false in Lucene terms)
    syn = SynonymDict.parse("usa => united states of america")
    out = expand_tokens(toks("visit", "usa", "now"), syn)
    assert out == [("visit", 1),
                   ("united", 1), ("states", 1), ("of", 1), ("america", 1),
                   ("now", 1)]


def test_earliest_longest_priority():
    syn = SynonymDict.parse("a b,ab\nb c,bc")
    out = expand_tokens(toks("a", "b", "c"), syn)
    # 'a b' matches first (earliest), consuming b; 'b c' can't match
    assert out == [("a", 1), ("b", 1), ("ab", 0), ("c", 1)]


def test_ignore_case_filter():
    syn = SynonymDict.parse("fast,quick")
    out = expand_tokens(toks("FAST"), syn, ignore_case=True)
    assert out == [("FAST", 1), ("quick", 0)]


def test_contract_mode_replaces():
    # parser expand=False: a,b,c -> every term maps to [a] only
    syn = SynonymDict.parse("fast,quick", expand=False)
    out = expand_tokens(toks("quick"), syn)
    assert out == [("fast", 1)]


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
    assert (0, "quick", 0, 0) in rows
    assert (0, "fast", 0, 1) in rows
    assert (1, "slow", 0, 1) in rows
