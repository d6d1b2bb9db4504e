"""Tier-1 golden parity: every assertTokenStream fixture from the
reference test suite (NGramSynonymTokenizerTest.java:226-1354),
token-for-token in the reference's own 'term,start,end,posInc'
'/'-encoding. Extracted by tools/extract_golden.py."""

import json
from pathlib import Path

import pytest

from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig, blocks, tokenize_to_string

CASES = json.loads((Path(__file__).parent / "golden_tokens.json").read_text("utf-8"))


@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_golden_token_stream(case):
    # test analyzer: ignoreCase=True, dict parsed with expand=True +
    # lowercase (NGramSynonymTokenizerTest.java:1437-1468); '/' in the
    # rules string = newline
    syn = None
    if case["synonyms"] is not None:
        syn = SynonymDict.parse(case["synonyms"].replace("/", "\n"),
                                expand=True, ignore_case=True)
    cfg = TokenizerConfig(n=case["n"], expand=case["expand"], ignore_case=True)
    got = tokenize_to_string(case["text"], cfg, syn)
    # reference assertTokenStream checks only as many attributes as the
    # expected token provides (term[,start[,end[,posInc]]]) — mirror that
    got_toks = got.split("/") if got else []
    exp_toks = case["expected"].split("/")
    assert len(got_toks) == len(exp_toks), f"{case['id']}: {got} != {case['expected']}"
    for g, e in zip(got_toks, exp_toks):
        g_attrs, e_attrs = g.split(","), e.split(",")
        assert g_attrs[: len(e_attrs)] == e_attrs, \
            f"{case['id']}: {got} != {case['expected']}"


# block segmentation fixtures (NGramSynonymTokenizerTest.java:41-56)
BLOCK_CASES = [
    ("あいうえお", [0], ["あいうえお"]),
    ("あいうえお ", [0], ["あいうえお"]),
    ("あいうえお かきくけこ", [0, 6], ["あいうえお", "かきくけこ"]),
    ("あいうえお \tかきくけこ", [0, 7], ["あいうえお", "かきくけこ"]),
    ("あいうえお \t　かきくけこ さしすせそ", [0, 8, 14],
     ["あいうえお", "かきくけこ", "さしすせそ"]),
]


@pytest.mark.parametrize("text,starts,blks", BLOCK_CASES)
def test_block_segmentation(text, starts, blks):
    got = list(blocks(text))
    assert [s for s, _ in got] == starts
    assert [b for _, b in got] == blks


def test_block_segmentation_long():
    # buffer-boundary analogues (:59-106); our impl has no 4096 buffer
    # but must still split identically around those lengths
    for size in (4094, 4095, 4096, 4097, 4098):
        src = "a" * size + " " + "b" * 10
        got = list(blocks(src))
        assert got == [(0, "a" * size), (size + 1, "b" * 10)]
    src = "a" * 4098 + "\n\r" + "b" * 10
    assert list(blocks(src)) == [(0, "a" * 4098), (4100, "b" * 10)]


def test_empty_and_delimiter_only():
    assert list(blocks("")) == []
    assert list(blocks(" \t\n\r　")) == []


def test_dict_fingerprint_stable():
    d1 = SynonymDict.parse("a,aa\nb,bb")
    d2 = SynonymDict.parse("a,aa\nb,bb")
    assert d1.fingerprint() == d2.fingerprint()
    d3 = SynonymDict.parse("a,aa\nb,bbb")
    assert d1.fingerprint() != d3.fingerprint()


def test_empty_dict_is_none():
    assert SynonymDict.parse("") is None
    assert SynonymDict.parse("# comment only\n\n") is None
    assert SynonymDict.parse(None) is None


def test_explicit_mapping_rule():
    # 'lhs => rhs': each lhs term maps to rhs list only
    d = SynonymDict.parse("a => b,c")
    assert d.mapping["a"] == ["b", "c"]
    assert "b" not in d.mapping


def test_parser_contract_mode():
    # parser expand=False: group contracts to its first term
    d = SynonymDict.parse("a,aa,aaa", expand=False)
    assert d.mapping["aaa"] == ["a"]


def test_utf16_offsets_non_bmp():
    """offsets="utf16" counts UTF-16 units like the Java reference
    (NGramSynonymTokenizer.java:297-300 reads a char[]); 𩸽 (U+29E3D)
    is a surrogate pair = 2 units. Token content stays code-point
    windowed (no split pairs) in both modes."""
    from synspark.tokenizer import TokenizerConfig, tokenize
    text = "𩸽の刺身"
    cp = tokenize(text, TokenizerConfig(n=2, expand=False))
    assert cp == [("𩸽の", 0, 2, 1), ("の刺", 1, 3, 1), ("刺身", 2, 4, 1)]
    u16 = tokenize(text, TokenizerConfig(n=2, expand=False,
                                         offsets="utf16"))
    assert u16 == [("𩸽の", 0, 3, 1), ("の刺", 2, 4, 1), ("刺身", 3, 5, 1)]
    # BMP text: the two modes are identical (the documented parity)
    bmp = "東京タワー"
    assert tokenize(bmp, TokenizerConfig(n=2)) == \
        tokenize(bmp, TokenizerConfig(n=2, offsets="utf16"))
    # config validation
    import pytest
    with pytest.raises(ValueError):
        TokenizerConfig(offsets="bogus")
