"""ES ``match_phrase`` slop over a word-level index (whole-block
tokens, n larger than any block = whitespace tokenizer).

Truth anchor: Lucene SloppyPhraseScorer move-distance semantics for a
two-position phrase — occurrences (p0, p1) match iff
|(p1 − p0) − 1| ≤ slop, so a one-word gap costs 1 and transposed
adjacent terms cost 2 (the ES-documented transposition behavior).
The oracle is brute-force position matching in Python.
"""

import pytest

from synspark.deletes import delete_docs
from synspark.index_store import build_index
from synspark.query import count_matches, match_ids
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=1 << 20, expand=False)
A, B = "key", "order"
FILLER = ["data", "sort", "merge", "row", "scan"]


def _texts(n=120):
    out = []
    for i in range(n):
        ws = [FILLER[(i + j) % len(FILLER)] for j in range(i % 7)]
        ws.insert(i % (len(ws) + 1), A)
        ws.insert((i * 3) % (len(ws) + 1), B)
        if i % 4 == 0:
            ws.append(A)
        if i % 9 == 0:
            ws = [w for w in ws if w != B]   # some docs without B
        out.append(" ".join(ws))
    return out


def _corpus(spark):
    return spark.createDataFrame(
        [(f"r{i:03d}", "f", "c", "t", t)
         for i, t in enumerate(_texts())],
        "repo string, path string, commit string, lang string, "
        "content string")


@pytest.fixture(scope="module")
def sstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("slop")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=3, resume=False)


def _brute_hits(slop):
    hits = 0
    for t in _texts():
        ws = t.split()
        pa = [i for i, w in enumerate(ws) if w == A]
        pb = [i for i, w in enumerate(ws) if w == B]
        if any(abs((q - p) - 1) <= slop for p in pa for q in pb):
            hits += 1
    return hits


@pytest.mark.parametrize("slop", [1, 2, 3, 5])
def test_slop_count_matches_brute_force(spark, sstore, slop):
    got = count_matches(spark, sstore, f"{A} {B}", phrase=True,
                        slop=slop).collect()[0]["hits"]
    assert got == _brute_hits(slop)
    assert match_ids(spark, sstore, f"{A} {B}", phrase=True,
                     slop=slop).count() == got


def test_slop_zero_equals_exact_phrase(spark, sstore):
    exact = count_matches(spark, sstore, f"{A} {B}",
                          phrase=True).collect()[0]["hits"]
    assert exact == _brute_hits(0)


def test_slop_monotone_and_transposition(spark, tmp_path):
    rows = [("a", "f", "c", "t", f"{A} {B}"),
            ("b", "f", "c", "t", f"{B} {A}"),
            ("c", "f", "c", "t", f"{A} x {B}")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    store = build_index(spark, df, str(tmp_path / "idx"), cfg=CFG,
                        n_shards=1, resume=False)

    def cnt(s):
        return count_matches(spark, store, f"{A} {B}", phrase=True,
                             slop=s).collect()[0]["hits"]

    assert cnt(0) == 1            # only the adjacent doc
    assert cnt(1) == 2            # + one-word gap
    assert cnt(2) == 3            # + transposition (costs exactly 2)


def test_slop_follows_live_docs(spark, tmp_path):
    rows = [("a", "f", "c", "t", f"{A} x {B}"),
            ("b", "f", "c", "t", f"{A} {B}")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    store = build_index(spark, df, str(tmp_path / "idx"), cfg=CFG,
                        n_shards=1, resume=False)
    assert count_matches(spark, store, f"{A} {B}", phrase=True,
                         slop=1).collect()[0]["hits"] == 2
    victim = match_ids(spark, store, A, mode="and").collect()[0].doc_id
    delete_docs(spark, store, doc_ids=[int(victim)])
    assert count_matches(spark, store, f"{A} {B}", phrase=True,
                         slop=1).collect()[0]["hits"] == 1


def test_slop_validation(spark, sstore):
    with pytest.raises(ValueError, match="requires phrase"):
        count_matches(spark, sstore, f"{A} {B}", slop=1)
    with pytest.raises(ValueError, match="two-position"):
        count_matches(spark, sstore, f"{A} {B} data", phrase=True,
                      slop=1)
    with pytest.raises(ValueError, match=">= 0"):
        count_matches(spark, sstore, f"{A} {B}", phrase=True, slop=-1)
