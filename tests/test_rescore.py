"""ES ``rescore`` (query rescorer): the primary query's top-window
re-ranked by a combined primary/secondary score.

Truth anchors (public ES semantics):
- score_mode total/multiply/avg/max/min with query_weight and
  rescore_query_weight factors;
- window docs that don't match the rescore query keep their weighted
  primary score (the secondary is only combined when it matched);
- docs outside the window are never returned, however well they'd
  score on the rescore query.

Oracle: brute-force combination of search() and score_naive() —
each independently pinned elsewhere.
"""

import pytest

from synspark.index_store import build_index
from synspark.query import rescore, score_naive, search
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)
PRIMARY = "data sort"
SECONDARY = "key order"


def _corpus(spark, n=200):
    words = ["data", "sort", "merge", "key", "order", "scan"]
    rows = []
    for i in range(n):
        ws = []
        for j, w in enumerate(words):
            ws += [w] * ((i >> j) & 3)
        ws = ws or ["data", "sort"]
        rows.append((f"r{i:03d}", "f", "c", "t", " ".join(ws)))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def rstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("rescore")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=3, resume=False)


def _expected(spark, rstore, window_size, qw, rqw, combine):
    prim = {r.doc_id: r.score for r in
            search(spark, rstore, PRIMARY, k=window_size,
                   mode="and").collect()}
    sec = {r.doc_id: r.score for r in
           score_naive(spark, rstore, SECONDARY, k=10**6,
                       mode="or").collect()}
    out = []
    for d, p in prim.items():
        if d in sec:
            out.append((d, combine(qw * p, rqw * sec[d])))
        else:
            out.append((d, qw * p))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("score_mode,combine", [
    ("total", lambda p, s: p + s),
    ("multiply", lambda p, s: p * s),
    ("avg", lambda p, s: (p + s) / 2.0),
    ("max", max),
    ("min", min),
])
def test_rescore_score_modes(spark, rstore, score_mode, combine):
    got = [(r.doc_id, round(r.score, 9)) for r in
           rescore(spark, rstore, PRIMARY, SECONDARY, k=40,
                   window_size=40, query_weight=0.7,
                   rescore_query_weight=2.0,
                   score_mode=score_mode).collect()]
    expect = [(d, round(s, 9)) for d, s in
              _expected(spark, rstore, 40, 0.7, 2.0, combine)][:40]
    assert got == expect


def test_window_bounds_results(spark, rstore):
    """A doc outside the primary window never appears, and shrinking
    the window can only shrink the result id set."""
    wide = {r.doc_id for r in
            rescore(spark, rstore, PRIMARY, SECONDARY, k=30,
                    window_size=30).collect()}
    narrow = {r.doc_id for r in
              rescore(spark, rstore, PRIMARY, SECONDARY, k=30,
                      window_size=10).collect()}
    win10 = {r.doc_id for r in
             search(spark, rstore, PRIMARY, k=10, mode="and").collect()}
    assert narrow == win10
    assert narrow <= wide


def test_unmatched_window_docs_keep_primary(spark, rstore):
    """With a secondary query matching nothing, every mode returns the
    weighted primary ranking unchanged."""
    prim = [(r.doc_id, round(0.5 * r.score, 9)) for r in
            search(spark, rstore, PRIMARY, k=20, mode="and").collect()]
    for sm in ("total", "multiply", "max"):
        got = [(r.doc_id, round(r.score, 9)) for r in
               rescore(spark, rstore, PRIMARY, "zz", k=20,
                       window_size=20, query_weight=0.5,
                       score_mode=sm).collect()]
        assert got == sorted(prim, key=lambda x: (-x[1], x[0]))


def test_bad_score_mode(spark, rstore):
    with pytest.raises(ValueError, match="score_mode"):
        rescore(spark, rstore, PRIMARY, SECONDARY, score_mode="nope")
