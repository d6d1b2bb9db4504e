"""Lucene span_near (two clauses): ordered/unordered proximity over
index positions, on both the word-level index (positions = word
positions, the ES-user mental model) and the n-gram index (clauses
are gram RUNS — substring proximity).

Truth anchors: public Lucene NearSpansOrdered (in-order,
non-overlapping, totalGap ≤ slop) and NearSpansUnordered
(maxEnd − minStart − Σlen ≤ slop, overlaps admitted). Oracle:
brute-force position algebra over the tokenizer's own output.
"""

import pytest

from synspark.index_store import build_index
from synspark.query import plan_span, span_near_count, span_near_ids
from synspark.tokenizer import TokenizerConfig, tokenize

WCFG = TokenizerConfig(n=1 << 20, expand=False, ignore_case=True)
GCFG = TokenizerConfig(n=2, expand=False, ignore_case=True)

TEXTS = [
    "key order data", "order key data", "key a order",
    "key a b c order", "order a b key", "key a b c d order",
    "data sort", "keyboard disorder", "key key order order",
    "order", "key", "key xx yy order zz key order",
]


def _corpus(spark):
    rows = [(f"r{i:02d}", "f", "c", "en", t)
            for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def spans(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("spans")
    w = build_index(spark, _corpus(spark), str(root / "w"),
                    cfg=WCFG, n_shards=3, resume=False)
    g = build_index(spark, _corpus(spark), str(root / "g"),
                    cfg=GCFG, n_shards=3, resume=False)
    wmap = {r.doc_id: int(r.repo[1:]) for r in
            w.docmap(spark).collect()}
    gmap = {r.doc_id: int(r.repo[1:]) for r in
            g.docmap(spark).collect()}
    return w, g, wmap, gmap


def _positions(text, cfg):
    pos, out = -1, []
    for w, _s, _e, pi in tokenize(text, cfg, None):
        pos += pi
        out.append((w, pos))
    return out


def _run_starts(text, run, cfg):
    toks = _positions(text, cfg)
    bypos = {}
    for w, p in toks:
        bypos.setdefault(p, set()).add(w)
    mx = max((p for _w, p in toks), default=-1)
    return [s for s in range(mx + 1)
            if all(run[i] in bypos.get(s + i, set())
                   for i in range(len(run)))]


def _truth(idmap, q0, q1, slop, in_order, cfg):
    g0 = [w for w, _ in _positions(q0, cfg)]
    g1 = [w for w, _ in _positions(q1, cfg)]
    L0, L1 = len(g0), len(g1)
    out = set()
    for d, ti in idmap.items():
        t = TEXTS[ti]
        for a in _run_starts(t, g0, cfg):
            for b in _run_starts(t, g1, cfg):
                delta = b - a
                if (L0 <= delta <= L0 + slop) if in_order else \
                        (-(L1 + slop) <= delta <= L0 + slop):
                    out.add(d)
    return out


CASES = [(0, True), (1, True), (3, True), (0, False), (2, False),
         (5, False)]


@pytest.mark.parametrize("slop,in_order", CASES)
def test_word_index_spans(spark, spans, slop, in_order):
    w, _g, wmap, _gmap = spans
    got = {r.doc_id for r in
           span_near_ids(spark, w, "key", "order", slop,
                         in_order).collect()}
    want = _truth(wmap, "key", "order", slop, in_order, WCFG)
    assert got == want
    assert span_near_count(spark, w, "key", "order", slop,
                           in_order).collect()[0].hits == len(want)


@pytest.mark.parametrize("slop,in_order", CASES)
def test_gram_index_spans(spark, spans, slop, in_order):
    _w, g, _wmap, gmap = spans
    got = {r.doc_id for r in
           span_near_ids(spark, g, "key", "order", slop,
                         in_order).collect()}
    assert got == _truth(gmap, "key", "order", slop, in_order, GCFG)


def test_gram_spans_are_substring_proximity(spark, spans):
    """'keyboard disorder': the 'key' gram run starts at 0, the
    'order' run at gram position 10 (inside 'disorder'), so the
    ordered gap is 10 − 2 = 8 — found at slop ≥ 8, not below.
    Substring proximity is exactly what the n-gram analyzer is FOR."""
    _w, g, _wmap, gmap = spans
    kb = {d for d, ti in gmap.items() if TEXTS[ti] == "keyboard disorder"}
    lo = {r.doc_id for r in
          span_near_ids(spark, g, "key", "order", 7, True).collect()}
    hi = {r.doc_id for r in
          span_near_ids(spark, g, "key", "order", 8, True).collect()}
    assert not (kb & lo) and kb <= hi


def test_span_plan_errors(spark, spans):
    w, _g, _wm, _gm = spans
    with pytest.raises(ValueError):
        plan_span(spark, w, "", "order")
    with pytest.raises(ValueError):
        plan_span(spark, w, "key", "order", slop=-1)


def test_span_doc_where(spark, tmp_path_factory):
    spark_rows = [(f"r{i}", "f", "c", "en" if i % 2 == 0 else "ja",
                   "key a order") for i in range(8)]
    corpus = spark.createDataFrame(
        spark_rows, "repo string, path string, commit string, "
                    "lang string, content string")
    root = tmp_path_factory.mktemp("spandw")
    st = build_index(spark, corpus, str(root / "w"), cfg=WCFG,
                     n_shards=2, resume=False)
    n = span_near_count(spark, st, "key", "order", 1, True,
                        doc_where="lang = 'en'").collect()[0].hits
    assert n == 4
