"""ES metric/bucket aggregations + field sort over the match set:
``stats``, ``histogram`` (min_doc_count=0 zero-fill semantics),
``cardinality`` (exact + HLL approx), and field ``sort``.

Truth anchors are public ES semantics:
- aggregations run over the query's LIVE matching docs (liveDocs);
- histogram buckets are floor(v/interval)*interval, and with the
  default min_doc_count=0 the empty buckets between the first and
  last occupied bucket are materialized;
- cardinality is HLL++-approximate in ES; the exact path here is the
  oracle-comparable twin and approx must land within a loose rsd;
- field sort breaks ties by shard doc order — here pinned to doc_id.

The oracle is brute-force recomputation from the engine's own
match_ids + docstats/docmap frames (each already hash-pinned against
DuckDB by the driver contract), so these tests pin the COMPOSITION.
"""

import pytest
from pyspark.sql import functions as F

from synspark.deletes import delete_docs
from synspark.index_store import build_index
from synspark.query import (cardinality_agg, histogram_agg, match_ids,
                            search_sorted, stats_agg, terms_agg)
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)
LANGS = ["en", "de", "ja", "fr"]


def _corpus(spark, n=180):
    rows = []
    for i in range(n):
        # vary dl strongly so histogram has gaps -> zero-fill matters
        body = "data sort " + ("merge key order " * (1 + (i * i) % 9))
        if i % 5 == 0:
            body = "key order only here"      # non-matching docs
        rows.append((f"r{i:03d}", "f", "c", LANGS[i % len(LANGS)], body))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def astore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("aggs")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=4, resume=False)


QUERY = "data sort"


def _truth(spark, astore):
    """(doc_id, dl, lang) rows of the live match set, brute-force."""
    ids = match_ids(spark, astore, QUERY, mode="and")
    j = (ids.join(astore.docstats(spark), "doc_id")
         .join(astore.docmap(spark).select("doc_id", "lang"), "doc_id"))
    return [(r.doc_id, r.dl, r.lang) for r in j.collect()]


def test_stats_agg(spark, astore):
    rows = _truth(spark, astore)
    dls = [dl for _, dl, _ in rows]
    got = stats_agg(spark, astore, "dl", QUERY, mode="and").collect()[0]
    assert got["count"] == len(dls)
    assert got["min"] == min(dls)
    assert got["max"] == max(dls)
    assert got["sum"] == sum(dls)
    assert got["avg"] == pytest.approx(sum(dls) / len(dls), abs=1e-6)


def test_histogram_zero_fill_and_min_doc_count(spark, astore):
    rows = _truth(spark, astore)
    interval = 10
    counts = {}
    for _, dl, _ in rows:
        k = (dl // interval) * interval
        counts[k] = counts.get(k, 0) + 1
    lo, hi = min(counts), max(counts)
    expect = [(k, counts.get(k, 0))
              for k in range(lo, hi + interval, interval)]
    got = [(r.key, r.doc_count) for r in
           histogram_agg(spark, astore, "dl", interval, QUERY,
                         mode="and").collect()]
    assert got == expect
    # the corpus's quadratic dl spread must actually produce a gap,
    # else the zero-fill assertion is vacuous
    assert any(c == 0 for _, c in got)
    got1 = [(r.key, r.doc_count) for r in
            histogram_agg(spark, astore, "dl", interval, QUERY,
                          mode="and", min_doc_count=1).collect()]
    assert got1 == [(k, c) for k, c in expect if c >= 1]


def test_cardinality_exact_and_approx(spark, astore):
    rows = _truth(spark, astore)
    exact = len({lang for *_, lang in rows})
    got = cardinality_agg(spark, astore, "lang", QUERY,
                          mode="and").collect()[0]["value"]
    assert got == exact
    approx = cardinality_agg(spark, astore, "lang", QUERY, mode="and",
                             exact=False).collect()[0]["value"]
    assert abs(approx - exact) <= max(1, exact // 2)


def test_search_sorted_directions_and_tiebreak(spark, astore):
    rows = _truth(spark, astore)
    expect = sorted(rows, key=lambda r: (-r[1], r[2], r[0]))[:7]
    got = [(r.doc_id, r.dl, r.lang) for r in
           search_sorted(spark, astore, [("dl", "desc"),
                                         ("lang", "asc")],
                         QUERY, mode="and", k=7).collect()]
    assert got == expect
    expect_asc = sorted(rows, key=lambda r: (r[1], r[0]))[:7]
    got_asc = [(r.doc_id, r.dl) for r in
               search_sorted(spark, astore, [("dl", "asc")], QUERY,
                             mode="and", k=7).collect()]
    assert got_asc == [(d, dl) for d, dl, _ in expect_asc]


def test_sorted_plan_is_take_ordered(spark, astore):
    """The sort path must be a distributed top-k (TakeOrdered), not a
    global sort-exchange."""
    df = search_sorted(spark, astore, [("dl", "desc")], QUERY, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_aggs_follow_live_docs(spark, tmp_path, astore):
    """ES aggregations count live docs only: delete one matching doc,
    stats count and terms buckets drop by exactly that doc."""
    root = str(tmp_path / "idx2")
    store = build_index(spark, _corpus(spark), root, cfg=CFG,
                        n_shards=4, resume=False)
    rows = _truth(spark, store)
    victim = rows[0]
    before = stats_agg(spark, store, "dl", QUERY).collect()[0]
    tb = {r[0]: r[1] for r in [(x.lang, x.doc_count) for x in
          terms_agg(spark, store, "lang", QUERY, size=10).collect()]}
    delete_docs(spark, store, doc_ids=[victim[0]])
    after = stats_agg(spark, store, "dl", QUERY).collect()[0]
    ta = {r[0]: r[1] for r in [(x.lang, x.doc_count) for x in
          terms_agg(spark, store, "lang", QUERY, size=10).collect()]}
    assert after["count"] == before["count"] - 1
    assert after["sum"] == before["sum"] - victim[1]
    assert ta[victim[2]] == tb[victim[2]] - 1


def test_unknown_field_raises(spark, astore):
    with pytest.raises(ValueError, match="unknown doc field"):
        stats_agg(spark, astore, "nope", QUERY)


def test_search_sorted_after_cursor_pages(spark, astore):
    """Sort-keyed search_after: concatenating cursor pages reproduces
    the full ordering exactly once, including ties crossed mid-page
    (dl repeats heavily in this corpus)."""
    from synspark.query import search_sorted
    sort = [("dl", "desc"), ("lang", "asc")]
    full = search_sorted(spark, astore, sort, QUERY, mode="and",
                         k=10 ** 6).collect()
    pages, after = [], None
    while True:
        p = search_sorted(spark, astore, sort, QUERY, mode="and",
                          k=7, after=after).collect()
        if not p:
            break
        pages += p
        after = (p[-1].dl, p[-1].lang, p[-1].doc_id)
    assert [(r.doc_id, r.dl, r.lang) for r in pages] == \
        [(r.doc_id, r.dl, r.lang) for r in full]
    with pytest.raises(ValueError):
        search_sorted(spark, astore, sort, QUERY, after=(1,))
