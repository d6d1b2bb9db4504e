"""Round-5 aggregation + search-as-you-type surfaces: ES
``percentiles`` (exact interpolated + sketch twin), ``range`` buckets
(from-inclusive / to-exclusive, empty ranges materialized),
``composite`` after-key pagination, and ``match_phrase_prefix``
(MultiPhrasePrefixQuery — last position prefix-expanded).

Oracle: brute-force recomputation from the engine's own match_ids /
docstats frames (hash-pinned against DuckDB by the driver contract)
plus raw-text regexes for phrase-prefix adjacency.
"""

import re

import numpy as np
import pytest

from synspark.index_store import build_index
from synspark.multiterm import (count_phrase_prefix,
                                search_phrase_prefix)
from synspark.query import (composite_agg, match_ids,
                            percentiles_agg, range_agg)
from synspark.tokenizer import TokenizerConfig

CFG = TokenizerConfig(n=2, expand=False, ignore_case=True)
LANGS = ["en", "de", "ja", "fr", "zh"]
QUERY = "data sort"


def _corpus(spark, n=180):
    rows = []
    for i in range(n):
        body = "data sort " + ("merge key order " * (1 + (i * i) % 9))
        if i % 5 == 0:
            body = "key of the order"        # phrase-prefix 'key o'
        if i % 7 == 0:
            body += " monkey order"          # substring 'key o...'
        rows.append((f"r{i:03d}", "f", "c", LANGS[i % len(LANGS)],
                     body))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")


@pytest.fixture(scope="module")
def pstore(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("aggs2")
    return build_index(spark, _corpus(spark), str(root / "idx"),
                       cfg=CFG, n_shards=4, resume=False)


def _match_dl(spark, pstore):
    ids = match_ids(spark, pstore, QUERY, mode="and")
    j = ids.join(pstore.docstats(spark), "doc_id")
    return np.array(sorted(r.dl for r in j.collect()), dtype="float64")


def test_percentiles_exact(spark, pstore):
    dls = _match_dl(spark, pstore)
    row = percentiles_agg(spark, pstore, "dl",
                          (25.0, 50.0, 75.0, 99.0), QUERY,
                          mode="and").collect()[0]
    for p in (25.0, 50.0, 75.0, 99.0):
        want = round(float(np.percentile(dls, p,
                                         method="linear")), 6)
        assert getattr(row, f"p{int(p)}") == pytest.approx(want,
                                                           abs=1e-6)


def test_percentiles_approx_within_bounds(spark, pstore):
    dls = _match_dl(spark, pstore)
    row = percentiles_agg(spark, pstore, "dl", (50.0,), QUERY,
                          mode="and", exact=False).collect()[0]
    # sketch result must be an actual value near the true median
    assert dls.min() <= row.p50 <= dls.max()
    assert abs(row.p50 - np.median(dls)) <= (dls.max() - dls.min())


def test_range_agg_buckets(spark, pstore):
    dls = _match_dl(spark, pstore)
    ranges = [(None, 60.0), (60.0, 90.0), (90.0, None),
              (1000.0, 2000.0)]            # last one empty
    rows = range_agg(spark, pstore, "dl", ranges, QUERY,
                     mode="and").collect()
    assert [r.key for r in rows] == ["*-60", "60-90", "90-*",
                                     "1000-2000"]
    want = [int(((dls >= (lo or -np.inf)) & (dls < (hi or np.inf)))
               .sum()) for lo, hi in
            [(None, 60), (60, 90), (90, None), (1000, 2000)]]
    assert [r.doc_count for r in rows] == want
    assert rows[-1].doc_count == 0        # empty range materializes


def test_range_agg_overlap_and_errors(spark, pstore):
    dls = _match_dl(spark, pstore)
    rows = range_agg(spark, pstore, "dl",
                     [(None, None), (0.0, 10_000.0)], QUERY,
                     mode="and").collect()
    # overlapping ranges each count the doc (ES semantics)
    assert rows[0].doc_count == rows[1].doc_count == len(dls)
    with pytest.raises(ValueError):
        range_agg(spark, pstore, "dl", [], QUERY)


def test_composite_pagination_covers_all(spark, pstore):
    ids = match_ids(spark, pstore, QUERY, mode="and")
    truth = (ids.join(pstore.docmap(spark).select("doc_id", "lang"),
                      "doc_id").groupBy("lang").count().collect())
    want = sorted((r.lang, r["count"]) for r in truth)
    got, after = [], None
    for _ in range(10):
        page = composite_agg(spark, pstore, "lang", size=2,
                             after=after, text=QUERY,
                             mode="and").collect()
        if not page:
            break
        got += [(r.lang, r.doc_count) for r in page]
        after = page[-1].lang
    assert got == want                     # key-ordered, complete
    # after-key is strict: the cursor bucket never reappears
    assert len(got) == len({k for k, _ in got})


def test_phrase_prefix_matches_regex(spark, pstore):
    corpus = {r[0]: r[4] for r in
              _corpus(spark).collect()}
    dm = {r.repo: r.doc_id for r in
          pstore.docmap(spark).collect()}
    pat = re.compile(r"key[ \t\n\r　]+o")
    want = {dm[k] for k, t in corpus.items() if pat.search(t)}
    assert want
    n = count_phrase_prefix(spark, pstore, "key o",
                            max_expansions=None).collect()[0].hits
    assert n == len(want)
    hits = search_phrase_prefix(spark, pstore, "key o", k=500,
                                max_expansions=None).collect()
    assert {r.doc_id for r in hits} == want
    # scores strictly positive and sorted
    ss = [r.score for r in hits]
    assert all(s > 0 for s in ss) and ss == sorted(ss, reverse=True)


def test_phrase_prefix_empty_expansion(spark, pstore):
    assert count_phrase_prefix(spark, pstore, "key zq",
                               max_expansions=None) \
        .collect()[0].hits == 0
    assert search_phrase_prefix(spark, pstore, "key zq").count() == 0


def test_phrase_prefix_cap_is_subset(spark, pstore):
    full = {r.doc_id for r in
            search_phrase_prefix(spark, pstore, "key o", k=500,
                                 max_expansions=None).collect()}
    capped = {r.doc_id for r in
              search_phrase_prefix(spark, pstore, "key o", k=500,
                                   max_expansions=2).collect()}
    assert capped <= full


def test_terms_stats_subagg(spark, pstore):
    """ES sub-aggregation: per-lang buckets with dl stats — pinned
    against brute-force recomputation from the engine's own frames."""
    from synspark.query import terms_stats_agg
    ids = match_ids(spark, pstore, QUERY, mode="and")
    j = (ids.join(pstore.docstats(spark), "doc_id")
         .join(pstore.docmap(spark).select("doc_id", "lang"),
               "doc_id"))
    rows = [(r.lang, r.dl) for r in j.collect()]
    want = {}
    for lang, dl in rows:
        b = want.setdefault(lang, [])
        b.append(dl)
    got = terms_stats_agg(spark, pstore, "lang", "dl", QUERY,
                          mode="and").collect()
    assert len(got) == len(want)
    order = [(-(len(v)), k) for k, v in want.items()]
    assert [r.key for r in got] == [k for _n, k in sorted(order)]
    for r in got:
        v = want[r.key]
        assert (r.doc_count, r.min, r.max, r.sum) == \
            (len(v), min(v), max(v), sum(v))
        assert r.avg == pytest.approx(round(sum(v) / len(v), 6),
                                      abs=1e-6)


def test_percentile_names_integers(spark, pstore):
    row = percentiles_agg(spark, pstore, "dl", (10, 50, 100, 99.9),
                          QUERY, mode="and").collect()[0]
    assert set(row.asDict()) == {"p10", "p50", "p100", "p99_9"}
    with pytest.raises(ValueError):
        percentiles_agg(spark, pstore, "dl", (5, 5.0), QUERY)
