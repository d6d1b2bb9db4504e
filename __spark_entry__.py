"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from
SURVEY.md §2 over the driver's parquet tables; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for EVERY query — including the approximate
IVF path, whose seeded-hyperplane bucketing is deterministic enough to
mirror exactly (WAND internals are additionally oracled by the naive
scorer in pytest).

Engine queries build a bigram index (n=2, expand=false, no dict — the
SQL-mirrorable configuration) over the ``documents`` table, cached
under /tmp keyed by sf_dir (build_index is resumable/idempotent, so
repeat calls are cheap). Synonym-mode coverage is exercised by its own
query + the pytest golden suite.
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
from collections.abc import Callable
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------

BM25_QUERY = "data sort merge"
PHRASE = "key order"
RESCORE_QUERY = "key order"
K1, B = 1.2, 0.75


def _ensure_shipped(spark: SparkSession) -> None:
    """Make synspark importable on executors regardless of the driver's
    cwd (spark-submit --py-files equivalent)."""
    try:
        from synspark.session import package_zip
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table, spread across the cluster: the sf tables are
    single small parquet files (one input split), which would run every
    downstream operator on ONE core — a 100 TB deployment gets its
    parallelism from file count, the sandbox gets it from an explicit
    cheap repartition of the sub-MB input."""
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return df.repartition(spark.sparkContext.defaultParallelism)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return df.repartition(spark.sparkContext.defaultParallelism)


def _index(spark: SparkSession, sf_dir: str):
    """Bigram index over documents(text), cached per sf_dir."""
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|bigram-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return build_index(
        spark, corpus, str(out),
        cfg=TokenizerConfig(n=2, expand=False, ignore_case=True), syn=None,
        n_shards=4, source=f"{sf_dir}/documents.parquet", resume=True)


def _query_bigrams(text: str) -> list[str]:
    from synspark.tokenizer import TokenizerConfig, tokenize
    return [w for w, *_ in
            tokenize(text, TokenizerConfig(n=2, expand=False), None)]


def _rounded_topk(df: DataFrame, k: int = 10) -> DataFrame:
    """Order by ROUNDED score then doc_id so cross-engine ULP noise
    can't flip ranks at the k boundary."""
    return (df.withColumn("score_r", F.round("score", 6))
            .orderBy(F.desc("score_r"), F.asc("doc_id"))
            .limit(k).select("doc_id", "score_r"))


# ---------------------------------------------------------------------
# entry — flagship
# ---------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the bigram index over sf0.001 documents, answer
    a BM25 top-10 via shard-parallel block-max WAND."""
    from synspark.query import search
    store = _index(spark, DEFAULT_SF)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 10)


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------

def q_fts_term_stats(spark, sf_dir):
    store = _index(spark, sf_dir)
    return (store.termstats(spark)
            .orderBy(F.desc("df"), F.asc("term")).limit(100)
            .select("term", "df", "cf"))


def q_fts_doc_lengths(spark, sf_dir):
    store = _index(spark, sf_dir)
    return store.docstats(spark).select("doc_id", "dl")


def q_fts_bm25_topk(spark, sf_dir):
    from synspark.query import score_naive
    store = _index(spark, sf_dir)
    # k=200 like the WAND twin: a huge k here would land k rows on the
    # driver through TakeOrdered at bigger sf for no benefit
    return _rounded_topk(
        score_naive(spark, store, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_wand_topk(spark, sf_dir):
    from synspark.query import search
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_wand_or_topk(spark, sf_dir):
    """Disjunctive (mode=or) ranked BM25 top-k via WAND — the classic
    WAND setting (AND-mode is the reference fixtures' shape; OR-mode
    was previously only count-covered)."""
    from synspark.query import search
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="or"), 10)


def q_fts_fetch_sources(spark, sf_dir):
    """ES response hydration (fetch_sources): top hits joined to the
    docmap for document keys + content sha — the reference's search
    responses carry _source fields (SynonymPluginTest.java:163-168)."""
    from synspark.query import fetch_sources, search
    store = _index(spark, sf_dir)
    hits = _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 5) \
        .withColumnRenamed("score_r", "score")
    return fetch_sources(spark, store, hits).select(
        "doc_id", "lang", "content_sha256",
        F.col("score").alias("score_r"))


def q_fts_explain_score(spark, sf_dir):
    """The ES `_explain` surface: per-group BM25 breakdown for the
    top-1 document; rows sum to the search score (ordered fold)."""
    from synspark.query import explain_score, search
    store = _index(spark, sf_dir)
    top = _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 1).collect()
    did = int(top[0]["doc_id"])
    out = explain_score(spark, store, BM25_QUERY, did)
    return out.select("gid", "terms", "tf", "dl",
                      F.round("idf", 6).alias("idf_r"),
                      F.round("gscore", 6).alias("gscore_r"))


def q_fts_highlight(spark, sf_dir):
    """ES plain-highlighter surface: character-offset spans of the
    query's terms in the top-3 hits (re-analysis of the stored field,
    ≤10 spans per doc in offset order)."""
    from synspark.query import highlight, search
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    top3 = _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 3) \
        .withColumnRenamed("score_r", "score")
    return highlight(spark, store, top3, corpus, BM25_QUERY) \
        .select("doc_id", "start", "end", "term")


def q_fts_compact_topk(spark, sf_dir):
    """BM25 top-k over a COMPACTED copy of the bigram index
    (compact_index merges the doc-range shards by pure relabeling — no
    postings re-encode), hash-identical to fts_wand_topk by the
    relabeling-identity claim; shares its oracle."""
    from synspark.index_store import FORMAT_VERSION, compact_index
    from synspark.query import search
    store = _index(spark, sf_dir)
    key = hashlib.md5(
        f"{sf_dir}|compact-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    if not (out / "meta.json").exists():
        per = max(1, store.meta().n_docs // 2)  # 4 shards -> 2
        compact_index(spark, store, str(out), docs_per_shard=per)
    from synspark.index_store import IndexStore
    dst = IndexStore(str(out))
    return _rounded_topk(
        search(spark, dst, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_phrase_hits(spark, sf_dir):
    """Distributed phrase hit count: per-shard adjacency verification +
    one sum — no candidate set ever reaches the driver."""
    from synspark.query import count_matches
    store = _index(spark, sf_dir)
    return count_matches(spark, store, PHRASE, mode="and", phrase=True)


def q_fts_count_and(spark, sf_dir):
    """Boolean AND hit count — distributed per-shard set intersection."""
    from synspark.query import count_matches
    store = _index(spark, sf_dir)
    return count_matches(spark, store, BM25_QUERY, mode="and")


def q_fts_count_or(spark, sf_dir):
    """Boolean OR hit count — distributed per-shard set union."""
    from synspark.query import count_matches
    store = _index(spark, sf_dir)
    return count_matches(spark, store, BM25_QUERY, mode="or")


def _syn_index(spark, sf_dir):
    """Synonym-expanded bigram index (dict data,info / sort,order,
    expand=true, n=2) over documents, cached per sf_dir."""
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|syn-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    syn = SynonymDict.parse("data,info\nsort,order")
    store = build_index(spark, corpus, str(out),
                        cfg=TokenizerConfig(n=2, expand=True), syn=syn,
                        n_shards=4, source=f"{sf_dir}:syn", resume=True)
    return store, syn


def q_fts_synonym_bm25(spark, sf_dir):
    """Synonym-expanded BM25 (dict data,info / sort,order, expand=true,
    n=2) — fully oracle-checked: with this dict the expanded index is
    SQL-expressible. Each dict match emits the surface + the stacked
    alternative at one position, so tf(data)=tf(info)=matches(data|info)
    (group tf = 2×matches, df identical across the group), boundary
    partials never change position counts (dl per block = matches +
    Σ max(1, seg_len-1)), verified against the tokenizer by probe."""
    from synspark.query import search
    store, syn = _syn_index(spark, sf_dir)
    return _rounded_topk(
        search(spark, store, "info sort", k=200, mode="and", syn=syn), 10)


def q_fts_asym_count(spark, sf_dir):
    """LUCENE-5252's documented asymmetric deployment as a contract
    row: index analyzer expand=true, QUERY analyzer expand=false — the
    query emits only the surface anchors (info, sort: no stacking, no
    partials), which match the index-side stacked tokens. Hit count =
    docs containing (data|info) AND (sort|order)."""
    from synspark.query import count_matches
    from synspark.tokenizer import TokenizerConfig
    store, syn = _syn_index(spark, sf_dir)
    qcfg = TokenizerConfig(n=2, expand=False, ignore_case=True)
    return count_matches(spark, store, "info sort", mode="and",
                         syn=syn, cfg=qcfg)


def q_fts_analyze(spark, sf_dir):
    """_analyze debug API (E12): token stream for a fixture string.
    Deterministic constant output — oracle inlines the expected rows."""
    from synspark.query import analyze_df
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig
    syn = SynonymDict.parse("あ,かき")
    return analyze_df(spark, "かきいうえお",
                      TokenizerConfig(n=2, expand=True), syn)


def _word_tokens(spark, sf_dir):
    """Whitespace WORD tokens of the documents table as a tokens
    DataFrame (doc_id, term, pos, pos_inc): the n-gram tokenizer with n
    larger than any block emits each delimiter-separated run as one
    whole-span token — i.e. a whitespace tokenizer, which is what the
    reference's SynonymFilter factory defaults to for its input
    (SynonymTokenFilterFactory.java:45-52)."""
    from synspark.indexer import tokenize_corpus
    from synspark.tokenizer import TokenizerConfig
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return tokenize_corpus(docs, TokenizerConfig(n=1 << 20, expand=False),
                           None)


def _word_index(spark, sf_dir):
    """Plain WORD-level index (whole-block tokens — the whitespace
    tokenizer shape) over documents, cached per sf_dir. Token
    positions are word positions, which is what ES match_phrase slop
    is defined over."""
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|word-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return build_index(
        spark, corpus, str(out),
        cfg=TokenizerConfig(n=1 << 20, expand=False), syn=None,
        n_shards=4, source=f"{sf_dir}:word", resume=True)


def _filter_index(spark, sf_dir):
    """Filter-COMPOSED analyzer index (word tokenizer + synonym token
    filter with the multi-word rule 'key order,ko') over documents,
    cached per sf_dir. The rule's single-token alternative ``ko``
    spans 2 positions in the index (pl_bytes posLength — v6), per
    SynonymFilter.java:472-526."""
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.synfilter import synonym_token_filter
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|graph-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    syn_f = SynonymDict.parse("key order,ko")
    filt = synonym_token_filter(syn_f, entry_tokenizer=str.split)
    # n larger than any block => whole-word tokens (the SynonymFilter
    # factory's default whitespace input)
    store = build_index(spark, corpus, str(out),
                        cfg=TokenizerConfig(n=1 << 20, expand=False),
                        syn=None, n_shards=4,
                        source=f"{sf_dir}:graph", resume=True,
                        token_filter=filt)
    return store


def q_fts_graph_phrase(spark, sf_dir):
    """posLength-graph phrase matching through the filter-composed
    index: the asymmetric query [ko][data|customer|the|line|column|row]
    (raw ``ko`` token, no query-side expansion; alternatives in the
    second position like a MultiPhraseQuery) matches exactly the docs
    where the multi-word surface 'key order' is immediately followed
    by one of those words — the indexed ``ko`` token SPANS the
    two-word match (pl=2, SynonymFilter.java:472-526), so adjacency
    follows the token graph; a position-flattened index would count 0
    here (ko would end one position short of the follower)."""
    from synspark.query import count_matches
    store = _filter_index(spark, sf_dir)
    follow = ["data", "customer", "the", "line", "column", "row"]
    return count_matches(spark, store, "", mode="and", phrase=True,
                         groups=[["ko"], follow])


def q_fts_stream_reload(spark, sf_dir):
    """Live dictionary reload through the streaming sink as a CONTRACT
    row (round-4 verdict task #8 — the last pytest-only surface, T14/
    D3, promoted to a hash-checked driver row): docs 0-149 stream in
    under rules v1 ``data,info``, the rules FILE is swapped to v2
    ``sort,order`` mid-stream (DictWatcher mtime/fingerprint poll — no
    restart), docs 150-299 stream in under v2. Reference semantics
    (SynonymPluginTest.java:367-484): a dictionary change applies to
    SUBSEQUENT documents only; previously indexed docs keep their old
    tokens until reindexed. The two anchor counts pin BOTH directions
    of that truth table on one index:

    - ``hits_info``  = docs with whole-token ``info``  — only v1-era
      docs (doc_id < 150) containing data|info got the stacked
      anchors; v2-era docs tokenize those substrings as plain grams;
    - ``hits_order`` = docs with whole-token ``order`` — only v2-era
      docs (doc_id >= 150) containing sort|order.
    """
    import shutil
    import time as _time

    from synspark.index_store import FORMAT_VERSION, IndexStore
    from synspark.query import count_matches
    from synspark.streaming import stream_ingest
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|reload-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    root = Path(tempfile.gettempdir()) / f"synspark_reload_{key}"
    idx = root / "index"
    corpus = (_docs(spark, sf_dir)
              .filter(F.col("doc_id") < 300)
              .select(F.concat(F.lit("r"),
                               F.lpad(F.col("doc_id").cast("string"),
                                      8, "0")).alias("repo"),
                      F.lit("f").alias("path"),
                      F.lit("c").alias("commit"),
                      F.lit("t").alias("lang"),
                      F.col("text").alias("content"),
                      "doc_id"))
    ok = False
    if (idx / "meta.json").exists():
        try:
            ok = IndexStore(str(idx)).meta().n_docs == 300
        except Exception:
            ok = False
    if not ok:
        shutil.rmtree(root, ignore_errors=True)
        root.mkdir(parents=True)
        inp = root / "input"
        inp.mkdir()
        rules = root / "rules.txt"
        rules.write_text("data,info\n")
        q = stream_ingest(
            spark, str(inp), str(idx), str(root / "ckpt"),
            cfg=TokenizerConfig(n=2, expand=True, ignore_case=True),
            n_shards_first=4, poll_files_per_batch=1,
            dict_path=str(rules), dict_poll_interval=0.05)
        try:
            (corpus.filter(F.col("doc_id") < 150).drop("doc_id")
             .coalesce(1).write.mode("append").parquet(str(inp)))
            q.processAllAvailable()
            assert IndexStore(str(idx)).meta().n_docs == 150
            # swap the rules FILE in place — the watcher's
            # (mtime_ns, size) + fingerprint poll picks it up before
            # the next micro-batch; nothing restarts
            rules.write_text("sort,order\n")
            _time.sleep(0.1)
            (corpus.filter(F.col("doc_id") >= 150).drop("doc_id")
             .coalesce(1).write.mode("append").parquet(str(inp)))
            q.processAllAvailable()
        finally:
            q.stop()
    store = IndexStore(str(idx))
    assert store.meta().n_docs == 300, store.meta().n_docs
    qcfg = TokenizerConfig(n=2, expand=False, ignore_case=True)
    a = count_matches(spark, store, "info", mode="and",
                      syn=SynonymDict.parse("data,info"), cfg=qcfg) \
        .select(F.col("hits").alias("hits_info"))
    b = count_matches(spark, store, "order", mode="and",
                      syn=SynonymDict.parse("sort,order"), cfg=qcfg) \
        .select(F.col("hits").alias("hits_order"))
    return a.crossJoin(b)


def q_fts_stream_count(spark, sf_dir):
    """Structured-Streaming ingest as a CONTRACT row (round-3 verdict
    task #7): the first 300 documents are split into 3 parquet files,
    tailed by stream_ingest (maxFilesPerTrigger=1 → bootstrap build +
    2 idempotent appends through the real foreachBatch sink), then a
    replayed micro-batch tag is re-submitted and must no-op. The final
    index answers the benchmark boolean count hash-identically to a
    one-shot build over the same docs — which is exactly what the
    DuckDB oracle computes."""
    import shutil

    from synspark.index_store import (FORMAT_VERSION, IndexStore,
                                      append_to_index)
    from synspark.query import count_matches
    from synspark.streaming import stream_ingest
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|stream-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    root = Path(tempfile.gettempdir()) / f"synspark_stream_{key}"
    idx = root / "index"
    corpus = (_docs(spark, sf_dir)
              .filter(F.col("doc_id") < 300)
              .select(F.concat(F.lit("r"),
                               F.lpad(F.col("doc_id").cast("string"),
                                      8, "0")).alias("repo"),
                      F.lit("f").alias("path"),
                      F.lit("c").alias("commit"),
                      F.lit("t").alias("lang"),
                      F.col("text").alias("content"),
                      "doc_id"))
    ok = False
    if (idx / "meta.json").exists():
        try:
            ok = IndexStore(str(idx)).meta().n_docs == 300
        except Exception:
            ok = False
    if not ok:
        shutil.rmtree(root, ignore_errors=True)
        inp = root / "input"
        for lo, hi in ((0, 100), (100, 200), (200, 300)):
            (corpus.filter((F.col("doc_id") >= lo)
                           & (F.col("doc_id") < hi))
             .drop("doc_id").coalesce(1)
             .write.mode("append").parquet(str(inp)))
        q = stream_ingest(
            spark, str(inp), str(idx), str(root / "ckpt"),
            cfg=TokenizerConfig(n=2, expand=False, ignore_case=True),
            n_shards_first=4, poll_files_per_batch=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    store = IndexStore(str(idx))
    assert store.meta().n_docs == 300, store.meta().n_docs
    # at-least-once replay: an already-committed micro-batch tag
    # no-ops (otherwise the count below would double and hash-fail)
    append_to_index(spark, store, corpus.drop("doc_id").limit(50),
                    batch_tag="stream-batch-1")
    assert store.meta().n_docs == 300
    return count_matches(spark, store, BM25_QUERY, mode="and")


def _del_index(spark, sf_dir):
    """Bigram index over documents with ``doc_id % 7 == 3`` tombstoned
    (phase-1 delete — Lucene liveDocs), cached per sf_dir. The delete
    commit is atomic, so a crashed prior run either left the base
    index (n_deleted == 0 → delete again) or the finished state."""
    from synspark.deletes import delete_docs
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|del-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    store = build_index(
        spark, corpus, str(out),
        cfg=TokenizerConfig(n=2, expand=False, ignore_case=True),
        syn=None, n_shards=4, source=f"{sf_dir}:del", resume=True)
    if store.meta().n_deleted == 0:
        delete_docs(spark, store,
                    doc_ids=corpus.filter(F.col("doc_id") % 7 == 3)
                    .select("doc_id"))
    return store


def q_fts_delete_topk(spark, sf_dir):
    """BM25 top-10 over an index with ``doc_id % 7 == 3`` tombstoned —
    phase-1 Lucene liveDocs semantics: deleted docs leave the results,
    every surviving doc scores EXACTLY as before (df/N/avgdl still
    count deleted docs until merge; Lucene docFreq/maxDoc behavior).
    The oracle therefore computes BM25 over ALL docs and only filters
    the tombstoned ids from the final ranking."""
    from synspark.query import search
    store = _del_index(spark, sf_dir)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_purge_topk(spark, sf_dir):
    """BM25 top-10 AFTER the purging merge (phase 2): compact_index
    applies the tombstones — deleted docs leave every posting list,
    ids renumber densely in id order, df/N/avgdl recompute over live
    docs. The oracle builds BM25 from scratch over the renumbered live
    corpus — a purged index is equivalent to a fresh build (also
    pinned shard-by-shard in tests/test_deletes.py)."""
    from synspark.index_store import IndexStore, compact_index
    from synspark.query import search
    src = _del_index(spark, sf_dir)
    live = src.meta().n_docs - src.meta().n_deleted
    out = Path(str(src.path) + "_purged")
    ok = False
    if (out / "meta.json").exists():
        try:
            ok = IndexStore(str(out)).meta().n_docs == live
        except Exception:
            ok = False
    store = IndexStore(str(out)) if ok \
        else compact_index(spark, src, str(out))
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_upsert_count(spark, sf_dir):
    """Boolean AND count after an UPSERT (ES index-by-key / Lucene
    updateDocument): docs with ``doc_id % 11 == 2`` are replaced by
    new content under their (repo, path) key — old version tombstoned
    and new version appended in ONE atomic meta commit. Even ids among
    them still contain the benchmark phrase terms, odd ids lose them;
    the oracle counts AND-matches over (unchanged docs) ∪ (new
    versions) — update ids don't matter for counting, so the
    hash-checked contract is independent of id-assignment order."""
    from synspark.deletes import upsert_docs
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.query import count_matches
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|ups-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = (_docs(spark, sf_dir)
              .select(F.concat(F.lit("r"), F.col("doc_id").cast("string"))
                      .alias("repo"),
                      F.lit("f").alias("path"), F.lit("c").alias("commit"),
                      F.col("lang"), F.col("text").alias("content"),
                      "doc_id"))
    store = build_index(
        spark, corpus, str(out),
        cfg=TokenizerConfig(n=2, expand=False, ignore_case=True),
        syn=None, n_shards=4, source=f"{sf_dir}:ups", resume=True)
    if store.meta().n_deleted == 0:
        new_docs = (corpus.filter(F.col("doc_id") % 11 == 2)
                    .withColumn(
                        "content",
                        F.when(F.col("doc_id") % 2 == 0,
                               F.lit("data sort merge refreshed entry"))
                        .otherwise(F.lit("refreshed entry only"))))
        upsert_docs(spark, store, new_docs, batch_tag="contract-upsert")
    return count_matches(spark, store, BM25_QUERY, mode="and")


def q_fts_index_stats(spark, sf_dir):
    """Global index statistics (the ``_stats`` surface) pinned against
    first principles: N, live docs, exact integer Σ dl, and avgdl —
    the quantities every BM25 score depends on. One row."""
    store = _index(spark, sf_dir)
    st = store.stats()
    return spark.createDataFrame(
        [(int(st["n_docs"]), int(st["n_live"]), int(st["total_dl"]),
          float(round(st["avgdl"], 6)))],
        "n_docs long, n_live long, total_dl long, avgdl_r double")


def _mf_fields(spark, sf_dir):
    """The two per-field indexes shared by the multi_match rows:
    content = full text (boost 1.0), title = first 60 chars (boost
    2.0), cached per sf_dir. Field indexes share doc ids by
    construction (same corpus, same deterministic assignment)."""
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|mf-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    cfg = TokenizerConfig(n=2, expand=False, ignore_case=True)
    corpus = (_docs(spark, sf_dir)
              .withColumnRenamed("text", "content")
              .withColumn("title", F.substring("content", 1, 60)))
    s_c = build_index(spark, corpus, str(out / "content"), cfg=cfg,
                      syn=None, n_shards=4, text_col="content",
                      source=f"{sf_dir}:mf-content", resume=True)
    s_t = build_index(spark, corpus, str(out / "title"), cfg=cfg,
                      syn=None, n_shards=4, text_col="title",
                      source=f"{sf_dir}:mf-title", resume=True)
    return {"content": (s_c, 1.0), "title": (s_t, 2.0)}


def q_fts_multifield_topk(spark, sf_dir):
    """ES multi_match (most_fields): each field scores with its OWN
    df/N/avgdl (per-field norms); a doc matches if at least one
    field's AND query matches and scores the boost-weighted sum over
    matching fields."""
    from synspark.query import search_fields
    return _rounded_topk(
        search_fields(spark, _mf_fields(spark, sf_dir),
                      BM25_QUERY, k=200, mode="and"), 10)


def q_fts_dismax_topk(spark, sf_dir):
    """ES multi_match best_fields / dis_max (Lucene
    DisjunctionMaxQuery): per-doc max over the boosted field scores
    plus tie_breaker=0.3 × the rest, same per-field norms and the
    same threshold-algorithm pruning as most_fields."""
    from synspark.query import search_fields
    return _rounded_topk(
        search_fields(spark, _mf_fields(spark, sf_dir),
                      BM25_QUERY, k=200, mode="and",
                      type="best_fields", tie_breaker=0.3), 10)


def q_fts_merge_topk(spark, sf_dir):
    """BM25 top-10 after an INCREMENTAL merge (deletes.merge_shards,
    the Lucene per-segment merge): docs with ``doc_id % 5 == 1`` are
    tombstoned, then every shard holding tombstones rewrites
    copy-on-write at a new shard id with doc ids UNCHANGED; stats
    adjust by signed delta. With all tombstones merged, scoring equals
    a live-docs-only index that kept its original ids — which is
    exactly what the oracle computes (no renumbering, unlike the full
    purge row)."""
    from synspark.deletes import delete_docs, merge_shards
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.query import search
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|mrg-f{FORMAT_VERSION}".encode()).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    store = build_index(
        spark, corpus, str(out),
        cfg=TokenizerConfig(n=2, expand=False, ignore_case=True),
        syn=None, n_shards=4, source=f"{sf_dir}:mrg", resume=True)
    if store.meta().n_purged == 0:
        delete_docs(spark, store,
                    doc_ids=corpus.filter(F.col("doc_id") % 5 == 1)
                    .select("doc_id"))
        merge_shards(spark, store, min_deleted_fraction=0.0)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_match_ids(spark, sf_dir):
    """ALL matching doc ids for the benchmark AND query (the
    scroll-all-hits surface feeding delete_by_query) — distributed
    per-shard set algebra, ids never collected driver-side; returned
    sorted for the hash check."""
    from synspark.query import match_ids
    store = _index(spark, sf_dir)
    return match_ids(spark, store, BM25_QUERY, mode="and") \
        .orderBy("doc_id")


def q_fts_page2_topk(spark, sf_dir):
    """ES search_after pagination: ranks 11-20 of the benchmark query,
    fetched with a (score, doc_id) cursor taken from the exact page-1
    ranking — each page keeps only a k-sized heap (deep pagination
    without deep heaps), sound because scores are bit-stable across
    runs."""
    from synspark.query import search
    store = _index(spark, sf_dir)
    p1 = search(spark, store, BM25_QUERY, k=10, mode="and").collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and",
               after=cursor), 10)


BOOL_MUST, BOOL_SHOULD, BOOL_NOT = "data", "sort merge", "key"
MSM_M = 5


def q_fts_bool_topk(spark, sf_dir):
    """ES ``bool`` query ranked top-10 on the WAND path (Lucene
    BooleanClause.Occur): 'data' required and scoring, 'sort merge'
    optional and scoring when matched, docs containing 'key'
    excluded (ReqExclScorer — never scores)."""
    from synspark.query import search_bool
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search_bool(spark, store, must=BOOL_MUST, should=BOOL_SHOULD,
                    must_not=BOOL_NOT, k=200), 10)


def q_fts_msm_topk(spark, sf_dir):
    """ES match minimum_should_match=5 over the benchmark query's 10
    bigram groups (BooleanQuery.setMinimumNumberShouldMatch) — WAND
    runs natively as the m-of-n operator, window-pruning on the
    should-group presence count."""
    from synspark.query import search
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="or",
               min_should_match=MSM_M), 10)


def q_fts_filter_topk(spark, sf_dir):
    """ES bool filter context (Lucene FILTER occur): 'data' scores,
    'sort' is required but NEVER scores — surviving docs keep the
    filter-free query's exact scores, ranked among filter survivors."""
    from synspark.query import search_bool
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search_bool(spark, store, must=BOOL_MUST, filter="sort",
                    k=200), 10)


def q_fts_docvalue_topk(spark, sf_dir):
    """ES doc-values filter ({"bool": {"filter": {"term": {"lang":
    "en"}}}} + scoring match): the metadata predicate resolves to a
    per-shard allowlist routed like liveDocs and masks BEFORE heap
    admission — hits keep their unfiltered scores (filters never touch
    idf/avgdl, exactly ES)."""
    from synspark.query import search
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search(spark, store, BM25_QUERY, k=200, mode="and",
               doc_where="lang = 'en'"), 10)


def q_fts_docvalue_count(spark, sf_dir):
    """Distributed hit count under a doc-values filter (OR-mode match
    restricted to lang='zh' docs)."""
    from synspark.query import count_matches
    store = _index(spark, sf_dir)
    return count_matches(spark, store, BM25_QUERY, mode="or",
                         doc_where="lang = 'zh'")


def q_fts_msm_count(spark, sf_dir):
    """Distributed m-of-n hit count: per-shard vectorized group-match
    counting, one tiny sum — the bool twin of fts_count_and/or."""
    from synspark.query import count_matches
    store = _index(spark, sf_dir)
    return count_matches(spark, store, BM25_QUERY, mode="or",
                         min_should_match=MSM_M)


def q_fts_terms_agg(spark, sf_dir):
    """ES ``terms`` aggregation: lang bucket counts over the benchmark
    query's AND match set, ES bucket order (doc_count DESC, key ASC).
    Distributed end-to-end — match set and docmap join and aggregate
    executor-side; only the ≤size buckets reach the driver."""
    from synspark.query import terms_agg
    store = _index(spark, sf_dir)
    return terms_agg(spark, store, "lang", BM25_QUERY, mode="and")


def q_fts_stats_agg(spark, sf_dir):
    """ES ``stats`` metric aggregation (count/min/max/avg/sum) over
    the benchmark query's AND match set's dl (indexed token count).
    One scalar row leaves the cluster; the aggregate itself is a
    map-side partial fold after the doc_id join."""
    from synspark.query import stats_agg
    store = _index(spark, sf_dir)
    return stats_agg(spark, store, "dl", BM25_QUERY, mode="and")


def q_fts_histogram_agg(spark, sf_dir):
    """ES ``histogram`` aggregation over the match set's dl with
    interval 10, default min_doc_count=0 semantics: empty buckets
    between the first and last occupied bucket materialize with
    doc_count 0 (one generated sequence frame, never a driver
    loop)."""
    from synspark.query import histogram_agg
    store = _index(spark, sf_dir)
    return histogram_agg(spark, store, "dl", 10, BM25_QUERY,
                         mode="and")


def q_fts_cardinality_agg(spark, sf_dir):
    """ES ``cardinality`` aggregation: distinct langs in the match
    set. Exact path here (oracle-comparable); the HLL++ approx twin
    (``exact=False`` — what ES itself computes) is pinned within rsd
    by pytest."""
    from synspark.query import cardinality_agg
    store = _index(spark, sf_dir)
    return cardinality_agg(spark, store, "lang", BM25_QUERY,
                           mode="and")


def q_fts_sort_topk(spark, sf_dir):
    """ES field ``sort`` (not _score): the match set's top 10 by
    (dl DESC, lang ASC, doc_id ASC tiebreak) — a
    TakeOrderedAndProject distributed k-heap, never a global sort."""
    from synspark.query import search_sorted
    store = _index(spark, sf_dir)
    return search_sorted(spark, store, [("dl", "desc"),
                                        ("lang", "asc")],
                         BM25_QUERY, mode="and", k=10)


def q_fts_collapse_topk(spark, sf_dir):
    """ES ``collapse``: top-5 hits keeping only the best-scoring doc
    per lang (search-result dedup by key). Rank-1 window over the
    score-all frame — one shuffle on the collapse key, final cut is a
    distributed k-heap."""
    from synspark.rank import search_collapsed
    store = _index(spark, sf_dir)
    return search_collapsed(spark, store, "lang", BM25_QUERY,
                            mode="and", k=5)


def q_fts_top_hits(spark, sf_dir):
    """ES ``terms`` + ``top_hits`` sub-aggregation: the 3 largest lang
    buckets of the match set with each bucket's 2 best hits. One
    window computes rank and bucket size together."""
    from synspark.rank import top_hits_agg
    store = _index(spark, sf_dir)
    return top_hits_agg(spark, store, "lang", BM25_QUERY, mode="and",
                        n_buckets=3, n_hits=2)


def q_fts_function_score(spark, sf_dir):
    """ES ``function_score`` / field_value_factor: BM25 × log10(1+dl)
    (the popularity-boost idiom on the engine's own token-count
    field), top-10 on the combined score — the combine stays in
    whole-stage codegen over the score-all frame."""
    from synspark.rank import function_score
    store = _index(spark, sf_dir)
    return function_score(spark, store, BM25_QUERY, "dl", factor=1.0,
                          modifier="log1p", boost_mode="multiply",
                          k=10)


def q_fts_constant_score(spark, sf_dir):
    """ES ``constant_score``: the AND match set scored flat 1.5 — no
    tf/dl decode at all (rides the match-only set algebra), first 10
    by doc_id."""
    from synspark.rank import constant_score
    store = _index(spark, sf_dir)
    return constant_score(spark, store, BM25_QUERY, mode="and",
                          boost=1.5, k=10)


def q_fts_boosting(spark, sf_dir):
    """ES ``boosting`` query: positive BM25 match demoted ×0.3 where
    the doc also matches the negative query — demotion without
    exclusion; the negative set is an unscored match_ids frame."""
    from synspark.rank import boosting
    store = _index(spark, sf_dir)
    return boosting(spark, store, BM25_QUERY, PHRASE,
                    negative_boost=0.3, k=10)


def q_fts_sig_terms(spark, sf_dir):
    """ES ``significant_terms`` (JLH) over the AND match set: terms
    unusually frequent in matching docs vs the whole index. Foreground
    counts re-analyze ONLY the matches (fielddata contract);
    background df rides the index's termstats."""
    from synspark.fielddata import significant_terms_agg
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return significant_terms_agg(spark, store, corpus, BM25_QUERY,
                                 mode="and", size=10)


def q_fts_term_vectors(spark, sf_dir):
    """ES ``_termvectors`` with term_statistics: per-term tf for docs
    3 and 7 re-derived from _source, plus collection df/ttf from
    termstats — vectors on the fly, exactly ES when not stored."""
    from synspark.fielddata import term_vectors
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return term_vectors(spark, store, corpus, [3, 7])


PERC_QUERIES = [(1, BM25_QUERY, "and"), (2, "merge", "or"),
                (3, PHRASE, "msm", 3)]


def q_fts_percolate(spark, sf_dir):
    """ES ``percolate`` (reverse search): three registered queries
    (AND / OR / minimum_should_match) matched against every document —
    the saved-search alerting shape. Broadcast path: the query table
    ships with the Arrow workers, each doc decides locally, zero
    shuffle (and therefore streaming-safe, pinned by pytest)."""
    from synspark.percolate import percolate, register_queries
    from synspark.tokenizer import TokenizerConfig
    cfg = TokenizerConfig(n=2, expand=False, ignore_case=True)
    reg = register_queries(spark, PERC_QUERIES, cfg)
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return percolate(spark, reg, docs, cfg) \
        .orderBy("doc_id", "query_id")


def q_fts_sort_page2(spark, sf_dir):
    """Sort-keyed deep pagination (ES search_after on a field sort):
    page 2 of the (dl DESC, lang ASC) ordering via the page-1 cursor —
    the codegen lexicographic filter admits only rows strictly after
    it, so page N never re-ships pages 1..N-1."""
    from synspark.query import search_sorted
    store = _index(spark, sf_dir)
    sort = [("dl", "desc"), ("lang", "asc")]
    p1 = search_sorted(spark, store, sort, BM25_QUERY, mode="and",
                       k=10).collect()
    last = p1[-1]
    return search_sorted(spark, store, sort, BM25_QUERY, mode="and",
                         k=10, after=(last.dl, last.lang,
                                      last.doc_id))


def q_fts_sig_terms_sampled(spark, sf_dir):
    """ES ``sampler`` around significant_terms: the foreground is the
    50 best-scoring matches instead of all matches — fielddata
    re-analysis cost stays fixed no matter how large the match set."""
    from synspark.fielddata import significant_terms_agg
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return significant_terms_agg(spark, store, corpus, BM25_QUERY,
                                 mode="and", size=10, sample_size=50)


def q_fts_snapshot_topk(spark, sf_dir):
    """ES ``_snapshot`` + restore: point-in-time incremental copy of
    the committed store (immutable files, (name,size) skip,
    metadata-last commit), then the flagship BM25 over the RESTORED
    store — answers must be identical to querying the source."""
    import tempfile
    from synspark.query import search
    from synspark.snapshot import restore, snapshot
    store = _index(spark, sf_dir)
    key = hashlib.md5(f"{sf_dir}|snap".encode()).hexdigest()[:12]
    root = Path(tempfile.gettempdir()) / f"synspark_snap_{key}"
    snapshot(store, str(root / "snap"))
    rst = restore(str(root / "snap"), str(root / "restored"))
    return _rounded_topk(
        search(spark, rst, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_rescore_topk(spark, sf_dir):
    """ES ``rescore`` (query rescorer, score_mode=total,
    rescore_query_weight=2): the benchmark query's top-50 window
    re-ranked by primary + 2×BM25('key order'), secondary scoring
    candidate-restricted to the window's blocks — never a full
    posting scan of the rescore terms."""
    from synspark.query import rescore
    store = _index(spark, sf_dir)
    return _rounded_topk(
        rescore(spark, store, BM25_QUERY, RESCORE_QUERY, k=50,
                window_size=50, rescore_query_weight=2.0), 10)


def q_fts_mlt_topk(spark, sf_dir):
    """ES ``more_like_this`` for doc 42 with the ES defaults
    (max_query_terms=25, min_term_freq=2, min_doc_freq=5,
    include=false): interesting terms ranked by rounded tf·idf become
    a scored disjunction over the standard WAND path; the liked doc
    itself is excluded."""
    from synspark.query import more_like_this
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return _rounded_topk(
        more_like_this(spark, store, 42, corpus=corpus, k=200), 10)


def q_fts_slop_count(spark, sf_dir):
    """ES ``match_phrase`` with ``slop: 2`` over the word-level index:
    docs where 'key' and 'order' occur within Lucene move distance 2
    (adjacent, one- or two-word gap, or transposed — transposition
    costs exactly 2). Distributed position-set probes per shard, no
    driver-side candidate lists."""
    from synspark.query import count_matches
    store = _word_index(spark, sf_dir)
    return count_matches(spark, store, "key order", phrase=True,
                         slop=2)


def q_fts_prefix_count(spark, sf_dir):
    """ES ``prefix`` query, constant_score rewrite (the ES default):
    hit count of docs holding ANY indexed term starting with 'd'.
    Expansion resolves against the term dictionary (StartsWith pushed
    to the termstats parquet scan); matching is one OR group through
    the distributed match workers."""
    from synspark.query import count_prefix
    store = _index(spark, sf_dir)
    return count_prefix(spark, store, "d")


def q_fts_prefix_topk(spark, sf_dir):
    """ES ``prefix`` query, scoring_boolean rewrite: the top-5-by-df
    'd%' terms (deterministic top_terms_N selection, term ASC ties)
    each become their own BM25 SHOULD clause, ranked by the standard
    WAND path."""
    from synspark.query import search_prefix
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search_prefix(spark, store, "d", k=200, max_expansions=5), 10)


def q_fts_fuzzy_count(spark, sf_dir):
    """ES ``fuzzy`` query, constant_score rewrite (the ES default):
    docs holding any word within 2 edits of the typo 'qery'
    ('query' d=1, 'key' d=2). Expansion resolves against the
    word-index term dictionary — JVM-side ``levenshtein`` with the
    early-exit threshold, length-window prefilter pushed below it —
    and matching is one OR group through the match workers."""
    from synspark.multiterm import count_fuzzy
    store = _word_index(spark, sf_dir)
    return count_fuzzy(spark, store, "qery", fuzziness=2)


def q_fts_fuzzy_topk(spark, sf_dir):
    """ES ``fuzzy`` query, scored: each expansion of 'qery' becomes a
    SHOULD clause with its own idf × the Lucene FuzzyTermsEnum boost
    1 − d/min(len(term), len(query)), summed over matched clauses and
    ranked by the shard-parallel block-max WAND."""
    from synspark.multiterm import search_fuzzy
    store = _word_index(spark, sf_dir)
    return _rounded_topk(
        search_fuzzy(spark, store, "qery", k=200, fuzziness=2), 10)


def q_fts_wildcard_topk(spark, sf_dir):
    """ES ``wildcard`` query 's*' under the capped scoring_boolean
    rewrite: the top-5-by-df matching dictionary words (term ASC
    ties — the deterministic top_terms_N selection) each become their
    own BM25 SHOULD clause."""
    from synspark.multiterm import search_wildcard
    store = _word_index(spark, sf_dir)
    return _rounded_topk(
        search_wildcard(spark, store, "s*", k=200,
                        max_expansions=5), 10)


def q_fts_regexp_count(spark, sf_dir):
    """ES ``regexp`` query '.*or.*' — ANCHORED full-term match
    (Lucene RegexpQuery), constant_score: hit count of docs holding
    any dictionary word containing 'or'."""
    from synspark.multiterm import count_regexp
    store = _word_index(spark, sf_dir)
    return count_regexp(spark, store, ".*or.*")


def q_fts_suggest_term(spark, sf_dir):
    """ES ``term`` suggester (Lucene DirectSpellChecker) over the word
    index's dictionary: 'slot' and 'qery' are missing from the corpus
    and get corrected ('slot'→slow d=1 / sort d=2, 'qery'→query d=1);
    'merge' exists so the default suggest_mode=missing leaves it
    alone. Score = 1 − d/min(len), rounded; (score DESC, df DESC,
    term ASC) order. One column-pruned dictionary scan; no postings
    touched."""
    from synspark.suggest import suggest_terms
    store = _word_index(spark, sf_dir)
    out = suggest_terms(spark, store, "slot qery merge", size=5)
    return (out.withColumn("score", F.round("score", 6))
            .orderBy(F.asc("token"), F.desc("score"), F.desc("df"),
                     F.asc("suggestion")))


def q_fts_suggest_completion(spark, sf_dir):
    """ES ``completion`` suggester with df as weight: top-5 dictionary
    words under prefix 's', heaviest first (weight DESC, term ASC) —
    the FST-with-weights lookup as a StartsWith-pruned scan of the
    sorted term column."""
    from synspark.suggest import suggest_completion
    store = _word_index(spark, sf_dir)
    return suggest_completion(spark, store, "s", size=5)


def q_fts_synfilter(spark, sf_dir):
    """Token-level synonym filter (SURVEY §2.3) over word tokens of the
    documents table. With the fixed single-word dict the expanded term
    counts are SQL-expressible (each occurrence of a group member emits
    every member, so each member's count is the group total)."""
    from synspark.synfilter import expand_tokens_df
    from synspark.synonyms import SynonymDict
    _ensure_shipped(spark)
    syn = SynonymDict.parse("data,info\nsort,order")
    out = expand_tokens_df(_word_tokens(spark, sf_dir), syn)
    return (out.groupBy("term").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("term")).limit(50))


def q_dp_exact_dups(spark, sf_dir):
    """Exact dedup over documents + deterministically injected dups
    (doc_id+10^6 clones of the first 50 docs) so the check is
    non-trivial even on a dup-free table."""
    from synspark.datapipe.dedup import exact_dup_groups
    docs = _docs(spark, sf_dir)
    clones = (docs.filter(F.col("doc_id") < 50)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    return exact_dup_groups(docs.unionByName(clones)) \
        .select("dup_key", "n_docs", "keep_doc_id")


def q_dp_token_counts(spark, sf_dir):
    from synspark.datapipe.textstats import token_counts
    return token_counts(_docs(spark, sf_dir))


def q_dp_subword_counts(spark, sf_dir):
    """BPE-ish (GPT-2 pre-tokenizer) subword counts — the token-budget
    estimate; lookahead-free regex shared verbatim with the oracle."""
    from synspark.datapipe.textstats import subword_counts
    return subword_counts(_docs(spark, sf_dir))


def q_dp_quality(spark, sf_dir):
    from synspark.datapipe.textstats import quality_scores
    return quality_scores(_docs(spark, sf_dir))


def q_dp_lang_id(spark, sf_dir):
    from synspark.datapipe.textstats import language_id
    return language_id(_docs(spark, sf_dir))


def q_dp_fingerprints(spark, sf_dir):
    from synspark.datapipe.textstats import fingerprints
    return fingerprints(_docs(spark, sf_dir))


def q_dp_scrub(spark, sf_dir):
    """PII scrubbing over documents + injected PII (first 20 docs gain
    an email/IP/long number so redaction counts are non-trivial)."""
    from synspark.datapipe.textstats import scrub_pii
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") < 20,
               F.concat(F.col("text"),
                        F.lit(" contact bob@example.com via 10.0.0.1 "
                              "acct 1234567890")))
        .otherwise(F.col("text")))
    return scrub_pii(docs).select("doc_id", "text", "n_redactions")


def q_dp_chunks(spark, sf_dir):
    """LLM pretraining chunking: ≤64-token chunks, 8-token overlap."""
    from synspark.datapipe.textstats import chunk_documents
    return chunk_documents(_docs(spark, sf_dir), max_tokens=64,
                           overlap=8) \
        .select("doc_id", "chunk_id", "n_tokens", "chunk")


def q_dp_minhash_lsh(spark, sf_dir):
    from synspark.datapipe.dedup import (lsh_candidate_groups,
                                         minhash_signatures, word_shingles)
    sh = word_shingles(_docs(spark, sf_dir), k=3)
    return lsh_candidate_groups(minhash_signatures(sh, 8), bands=4,
                                rows_per_band=2) \
        .select("band_id", "band_key", "n_docs", "keep_doc_id")


def q_dp_jaccard_pairs(spark, sf_dir):
    """Exact Jaccard verification restricted to the LSH candidate pair
    set (the scale-correct wiring: the shingle self-join input is
    bounded by LSH collision groups, never all-pairs)."""
    from synspark.datapipe.dedup import (jaccard_pairs,
                                         lsh_candidate_pairs,
                                         minhash_signatures, word_shingles)
    sh = word_shingles(_docs(spark, sf_dir), k=3)
    cand = lsh_candidate_pairs(minhash_signatures(sh, 8), bands=4,
                               rows_per_band=2)
    return jaccard_pairs(sh, candidates=cand, threshold=0.2) \
        .select("a", "b", "n_inter", "jaccard")


def q_dp_dedup_drop(spark, sf_dir):
    """End-to-end dedup drop list (exact ∪ LSH-verified near) over
    documents + injected exact clones (first 50 docs at id+10^6) and
    near clones (first 30 docs with 3 appended words at id+2*10^6)."""
    from synspark.datapipe.dedup import dedup_drop_list
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    clones = (docs.filter(F.col("doc_id") < 50)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    near = (docs.filter(F.col("doc_id") < 30)
            .withColumn("doc_id", F.col("doc_id") + F.lit(2_000_000))
            .withColumn("text", F.concat(F.col("text"),
                                         F.lit(" zq zq zq"))))
    aug = docs.unionByName(clones).unionByName(near)
    return dedup_drop_list(aug, threshold=0.5).select("doc_id", "reason")


def q_dp_simhash_dups(spark, sf_dir):
    """SimHash near-dups. The engine's word hash is defined as DuckDB's
    md5_number_upper (first 8 md5 bytes little-endian), so the whole
    operator — signature, pigeonhole blocking, hamming filter — has an
    exact SQL oracle."""
    from synspark.datapipe.dedup import simhash, simhash_near_dups
    s = simhash(_docs(spark, sf_dir))
    return simhash_near_dups(s, max_hamming=3)


def q_dp_ann_cosine(spark, sf_dir):
    from synspark.datapipe.similarity import brute_force_topk
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return (brute_force_topk(emb.filter(F.col("vec_id") != 0), qv, k=10)
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .select("vec_id", "cosine"))


def q_dp_ann_ivf(spark, sf_dir):
    """IVF/LSH-bucketed ANN over the PERSISTED bucket-partitioned
    layout (write_ivf_index → ivf_topk_indexed): probing is partition
    pruning at the parquet scan — the 100 TB shape, not an in-memory
    filter (plan-asserted in pytest). Approximate by design but
    DETERMINISTIC (seeded hyperplanes), so the exact probe-restricted
    result has a full SQL oracle (planes inlined as literals); recall
    vs brute force is additionally asserted in pytest."""
    from synspark.datapipe.similarity import (ivf_topk_indexed,
                                              write_ivf_index)
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    dim = len(qv)
    key = hashlib.md5(f"{sf_dir}|ivf-idx-v1".encode()).hexdigest()[:12]
    path = Path(tempfile.gettempdir()) / f"synspark_ivf_{key}"
    if not (path / "_SUCCESS").exists():  # deterministic layout: cacheable
        write_ivf_index(emb.filter(F.col("vec_id") != 0), str(path), dim)
    return ivf_topk_indexed(spark, str(path), qv, dim, k=10, probes=16) \
        .select("vec_id", "cosine")


def q_dp_embedding_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (semantic dedup) over
    embeddings + injected near-clones (first 20 vectors at id+10^6
    with +0.1 on component 0 — the embeddings are unit-norm, so every
    injected pair has cosine ≥ 0.994 while the background pair max is
    ~0.5): LSH-bucket candidate join (seeded hyperplanes — never
    all-pairs), exact cosine ≥ 0.9 verification. Deterministic end to
    end — full SQL oracle. A pair whose clone crosses a hyperplane
    lands in another bucket and is (identically, in both engines)
    not a candidate — the standard single-probe LSH recall trade."""
    from synspark.datapipe.dedup import embedding_near_dups
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    dim = len(emb.select("embedding").first()[0])
    pert = (emb.filter(F.col("vec_id") < 20)
            .select((F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
                    F.concat(
                        F.array(F.col("embedding")[0] + F.lit(0.1)),
                        F.expr("slice(embedding, 2, size(embedding) - 1)"))
                    .alias("embedding")))
    return embedding_near_dups(emb.unionByName(pert), dim, threshold=0.9)


def q_dp_media_meta(spark, sf_dir):
    from synspark.datapipe.multimodal import as_media, decode_media
    media = as_media(_docs(spark, sf_dir))
    return decode_media(media).select("media_id", "kind", "n_bytes",
                                      "sha256")


def q_dp_media_features(spark, sf_dir):
    """Feature-extraction plumbing (stub model: first 8 sha bytes/255;
    the mapInPandas batch shape is what a real model forward pass
    uses). Fully oracle-checked."""
    from synspark.datapipe.multimodal import as_media, extract_features
    return extract_features(as_media(_docs(spark, sf_dir)), dim=8)


def q_dp_resize_plan(spark, sf_dir):
    """Aspect-preserving resize plan over decoded media dims — pure
    built-in expressions."""
    from synspark.datapipe.multimodal import (as_media, decode_media,
                                              resize_plan)
    return resize_plan(decode_media(as_media(_docs(spark, sf_dir))),
                       224, 224)


def q_dp_frame_plan(spark, sf_dir):
    from synspark.datapipe.multimodal import (as_media, decode_media,
                                              frame_sample_plan)
    decoded = decode_media(as_media(_docs(spark, sf_dir)))
    return frame_sample_plan(decoded, every_n=30)


def q_fts_qs_opt_phrase(spark, sf_dir):
    """query_string with TRUE optional phrases (Lucene OR semantics,
    exhaustive score-all path): 'merge "key order"' ranks docs
    matching EITHER clause; adjacency-verified phrases add their gram
    scores on top — no must-promotion."""
    from synspark.querystring import query_string
    store = _index(spark, sf_dir)
    return _rounded_topk(
        query_string(spark, store, 'merge "key order"', k=200,
                     optional_phrases=True), 10)


def q_fts_terms_stats_agg(spark, sf_dir):
    """ES sub-aggregation: terms buckets (lang) each carrying a
    stats metric (dl) over the benchmark match set — one aggregate
    pass computes counts and metrics together."""
    from synspark.query import terms_stats_agg
    store = _index(spark, sf_dir)
    return terms_stats_agg(spark, store, "lang", "dl", BM25_QUERY,
                           mode="and")


def q_fts_reindex_topk(spark, sf_dir):
    """ES ``_reindex``: copy the 'data'-matching subset into a fresh
    index (fresh dense ids = rank of original id) and rank the
    benchmark query there — scores use the SUBSET's own statistics
    (n, avgdl, dfs), exactly what a real reindexed index serves."""
    from synspark.index_store import FORMAT_VERSION
    from synspark.reindex import reindex
    from synspark.index_store import IndexStore
    store = _index(spark, sf_dir)
    key = hashlib.md5(
        f"{sf_dir}|reidx-data-f{FORMAT_VERSION}".encode()) \
        .hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    if (out / "meta.json").exists():
        dst = IndexStore(str(out))
    else:
        corpus = _docs(spark, sf_dir) \
            .withColumnRenamed("text", "content")
        dst = reindex(spark, store, corpus, str(out), query="data",
                      mode="and", n_shards=2,
                      source=f"{sf_dir}#reindex")
    from synspark.query import search
    return _rounded_topk(
        search(spark, dst, BM25_QUERY, k=200, mode="and"), 10)


def q_fts_rrf_hybrid(spark, sf_dir):
    """ES hybrid retriever (``retriever: {rrf}``): BM25 top-window
    over the bigram index + brute-force cosine kNN over the
    embeddings table (vec_id ≡ doc_id), fused by reciprocal rank —
    Σ 1/(60 + rank), ranks on 6-dp-rounded scores, doc_id tiebreak.
    No score calibration between the two retrievers needed."""
    from synspark.fusion import hybrid_search
    store = _index(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return hybrid_search(spark, store, BM25_QUERY, emb, qv, k=10,
                         window=100, mode="and")


def q_fts_span_near_count(spark, sf_dir):
    """Lucene ``span_near`` UNORDERED (in_order=false, slop=2) over
    the word index: 'key' within 2 positions of 'order', either
    order, overlaps admitted — NearSpansUnordered's
    maxEnd−minStart−Σlen ≤ slop criterion as bounded delta-window
    probes per shard."""
    from synspark.query import span_near_count
    store = _word_index(spark, sf_dir)
    return span_near_count(spark, store, "key", "order", slop=2,
                           in_order=False)


def q_fts_span_ordered_count(spark, sf_dir):
    """``span_near`` ORDERED (slop=1): 'key' before 'order' with at
    most one position between the spans (NearSpansOrdered gap)."""
    from synspark.query import span_near_count
    store = _word_index(spark, sf_dir)
    return span_near_count(spark, store, "key", "order", slop=1,
                           in_order=True)


GREP_PAT = "key [a-z]*order"


def q_fts_grep_search(spark, sf_dir):
    """Gram-accelerated regex code-grep (Google Code Search / Zoekt
    design): required literal runs -> AND gram prefilter on the
    inverted index -> JVM-side regexp_count verify on the candidate
    join. Returns (doc_id, n_matches), the grep -c shape."""
    from synspark.grep import grep_search
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return grep_search(spark, store, corpus, GREP_PAT)


def q_fts_grep_count(spark, sf_dir):
    """Matching-doc count for the same grep (prefilter + rlike)."""
    from synspark.grep import grep_count
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return grep_count(spark, store, corpus, GREP_PAT)


def q_fts_grep_fallback(spark, sf_dir):
    """Regex with a top-level alternation — no sound gram prefilter
    exists, so the planner degrades to the verified full scan (the
    documented fallback); results must stay exact."""
    from synspark.grep import grep_count
    store = _index(spark, sf_dir)
    corpus = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return grep_count(spark, store, corpus, "data|info")


def _half_index(spark, sf_dir, which: int):
    """One of two disjoint half-corpus indexes (doc_id parity split)
    — the multi-index search fixture. Each half gets its OWN dense
    0..N/2 doc_id space (every real index numbers its own docs; the
    store's reader gate requires density), recoverable arithmetically:
    original id = 2 * half_id + which."""
    from synspark.index_store import FORMAT_VERSION, build_index
    from synspark.tokenizer import TokenizerConfig
    _ensure_shipped(spark)
    key = hashlib.md5(
        f"{sf_dir}|half{which}-f{FORMAT_VERSION}".encode()) \
        .hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"synspark_idx_{key}"
    corpus = (_docs(spark, sf_dir).withColumnRenamed("text", "content")
              .filter(F.pmod(F.col("doc_id"), F.lit(2)) == which)
              .withColumn("doc_id",
                          ((F.col("doc_id") - which) / 2)
                          .cast("long")))
    return build_index(
        spark, corpus, str(out),
        cfg=TokenizerConfig(n=2, expand=False, ignore_case=True),
        syn=None, n_shards=2,
        source=f"{sf_dir}/documents.parquet#half{which}", resume=True)


def q_fts_multi_index_topk(spark, sf_dir):
    """ES multi-index (alias) search in dfs_query_then_fetch mode:
    the corpus split across TWO indexes (doc_id parity), searched
    with COMBINED statistics (Σ df, Σ docs, token-weighted avgdl) —
    by the dfs contract the merged ranking must equal a single
    whole-corpus index, which is exactly what the oracle computes
    (per-index ids map back arithmetically to corpus ids)."""
    from synspark.multindex import search_indices
    even = _half_index(spark, sf_dir, 0)
    odd = _half_index(spark, sf_dir, 1)
    hits = search_indices(spark, {"even": even, "odd": odd},
                          BM25_QUERY, k=200, mode="and", dfs=True)
    orig = (F.col("doc_id") * 2
            + F.when(F.col("index") == "odd", 1).otherwise(0))
    return _rounded_topk(
        hits.select(orig.cast("long").alias("doc_id"), "score"), 10)


def q_fts_sliced_scroll(spark, sf_dir):
    """ES sliced scroll: slice 1 of 3 of the benchmark OR query's hit
    stream (doc_id mod 3) — disjoint, covering, deterministic
    partitions of the scroll set."""
    from synspark.query import match_ids
    store = _index(spark, sf_dir)
    return match_ids(spark, store, BM25_QUERY, mode="or",
                     sliced=(1, 3)).orderBy("doc_id")


def q_fts_percentiles_agg(spark, sf_dir):
    """ES ``percentiles`` metric aggregation over the match set's dl:
    exact interpolated quantiles (the oracle-comparable path; the
    t-digest-style sketch twin ``exact=False`` is pinned by pytest,
    as ES itself never serves exact percentiles)."""
    from synspark.query import percentiles_agg
    store = _index(spark, sf_dir)
    return percentiles_agg(spark, store, "dl",
                           (25.0, 50.0, 75.0, 95.0, 99.0),
                           BM25_QUERY, mode="and")


def q_fts_range_agg(spark, sf_dir):
    """ES ``range`` bucket aggregation over dl: [*,120), [120,160),
    [160,*) — every requested range materializes (empty included),
    from inclusive / to exclusive, ES key format."""
    from synspark.query import range_agg
    store = _index(spark, sf_dir)
    return range_agg(spark, store, "dl",
                     [(None, 120.0), (120.0, 160.0), (160.0, None)],
                     BM25_QUERY, mode="and")


def q_fts_composite_agg(spark, sf_dir):
    """ES ``composite`` aggregation (one terms source, lang) — page 2
    via after_key 'en': buckets in KEY order with the cursor predicate
    BEFORE the aggregate, constant cost per page."""
    from synspark.query import composite_agg
    store = _index(spark, sf_dir)
    return composite_agg(spark, store, "lang", size=10, after="en",
                         text=BM25_QUERY, mode="and")


def q_fts_phrase_prefix_count(spark, sf_dir):
    """ES ``match_phrase_prefix`` hit count ('key o' — last position
    prefix-expanded over the whole dictionary range, adjacency
    verified per shard like any MultiPhraseQuery)."""
    from synspark.multiterm import count_phrase_prefix
    store = _index(spark, sf_dir)
    return count_phrase_prefix(spark, store, "key o",
                               max_expansions=None)


def q_fts_phrase_prefix_topk(spark, sf_dir):
    """ES ``match_phrase_prefix`` ranked: BM25 over the positions with
    the expanded last position as a blended group (max-df idf, summed
    tf), restricted to adjacency-verified docs."""
    from synspark.multiterm import search_phrase_prefix
    store = _index(spark, sf_dir)
    return _rounded_topk(
        search_phrase_prefix(spark, store, "key o", k=200,
                             max_expansions=None), 10)


QS_QUERY = '+data "key order" -"slow scan" lang:en sort^2'


def q_fts_query_string(spark, sf_dir):
    """ES/Lucene ``query_string`` mini-DSL compiled onto the bool/WAND
    engine: '+data' must-scores, the phrase gates (per-shard adjacency)
    AND scores its grams, '-"slow scan"' excludes phrase-matching docs
    (id set merged into the liveDocs mask), 'lang:en' is a docmap
    filter pushed into the parquet scan, 'sort^2' is an optional
    boosted clause. The 'or' bigram lands in BOTH the phrase and the
    boosted should clause — per-group scoring sums to boost 3."""
    from synspark.querystring import query_string
    store = _index(spark, sf_dir)
    return _rounded_topk(
        query_string(spark, store, QS_QUERY, k=200), 10)


def q_fts_qs_prefix_topk(spark, sf_dir):
    """query_string with a boosted prefix clause ('+data s*^2'): the
    prefix expands over the term dictionary (top-df, capped 50) into
    ONE blended group — idf of the max-df expansion, tf summed over
    expansions (the SynonymQuery / blended-rewrite shape)."""
    from synspark.querystring import query_string
    store = _index(spark, sf_dir)
    return _rounded_topk(
        query_string(spark, store, "+data s*^2", k=200), 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "fts_term_stats": q_fts_term_stats,
        "fts_doc_lengths": q_fts_doc_lengths,
        "fts_bm25_topk": q_fts_bm25_topk,
        "fts_wand_topk": q_fts_wand_topk,
        "fts_wand_or_topk": q_fts_wand_or_topk,
        "fts_compact_topk": q_fts_compact_topk,
        "fts_fetch_sources": q_fts_fetch_sources,
        "fts_explain_score": q_fts_explain_score,
        "fts_highlight": q_fts_highlight,
        "fts_phrase_hits": q_fts_phrase_hits,
        "fts_count_and": q_fts_count_and,
        "fts_count_or": q_fts_count_or,
        "fts_synonym_bm25": q_fts_synonym_bm25,
        "fts_asym_count": q_fts_asym_count,
        "fts_analyze": q_fts_analyze,
        "fts_synfilter": q_fts_synfilter,
        "fts_graph_phrase": q_fts_graph_phrase,
        "fts_stream_count": q_fts_stream_count,
        "fts_stream_reload": q_fts_stream_reload,
        "fts_delete_topk": q_fts_delete_topk,
        "fts_purge_topk": q_fts_purge_topk,
        "fts_upsert_count": q_fts_upsert_count,
        "fts_match_ids": q_fts_match_ids,
        "fts_page2_topk": q_fts_page2_topk,
        "fts_bool_topk": q_fts_bool_topk,
        "fts_msm_topk": q_fts_msm_topk,
        "fts_msm_count": q_fts_msm_count,
        "fts_filter_topk": q_fts_filter_topk,
        "fts_docvalue_topk": q_fts_docvalue_topk,
        "fts_docvalue_count": q_fts_docvalue_count,
        "fts_terms_agg": q_fts_terms_agg,
        "fts_collapse_topk": q_fts_collapse_topk,
        "fts_sig_terms": q_fts_sig_terms,
        "fts_percolate": q_fts_percolate,
        "fts_snapshot_topk": q_fts_snapshot_topk,
        "fts_sort_page2": q_fts_sort_page2,
        "fts_sig_terms_sampled": q_fts_sig_terms_sampled,
        "fts_query_string": q_fts_query_string,
        "fts_qs_prefix_topk": q_fts_qs_prefix_topk,
        "fts_qs_opt_phrase": q_fts_qs_opt_phrase,
        "fts_terms_stats_agg": q_fts_terms_stats_agg,
        "fts_reindex_topk": q_fts_reindex_topk,
        "fts_rrf_hybrid": q_fts_rrf_hybrid,
        "fts_span_near_count": q_fts_span_near_count,
        "fts_span_ordered_count": q_fts_span_ordered_count,
        "fts_grep_search": q_fts_grep_search,
        "fts_grep_count": q_fts_grep_count,
        "fts_grep_fallback": q_fts_grep_fallback,
        "fts_multi_index_topk": q_fts_multi_index_topk,
        "fts_sliced_scroll": q_fts_sliced_scroll,
        "fts_percentiles_agg": q_fts_percentiles_agg,
        "fts_range_agg": q_fts_range_agg,
        "fts_composite_agg": q_fts_composite_agg,
        "fts_phrase_prefix_count": q_fts_phrase_prefix_count,
        "fts_phrase_prefix_topk": q_fts_phrase_prefix_topk,
        "fts_term_vectors": q_fts_term_vectors,
        "fts_top_hits": q_fts_top_hits,
        "fts_function_score": q_fts_function_score,
        "fts_constant_score": q_fts_constant_score,
        "fts_boosting": q_fts_boosting,
        "fts_rescore_topk": q_fts_rescore_topk,
        "fts_mlt_topk": q_fts_mlt_topk,
        "fts_slop_count": q_fts_slop_count,
        "fts_prefix_count": q_fts_prefix_count,
        "fts_prefix_topk": q_fts_prefix_topk,
        "fts_fuzzy_count": q_fts_fuzzy_count,
        "fts_fuzzy_topk": q_fts_fuzzy_topk,
        "fts_wildcard_topk": q_fts_wildcard_topk,
        "fts_regexp_count": q_fts_regexp_count,
        "fts_suggest_term": q_fts_suggest_term,
        "fts_suggest_completion": q_fts_suggest_completion,
        "fts_stats_agg": q_fts_stats_agg,
        "fts_histogram_agg": q_fts_histogram_agg,
        "fts_cardinality_agg": q_fts_cardinality_agg,
        "fts_sort_topk": q_fts_sort_topk,
        "fts_merge_topk": q_fts_merge_topk,
        "fts_multifield_topk": q_fts_multifield_topk,
        "fts_dismax_topk": q_fts_dismax_topk,
        "fts_index_stats": q_fts_index_stats,
        "dp_exact_dups": q_dp_exact_dups,
        "dp_token_counts": q_dp_token_counts,
        "dp_subword_counts": q_dp_subword_counts,
        "dp_quality": q_dp_quality,
        "dp_lang_id": q_dp_lang_id,
        "dp_fingerprints": q_dp_fingerprints,
        "dp_scrub": q_dp_scrub,
        "dp_chunks": q_dp_chunks,
        "dp_minhash_lsh": q_dp_minhash_lsh,
        "dp_jaccard_pairs": q_dp_jaccard_pairs,
        "dp_dedup_drop": q_dp_dedup_drop,
        "dp_simhash_dups": q_dp_simhash_dups,
        "dp_ann_cosine": q_dp_ann_cosine,
        "dp_ann_ivf": q_dp_ann_ivf,
        "dp_embedding_dups": q_dp_embedding_dups,
        "dp_media_meta": q_dp_media_meta,
        "dp_media_features": q_dp_media_features,
        "dp_resize_plan": q_dp_resize_plan,
        "dp_frame_plan": q_dp_frame_plan,
    }


# ---------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------

_DELIMS = "[ \t\n\r　]+"

# bigram tokenization of documents.text — mirrors the engine's
# tokenizer at n=2, expand=false, no dict (short blocks emit whole-span)


def _grams_cte(pred: str = "", table: str = "documents",
               sfx: str = "", lead: str = "WITH") -> str:
    """The bigram CTE over ``table`` (default ``documents``; the
    delete/purge/upsert oracles pass a derived live-docs subquery) with
    an optional row predicate (e.g. the streaming row's doc_id < 300
    sub-corpus). ``sfx`` renames every CTE (multi-field oracles chain
    two instances); ``lead`` is "WITH" for the first chain and "," for
    a continuation."""
    return f"""
{lead} blocks{sfx} AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '{_DELIMS}')) AS blk
  FROM {table} {pred}
), nb{sfx} AS (
  SELECT doc_id, blk FROM blocks{sfx} WHERE length(blk) > 0
), gi{sfx} AS (
  SELECT doc_id, blk, unnest(generate_series(1, length(blk)-1)) AS i
  FROM nb{sfx} WHERE length(blk) >= 2
), grams{sfx} AS (
  SELECT doc_id, blk AS term FROM nb{sfx} WHERE length(blk) < 2
  UNION ALL
  SELECT doc_id, substr(blk, i, 2) AS term FROM gi{sfx}
)
"""


_GRAMS_CTE = _grams_cte()

_WORDS_CTE = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     w -> length(w) > 0) AS ws,
         text
  FROM documents
)
"""

_SHINGLES_CTE = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DELIMS}'),
                     w -> length(w) > 0) AS ws
  FROM documents
), sh_long AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
        FROM words WHERE len(ws) >= 3)
), sh_short AS (
  SELECT doc_id, array_to_string(ws, ' ') AS shingle
  FROM words WHERE len(ws) < 3
), shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT * FROM sh_long UNION ALL SELECT * FROM sh_short)
  WHERE length(shingle) > 0
)
"""


def _qterm_values() -> str:
    """VALUES list of the benchmark query's distinct bigrams (all
    distinct, so group-AND == all-terms-present)."""
    return ", ".join(f"('{t}')"
                     for t in sorted(set(_query_bigrams(BM25_QUERY))))


def _perc_reg_values() -> str:
    """VALUES list (query_id, term) mirroring register_queries over
    PERC_QUERIES (expand=False: every group is its one bigram, and no
    query repeats a bigram, so distinct-term counting == group
    counting)."""
    rows = []
    for q in PERC_QUERIES:
        for t in sorted(set(_query_bigrams(q[1]))):
            rows.append(f"({q[0]}, '{t}')")
    return ", ".join(rows)


def _perc_req_values() -> str:
    """VALUES list (query_id, required): and=all groups, or=1, msm=m."""
    rows = []
    for q in PERC_QUERIES:
        n = len(set(_query_bigrams(q[1])))
        req = n if q[2] == "and" else (1 if q[2] == "or"
                                       else min(q[3], n))
        rows.append(f"({q[0]}, {req})")
    return ", ".join(rows)


def _match_dl_cte() -> str:
    """Continuation CTEs after _GRAMS_CTE: ``m`` = the benchmark
    query's AND match set, ``dl`` = per-doc gram count — the shared
    scaffold of the aggregation/sort oracles."""
    return f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
), m AS (
  SELECT doc_id FROM per_doc WHERE c = (SELECT count(*) FROM qt)
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM grams GROUP BY doc_id
)
"""


def _bm25_prefix(table: str = "documents", sfx: str = "",
                 lead: str = "WITH",
                 qterms_sql: str | None = None) -> str:
    """Shared CTE chain through ``scored{sfx}`` (doc_id, score, ng)
    for the benchmark query's bigrams — reused by every BM25-derived
    oracle. ``table`` swaps in a derived corpus (the purge oracle's
    renumbered live docs); ``sfx``/``lead`` allow chaining two
    instances (multi-field); ``qterms_sql`` replaces the fixed VALUES
    query-term list with a derived selection (the prefix/MLT rewrites,
    which pick their clause terms from the corpus itself)."""
    terms = sorted(set(_query_bigrams(BM25_QUERY)))
    vals = ", ".join(f"('{t}')" for t in terms)
    qsrc = qterms_sql or f"SELECT * FROM (VALUES {vals}) AS q(term)"
    return _grams_cte(table=table, sfx=sfx, lead=lead) + f"""
, qterms{sfx} AS ({qsrc})
, tf{sfx} AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams{sfx}
  GROUP BY 1, 2
), dl{sfx} AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams{sfx} GROUP BY 1
), stats{sfx} AS (
  SELECT (SELECT count(*) FROM {table})::DOUBLE AS n,
         (SELECT avg(dl) FROM dl{sfx}) AS avgdl
), dfs{sfx} AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf{sfx}
  WHERE term IN (SELECT term FROM qterms{sfx}) GROUP BY term
), scored{sfx} AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score,
         count(*) AS ng
  FROM tf{sfx} t
  JOIN dfs{sfx} d USING (term)
  JOIN dl{sfx} l USING (doc_id)
  CROSS JOIN stats{sfx} s
  WHERE t.term IN (SELECT term FROM qterms{sfx})
  GROUP BY t.doc_id
)
"""


def _bm25_words(qterms_sql: str) -> str:
    """Word-level BM25 scored CTE (the word index's whole-block
    tokens, same shape as the slop oracle's ``tok``): ``qterms_sql``
    must yield (term, boost); ``scored`` is (doc_id, score). The
    fuzzy/wildcard oracles derive their qterms from the corpus
    vocabulary exactly as the engine's term-dictionary expansion
    does."""
    return f"""
WITH wl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     x -> length(x) > 0) AS ws
  FROM documents
), tok AS (
  SELECT doc_id, unnest(ws) AS term FROM wl
), qterms AS ({qterms_sql})
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
), scored AS (
  SELECT t.doc_id,
         sum(q.boost * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score
  FROM tf t
  JOIN dfs d USING (term)
  JOIN qterms q USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
"""


# Lucene FuzzyTermsEnum boost for the 'qery' (len 4) expansion;
# mirrors multiterm._fuzzy_clauses bit-exactly (same IEEE ops).
_FUZZY_BOOST = ("CASE WHEN d = 0 THEN 1.0 "
                "ELSE 1.0 - d / least(length(term), 4) END")

_FUZZY_QTERMS = f"""
  SELECT term, {_FUZZY_BOOST} AS boost
  FROM (
    SELECT term, levenshtein(term, 'qery')::DOUBLE AS d,
           count(DISTINCT doc_id) AS df
    FROM tok
    WHERE abs(length(term) - 4) <= 2
    GROUP BY term
    HAVING levenshtein(term, 'qery') <= 2
    ORDER BY levenshtein(term, 'qery') ASC, df DESC, term ASC
    LIMIT 50
  )
  WHERE {_FUZZY_BOOST} > 0
"""

_WILDCARD_QTERMS = """
  SELECT term, 1.0 AS boost
  FROM (
    SELECT term, count(DISTINCT doc_id) AS df
    FROM tok WHERE term LIKE 's%'
    GROUP BY term
    ORDER BY df DESC, term ASC LIMIT 5
  )
"""

_WORDS_TOK_CTE = f"""
WITH wl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     x -> length(x) > 0) AS ws
  FROM documents
), tok AS (
  SELECT doc_id, unnest(ws) AS term FROM wl
)
"""


def _n_groups() -> int:
    return len(set(_query_bigrams(BM25_QUERY)))


def _bm25_oracle(mode: str = "and") -> str:
    gate = f"WHERE ng = {_n_groups()}" if mode == "and" else ""
    return _bm25_prefix() + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
{gate}
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
"""


def _bool_oracle() -> str:
    """must='data' ∧ should='sort merge' ∧ must_not='key' over the
    bigram index: score = Σ BM25 over matched must+should terms;
    gates are all-must-present, no must_not term present (the three
    texts' bigram sets are disjoint, so per-term scoring == per-group
    scoring)."""
    m = sorted(set(_query_bigrams(BOOL_MUST)))
    s = sorted(set(_query_bigrams(BOOL_SHOULD)) - set(m))
    x = sorted(set(_query_bigrams(BOOL_NOT)))
    mv = ", ".join(f"('{t}')" for t in m)
    sv = ", ".join(f"('{t}')" for t in s)
    xl = ", ".join(f"'{t}'" for t in x)
    return _grams_cte() + f"""
, qterms AS (SELECT * FROM (VALUES {mv}, {sv}) AS q(term))
, mterms AS (SELECT * FROM (VALUES {mv}) AS q(term))
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
), scored AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score,
         count(*) FILTER (WHERE t.term IN (SELECT term FROM mterms))
           AS nm
  FROM tf t
  JOIN dfs d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  WHERE t.term IN (SELECT term FROM qterms)
  GROUP BY t.doc_id
), excl AS (
  SELECT DISTINCT doc_id FROM grams WHERE term IN ({xl})
)
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE nm = {len(m)} AND doc_id NOT IN (SELECT doc_id FROM excl)
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
"""


def _qs_oracle() -> str:
    """QS_QUERY ('+data "key order" -"slow scan" lang:en sort^2') over
    the bigram index: qterm boosts SUM per bigram occurrence across
    clauses ('or' sits in the phrase and the ×2 should → 3.0); gate =
    every distinct must gram present ∧ phrase-adjacency regex ∧
    lang='en' ∧ NOT excluded-phrase regex — exactly the compiled
    plan's must groups + allow/exclude id sets + docmap filter."""
    from collections import Counter
    boosts: Counter = Counter()
    for text, w in (("data", 1.0), ("key order", 1.0), ("sort", 2.0)):
        for g in _query_bigrams(text):
            boosts[g] += w
    mterms = sorted(set(_query_bigrams("data"))
                    | set(_query_bigrams("key order")))
    qv = ", ".join(f"('{t}', {b})" for t, b in sorted(boosts.items()))
    ml = ", ".join(f"'{t}'" for t in mterms)
    ph = "key order".replace(" ", _DELIMS)
    xph = "slow scan".replace(" ", _DELIMS)
    return _grams_cte() + f"""
, qterms AS (SELECT * FROM (VALUES {qv}) AS q(term, boost))
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
), scored AS (
  SELECT t.doc_id,
         sum(q.boost * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score,
         count(*) FILTER (WHERE t.term IN ({ml})) AS nm
  FROM tf t
  JOIN dfs d USING (term)
  JOIN qterms q USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT s.doc_id, round(score, 6) AS score_r FROM scored s
JOIN documents doc USING (doc_id)
WHERE nm = {len(mterms)}
  AND regexp_matches(doc.text, '{ph}')
  AND NOT regexp_matches(doc.text, '{xph}')
  AND doc.lang = 'en'
ORDER BY round(score, 6) DESC, s.doc_id LIMIT 10
"""


def _qs_prefix_oracle() -> str:
    """'+data s*^2': must grams of 'data' score per term; the prefix
    clause is ONE blended group — expansion = top-50 grams LIKE 's%'
    by df DESC, term ASC (the engine's deterministic top_terms cap);
    blended tf = Σ member tf, blended idf from the MAX member df
    (plan_bool's group-idf rule), ×2 boost."""
    m = sorted(set(_query_bigrams("data")))
    mv = ", ".join(f"('{t}')" for t in m)
    ml = ", ".join(f"'{t}'" for t in m)
    return _grams_cte() + f"""
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), exp AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM grams
  WHERE term LIKE 's%'
  GROUP BY term
  ORDER BY count(DISTINCT doc_id) DESC, term ASC LIMIT 50
), mdfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ({ml}) GROUP BY term
), mscore AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score,
         count(*) AS nm
  FROM tf t
  JOIN mdfs d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
), pblend AS (
  SELECT t.doc_id, sum(t.tf) AS btf FROM tf t
  WHERE t.term IN (SELECT term FROM exp)
  GROUP BY t.doc_id
), pscore AS (
  SELECT p.doc_id,
         2.0 * ln(1 + (s.n - (SELECT max(df) FROM exp) + 0.5)
                  / ((SELECT max(df) FROM exp) + 0.5)) *
         p.btf / (p.btf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS score
  FROM pblend p
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
)
SELECT m.doc_id,
       round(m.score + coalesce(p.score, 0), 6) AS score_r
FROM mscore m LEFT JOIN pscore p USING (doc_id)
WHERE m.nm = {len(m)}
ORDER BY round(m.score + coalesce(p.score, 0), 6) DESC, m.doc_id
LIMIT 10
"""


def _qs_opt_phrase_oracle() -> str:
    """'merge "key order"' with optional phrases: score = Σ merge-gram
    scores + (phrase-adjacent ? Σ phrase-gram scores : 0); a doc
    matches iff any merge gram is present OR the phrase is adjacent.
    The shared 'er' gram scores on BOTH sides when both fire —
    exactly the engine's per-clause summation."""
    mg = sorted(set(_query_bigrams("merge")))
    pg = sorted(set(_query_bigrams("key order")))
    mv = ", ".join(f"('{t}')" for t in mg)
    pv = ", ".join(f"('{t}')" for t in pg)
    allv = ", ".join(f"('{t}')" for t in sorted(set(mg) | set(pg)))
    ph = "key order".replace(" ", _DELIMS)
    return _grams_cte() + f"""
, qall AS (SELECT * FROM (VALUES {allv}) AS q(term))
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qall) GROUP BY term
), sc AS (
  SELECT t.doc_id, t.term,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
         t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS ts
  FROM tf t
  JOIN dfs d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
), a AS (
  SELECT doc_id, sum(ts) AS s FROM sc
  WHERE term IN (SELECT * FROM (VALUES {mv})) GROUP BY doc_id
), pd AS (
  SELECT doc_id FROM documents
  WHERE regexp_matches(text, '{ph}')
), b AS (
  SELECT doc_id, sum(ts) AS s FROM sc
  WHERE term IN (SELECT * FROM (VALUES {pv}))
    AND doc_id IN (SELECT doc_id FROM pd)
  GROUP BY doc_id
)
SELECT doc_id,
       round(coalesce(a.s, 0) + coalesce(b.s, 0), 6) AS score_r
FROM a FULL JOIN b USING (doc_id)
ORDER BY round(coalesce(a.s, 0) + coalesce(b.s, 0), 6) DESC, doc_id
LIMIT 10
"""


def _reindex_oracle() -> str:
    """'data'-subset reindex: dense ids = rank of original id among
    matches; BM25 of the benchmark query over the SUBSET corpus with
    subset statistics — the whole-pipeline spec of _reindex + search
    in one SQL (DuckDB allows the WITH-bearing derived table)."""
    dterms = sorted(set(_query_bigrams("data")))
    tl = ", ".join(f"'{t}'" for t in dterms)
    sub = ("(" + _grams_cte() + f"""
, per AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN ({tl}) GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY d.doc_id) - 1 AS doc_id, d.text
FROM documents d JOIN per USING (doc_id)
WHERE per.c = {len(dterms)}
)""")
    return _bm25_prefix(table=sub) + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng = {_n_groups()}
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
"""


def _phrase_prefix_oracle() -> str:
    """'key o' match_phrase_prefix, uncapped: adjacency gate = the
    raw-text regex (bigram positions mirror substrings); score = BM25
    over [ke],[ey] plus the blended 'o%'-expansion group (max-df idf,
    summed tf) — identical to the engine's MultiPhrasePrefix
    contract."""
    return _grams_cte() + f"""
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), pdocs AS (
  SELECT doc_id FROM documents
  WHERE regexp_matches(text, 'key[ \t\n\r　]+o')
), edfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf WHERE term LIKE 'o%'
  GROUP BY term
), kdfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ('ke', 'ey') GROUP BY term
), ks AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score,
         count(*) AS nm
  FROM tf t
  JOIN kdfs d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
), ob AS (
  SELECT t.doc_id, sum(t.tf) AS btf FROM tf t
  WHERE t.term LIKE 'o%' GROUP BY t.doc_id
), os AS (
  SELECT o.doc_id,
         ln(1 + (s.n - (SELECT max(df) FROM edfs) + 0.5)
            / ((SELECT max(df) FROM edfs) + 0.5)) *
         o.btf / (o.btf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS score
  FROM ob o JOIN dl l USING (doc_id) CROSS JOIN stats s
)
SELECT k.doc_id, round(k.score + coalesce(o.score, 0), 6) AS score_r
FROM ks k LEFT JOIN os o USING (doc_id)
WHERE k.nm = 2 AND k.doc_id IN (SELECT doc_id FROM pdocs)
ORDER BY round(k.score + coalesce(o.score, 0), 6) DESC, k.doc_id
LIMIT 10
"""


def _filter_oracle() -> str:
    """must='data' scores; filter='sort' gates without scoring: the
    BM25 sum runs over the must bigrams only, restricted to docs
    containing every filter bigram."""
    m = sorted(set(_query_bigrams(BOOL_MUST)))
    f = sorted(set(_query_bigrams("sort")))
    mv = ", ".join(f"('{t}')" for t in m)
    fl = ", ".join(f"'{t}'" for t in f)
    return _grams_cte() + f"""
, qterms AS (SELECT * FROM (VALUES {mv}) AS q(term))
, tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM grams GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM grams GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
), scored AS (
  SELECT t.doc_id,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             t.tf / (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)))
           AS score,
         count(*) AS nm
  FROM tf t
  JOIN dfs d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  WHERE t.term IN (SELECT term FROM qterms)
  GROUP BY t.doc_id
), fdocs AS (
  SELECT doc_id FROM grams WHERE term IN ({fl})
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(f)}
)
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE nm = {len(m)} AND doc_id IN (SELECT doc_id FROM fdocs)
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
"""


def _fetch_sources_oracle() -> str:
    return _bm25_prefix() + f"""
, top AS (
  SELECT doc_id, round(score, 6) AS score_r FROM scored
  WHERE ng = {_n_groups()}
  ORDER BY round(score, 6) DESC, doc_id LIMIT 5
)
SELECT t.doc_id, d.lang, sha256(d.text) AS content_sha256, t.score_r
FROM top t JOIN documents d USING (doc_id)
"""


def _explain_oracle() -> str:
    gid_vals = ", ".join(f"({i}, '{t}')"
                         for i, t in enumerate(_query_bigrams(BM25_QUERY)))
    return _bm25_prefix() + f"""
, top1 AS (
  SELECT doc_id FROM scored WHERE ng = {_n_groups()}
  ORDER BY round(score, 6) DESC, doc_id LIMIT 1
), qmap AS (SELECT * FROM (VALUES {gid_vals}) AS q(gid, term))
SELECT m.gid, m.term AS terms, t.tf::BIGINT AS tf, l.dl::BIGINT AS dl,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6) AS idf_r,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf /
             (t.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)), 6)
         AS gscore_r
FROM qmap m
JOIN tf t ON t.term = m.term AND t.doc_id = (SELECT doc_id FROM top1)
JOIN dl l ON l.doc_id = t.doc_id
JOIN dfs d ON d.term = m.term
CROSS JOIN stats s
"""


def _highlight_oracle() -> str:
    """Spans of the query bigrams in the top-3 docs: a bigram token
    exists exactly at the character positions where the 2-char window
    equals the term (windows crossing a block boundary contain a
    delimiter and can never equal a delimiter-free term), capped at 10
    spans per doc in offset order — the engine's re-analysis cap."""
    return _bm25_prefix() + f"""
, top3 AS (
  SELECT doc_id FROM scored WHERE ng = {_n_groups()}
  ORDER BY round(score, 6) DESC, doc_id LIMIT 3
), chars AS (
  SELECT d.doc_id, unnest(generate_series(1, length(d.text) - 1)) AS i,
         d.text
  FROM documents d JOIN top3 USING (doc_id)
), spans AS (
  SELECT doc_id, (i - 1)::INT AS start, (i + 1)::INT AS "end",
         substr(text, i, 2) AS term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM chars
  WHERE substr(text, i, 2) IN (SELECT term FROM qterms)
)
SELECT doc_id, start, "end", term FROM spans WHERE rn <= 10
"""


def _plane_cases(col: str, dim: int = 64, n_planes: int = 6) -> str:
    """The IVF/LSH bucket id as inline SQL: sign-bit sum against the
    seeded hyperplanes (DuckDB's sequential list_dot_product matches
    Spark's ordered fold — 0 sign mismatches over the test
    embeddings)."""
    from synspark.datapipe.similarity import _hyperplanes
    planes = _hyperplanes(dim, n_planes)
    return " + ".join(
        f"(CASE WHEN list_dot_product({col}, "
        f"[{','.join(repr(float(x)) for x in planes[i])}]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)" for i in range(n_planes))


def _ivf_oracle(dim: int = 64, n_planes: int = 6, probes: int = 16) -> str:
    """IVF bucketing is deterministic (seeded hyperplanes), so the
    whole approximate path is SQL-expressible: the plane vectors are
    inlined as literals, bucket = the same sign-bit sum, the probe set
    is the same (hamming, bucket)-ranked top-``probes`` computed in
    SQL."""

    def cases(col: str) -> str:
        return _plane_cases(col, dim, n_planes)

    cos = ("list_dot_product(b.v, q.qv) / (sqrt(list_dot_product(b.v, b.v))"
           " * sqrt(list_dot_product(q.qv, q.qv)))")
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0),
qb AS (SELECT {cases('qv')} AS qbits FROM q),
b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             {cases('embedding::DOUBLE[]')} AS bucket
      FROM embeddings WHERE vec_id != 0),
probes AS (
  SELECT bid FROM (SELECT unnest(generate_series(0, {(1 << n_planes) - 1}))
                   AS bid), qb
  ORDER BY bit_count(xor(bid::BIGINT, qbits::BIGINT)), bid LIMIT {probes}
)
SELECT vec_id, round({cos}, 6) AS cosine
FROM b, q
WHERE bucket IN (SELECT bid FROM probes)
ORDER BY round({cos}, 6) DESC, vec_id LIMIT 10
"""


def oracle_sql() -> dict[str, str]:
    bm25 = _bm25_oracle()
    phrase_re = PHRASE.replace(" ", "[ \t\n\r　]+")
    return {
        "fts_term_stats": _GRAMS_CTE + """
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM grams GROUP BY term ORDER BY df DESC, term LIMIT 100
""",
        "fts_doc_lengths": _GRAMS_CTE + """
SELECT doc_id, count(*)::INT AS dl FROM grams GROUP BY doc_id
""",
        "fts_bm25_topk": bm25,
        "fts_wand_topk": bm25,
        "fts_snapshot_topk": bm25,
        "fts_wand_or_topk": _bm25_oracle(mode="or"),
        # compaction is a pure shard relabeling: same docs, same
        # postings, same scores — the oracle IS the BM25 oracle
        "fts_compact_topk": bm25,
        "fts_fetch_sources": _fetch_sources_oracle(),
        "fts_explain_score": _explain_oracle(),
        "fts_highlight": _highlight_oracle(),
        # the LUCENE-5252 boundary-expansion stream for かきいうえお with
        # dict あ,かき (reference-documented, SURVEY §3.2)
        "fts_analyze": """
SELECT * FROM (VALUES
  ('かき', 0, 2, 1, 0), ('あ', 0, 2, 0, 0),
  ('い', 2, 3, 1, 1), ('いう', 2, 4, 0, 1),
  ('うえ', 3, 5, 1, 2), ('えお', 4, 6, 1, 3)
) AS t(token, start_offset, end_offset, pos_inc, position)
""",
        "fts_phrase_hits": f"""
SELECT count(*)::BIGINT AS hits FROM documents
WHERE regexp_matches(text, '{phrase_re}')
""",
        "fts_count_and": _GRAMS_CTE + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
)
SELECT count(*)::BIGINT AS hits FROM per_doc
WHERE c = (SELECT count(*) FROM qt)
""",
        "fts_bool_topk": _bool_oracle(),
        "fts_filter_topk": _filter_oracle(),
        "fts_docvalue_topk": _bm25_prefix() + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng = {_n_groups()}
  AND doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_docvalue_count": _bm25_prefix() + """
SELECT count(*)::BIGINT AS hits FROM scored
WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'zh')
""",
        "fts_msm_topk": _bm25_prefix() + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng >= {MSM_M}
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_msm_count": _bm25_prefix() + f"""
SELECT count(*)::BIGINT AS hits FROM scored WHERE ng >= {MSM_M}
""",
        "fts_terms_agg": _GRAMS_CTE + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
), m AS (
  SELECT doc_id FROM per_doc WHERE c = (SELECT count(*) FROM qt)
)
SELECT d.lang AS lang, count(*)::BIGINT AS doc_count
FROM m JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY doc_count DESC, lang LIMIT 10
""",
        "fts_sort_page2": _GRAMS_CTE + _match_dl_cte() + """
SELECT m.doc_id, l.dl::INT AS dl, d.lang AS lang
FROM m JOIN dl l USING (doc_id) JOIN documents d USING (doc_id)
ORDER BY l.dl DESC, d.lang ASC, m.doc_id ASC LIMIT 10 OFFSET 10
""",
        "fts_query_string": _qs_oracle(),
        "fts_qs_prefix_topk": _qs_prefix_oracle(),
        "fts_qs_opt_phrase": _qs_opt_phrase_oracle(),
        "fts_terms_stats_agg": _GRAMS_CTE + _match_dl_cte() + """
SELECT d.lang AS key, count(*)::BIGINT AS doc_count,
       min(l.dl)::BIGINT AS min, max(l.dl)::BIGINT AS max,
       round(avg(l.dl), 6) AS avg, sum(l.dl)::BIGINT AS sum
FROM m JOIN dl l USING (doc_id) JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY count(*) DESC, d.lang ASC LIMIT 10
""",
        "fts_reindex_topk": _reindex_oracle(),
        "fts_rrf_hybrid": _bm25_prefix() + f"""
, lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
           AS rank
  FROM scored WHERE ng = {_n_groups()}
  QUALIFY rank <= 100
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), cosd AS (
  SELECT vec_id AS doc_id,
    round(list_dot_product(embedding::DOUBLE[], q.qv) /
          (sqrt(list_dot_product(embedding::DOUBLE[],
                                 embedding::DOUBLE[]))
           * sqrt(list_dot_product(q.qv, q.qv))), 6) AS c
  FROM embeddings, q
), vec AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY c DESC, doc_id) AS rank
  FROM cosd QUALIFY rank <= 100
), parts AS (
  SELECT doc_id, 1.0 / (60 + rank) AS c FROM lex
  UNION ALL
  SELECT doc_id, 1.0 / (60 + rank) FROM vec
)
SELECT doc_id, round(sum(c), 6) AS rrf_score FROM parts
GROUP BY doc_id
ORDER BY round(sum(c), 6) DESC, doc_id LIMIT 10
""",
        "fts_span_near_count": f"""
WITH wl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     x -> length(x) > 0) AS ws
  FROM documents
), tok AS (
  SELECT doc_id, ws[p] AS word, p
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
        FROM wl)
)
SELECT count(DISTINCT a.doc_id)::BIGINT AS hits
FROM tok a JOIN tok b USING (doc_id)
WHERE a.word = 'key' AND b.word = 'order'
  AND b.p - a.p BETWEEN -3 AND 3
""",
        "fts_span_ordered_count": f"""
WITH wl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     x -> length(x) > 0) AS ws
  FROM documents
), tok AS (
  SELECT doc_id, ws[p] AS word, p
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
        FROM wl)
)
SELECT count(DISTINCT a.doc_id)::BIGINT AS hits
FROM tok a JOIN tok b USING (doc_id)
WHERE a.word = 'key' AND b.word = 'order'
  AND b.p - a.p BETWEEN 1 AND 2
""",
        "fts_grep_search": f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{GREP_PAT}'))::BIGINT
         AS n_matches
FROM documents
WHERE regexp_matches(text, '{GREP_PAT}')
ORDER BY doc_id
""",
        "fts_grep_count": f"""
SELECT count(*)::BIGINT AS hits FROM documents
WHERE regexp_matches(text, '{GREP_PAT}')
""",
        "fts_grep_fallback": """
SELECT count(*)::BIGINT AS hits FROM documents
WHERE regexp_matches(text, 'data|info')
""",
        # dfs_query_then_fetch over a split corpus == one merged
        # index: the whole-corpus BM25 oracle IS the spec
        "fts_multi_index_topk": _bm25_oracle("and"),
        "fts_sliced_scroll": _GRAMS_CTE + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
)
SELECT doc_id FROM per_doc WHERE doc_id % 3 = 1 ORDER BY doc_id
""",
        "fts_percentiles_agg": _GRAMS_CTE + _match_dl_cte() + """
SELECT round(quantile_cont(l.dl, 0.25), 6) AS p25,
       round(quantile_cont(l.dl, 0.5), 6) AS p50,
       round(quantile_cont(l.dl, 0.75), 6) AS p75,
       round(quantile_cont(l.dl, 0.95), 6) AS p95,
       round(quantile_cont(l.dl, 0.99), 6) AS p99
FROM m JOIN dl l USING (doc_id)
""",
        "fts_range_agg": _GRAMS_CTE + _match_dl_cte() + """
, j AS (SELECT l.dl FROM m JOIN dl l USING (doc_id))
SELECT r.key, coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM (VALUES ('*-120'), ('120-160'), ('160-*')) AS r(key)
LEFT JOIN (
  SELECT '*-120' AS key, count(*)::BIGINT AS doc_count FROM j
  WHERE dl < 120
  UNION ALL
  SELECT '120-160', count(*)::BIGINT FROM j
  WHERE dl >= 120 AND dl < 160
  UNION ALL
  SELECT '160-*', count(*)::BIGINT FROM j WHERE dl >= 160
) c USING (key)
""",
        "fts_composite_agg": _GRAMS_CTE + _match_dl_cte() + """
SELECT d.lang AS lang, count(*)::BIGINT AS doc_count
FROM m JOIN documents d USING (doc_id)
WHERE d.lang > 'en'
GROUP BY d.lang ORDER BY d.lang ASC LIMIT 10
""",
        "fts_phrase_prefix_count": """
SELECT count(*)::BIGINT AS hits FROM documents
WHERE regexp_matches(text, 'key[ \t\n\r　]+o')
""",
        "fts_phrase_prefix_topk": _phrase_prefix_oracle(),
        "fts_sig_terms_sampled": _bm25_prefix() + f"""
, m AS (
  SELECT doc_id FROM scored WHERE ng = {_n_groups()}
  ORDER BY round(score, 6) DESC, doc_id LIMIT 50
), fgt AS (SELECT count(*)::DOUBLE AS n FROM m)
, fg AS (
  SELECT g.term, count(DISTINCT g.doc_id)::BIGINT AS doc_count
  FROM grams g JOIN m USING (doc_id) GROUP BY g.term
), bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_count FROM grams
  WHERE term IN (SELECT term FROM fg) GROUP BY term
), tot AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n)
SELECT term, doc_count, bg_count, score_r FROM (
  SELECT f.term, f.doc_count, b.bg_count,
         round(CASE WHEN (f.doc_count / fgt.n) > (b.bg_count / tot.n)
               THEN ((f.doc_count / fgt.n) - (b.bg_count / tot.n))
                    * ((f.doc_count / fgt.n) / (b.bg_count / tot.n))
               ELSE 0.0 END, 6) AS score_r
  FROM fg f JOIN bg b USING (term), fgt, tot
) WHERE score_r > 0
ORDER BY score_r DESC, term LIMIT 10
""",
        "fts_percolate": _GRAMS_CTE + f"""
, reg AS (SELECT * FROM (VALUES {_perc_reg_values()})
          AS r(query_id, term))
, req AS (SELECT * FROM (VALUES {_perc_req_values()})
          AS r(query_id, required))
, m AS (
  SELECT g.doc_id, r.query_id, count(DISTINCT g.term) AS c
  FROM (SELECT DISTINCT doc_id, term FROM grams) g
  JOIN reg r USING (term) GROUP BY 1, 2
)
SELECT m.doc_id, m.query_id::BIGINT AS query_id
FROM m JOIN req USING (query_id)
WHERE m.c >= req.required
ORDER BY doc_id, query_id
""",
        "fts_sig_terms": _GRAMS_CTE + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
), m AS (
  SELECT doc_id FROM per_doc WHERE c = (SELECT count(*) FROM qt)
), fgt AS (SELECT count(*)::DOUBLE AS n FROM m)
, fg AS (
  SELECT g.term, count(DISTINCT g.doc_id)::BIGINT AS doc_count
  FROM grams g JOIN m USING (doc_id) GROUP BY g.term
), bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_count FROM grams
  WHERE term IN (SELECT term FROM fg) GROUP BY term
), tot AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n)
SELECT term, doc_count, bg_count, score_r FROM (
  SELECT f.term, f.doc_count, b.bg_count,
         round(CASE WHEN (f.doc_count / fgt.n) > (b.bg_count / tot.n)
               THEN ((f.doc_count / fgt.n) - (b.bg_count / tot.n))
                    * ((f.doc_count / fgt.n) / (b.bg_count / tot.n))
               ELSE 0.0 END, 6) AS score_r
  FROM fg f JOIN bg b USING (term), fgt, tot
) WHERE score_r > 0
ORDER BY score_r DESC, term LIMIT 10
""",
        "fts_term_vectors": _GRAMS_CTE + """
, tv AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM grams
  WHERE doc_id IN (3, 7) GROUP BY 1, 2
), st AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
         count(*)::BIGINT AS ttf
  FROM grams WHERE term IN (SELECT term FROM tv) GROUP BY term
)
SELECT t.doc_id, t.term, t.tf, s.df, s.ttf
FROM tv t JOIN st s USING (term)
ORDER BY doc_id, term
""",
        "fts_collapse_topk": _bm25_prefix() + f"""
SELECT doc_id, lang, score_r FROM (
  SELECT s.doc_id, d.lang, round(s.score, 6) AS score_r,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY round(s.score, 6) DESC,
                                     s.doc_id) AS rn
  FROM scored s JOIN documents d USING (doc_id)
  WHERE s.ng = {_n_groups()}
) WHERE rn = 1
ORDER BY score_r DESC, doc_id LIMIT 5
""",
        "fts_top_hits": _bm25_prefix() + f"""
, h AS (
  SELECT d.lang, s.doc_id, round(s.score, 6) AS score_r,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY round(s.score, 6) DESC,
                                     s.doc_id) AS rank,
         count(*) OVER (PARTITION BY d.lang) AS doc_count
  FROM scored s JOIN documents d USING (doc_id)
  WHERE s.ng = {_n_groups()}
), b AS (
  SELECT lang FROM (SELECT DISTINCT lang, doc_count FROM h)
  ORDER BY doc_count DESC, lang LIMIT 3
)
SELECT h.lang, h.doc_count::BIGINT AS doc_count, h.rank::INT AS rank,
       h.doc_id, h.score_r
FROM h JOIN b USING (lang) WHERE h.rank <= 2
ORDER BY doc_count DESC, lang, rank
""",
        "fts_function_score": _bm25_prefix() + f"""
SELECT s.doc_id,
       round(s.score * log10(1.0 * l.dl + 1.0), 6) AS score_r
FROM scored s JOIN dl l USING (doc_id)
WHERE s.ng = {_n_groups()}
ORDER BY score_r DESC, doc_id LIMIT 10
""",
        "fts_constant_score": _bm25_prefix() + f"""
SELECT doc_id, 1.5::DOUBLE AS score_r FROM scored
WHERE ng = {_n_groups()}
ORDER BY doc_id LIMIT 10
""",
        "fts_boosting": _bm25_prefix() + f"""
, negdocs AS (
  SELECT doc_id FROM grams
  WHERE term IN ({", ".join(f"'{t}'" for t in
                            sorted(set(_query_bigrams(PHRASE))))})
  GROUP BY doc_id
  HAVING count(DISTINCT term) = {len(set(_query_bigrams(PHRASE)))}
)
SELECT s.doc_id,
       round(CASE WHEN s.doc_id IN (SELECT doc_id FROM negdocs)
                  THEN s.score * 0.3 ELSE s.score END, 6) AS score_r
FROM scored s WHERE s.ng = {_n_groups()}
ORDER BY score_r DESC, doc_id LIMIT 10
""",
        "fts_rescore_topk": (
            _bm25_prefix()
            + _bm25_prefix(sfx="2", lead=",", qterms_sql=(
                "SELECT * FROM (VALUES " + ", ".join(
                    f"('{t}')" for t in
                    sorted(set(_query_bigrams(RESCORE_QUERY))))
                + ") AS q(term)"))
            + f"""
, win AS (
  SELECT doc_id, score FROM scored WHERE ng = {_n_groups()}
  ORDER BY score DESC, doc_id LIMIT 50
)
SELECT w.doc_id,
       round(w.score + 2.0 * coalesce(s.score, 0), 6) AS score_r
FROM win w LEFT JOIN scored2 s USING (doc_id)
ORDER BY round(w.score + 2.0 * coalesce(s.score, 0), 6) DESC, doc_id
LIMIT 10
"""),
        "fts_mlt_topk": _bm25_prefix(qterms_sql=(
            "SELECT term FROM ("
            "SELECT g.term AS term, round(count(*) * ln(1 + "
            "((SELECT count(*) FROM documents) - d.df + 0.5) "
            "/ (d.df + 0.5)), 6) AS sc "
            "FROM grams g JOIN (SELECT term, count(DISTINCT doc_id) "
            "AS df FROM grams GROUP BY term) d ON g.term = d.term "
            "WHERE g.doc_id = 42 GROUP BY g.term, d.df "
            "HAVING count(*) >= 2 AND d.df >= 5 "
            "ORDER BY sc DESC, term LIMIT 25)")) + """
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE doc_id != 42
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_slop_count": f"""
WITH wl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     x -> length(x) > 0) AS ws
  FROM documents
), tok AS (
  SELECT doc_id, ws[p] AS word, p
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p
        FROM wl)
)
SELECT count(DISTINCT a.doc_id)::BIGINT AS hits
FROM tok a JOIN tok b USING (doc_id)
WHERE a.word = 'key' AND b.word = 'order'
  AND abs((b.p - a.p) - 1) <= 2
""",
        "fts_prefix_count": _GRAMS_CTE + """
SELECT count(DISTINCT doc_id)::BIGINT AS hits FROM grams
WHERE term LIKE 'd%'
""",
        "fts_prefix_topk": _bm25_prefix(qterms_sql=(
            "SELECT term FROM ("
            "SELECT term, count(DISTINCT doc_id) AS pdf FROM grams "
            "WHERE term LIKE 'd%' GROUP BY term) "
            "ORDER BY pdf DESC, term LIMIT 5")) + """
SELECT doc_id, round(score, 6) AS score_r FROM scored
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_fuzzy_count": _WORDS_TOK_CTE + """
SELECT count(DISTINCT doc_id)::BIGINT AS hits FROM tok
WHERE levenshtein(term, 'qery') <= 2
""",
        "fts_fuzzy_topk": _bm25_words(_FUZZY_QTERMS) + """
SELECT doc_id, round(score, 6) AS score_r FROM scored
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_wildcard_topk": _bm25_words(_WILDCARD_QTERMS) + """
SELECT doc_id, round(score, 6) AS score_r FROM scored
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_regexp_count": _WORDS_TOK_CTE + """
SELECT count(DISTINCT doc_id)::BIGINT AS hits FROM tok
WHERE regexp_full_match(term, '.*or.*')
""",
        "fts_suggest_term": _WORDS_TOK_CTE + """
, dict AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
  GROUP BY term
), toks AS (
  SELECT * FROM (VALUES ('merge'), ('qery'), ('slot')) AS t(token)
), cand AS (
  SELECT t.token, d.term, d.df,
         levenshtein(d.term, t.token)::DOUBLE AS dist
  FROM toks t JOIN dict d
    ON length(d.term) BETWEEN length(t.token) - 2
                          AND length(t.token) + 2
   AND substring(d.term, 1, 1) = substring(t.token, 1, 1)
  WHERE levenshtein(d.term, t.token) BETWEEN 1 AND 2
    AND NOT EXISTS (SELECT 1 FROM dict x WHERE x.term = t.token)
), sc AS (
  SELECT token, term AS suggestion, df,
         1.0 - dist / least(length(term), length(token)) AS score
  FROM cand
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY token
            ORDER BY score DESC, df DESC, suggestion ASC) AS rn
  FROM sc
)
SELECT token, suggestion, df, round(score, 6) AS score
FROM ranked WHERE rn <= 5
ORDER BY token ASC, round(score, 6) DESC, df DESC, suggestion ASC
""",
        "fts_suggest_completion": _WORDS_TOK_CTE + """
SELECT term AS suggestion, count(DISTINCT doc_id)::BIGINT AS weight
FROM tok WHERE term LIKE 's%'
GROUP BY term ORDER BY weight DESC, suggestion ASC LIMIT 5
""",
        "fts_stats_agg": _GRAMS_CTE + _match_dl_cte() + """
SELECT count(*)::BIGINT AS "count", min(l.dl)::BIGINT AS "min",
       max(l.dl)::BIGINT AS "max", round(avg(l.dl), 6) AS "avg",
       sum(l.dl)::BIGINT AS "sum"
FROM m JOIN dl l USING (doc_id)
""",
        "fts_histogram_agg": _GRAMS_CTE + _match_dl_cte() + """
, b AS (
  SELECT (floor(l.dl / 10) * 10)::BIGINT AS key
  FROM m JOIN dl l USING (doc_id)
), c AS (
  SELECT key, count(*)::BIGINT AS doc_count FROM b GROUP BY key
), keys AS (
  SELECT unnest(generate_series((SELECT min(key) FROM c),
                                (SELECT max(key) FROM c), 10)) AS key
)
SELECT k.key::BIGINT AS key,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM keys k LEFT JOIN c USING (key) ORDER BY key
""",
        "fts_cardinality_agg": _GRAMS_CTE + _match_dl_cte() + """
SELECT count(DISTINCT d.lang)::BIGINT AS value
FROM m JOIN documents d USING (doc_id)
""",
        "fts_sort_topk": _GRAMS_CTE + _match_dl_cte() + """
SELECT m.doc_id, l.dl::INT AS dl, d.lang AS lang
FROM m JOIN dl l USING (doc_id) JOIN documents d USING (doc_id)
ORDER BY l.dl DESC, d.lang ASC, m.doc_id ASC LIMIT 10
""",
        "fts_count_or": _GRAMS_CTE + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
SELECT count(DISTINCT doc_id)::BIGINT AS hits FROM grams
WHERE term IN (SELECT term FROM qt)
""",
        # posLength-graph phrase through the filter-composed index:
        # the indexed ko token spans exactly a whole-token
        # 'key order' run (keepOrig stacks it at the match start with
        # pl=2), so [ko][follower-alternatives] graph-adjacency ≡ the
        # surface phrase 'key order <follower>' on whole-token
        # boundaries
        "fts_graph_phrase": f"""
SELECT count(*)::BIGINT AS hits FROM documents
WHERE regexp_matches(text,
  '(^|[ \t\n\r　])key[ \t\n\r　]+order[ \t\n\r　]+(data|customer|the|line|column|row)($|[ \t\n\r　])')
""",
        # the streamed index over doc_id < 300 answers the benchmark
        # boolean AND count exactly as a one-shot build would — stats
        # and postings are batch-order-independent by construction
        "fts_stream_count": _grams_cte("WHERE doc_id < 300") + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
)
SELECT count(*)::BIGINT AS hits FROM per_doc
WHERE c = (SELECT count(*) FROM qt)
""",
        # live dict reload mid-stream: v1-era docs (id<150) carry
        # data,info anchors, v2-era docs (id>=150) carry sort,order —
        # whole-token anchor counts are substring existence per era
        # (the asym-count oracle pattern, era-restricted)
        "fts_stream_reload": f"""
WITH blocks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '{_DELIMS}')) AS blk
  FROM documents WHERE doc_id < 300
), nb AS (
  SELECT doc_id, lower(blk) AS blk FROM blocks WHERE length(blk) > 0
), m AS (
  SELECT doc_id,
    len(regexp_extract_all(blk, '(data|info)')) AS m1,
    len(regexp_extract_all(blk, '(sort|order)')) AS m2
  FROM nb
), d AS (
  SELECT doc_id, sum(m1) AS m1, sum(m2) AS m2 FROM m GROUP BY doc_id
)
SELECT
  (SELECT count(*) FROM d WHERE doc_id < 150 AND m1 > 0)::BIGINT
    AS hits_info,
  (SELECT count(*) FROM d WHERE doc_id >= 150 AND m2 > 0)::BIGINT
    AS hits_order
""",
        # global stats every BM25 score depends on, from first
        # principles over the raw corpus
        "fts_index_stats": _GRAMS_CTE + """
, dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM grams GROUP BY 1)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM documents)::BIGINT AS n_live,
       (SELECT sum(dl) FROM dl)::BIGINT AS total_dl,
       round((SELECT sum(dl) FROM dl)::DOUBLE
             / (SELECT count(*) FROM documents), 6) AS avgdl_r
""",
        # multi_match most_fields: content (boost 1) + title = first
        # 60 chars (boost 2), per-field stats, bool-should across
        # fields, boost-weighted score sum
        "fts_multifield_topk": _bm25_prefix(sfx="_c")
        + _bm25_prefix(table="""
(SELECT doc_id, substr(text, 1, 60) AS text FROM documents)""",
                       sfx="_t", lead=",") + f"""
SELECT coalesce(c.doc_id, t.doc_id) AS doc_id,
       round(coalesce(c.score, 0) * 1.0
             + coalesce(t.score, 0) * 2.0, 6) AS score_r
FROM (SELECT doc_id, score FROM scored_c WHERE ng = {_n_groups()}) c
FULL OUTER JOIN
     (SELECT doc_id, score FROM scored_t WHERE ng = {_n_groups()}) t
  ON c.doc_id = t.doc_id
ORDER BY score_r DESC, doc_id LIMIT 10
""",
        # multi_match best_fields (dis_max): max of the boosted field
        # scores + 0.3 × the rest, same per-field stats as above
        "fts_dismax_topk": _bm25_prefix(sfx="_c")
        + _bm25_prefix(table="""
(SELECT doc_id, substr(text, 1, 60) AS text FROM documents)""",
                       sfx="_t", lead=",") + f"""
, mf AS (
  SELECT coalesce(c.doc_id, t.doc_id) AS doc_id,
         coalesce(c.score, 0) * 1.0 AS sc,
         coalesce(t.score, 0) * 2.0 AS st
  FROM (SELECT doc_id, score FROM scored_c WHERE ng = {_n_groups()}) c
  FULL OUTER JOIN
       (SELECT doc_id, score FROM scored_t WHERE ng = {_n_groups()}) t
    ON c.doc_id = t.doc_id
)
SELECT doc_id,
       round(greatest(sc, st)
             + 0.3 * (sc + st - greatest(sc, st)), 6) AS score_r
FROM mf
ORDER BY score_r DESC, doc_id LIMIT 10
""",
        # incremental merge with every tombstone applied == a live-
        # docs-only index with ORIGINAL ids (no renumbering)
        "fts_merge_topk": _bm25_prefix(table="""
(SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 1)""") + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng = {_n_groups()}
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        # all matching ids for the AND query, sorted
        "fts_match_ids": _GRAMS_CTE + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
)
SELECT doc_id FROM per_doc WHERE c = (SELECT count(*) FROM qt)
ORDER BY doc_id
""",
        # search_after page 2 == ranks 11-20 of the same ordering
        "fts_page2_topk": _bm25_prefix() + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng = {_n_groups()}
ORDER BY round(score, 6) DESC, doc_id LIMIT 10 OFFSET 10
""",
        # phase-1 delete (liveDocs): BM25 over ALL docs — deleted docs
        # still count in df/N/avgdl (Lucene pre-merge stats) — with
        # only the final ranking filtered to live docs
        "fts_delete_topk": _bm25_prefix() + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng = {_n_groups()} AND doc_id % 7 <> 3
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        # phase-2 purge: the merged index IS a fresh build over the
        # live corpus with ids renumbered densely in old-id order
        "fts_purge_topk": _bm25_prefix(table="""
(SELECT row_number() OVER (ORDER BY doc_id) - 1 AS doc_id, text
 FROM documents WHERE doc_id % 7 <> 3)""") + f"""
SELECT doc_id, round(score, 6) AS score_r FROM scored
WHERE ng = {_n_groups()}
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        # upsert: count AND-matches over (unchanged docs) ∪ (new
        # versions); the replaced originals are tombstoned so only the
        # new content matches — id assignment order is irrelevant to a
        # count, keeping this SQL-expressible
        "fts_upsert_count": _grams_cte(table="""
(SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 2
 UNION ALL
 SELECT 1000000 + doc_id AS doc_id,
        CASE WHEN doc_id % 2 = 0
             THEN 'data sort merge refreshed entry'
             ELSE 'refreshed entry only' END AS text
 FROM documents WHERE doc_id % 11 = 2)""") + f"""
, qt AS (SELECT * FROM (VALUES {_qterm_values()}) AS q(term))
, per_doc AS (
  SELECT doc_id, count(DISTINCT term) AS c FROM grams
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id
)
SELECT count(*)::BIGINT AS hits FROM per_doc
WHERE c = (SELECT count(*) FROM qt)
""",
        "dp_exact_dups": """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
)
SELECT md5(text) AS dup_key, count(*)::BIGINT AS n_docs,
       min(doc_id) AS keep_doc_id
FROM aug GROUP BY md5(text) HAVING count(*) > 1
""",
        "dp_token_counts": _WORDS_CTE + """
SELECT doc_id, len(ws)::INT AS n_tokens, length(text)::INT AS n_chars,
       strlen(text)::INT AS n_bytes
FROM words
""",
        "dp_subword_counts": _WORDS_CTE + r"""
SELECT doc_id,
       len(regexp_extract_all(text,
         '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
       ))::INT AS n_subwords,
       len(ws)::INT AS n_words
FROM words
""",
        "dp_quality": _WORDS_CTE + """
SELECT doc_id, len(ws)::INT AS n_tokens,
  round(CASE WHEN len(ws) > 0 THEN
    list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)
    ELSE 0 END, 6) AS mean_word_len,
  round(CASE WHEN len(ws) > 0 THEN
    len(list_filter(ws, w -> lower(w) IN
      ('the','of','and','to','in','a','is','for','on','with')))::DOUBLE
      / len(ws) ELSE 0 END, 6) AS stopword_ratio,
  round(CASE WHEN length(text) > 0 THEN
    length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))::DOUBLE
      / length(text) ELSE 0 END, 6) AS alnum_ratio
FROM words
""",
        "dp_lang_id": """
SELECT doc_id,
  CASE
    WHEN length(text) = 0 THEN 'other'
    WHEN (length(text) - length(regexp_replace(text,
          '[\\u3040-\\u30ff\\u4e00-\\u9fff]', '', 'g')))::DOUBLE
         / length(text) > 0.2 THEN 'ja'
    WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
         / length(text) > 0.5 THEN 'en'
    ELSE 'other'
  END AS lang_pred
FROM documents
""",
        "dp_fingerprints": f"""
SELECT doc_id, sha256(text) AS sha256,
       md5(regexp_replace(lower(trim(text)), '{_DELIMS}', ' ', 'g'))
         AS norm_md5
FROM documents
""",
        "dp_scrub": f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id < 20 THEN text ||
           ' contact bob@example.com via 10.0.0.1 acct 1234567890'
         ELSE text END AS text
  FROM documents
), s AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{{2,}}',
          '<EMAIL>', 'g'),
        '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
        '<IP>', 'g'),
      '\\b\\d{{9,}}\\b', '<NUM>', 'g') AS text
  FROM aug
)
SELECT doc_id, text,
  (len(string_split(text, '<EMAIL>')) - 1
   + len(string_split(text, '<IP>')) - 1
   + len(string_split(text, '<NUM>')) - 1)::INT AS n_redactions
FROM s
""",
        "dp_chunks": f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                     w -> length(w) > 0) AS ws
  FROM documents
), nz AS (
  SELECT doc_id, ws, len(ws) AS n FROM words WHERE len(ws) > 0
), st AS (
  SELECT doc_id, ws, n, unnest(generate_series(0,
           ((n - 1) // 56)::BIGINT)) * 56 AS s
  FROM nz
)
SELECT doc_id, (s // 56)::INT AS chunk_id,
       len(ws[s+1 : s+64])::INT AS n_tokens,
       array_to_string(ws[s+1 : s+64], ' ') AS chunk
FROM st
WHERE s = 0 OR s + 8 < n
""",
        "dp_minhash_lsh": _SHINGLES_CTE + """
, sigs AS (
  SELECT doc_id,
    min(md5('0' || shingle)) AS mh0, min(md5('1' || shingle)) AS mh1,
    min(md5('2' || shingle)) AS mh2, min(md5('3' || shingle)) AS mh3,
    min(md5('4' || shingle)) AS mh4, min(md5('5' || shingle)) AS mh5,
    min(md5('6' || shingle)) AS mh6, min(md5('7' || shingle)) AS mh7
  FROM shingles GROUP BY doc_id
), banded AS (
  SELECT 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key, doc_id FROM sigs
  UNION ALL
  SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sigs
  UNION ALL
  SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sigs
  UNION ALL
  SELECT 3, md5(mh6 || '|' || mh7), doc_id FROM sigs
)
SELECT band_id, band_key, count(*)::BIGINT AS n_docs,
       min(doc_id) AS keep_doc_id
FROM banded GROUP BY band_id, band_key HAVING count(*) > 1
""",
        "dp_jaccard_pairs": _SHINGLES_CTE + """
, sigs AS (
  SELECT doc_id,
    min(md5('0' || shingle)) AS mh0, min(md5('1' || shingle)) AS mh1,
    min(md5('2' || shingle)) AS mh2, min(md5('3' || shingle)) AS mh3,
    min(md5('4' || shingle)) AS mh4, min(md5('5' || shingle)) AS mh5,
    min(md5('6' || shingle)) AS mh6, min(md5('7' || shingle)) AS mh7
  FROM shingles GROUP BY doc_id
), banded AS (
  SELECT 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key, doc_id FROM sigs
  UNION ALL
  SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sigs
  UNION ALL
  SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sigs
  UNION ALL
  SELECT 3, md5(mh6 || '|' || mh7), doc_id FROM sigs
), cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM banded b1
  JOIN banded b2 USING (band_id, band_key)
  WHERE b1.doc_id < b2.doc_id
), counts AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shingles
             GROUP BY doc_id)
, inter AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, count(*)::BIGINT AS n_inter
  FROM shingles s1 JOIN shingles s2 USING (shingle)
  WHERE s1.doc_id < s2.doc_id
  GROUP BY s1.doc_id, s2.doc_id
)
SELECT a, b, n_inter,
       round(n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN cand USING (a, b)
JOIN counts ca ON ca.doc_id = a
JOIN counts cb ON cb.doc_id = b
WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter) >= 0.2
""",
        "dp_ann_cosine": """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0)
SELECT vec_id,
  round(list_dot_product(embedding::DOUBLE[], q.qv) /
        (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM embeddings, q
WHERE vec_id != 0
ORDER BY round(list_dot_product(embedding::DOUBLE[], q.qv) /
        (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC, vec_id
LIMIT 10
""",
        "dp_media_meta": """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       strlen(text)::INT AS n_bytes,
       sha256(text) AS sha256
FROM documents
""",
        "fts_synonym_bm25": f"""
WITH blocks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '{_DELIMS}')) AS blk
  FROM documents
), nb AS (
  SELECT doc_id, lower(blk) AS blk FROM blocks WHERE length(blk) > 0
), m AS (
  SELECT doc_id,
    len(regexp_extract_all(blk, '(data|info)')) AS m1,
    len(regexp_extract_all(blk, '(sort|order)')) AS m2,
    len(regexp_extract_all(blk, '(data|info|sort|order)'))
      + list_sum(list_transform(
          regexp_split_to_array(blk, '(data|info|sort|order)'),
          s -> CASE WHEN length(s) = 0 THEN 0
               ELSE greatest(1, length(s) - 1) END)) AS bpos
  FROM nb
), dstat AS (
  SELECT doc_id, sum(m1)::BIGINT AS m1, sum(m2)::BIGINT AS m2,
         sum(bpos)::BIGINT AS dl
  FROM m GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dstat WHERE dl > 0) AS avgdl,
         (SELECT count(*) FROM dstat WHERE m1 > 0)::DOUBLE AS df1,
         (SELECT count(*) FROM dstat WHERE m2 > 0)::DOUBLE AS df2
), scored AS (
  SELECT d.doc_id,
    ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5))
      * (2*d.m1) / ((2*d.m1) + {K1} * (1 - {B} + {B} * d.dl / s.avgdl))
    + ln(1 + (s.n - s.df2 + 0.5) / (s.df2 + 0.5))
      * (2*d.m2) / ((2*d.m2) + {K1} * (1 - {B} + {B} * d.dl / s.avgdl))
      AS score
  FROM dstat d CROSS JOIN stats s
  WHERE d.m1 > 0 AND d.m2 > 0
)
SELECT doc_id, round(score, 6) AS score_r FROM scored
ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
        "fts_asym_count": f"""
WITH blocks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '{_DELIMS}')) AS blk
  FROM documents
), nb AS (
  SELECT doc_id, lower(blk) AS blk FROM blocks WHERE length(blk) > 0
), m AS (
  SELECT doc_id,
    len(regexp_extract_all(blk, '(data|info)')) AS m1,
    len(regexp_extract_all(blk, '(sort|order)')) AS m2
  FROM nb
), dstat AS (
  SELECT doc_id, sum(m1) AS m1, sum(m2) AS m2 FROM m GROUP BY doc_id
)
SELECT count(*)::BIGINT AS hits FROM dstat WHERE m1 > 0 AND m2 > 0
""",
        "fts_synfilter": f"""
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '{_DELIMS}'),
                            x -> length(x) > 0)) AS term
  FROM documents
), raw AS (
  SELECT term, count(*)::BIGINT AS cnt FROM w GROUP BY term
), gtot AS (
  SELECT t.term, g.cnt
  FROM (VALUES ('data'), ('info')) t(term)
  CROSS JOIN (SELECT coalesce(sum(cnt), 0)::BIGINT AS cnt FROM raw
              WHERE term IN ('data', 'info')) g
  UNION ALL
  SELECT t.term, g.cnt
  FROM (VALUES ('sort'), ('order')) t(term)
  CROSS JOIN (SELECT coalesce(sum(cnt), 0)::BIGINT AS cnt FROM raw
              WHERE term IN ('sort', 'order')) g
), ex AS (
  SELECT term, cnt FROM raw
  WHERE term NOT IN ('data', 'info', 'sort', 'order')
  UNION ALL
  SELECT term, cnt FROM gtot WHERE cnt > 0
)
SELECT term, cnt FROM ex ORDER BY cnt DESC, term LIMIT 50
""",
        "dp_dedup_drop": f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 2000000, text || ' zq zq zq' FROM documents
  WHERE doc_id < 30
), eg AS (
  SELECT md5(text) AS k, min(doc_id) AS keep FROM aug
  GROUP BY md5(text) HAVING count(*) > 1
), exact_drop AS (
  SELECT a.doc_id, 'exact' AS reason
  FROM aug a JOIN eg ON md5(a.text) = eg.k
  WHERE a.doc_id != eg.keep
), words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DELIMS}'),
                     w -> length(w) > 0) AS ws
  FROM aug
  WHERE doc_id NOT IN (SELECT doc_id FROM exact_drop)
), sh_long AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-2)) AS i
        FROM words WHERE len(ws) >= 3)
), sh_short AS (
  SELECT doc_id, array_to_string(ws, ' ') AS shingle
  FROM words WHERE len(ws) < 3
), shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT * FROM sh_long UNION ALL SELECT * FROM sh_short)
  WHERE length(shingle) > 0
), sigs AS (
  SELECT doc_id,
    min(md5('0' || shingle)) AS mh0, min(md5('1' || shingle)) AS mh1,
    min(md5('2' || shingle)) AS mh2, min(md5('3' || shingle)) AS mh3,
    min(md5('4' || shingle)) AS mh4, min(md5('5' || shingle)) AS mh5,
    min(md5('6' || shingle)) AS mh6, min(md5('7' || shingle)) AS mh7
  FROM shingles GROUP BY doc_id
), banded AS (
  SELECT 0 AS band_id, md5(mh0 || '|' || mh1) AS band_key, doc_id FROM sigs
  UNION ALL SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sigs
  UNION ALL SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sigs
  UNION ALL SELECT 3, md5(mh6 || '|' || mh7), doc_id FROM sigs
), cand AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM banded b1 JOIN banded b2 USING (band_id, band_key)
  WHERE b1.doc_id < b2.doc_id
), counts AS (
  SELECT doc_id, count(*)::BIGINT AS n_sh FROM shingles GROUP BY doc_id
), inter AS (
  SELECT s1.doc_id AS a, s2.doc_id AS b, count(*)::BIGINT AS n_inter
  FROM shingles s1 JOIN shingles s2 USING (shingle)
  WHERE s1.doc_id < s2.doc_id
  GROUP BY s1.doc_id, s2.doc_id
), near_drop AS (
  SELECT i.b AS doc_id, 'near' AS reason
  FROM inter i
  JOIN cand USING (a, b)
  JOIN counts ca ON ca.doc_id = i.a
  JOIN counts cb ON cb.doc_id = i.b
  WHERE round(n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter), 6) >= 0.5
)
SELECT doc_id, min(reason) AS reason
FROM (SELECT * FROM exact_drop UNION ALL SELECT * FROM near_drop)
GROUP BY doc_id
""",
        "dp_simhash_dups": f"""
WITH wx AS (
  SELECT DISTINCT doc_id, w AS word
  FROM (SELECT doc_id,
        unnest(list_filter(regexp_split_to_array(lower(text), '{_DELIMS}'),
                           x -> length(x) > 0)) AS w
        FROM documents)
), h AS (
  SELECT doc_id, md5_number_upper(word) AS h FROM wx
), acc AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) bs
  GROUP BY doc_id, b
), sig0 AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::UBIGINT << b
                     ELSE 0::UBIGINT END) AS sig
  FROM acc GROUP BY doc_id
), sig AS (
  SELECT d.doc_id, coalesce(s.sig, 0)::UBIGINT AS sig
  FROM documents d LEFT JOIN sig0 s USING (doc_id)
), keyed AS (
  SELECT doc_id, sig, c, (sig >> (16*c)) & 65535 AS ck
  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c) cs
), pairs AS (
  SELECT DISTINCT k1.doc_id AS a, k2.doc_id AS b,
                  k1.sig AS ha, k2.sig AS hb
  FROM keyed k1 JOIN keyed k2 USING (c, ck)
  WHERE k1.doc_id < k2.doc_id
)
SELECT a, b, bit_count(xor(ha, hb))::INT AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= 3
""",
        "dp_media_features": """
SELECT doc_id AS media_id,
  (('0x' || substr(sha256(text), 1, 2))::INT) / 255.0 AS f0,
  (('0x' || substr(sha256(text), 3, 2))::INT) / 255.0 AS f1,
  (('0x' || substr(sha256(text), 5, 2))::INT) / 255.0 AS f2,
  (('0x' || substr(sha256(text), 7, 2))::INT) / 255.0 AS f3,
  (('0x' || substr(sha256(text), 9, 2))::INT) / 255.0 AS f4,
  (('0x' || substr(sha256(text), 11, 2))::INT) / 255.0 AS f5,
  (('0x' || substr(sha256(text), 13, 2))::INT) / 255.0 AS f6,
  (('0x' || substr(sha256(text), 15, 2))::INT) / 255.0 AS f7
FROM documents
""",
        "dp_resize_plan": """
WITH dims AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' ELSE 'video' END AS kind,
         16 * (1 + ('0x' || substr(sha256(text), 1, 2))::INT % 64)
           AS width,
         16 * (1 + ('0x' || substr(sha256(text), 3, 2))::INT % 64)
           AS height
  FROM documents WHERE doc_id % 3 != 1
), s AS (
  SELECT *, round(least(224.0 / width, 224.0 / height, 1.0), 6) AS scale
  FROM dims
)
SELECT media_id, kind, width::INT AS width, height::INT AS height,
       scale, round(width * scale)::INT AS out_w,
       round(height * scale)::INT AS out_h
FROM s
""",
        "dp_frame_plan": """
WITH v AS (
  SELECT doc_id AS media_id,
         1 + (('0x' || substr(sha256(text), 5, 2))::INT % 250) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       unnest(generate_series(0, n_frames - 1, 30))::INT AS frame_idx
FROM v
""",
        "dp_ann_ivf": _ivf_oracle(),
        "dp_embedding_dups": f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
aug AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 1000000, [v[1] + 0.1] || v[2:] FROM base
  WHERE vec_id < 20
), b AS (
  SELECT vec_id, v, {_plane_cases('v')} AS bucket FROM aug
), p AS (
  SELECT b1.vec_id AS a, b2.vec_id AS b,
         list_dot_product(b1.v, b2.v) /
           (sqrt(list_dot_product(b1.v, b1.v)) *
            sqrt(list_dot_product(b2.v, b2.v))) AS c
  FROM b b1 JOIN b b2 ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id
)
SELECT a, b, round(c, 6) AS cosine FROM p WHERE c >= 0.9
""",
    }
