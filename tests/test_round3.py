"""Round-3 pins: meta-as-commit-point crash safety, O(new-batch)
append stats, auto-scaled docID buckets, reference dictionary-reload
semantics (SynonymPluginTest.java:367-484), rarest-first count
skipping, parameterized SimHash blocking."""

import re
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from synspark.index_store import (IndexStore, append_to_index, build_index,
                                  compact_index, new_shard_segments)
from synspark.synonyms import SynonymDict
from synspark.tokenizer import TokenizerConfig, tokenize

pytestmark = pytest.mark.spark

CFG = TokenizerConfig(n=2, expand=False)


def mk(spark, n0, n1, text=None):
    body = F.lit(text) if text is not None else \
        F.when(F.col("id") % 3 == 0, F.lit("alpha beta gamma")) \
         .when(F.col("id") % 3 == 1, F.lit("delta epsilon alpha")) \
         .otherwise(F.lit("zeta eta theta"))
    return spark.range(n0, n1).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.col("id").cast("string").alias("commit"),
        F.lit("t").alias("lang"), body.alias("content"))


# ---------------------------------------------------------------------
# incremental append stats (round-2 verdict item 1)
# ---------------------------------------------------------------------

def test_append_stats_inputs_are_new_shards_only(spark, tmp_path_factory):
    """The stats refresh reads ONLY the appended shards' parquet (the
    round-2 scale-killer was a full-index re-aggregation per batch),
    and the merged stats equal a full rebuild's exactly."""
    out = tmp_path_factory.mktemp("inc") / "index"
    st = build_index(spark, mk(spark, 0, 60), str(out), cfg=CFG,
                     n_shards=3, source="base")
    old_shards = st.meta().n_shards
    st = append_to_index(spark, st, mk(spark, 60, 90), source="a")

    # the refresh scan partition-prunes to the appended shard dirs
    files = {r[0] for r in new_shard_segments(spark, st, old_shards)
             .select(F.input_file_name()).distinct().collect()}
    assert files
    for f in files:
        assert int(re.search(r"shard=(\d+)", f).group(1)) >= old_shards

    # per-batch delta partitions on disk; committed list in meta
    parts = {p.name for p in (out / "termstats").glob("batch=*")}
    assert parts == {"batch=initial", "batch=at-60"}
    assert st.meta().stats_batches == ["initial", "at-60"]

    # exact totals: integer-derived avgdl == full rebuild's, merged
    # termstats == full rebuild's
    out2 = tmp_path_factory.mktemp("incfull") / "index"
    full = build_index(spark, mk(spark, 0, 90), str(out2), cfg=CFG,
                       n_shards=3, source="full")
    assert st.meta().total_dl == full.meta().total_dl > 0
    assert st.meta().avgdl == full.meta().avgdl
    a = {tuple(r) for r in st.termstats(spark).collect()}
    b = {tuple(r) for r in full.termstats(spark).collect()}
    assert a == b
    ds_a = sorted(map(tuple, st.docstats(spark).collect()))
    assert len(ds_a) == 90 and len({d for d, _ in ds_a}) == 90


def test_append_stats_fold(spark, tmp_path_factory):
    """Continuous ingest keeps the reader-side merge bounded: once the
    delta count passes fold_stats_every, the append folds every
    committed termstats partition into one (O(vocab) on the small
    table, never the segments) — values unchanged."""
    out = tmp_path_factory.mktemp("fold") / "index"
    st = build_index(spark, mk(spark, 0, 30), str(out), cfg=CFG,
                     n_shards=2, source="base")
    for i in range(3):
        st = append_to_index(spark, st, mk(spark, 30 + 10 * i, 40 + 10 * i),
                             batch_tag=f"f{i}", fold_stats_every=2)
    # 2nd append tripped the fold (at n=50); 3rd added one delta on top
    assert st.meta().stats_batches == ["fold-at-50", "at-50"]
    out2 = tmp_path_factory.mktemp("foldfull") / "index"
    full = build_index(spark, mk(spark, 0, 60), str(out2), cfg=CFG,
                       n_shards=2, source="full")
    a = {tuple(r) for r in st.termstats(spark).collect()}
    b = {tuple(r) for r in full.termstats(spark).collect()}
    assert a == b
    # the next append folds again — the list stays bounded forever
    st = append_to_index(spark, st, mk(spark, 60, 70), batch_tag="f3",
                         fold_stats_every=2)
    assert st.meta().n_docs == 70
    assert st.meta().stats_batches == ["fold-at-70"]


def test_stale_larger_append_shards_excluded(spark, tmp_path_factory):
    """A crashed LARGER append can leave stale shard partitions above a
    later smaller append's range (dynamic overwrite replaces only the
    shards it re-writes). They are invisible to queries (shard <
    n_shards) and must be invisible to the stats refresh too — the
    upper bound on the new-shard scan (code-review regression: without
    it the stale shards' df/cf/dl leaked into the committed stats)."""
    import shutil
    out = tmp_path_factory.mktemp("stale") / "index"
    st = build_index(spark, mk(spark, 0, 40, "alpha beta"), str(out),
                     cfg=CFG, n_shards=2, source="base")
    # stale high shard from a crashed bigger append (content = shard 0)
    shutil.copytree(out / "segments" / "shard=0",
                    out / "segments" / "shard=9")
    st = append_to_index(spark, IndexStore(str(out)),
                         mk(spark, 40, 50, "delta"), source="small")
    assert st.meta().n_shards == 3  # stale shard 9 not adopted
    out2 = tmp_path_factory.mktemp("stalefull") / "index"
    full = build_index(
        spark,
        mk(spark, 0, 40, "alpha beta").unionByName(
            mk(spark, 40, 50, "delta")),
        str(out2), cfg=CFG, n_shards=2, source="full")
    assert st.meta().total_dl == full.meta().total_dl
    a = {tuple(r) for r in st.termstats(spark).collect()}
    b = {tuple(r) for r in full.termstats(spark).collect()}
    assert a == b  # stale shard leaked into neither df/cf nor dl
    assert "9" not in st.manifest()["shards"]  # no lineage adoption


def test_empty_output_append_cannot_adopt_stale(spark, tmp_path_factory):
    """A crashed larger append leaves a stale shard INSIDE the next
    append's range; if that append produces no segment output (all-
    empty documents) dynamic overwrite writes nothing — the leftovers
    must be cleared up front, not adopted (code-review finding)."""
    import shutil
    from synspark.query import count_matches
    out = tmp_path_factory.mktemp("stale2") / "index"
    st = build_index(spark, mk(spark, 0, 40, "alpha beta"), str(out),
                     cfg=CFG, n_shards=2, source="base")
    shutil.copytree(out / "segments" / "shard=0",
                    out / "segments" / "shard=2")  # in the next range
    st = append_to_index(spark, IndexStore(str(out)),
                         mk(spark, 40, 50, ""), source="empty-docs")
    assert st.meta().n_docs == 50
    assert not (out / "segments" / "shard=2").exists()  # cleared
    out2 = tmp_path_factory.mktemp("stale2full") / "index"
    full = build_index(
        spark, mk(spark, 0, 40, "alpha beta").unionByName(
            mk(spark, 40, 50, "")),
        str(out2), cfg=CFG, n_shards=2, source="full")
    assert st.meta().total_dl == full.meta().total_dl
    assert {tuple(r) for r in st.termstats(spark).collect()} \
        == {tuple(r) for r in full.termstats(spark).collect()}
    assert count_matches(spark, st, "alpha").collect()[0]["hits"] == 40


def test_empty_batch_append_records_tag(spark, tmp_path_factory):
    """n_new == 0: nothing is indexed but the idempotence tag still
    commits, so a replayed empty micro-batch no-ops."""
    out = tmp_path_factory.mktemp("emptyb") / "index"
    st = build_index(spark, mk(spark, 0, 20, "alpha"), str(out), cfg=CFG,
                     n_shards=1, source="base")
    st = append_to_index(spark, st, mk(spark, 20, 20), batch_tag="e0")
    assert st.meta().n_docs == 20 and st.meta().n_shards == 1
    assert st.meta().batches["e0"]["n_docs"] == 0
    st = append_to_index(spark, st, mk(spark, 20, 20), batch_tag="e0")
    assert st.meta().n_docs == 20  # replay no-ops


def test_termstats_read_pushes_filters(spark, tmp_path_factory):
    """Merge-on-read termstats must stay cheap for term-filtered reads
    (the only hot-path consumer, term_dfs): the term predicate pushes
    THROUGH the per-batch aggregate to the parquet scan, and the
    committed-batch gate is a partition filter."""
    out = tmp_path_factory.mktemp("tspush") / "index"
    st = build_index(spark, mk(spark, 0, 40), str(out), cfg=CFG,
                     n_shards=2, source="push")
    st = append_to_index(spark, st, mk(spark, 40, 60), source="a")
    df = st.termstats(spark).filter(F.col("term") == "al")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(term,al\)", plan), \
        plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "batch" in m.group(1), plan
    # and the merged value is correct: 'al' (from "alpha") appears in
    # every id%3 in {0,1} doc — 40 of the 60 docs across both batches
    got = {r["term"]: (r["df"], r["cf"]) for r in df.collect()}
    assert got["al"] == (40, 40)


# ---------------------------------------------------------------------
# commit protocol (round-2 advice 1 + 3)
# ---------------------------------------------------------------------

def test_crash_before_meta_commit_then_retry(spark, tmp_path_factory):
    """A crash anywhere before the meta write leaves readers on the old
    committed state (including termstats — the delta partition is
    gated), the batch tag UNcommitted (so the replay really retries),
    and the retry converges to the exact expected index."""
    from synspark.query import count_matches
    out = tmp_path_factory.mktemp("crash2") / "index"
    st = build_index(spark, mk(spark, 0, 50, "alpha beta"), str(out),
                     cfg=CFG, n_shards=2, source="base")
    ts0 = {tuple(r) for r in st.termstats(spark).collect()}

    st._write_meta = lambda m: (_ for _ in ()).throw(
        RuntimeError("simulated crash before commit"))
    with pytest.raises(RuntimeError):
        append_to_index(spark, st, mk(spark, 50, 70, "delta epsilon"),
                        batch_tag="b1")

    fresh = IndexStore(str(out))
    assert fresh.meta().n_docs == 50
    assert fresh.docmap(spark).count() == 50
    # crashed delta partition exists on disk but is invisible to readers
    assert (out / "termstats" / "batch=at-50").exists()
    assert {tuple(r) for r in fresh.termstats(spark).collect()} == ts0
    assert "b1" not in fresh.meta().batches  # replay will NOT no-op

    st2 = append_to_index(spark, fresh, mk(spark, 50, 70, "delta epsilon"),
                          batch_tag="b1")
    assert st2.meta().n_docs == 70
    assert st2.docmap(spark).count() == 70
    assert st2.docmap(spark).select("doc_id").distinct().count() == 70
    hits = count_matches(spark, st2, "delta").collect()[0]["hits"]
    assert hits == 20  # retry overwrote the crashed delta, no double count
    # committed tag now no-ops
    st3 = append_to_index(spark, st2, mk(spark, 50, 70, "delta epsilon"),
                          batch_tag="b1")
    assert st3.meta().n_docs == 70


def test_untagged_crash_retry_overwrites(spark, tmp_path_factory):
    """batch_tag=None: the fallback partition name is position-derived
    (append-at-<old N>), so an untagged retry after a crash replaces
    the crashed attempt's docmap/stats partitions instead of adding
    duplicates (round-2 advice #3)."""
    out = tmp_path_factory.mktemp("crash3") / "index"
    st = build_index(spark, mk(spark, 0, 40, "alpha"), str(out), cfg=CFG,
                     n_shards=2, source="base")
    st._write_meta = lambda m: (_ for _ in ()).throw(RuntimeError("boom"))
    with pytest.raises(RuntimeError):
        append_to_index(spark, st, mk(spark, 40, 55, "delta"))
    fresh = IndexStore(str(out))
    st2 = append_to_index(spark, fresh, mk(spark, 40, 55, "delta"))
    assert st2.meta().n_docs == 55
    assert st2.docmap(spark).count() == 55
    assert st2.docmap(spark).select("doc_id").distinct().count() == 55
    assert st2.meta().stats_batches == ["initial", "at-40"]
    # only one docmap partition for the append (overwritten, not added)
    parts = {p.name for p in (out / "docmap").glob("batch=*")}
    assert parts == {"batch=initial", "batch=at-40"}


def test_stats_job_failure_blocks_commit(spark, tmp_path_factory):
    """A failed concurrent stats job must abort the append BEFORE the
    meta commit (a swallowed thread exception would publish an index
    with missing stats)."""
    import synspark.index_store as ism
    out = tmp_path_factory.mktemp("sfail") / "index"
    st = build_index(spark, mk(spark, 0, 30, "alpha"), str(out), cfg=CFG,
                     n_shards=2, source="base")
    orig = ism.decode_docstats_rows

    def boom(*a, **k):
        raise RuntimeError("simulated stats-job failure")
    ism.decode_docstats_rows = boom
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            append_to_index(spark, st, mk(spark, 30, 40, "delta"),
                            batch_tag="sf1")
    finally:
        ism.decode_docstats_rows = orig
    fresh = IndexStore(str(out))
    assert fresh.meta().n_docs == 30          # commit never happened
    assert "sf1" not in fresh.meta().batches  # replay will retry
    st2 = append_to_index(spark, fresh, mk(spark, 30, 40, "delta"),
                          batch_tag="sf1")
    assert st2.meta().n_docs == 40


def test_format_version_enforced(spark, tmp_path_factory):
    """Opening a pre-v5 store with current code fails with a clear
    version message instead of silently mis-reading the changed stats
    layout (code-review finding: the bump had no enforcement path)."""
    import json
    out = tmp_path_factory.mktemp("fmt") / "index"
    st = build_index(spark, mk(spark, 0, 10, "alpha"), str(out), cfg=CFG,
                     n_shards=1, source="fmt")
    m = json.loads((out / "meta.json").read_text())
    del m["format"]  # what a pre-v5 meta looks like
    (out / "meta.json").write_text(json.dumps(m))
    with pytest.raises(ValueError, match="pre-v5"):
        IndexStore(str(out)).meta()
    with pytest.raises(ValueError, match="rebuild"):
        append_to_index(spark, IndexStore(str(out)),
                        mk(spark, 10, 20, "beta"))


def test_run_concurrent_reraises():
    from synspark.index_store import _run_concurrent
    hits = []

    def ok():
        hits.append(1)

    def bad():
        raise ValueError("x")
    with pytest.raises(ValueError):
        _run_concurrent(ok, bad, ok)
    assert len(hits) == 2  # all jobs still ran to completion


def test_bootstrap_batch_tag_no_ops_on_replay(spark, tmp_path_factory):
    """build_index(batch_tag=...) records the idempotence tag in the
    meta commit, so a replayed streaming BOOTSTRAP batch takes the
    append path and no-ops (round-2 advice #2)."""
    out = tmp_path_factory.mktemp("boot") / "index"
    docs = mk(spark, 0, 30, "alpha beta")
    st = build_index(spark, docs, str(out), cfg=CFG, n_shards=2,
                     source="stream-batch-0", batch_tag="stream-batch-0")
    assert st.meta().batches["stream-batch-0"]["status"] == "done"
    st = append_to_index(spark, st, docs, batch_tag="stream-batch-0")
    assert st.meta().n_docs == 30  # replayed bootstrap: no-op


def test_compact_preserves_batches_and_folds_stats(spark, tmp_path_factory):
    """Compaction carries idempotence records (a replayed micro-batch
    tag still no-ops against the compacted index — round-2 advice #4)
    and folds the per-append stats deltas into one partition."""
    out = tmp_path_factory.mktemp("cmpb") / "index"
    st = build_index(spark, mk(spark, 0, 40), str(out), cfg=CFG,
                     n_shards=2, source="base")
    for i in range(2):
        st = append_to_index(spark, st, mk(spark, 40 + 20 * i, 60 + 20 * i),
                             batch_tag=f"t{i}")
    ts_before = {tuple(r) for r in st.termstats(spark).collect()}
    dst_dir = tmp_path_factory.mktemp("cmpb2") / "index"
    dst = compact_index(spark, st, str(dst_dir), docs_per_shard=40)
    assert dst.meta().stats_batches == ["initial"]
    assert {p.name for p in (dst_dir / "termstats").glob("batch=*")} \
        == {"batch=initial"}
    assert {tuple(r) for r in dst.termstats(spark).collect()} == ts_before
    assert dst.meta().total_dl == st.meta().total_dl
    # replayed tag against the compacted index: no-op
    n = dst.meta().n_docs
    dst = append_to_index(spark, dst, mk(spark, 40, 60), batch_tag="t0")
    assert dst.meta().n_docs == n


# ---------------------------------------------------------------------
# auto-scaled docID buckets (round-2 verdict item 2)
# ---------------------------------------------------------------------

def test_docid_buckets_autoscale(spark):
    """buckets=None sizes B from the row count so no window-sort task
    exceeds ~target rows; ids stay dense + deterministic."""
    from synspark.docids import assign_doc_ids
    df = spark.range(1000).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.col("id").cast("string").alias("commit"))
    out = assign_doc_ids(df, target_rows_per_bucket=10)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == list(range(1000))
    # B = max(64, ceil(1000/10)) = 100; hash-uniform buckets mean no
    # single window task sees more than a small multiple of the target
    mx = (df.withColumn("_b", F.pmod(F.xxhash64("repo", "path", "commit"),
                                     F.lit(100)))
          .groupBy("_b").count().agg(F.max("count")).collect()[0][0])
    assert mx <= 60  # expected 10/bucket; far below n under any seed drift
    # stable across input partitioning
    out2 = assign_doc_ids(df.repartition(7), target_rows_per_bucket=10)
    m1 = {(r["repo"], r["doc_id"]) for r in out.select("repo", "doc_id")
          .collect()}
    m2 = {(r["repo"], r["doc_id"]) for r in out2.select("repo", "doc_id")
          .collect()}
    assert m1 == m2


# ---------------------------------------------------------------------
# reference dictionary-reload semantics (SynonymPluginTest.java:367-484)
# ---------------------------------------------------------------------

def test_dict_change_append_reference_semantics(spark, tmp_path_factory):
    """The reference's dynamic_reload truth table: doc1 indexed under
    東京,とうきょう; the dictionary swaps to 東京,TOKYO; doc2 indexed
    under the new rules. Then (all queries analyzed with the CURRENT
    dictionary, as the reference's analyzer does after reload):
    東京→2, とうきょう→0 (!), TOKYO→2 — old docs keep old tokens, the
    stacked 東京 alternative of the TOKYO query matches both."""
    from synspark.query import count_matches
    cfg = TokenizerConfig(n=2, expand=True)
    syn1 = SynonymDict.parse("東京,とうきょう")
    syn2 = SynonymDict.parse("東京,TOKYO")
    out = tmp_path_factory.mktemp("reload3") / "index"
    st = build_index(spark, mk(spark, 0, 1, "東京"), str(out), cfg=cfg,
                     syn=syn1, n_shards=1, source="d1")

    def hits(q, syn):
        return count_matches(spark, st, q, mode="and",
                             syn=syn).collect()[0]["hits"]

    # before the change (queries under the old dict)
    assert hits("東京", syn1) == 1
    assert hits("とうきょう", syn1) == 1
    assert hits("TOKYO", syn1) == 0

    # a changed dictionary is rejected unless explicitly allowed
    with pytest.raises(ValueError):
        append_to_index(spark, st, mk(spark, 1, 2, "東京"), syn=syn2)

    st = append_to_index(spark, st, mk(spark, 1, 2, "東京"), syn=syn2,
                         allow_dict_change=True, batch_tag="after-reload")
    assert st.meta().dict_fingerprint == syn2.fingerprint()

    # after the change (queries under the new dict) — the reference's
    # exact assertions at SynonymPluginTest.java:462-484
    assert hits("東京", syn2) == 2
    assert hits("とうきょう", syn2) == 0
    assert hits("TOKYO", syn2) == 2
    # the _analyze mirror: second token of 東京 is now the folded tokyo
    toks = tokenize("東京", cfg, syn2)
    assert toks[1][0] == "tokyo"


def test_filter_composed_index_reload_suite(spark, tmp_path_factory):
    """SynonymPluginTest.java:488-626 (test_synonymFilterPath_update):
    the msg1 analyzer is 2gram + synonym token FILTER, entries analyzed
    with the same tokenizer (multi-word outputs: 東京 expands into
    とうきょう's bigram chain), dictionary swapped mid-stream — docs
    indexed before the change keep old tokens. Full truth table +
    _analyze streams."""
    from synspark.query import count_matches
    from synspark.synfilter import (analyze_query_filtered,
                                    synonym_token_filter)

    cfg = TokenizerConfig(n=2, expand=False)          # the 2gram tokenizer
    qcfg = TokenizerConfig(n=2, expand=False, emit_short_blocks=False)

    def entry_tok(s):
        return [w for w, *_ in tokenize(s, cfg, None)]

    syn1 = SynonymDict.parse("東京,とうきょう\nああ,嗚呼")
    syn2 = SynonymDict.parse("東京,TOKYO\nああ,あゝ")
    f1 = synonym_token_filter(syn1, True, entry_tok)
    f2 = synonym_token_filter(syn2, True, entry_tok)

    # _analyze mirrors (SynonymPluginTest.java:573-580, 615-625)
    assert [w for w, *_ in f1(tokenize("東京", cfg, None))] \
        == ["東京", "とう", "うき", "きょ", "ょう"]
    assert [w for w, *_ in f2(tokenize("東京", cfg, None))] \
        == ["東京", "to", "ok", "ky", "yo"]

    def docs(pairs):
        return spark.createDataFrame(
            [(f"d{i}", "f", str(i), "t", body) for i, body in pairs],
            "repo string, path string, commit string, lang string, "
            "content string")

    out = tmp_path_factory.mktemp("synfidx") / "index"
    st = build_index(spark, docs([(1, "東京"), (10, "ああ")]), str(out),
                     cfg=cfg, syn=None, n_shards=1, source="filter-idx",
                     token_filter=f1)

    def plain(q):  # msg1 + "2gram_analyzer" (2gram + lowercase filter)
        return count_matches(spark, st, q.lower(), phrase=True,
                             cfg=qcfg).collect()[0]["hits"]

    def filtered(q, syn):  # the index's own (filter) analyzer
        groups = analyze_query_filtered(q, qcfg, syn, True, entry_tok)
        return count_matches(spark, st, q, phrase=True,
                             groups=groups).collect()[0]["hits"]

    # before the dictionary change (SynonymPluginTest.java:554-564)
    assert plain("東京") == 1
    assert plain("とうきょう") == 1  # expanded bigram chain matches
    assert plain("TOKYO") == 0
    assert filtered("ああ", syn1) == 1
    assert filtered("嗚呼", syn1) == 1
    assert filtered("あゝ", syn1) == 0

    # dictionary swapped; new docs indexed under the new rules
    st = append_to_index(spark, st, docs([(2, "東京"), (11, "ああ")]),
                         batch_tag="after-reload", token_filter=f2)

    # after (SynonymPluginTest.java:599-610)
    assert plain("東京") == 2
    assert plain("とうきょう") == 1   # only the pre-reload doc
    assert plain("TOKYO") == 1        # only the post-reload doc
    assert filtered("ああ", syn2) == 2
    assert filtered("嗚呼", syn2) == 1  # old stacked token survives
    assert filtered("あゝ", syn2) == 2

    # forgetting the filter on append fails fast (the filter is
    # analyzer config; silently indexing unfiltered would split the
    # index across two incompatible analyzers)
    with pytest.raises(ValueError, match="token_filter"):
        append_to_index(spark, st, docs([(3, "東京")]), batch_tag="x")

    # batched serving with a filter analyzer: search_batch(groups_list)
    # rank-identical to per-query search(groups=...)
    from synspark.query import search, search_batch
    texts = ["ああ", "嗚呼", "あゝ"]
    gl = [analyze_query_filtered(t, qcfg, syn2, True, entry_tok)
          for t in texts]
    got: dict = {}
    for r in search_batch(spark, st, texts, k=10, groups_list=gl).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    for qi, t in enumerate(texts):
        single = [(r["doc_id"], round(r["score"], 9)) for r in
                  search(spark, st, t, k=10, groups=gl[qi]).collect()]
        assert got.get(qi, []) == single, t


# ---------------------------------------------------------------------
# rarest-first block skipping in count (round-2 verdict item 7)
# ---------------------------------------------------------------------

def test_count_skips_blocks_rarest_first(spark, tmp_path_factory):
    """Selective AND: the rare group's candidate set gates the common
    group's block decodes — fewer blocks decoded, identical count."""
    from synspark.query import _count_shard, count_matches, plan_query
    docs = spark.range(400).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.col("id").cast("string").alias("commit"),
        F.lit("t").alias("lang"),
        F.when(F.col("id") == 123, F.lit("zz qq"))
         .otherwise(F.lit("zz")).alias("content"))
    out = tmp_path_factory.mktemp("skip") / "index"
    st = build_index(spark, docs, str(out), cfg=CFG, n_shards=1,
                     source="skiptest")
    blocks = (st.segments(spark)
              .filter(F.col("term").isin(["zz", "qq"]))
              .select("term", "shard", "first_doc", "last_doc", "n_docs",
                      "doc_bytes", "tf_bytes").toPandas())
    total_blocks = len(blocks)
    assert total_blocks >= 4  # zz spans several 128-doc blocks
    plan = plan_query(spark, st, "zz qq")
    stats = {}
    n = _count_shard(blocks, plan, "and", False, stats)
    assert n == 1
    # qq's single block + only the zz block covering qq's doc
    assert stats["decoded_blocks"] == 2 < total_blocks
    # distributed API agrees
    assert count_matches(spark, st, "zz qq", mode="and") \
        .collect()[0]["hits"] == 1


# ---------------------------------------------------------------------
# parameterized SimHash blocking (round-2 verdict item 4)
# ---------------------------------------------------------------------

def test_simhash_blocking_parameterized(spark):
    """Any valid (n_blocks, blocks_per_key) returns the SAME pair set
    (exact hamming verify); wider keys shrink the max bucket on a
    skewed signature population; invalid settings fail fast."""
    import random

    from synspark.datapipe.dedup import simhash_near_dups
    rng = random.Random(0)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    # skew: every signature shares the low 16 bits (the default single-
    # block key collapses to one bucket), high 48 bits random
    rows = [(i, signed((rng.getrandbits(48) << 16) | 0x1234))
            for i in range(300)]
    sim = spark.createDataFrame(rows, "doc_id long, simhash long")

    base = {tuple(r) for r in simhash_near_dups(sim).collect()}
    wide = {tuple(r) for r in
            simhash_near_dups(sim, n_blocks=6, blocks_per_key=3).collect()}
    assert base == wide  # exactness across parameterizations

    with pytest.raises(ValueError):
        simhash_near_dups(sim, max_hamming=3, n_blocks=4, blocks_per_key=2)

    # bucket-size math: replicate the key layout in pandas
    import itertools

    import numpy as np
    sigs = np.array([v for _, v in rows], dtype=np.int64) \
        .astype(np.uint64)

    def max_bucket(n_blocks, bpk):
        width = 64 // n_blocks
        mask = np.uint64((1 << width) - 1)
        blocks = [(sigs >> np.uint64(width * c)) & mask
                  for c in range(n_blocks)]
        mx = 0
        for combo in itertools.combinations(range(n_blocks), bpk):
            keys = ["_".join(str(blocks[c][i]) for c in combo)
                    for i in range(len(sigs))]
            _u, counts = np.unique(keys, return_counts=True)
            mx = max(mx, int(counts.max()))
        return mx

    assert max_bucket(4, 1) == 300          # the skewed bucket
    assert max_bucket(6, 3) < 10            # wider keys bound the join
