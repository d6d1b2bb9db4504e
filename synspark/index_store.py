"""Index storage: layout, manifest, lineage, resumable build
(SURVEY §4.3 "resumable checkpoints" — north-rule requirement).

On-disk layout (parquet everywhere; Iceberg-ready — same schemas):

  <index_dir>/
    meta.json           build lineage + global stats (N, avgdl, cfg,
                        dict fingerprint, source, build_id)
    manifest.json       per-shard checkpoint: rows/bytes/digest/status
    docmap/             doc_id, repo, path, commit, lang, content_sha256
    docstats/           doc_id, dl
    termstats/          term, df, cf  (query planning + idf)
    segments/shard=K/   encoded posting blocks, sorted by
                        (term, salt, block_seq) within files

The index is document-partitioned: ``shard`` is a fixed doc_id range
shared by all terms, so each shard holds complete postings for its
docs (queries run shard-parallel with no cross-shard traffic), and the
shard is also the resume/checkpoint granularity — a crashed build
restarts and recomputes only missing shards. Every stage is
deterministic (no sampled partitioners, seeded generators), so a
resumed index is byte-identical to a single-shot build.

Within shard files, rows sorted by term -> parquet row-group min/max
stats prune term lookups at query time (predicate pushdown).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager
from dataclasses import asdict, dataclass, field

from .fs import FsPath, LocalFS


def _run_concurrent(*fns) -> None:
    """Run jobs concurrently (Spark schedules concurrent jobs from
    separate threads — removes the per-job serial floor) and RE-RAISE
    the first failure after all join: a swallowed thread exception
    would let the meta commit proceed over missing/partial stats."""
    import threading
    errs: list = []

    def wrap(f):
        def g():
            try:
                f()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
        return g

    ts = [threading.Thread(target=wrap(f), daemon=True) for f in fns]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errs:
        raise errs[0]


@contextmanager
def _timed(stage: str):
    """Stage timing, printed when SYNSPARK_TIMING=1."""
    t0 = time.time()
    yield
    if os.environ.get("SYNSPARK_TIMING"):
        print(f"[synspark-timing] {stage}: {time.time() - t0:.2f}s",
              flush=True)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import with_sha256
from .docids import assign_doc_ids
from .indexer import (DOCSTATS_TERM, build_doc_stats,
                      build_segments_maponly, decode_docstats_rows,
                      encode_segments_from_tokens, tokenize_corpus)
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig

DEFAULT_SHARDS = 8
# bump when SEGMENT_SCHEMA / block encoding / store layout changes
# (v3: batch-partitioned docmap, meta.text_col, commit-gated readers;
#  v4: meta.json is the single atomic commit point — idempotence
#  records + committed-stats-partition list live IN meta; docstats and
#  termstats are batch-partitioned so appends write only their delta;
#  v5: meta.format enforcement, position-derived data partition names,
#  uses_token_filter analyzer-config flag;
#  v6: pl_bytes posLength column in SEGMENT_SCHEMA — filter-composed
#  indexes keep multi-word-rule spans for phrase adjacency — and
#  committed-partition-gated docstats/docmap readers;
#  v7: tombstone deletes — deletes/batch=del-K partitions plus
#  delete_batches / n_deleted in meta (Lucene liveDocs analogue; see
#  deletes.py for the two-phase delete -> purge-merge semantics))
#  v8: imp_bytes quantized-impact column in SEGMENT_SCHEMA + routed
#      tombstone mirror (deletes_routed/, meta.routed_batches)
FORMAT_VERSION = 8
INITIAL_BATCH = "initial"


def _with_ids(corpus: DataFrame, docid_mode: str,
              text_col: str = "content") -> DataFrame:
    """Corpora that already carry a dense 0..N-1 ``doc_id`` (e.g. the
    driver's documents table) keep it; otherwise assign deterministically
    from the (repo, path, commit) key."""
    df = with_sha256(corpus, col=text_col)
    if "doc_id" in corpus.columns:
        return df
    return assign_doc_ids(df, mode=docid_mode)


@dataclass
class IndexMeta:
    build_id: str
    n_docs: int
    avgdl: float
    n_shards: int
    k1: float
    b: float
    cfg: dict
    dict_fingerprint: str | None
    source: str
    store_positions: bool
    created_utc: float
    layout: str = "doc"
    text_col: str = "content"
    # exact Σ dl over the corpus: avgdl = total_dl / n_docs is integer-
    # derived, so incremental appends reproduce a full rebuild's avgdl
    # bit-for-bit (a float running average would drift with batch order)
    total_dl: int = 0
    # committed docstats/termstats batch partitions. Readers aggregate
    # exactly these; a crashed append's delta partition is invisible
    # until its retry commits (the parquet-native snapshot gate).
    stats_batches: list = field(default_factory=lambda: [INITIAL_BATCH])
    # idempotence records for at-least-once appends: tag -> commit info.
    # Lives in meta (not the manifest) because the meta write IS the
    # commit point — a tag is recorded iff its batch is fully visible
    # (round-2 advice: a tag committed before meta made a crashed batch
    # a permanent no-op that silently lost its documents).
    batches: dict = field(default_factory=dict)
    # store layout version; the field itself first appeared in v5, so
    # 0 = "no format field" (any pre-v5 store) and meta() rejects
    # mismatches with a clear message instead of failing obscurely on
    # the changed layout
    format: int = 0
    # True when the index was built through a token_filter composition.
    # The filter itself is analyzer CONFIG (a callable, like ES's
    # filter chain — not index data); the flag makes append fail fast
    # if the caller forgets to pass the same filter.
    uses_token_filter: bool = False
    # tombstone deletes (v7, Lucene liveDocs analogue): committed
    # deletes/batch= partition names + the exact deleted-doc count.
    # n_docs stays the doc-ID-SPACE size (reader gating, append
    # routing, and — exactly Lucene's pre-merge behavior — the N in
    # BM25: deleted docs keep counting in docFreq/maxDoc until a merge
    # purges them). Live docs = n_docs - n_deleted - n_purged.
    delete_batches: list = field(default_factory=list)
    n_deleted: int = 0
    # incremental merge (deletes.merge_shards, the Lucene per-segment
    # merge): shards rewritten copy-on-write land at NEW shard ids and
    # the replaced originals are listed here — readers skip them, disk
    # space is reclaimed at the next compact. Doc ids stay stable.
    dead_shards: list = field(default_factory=list)
    # docs physically removed by incremental merges: they left the
    # posting lists AND the stats (df/total_dl adjusted), so scoring N
    # = n_docs - n_purged (exactly Lucene's maxDoc shrinking as merges
    # apply liveDocs, while unmerged tombstones keep counting).
    n_purged: int = 0
    # committed purged/batch= partitions: the doc_ids each incremental
    # merge ACTUALLY removed from postings. The docmap keeps stale rows
    # for those ids until a full compact, so a later key-delete/upsert
    # can resolve an already-purged id; _write_tombstones anti-joins
    # this record to drop such inert tombstones at entry (they would
    # mask nothing but would skew n_deleted and the purge-merge live
    # counts). Bounded by churn since the last full compact; a
    # purge_merge output starts empty (docmap rebuilt, ids dense).
    purged_batches: list = field(default_factory=list)
    # delete batches that ALSO have a shard-routed mirror under
    # deletes_routed/ (shard, doc_id): the broadcast range join that
    # assigns each tombstone to its doc-range shard runs ONCE at
    # delete-commit time instead of inside every query (round-4 task
    # #5 — at a million live tombstones the per-query routing cost
    # 8-11s vs 5.3s clean). Writers keep this equal to delete_batches;
    # readers fall back to query-time routing for any batch without a
    # mirror (pre-v8 stores).
    routed_batches: list = field(default_factory=list)


def _digest_expr():
    return F.expr(
        "bit_xor(xxhash64(term, block_seq, first_doc, last_doc, "
        "n_docs, max_tf, sum_tf, min_dl, doc_bytes, tf_bytes, dl_bytes))"
    ).alias("digest")


class ConcurrentWriterError(RuntimeError):
    """A second writer tried to append while another holds the lock
    (or a crashed writer left a stale one — see break_lock)."""


class IndexStore:
    def __init__(self, path: str, fs=None):
        """``fs`` routes the METADATA/commit layer (meta/manifest
        writes, crashed-partition purge, writer lock): default
        ``LocalFS``; pass ``HadoopFS(spark, path)`` to run the store on
        any Hadoop-supported filesystem (hdfs://, s3a://, file:). Bulk
        parquet I/O always goes through Spark and is FS-agnostic either
        way."""
        self.fs = fs or LocalFS()
        self.path = FsPath(self.fs, path)
        # bounded per-term df memo for query planning: only QUERIED
        # terms ever enter (never the vocabulary), invalidated when the
        # index build changes. Cuts one Spark job per repeated query.
        self._df_cache: dict = {}
        self._df_cache_build: str | None = None

    # ---------- metadata ----------
    def meta(self) -> IndexMeta:
        m = IndexMeta(**json.loads((self.path / "meta.json").read_text()))
        if m.format != FORMAT_VERSION:
            have = f"v{m.format}" if m.format else \
                "pre-v5 (meta has no format field)"
            raise ValueError(
                f"index at {self.path} is store format {have}; this "
                f"build reads/writes v{FORMAT_VERSION} — rebuild the "
                f"index with build_index")
        return m

    def _write_meta(self, meta: IndexMeta) -> None:
        self.path.mkdir(parents=True, exist_ok=True)
        (self.path / "meta.json").write_text(json.dumps(asdict(meta), indent=1))

    def manifest(self) -> dict:
        p = self.path / "manifest.json"
        return json.loads(p.read_text()) if p.exists() else {"shards": {}}

    def _write_manifest(self, m: dict) -> None:
        (self.path / "manifest.json").write_text(json.dumps(m, indent=1))

    def completed_shards(self) -> set[int]:
        return {int(k) for k, v in self.manifest()["shards"].items()
                if v.get("status") == "done"}

    # ---------- writer lock ----------
    # append_to_index documents a single-writer contract; the lock file
    # turns a violated contract into a fast failure instead of silent
    # manifest/shard-allocation races (round-3 verdict task #10). Best
    # effort by design: created with create-exclusive semantics
    # (O_EXCL / FileSystem.createNewFile), removed on commit or error.
    def _lock_path(self) -> FsPath:
        return self.path / "writer.lock"

    def acquire_writer_lock(self, owner: str) -> None:
        info = json.dumps({"owner": owner, "pid": os.getpid(),
                           "acquired_utc": time.time()})
        if not self._lock_path().create_exclusive(info):
            try:
                held = self._lock_path().read_text()
            except Exception:
                held = "<unreadable>"
            raise ConcurrentWriterError(
                f"another writer holds {self._lock_path()}: {held}. "
                "Concurrent appends are unsupported (single-writer "
                "contract); if the holder crashed, call "
                "IndexStore.break_lock() and retry.")

    def release_writer_lock(self) -> None:
        try:
            self._lock_path().unlink()
        except Exception:
            pass

    def break_lock(self) -> None:
        """Operator override for a crashed writer's stale lock."""
        self.release_writer_lock()

    def _committed_data_parts(self, meta: "IndexMeta") -> list[str]:
        """Partition names of COMMITTED docstats/docmap batches: the
        initial build + every batch recorded in meta (the commit
        record). A crashed append's ``batch=at-N`` partition is never
        in this list, so partition-gated readers cannot even LIST its
        files (round-3 advice: the row-level doc_id gate alone still
        listed crashed-delta files, racing a retry's purge)."""
        parts = {INITIAL_BATCH}
        for b in meta.batches.values():
            if b.get("partition"):
                parts.add(b["partition"])
        return sorted(parts)

    # ---------- readers ----------
    # segments/docmap reads are COMMIT-GATED on meta (written last):
    # shard < n_shards / doc_id < n_docs hides partitions left by a
    # crashed append until its retry commits — cheap O(1) predicates
    # that partition-prune, the parquet-native analogue of a snapshot.
    def segments(self, spark: SparkSession) -> DataFrame:
        meta = self.meta()
        df = spark.read.parquet(str(self.path / "segments"))
        df = df.filter(F.col("shard") < meta.n_shards)
        if meta.dead_shards:
            # shards replaced by an incremental merge: their rewritten
            # successors are live at higher ids; the originals stay on
            # disk (in-flight readers planned on the old meta) until
            # compact reclaims them
            df = df.filter(~F.col("shard").isin(meta.dead_shards))
        return df

    def docstats(self, spark: SparkSession) -> DataFrame:
        """(doc_id, dl). Batch-partitioned on disk (one partition per
        append), gated on the COMMITTED partition list (partition
        pruning — a crashed append's delta files are never listed, so
        a concurrent retry's purge can't race this scan) plus the
        doc_id < n_docs row gate. ignoreMissingFiles covers the one
        remaining window: a reader that planned against an older meta
        while the vacuum reclaimed a folded delta."""
        meta = self.meta()
        df = spark.read.option("ignoreMissingFiles", "true") \
            .parquet(str(self.path / "docstats"))
        return (df.filter(F.col("batch")
                          .isin(self._committed_data_parts(meta)))
                .filter(F.col("doc_id") < meta.n_docs)
                .select("doc_id", "dl"))

    def termstats(self, spark: SparkSession) -> DataFrame:
        """(term, df, cf) — merge-on-read over per-batch delta
        partitions. Appends write ONLY their own delta (aggregated from
        the new shards); the reader sums committed partitions. df/cf
        are additive, term_dfs reads are term-filtered (the filter
        pushes below this aggregate to the parquet scan), and
        compact_index folds all deltas back into one partition — so
        per-append cost is O(new docs), never O(index).

        Gate: only partitions named in meta.stats_batches (the commit
        record) participate, hiding crashed-append deltas.
        ignoreMissingFiles covers a reader planned against an older
        meta racing the post-fold vacuum."""
        df = spark.read.option("ignoreMissingFiles", "true") \
            .parquet(str(self.path / "termstats"))
        return (df.filter(F.col("batch").isin(self.meta().stats_batches))
                .groupBy("term")
                .agg(F.sum("df").cast("long").alias("df"),
                     F.sum("cf").cast("long").alias("cf")))

    def deletes(self, spark: SparkSession) -> DataFrame:
        """Committed tombstoned ``doc_id``s (empty frame when none).
        Same snapshot gate as the stats readers: only partitions named
        in ``meta.delete_batches`` participate, so a crashed
        delete_docs attempt is invisible until its retry commits."""
        meta = self.meta()
        if not meta.delete_batches:
            return spark.range(0).select(F.col("id").alias("doc_id"))
        df = spark.read.option("ignoreMissingFiles", "true") \
            .parquet(str(self.path / "deletes"))
        return df.filter(F.col("batch").isin(meta.delete_batches)) \
            .select("doc_id")

    def deletes_routed(self, spark: SparkSession) -> DataFrame | None:
        """Shard-routed tombstones (shard, doc_id) when EVERY committed
        delete batch has a routed mirror, else None (caller falls back
        to the query-time broadcast range join — pre-v8 stores only).
        The mirror is written in the same commit as the delete batch,
        so the snapshot gate is the same meta list."""
        meta = self.meta()
        if not meta.delete_batches:
            return None
        if not set(meta.delete_batches) <= set(meta.routed_batches):
            return None
        df = spark.read.option("ignoreMissingFiles", "true") \
            .parquet(str(self.path / "deletes_routed"))
        return df.filter(F.col("batch").isin(meta.delete_batches)) \
            .select("shard", "doc_id")

    def purged(self, spark: SparkSession) -> DataFrame:
        """doc_ids physically removed by incremental merges whose
        stale docmap rows are still visible (empty frame when none) —
        the anti-join source that keeps re-deletes of purged ids from
        becoming inert tombstones. Same snapshot gate as deletes()."""
        meta = self.meta()
        if not meta.purged_batches:
            return spark.range(0).select(F.col("id").alias("doc_id"))
        df = spark.read.option("ignoreMissingFiles", "true") \
            .parquet(str(self.path / "purged"))
        return df.filter(F.col("batch").isin(meta.purged_batches)) \
            .select("doc_id")

    def shard_doc_ranges(self, spark: SparkSession) -> DataFrame:
        """(shard, lo, hi) — each shard's doc-id range, from the
        docstats pseudo-term rows (DOCSTATS_TERM sorts first within
        every shard file, so the term predicate prunes to ~one row
        group per file). Shards partition the id space into disjoint
        contiguous ranges, so tombstones route to exactly one shard by
        a range join against this tiny frame."""
        from .indexer import DOCSTATS_TERM
        return (self.segments(spark)
                .filter(F.col("term") == F.lit(DOCSTATS_TERM))
                .groupBy("shard")
                .agg(F.min("first_doc").alias("lo"),
                     F.max("last_doc").alias("hi")))

    def docmap(self, spark: SparkSession) -> DataFrame:
        meta = self.meta()
        df = spark.read.option("ignoreMissingFiles", "true") \
            .parquet(str(self.path / "docmap"))
        return (df.filter(F.col("batch")
                          .isin(self._committed_data_parts(meta)))
                .filter(F.col("doc_id") < meta.n_docs))

    def stats(self) -> dict:
        """The ES ``_stats``/``_cat/indices`` surface: doc accounting,
        shard layout, and on-disk lineage totals — all from meta + the
        manifest, no Spark job."""
        meta = self.meta()
        man = self.manifest()
        live_shards = [int(k) for k, v in man["shards"].items()
                       if v.get("status") == "done"
                       and int(k) < meta.n_shards
                       and int(k) not in meta.dead_shards]
        return {
            "n_docs": meta.n_docs,
            "n_live": meta.n_docs - meta.n_deleted - meta.n_purged,
            "n_deleted": meta.n_deleted,     # tombstoned, pre-merge
            "n_purged": meta.n_purged,       # removed by partial merges
            "n_shards": meta.n_shards,
            "n_live_shards": len(live_shards),
            "dead_shards": list(meta.dead_shards),
            "avgdl": meta.avgdl,
            "total_dl": meta.total_dl,
            "segment_rows": sum(v.get("rows", 0)
                                for k, v in man["shards"].items()
                                if int(k) in set(live_shards)),
            "segment_bytes": sum(v.get("bytes", 0)
                                 for k, v in man["shards"].items()
                                 if int(k) in set(live_shards)),
            "stats_batches": len(meta.stats_batches),
            "delete_batches": len(meta.delete_batches),
            "format": meta.format,
            "build_id": meta.build_id,
            "source": meta.source,
        }

    def term_dfs(self, spark: SparkSession, terms: list[str],
                 build_id: str | None = None) -> dict:
        """{term: df} for ``terms`` (0 for absent terms), served from a
        bounded driver-side memo keyed by build_id; only misses hit
        Spark. Memory stays O(distinct queried terms), capped."""
        bid = build_id or self.meta().build_id
        if bid != self._df_cache_build:
            self._df_cache = {}
            self._df_cache_build = bid
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = self.termstats(spark) \
                .filter(F.col("term").isin(missing)) \
                .select("term", "df").collect()
            found = {r["term"]: int(r["df"]) for r in rows}
            if len(self._df_cache) < (1 << 20):
                for t in missing:
                    self._df_cache[t] = found.get(t, 0)
            else:
                return {t: self._df_cache.get(
                    t, found.get(t, 0)) for t in terms}
        return {t: self._df_cache.get(t, 0) for t in terms}


def _usable_stats_dir(p: FsPath) -> bool:
    """True iff ``p`` exists AND is batch-partitioned (has ``batch=``
    children). A pre-v5 partial build left UNPARTITIONED stats dirs;
    resuming over one and committing v6 meta would make every later
    read fail obscurely on the missing ``batch`` column (round-3
    advice) — callers treat such dirs as absent and rebuild them."""
    return p.exists() and any(c.name.startswith("batch=")
                              for c in p.iterdir())


def build_index(spark: SparkSession, corpus: DataFrame, out_dir: str,
                cfg: TokenizerConfig | None = None,
                syn: SynonymDict | None = None,
                k1: float = 1.2, b: float = 0.75,
                n_shards: int | None = DEFAULT_SHARDS,
                store_positions: bool = True,
                target_postings_per_task: int = 1 << 20,
                docid_mode: str = "bucketed",
                layout: str = "doc",
                text_col: str = "content",
                source: str = "<dataframe>",
                resume: bool = True,
                batch_tag: str | None = None,
                token_filter=None, fs=None) -> IndexStore:
    """End-to-end resumable index build.

    Stage A (docmap + docstats + meta), then stage B (segments shard by
    shard, recorded in the manifest with rows/bytes/digest lineage).
    On restart with ``resume``, completed shards are skipped.

    ``layout="doc"`` (default): document-routed map-only build — one
    corpus repartition, zero token shuffle (indexer.
    build_segments_maponly). ``layout="term"``: salted
    repartition-by-term stream encode (indexer.
    encode_segments_from_tokens). Decoded postings are identical.

    Multi-field documents (the reference's msg1/msg2) compose as one
    index per field: call build_index once per text column via
    ``text_col`` (per-field norms/df/avgdl fall out naturally).

    ``n_shards=None`` auto-sizes shards by data volume (~12.5k docs ≈
    ~2M tokens per encode worker), floored at 4x parallelism —
    deterministic in n_docs, so resumes agree.

    ``token_filter`` composes a whole-doc token-stream transform after
    the tokenizer — the reference's SECOND analyzer shape (plain ngram
    tokenizer + synonym token FILTER, e.g.
    ``synfilter.synonym_token_filter(syn, entry_tokenizer=...)``,
    SynonymPluginTest.java:488-626). The filter is analyzer CONFIG, not
    index data (exactly ES): it is not recorded in meta, and the caller
    passes the current filter to every append/query — query side via
    ``search(..., groups=synfilter.analyze_query_filtered(...))``.
    Positions are stored; posLength is carried (v6 ``pl_bytes``) so
    multi-word rules ("united states => usa") keep their span and
    phrase adjacency follows the token GRAPH, per
    SynonymFilter.java:472-526 — full MultiPhraseQuery semantics.

    ``batch_tag`` records an idempotence tag in the final meta commit —
    used by the streaming sink's BOOTSTRAP micro-batch so a replay
    after the build committed but before the streaming checkpoint did
    takes ``append_to_index``'s no-op path instead of re-appending
    batch 0 (round-2 advice: effectively-once requires the bootstrap
    batch to be tagged like every other batch).
    """
    cfg = cfg or TokenizerConfig()
    store = IndexStore(out_dir, fs=fs)
    seg_dir = str(store.path / "segments")

    manifest = store.manifest() if resume else {"shards": {}}
    done = {int(k) for k, v in manifest["shards"].items()
            if v.get("status") == "done"}
    # meta is written LAST: its presence marks a complete build
    if resume and (store.path / "meta.json").exists() \
            and (n_shards is None or len(done) >= n_shards):
        return store

    # ---- stage A: docmap (ids + sha) ----
    # persist only when ids had to be assigned (window shuffle worth
    # caching); native-id corpora re-read parquet cheaper than cache
    assigned = "doc_id" not in corpus.columns
    docs = _with_ids(corpus, docid_mode, text_col)
    if assigned:
        docs = docs.persist()
    docmap_dir = store.path / "docmap"

    def _write_docmap():
        if not (resume and _usable_stats_dir(docmap_dir)):
            keep = [c for c in ["doc_id", "repo", "path", "commit", "lang",
                                "content_sha256"] if c in docs.columns]
            # partitioned by batch from the start so later appends can
            # dynamically overwrite exactly their own sub-dir
            (docs.select(*keep).withColumn("batch", F.lit("initial"))
             .write.mode("overwrite").partitionBy("batch")
             .parquet(str(docmap_dir)))

    docmap_thread = None
    docmap_errs: list = []
    with _timed("A.count"):
        n_docs = docs.count()
    if assigned or layout == "term":
        # window output cached; run serially (thread adds no overlap)
        with _timed("A.docmap"):
            _write_docmap()
    else:
        # independent of stage B — overlap the two jobs (Spark schedules
        # concurrent jobs from separate threads); failures re-raise at
        # the join so a dead docmap write can't commit silently
        import threading

        def _docmap_wrapped():
            try:
                _write_docmap()
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                docmap_errs.append(e)

        docmap_thread = threading.Thread(target=_docmap_wrapped,
                                         daemon=True)
        docmap_thread.start()
    if n_shards is None:
        # floor = 2 encode waves: range routing (indexer round 6) gives
        # exactly one task per shard, so the old 4x-parallelism floor —
        # sized to absorb HASH-routing collisions — only multiplied
        # per-task overhead; two waves still mask tokenize-cost
        # stragglers, and the volume term (~12.5k docs ≈ ~2M tokens per
        # encode worker) governs real corpora unchanged
        n_shards = max(2 * spark.sparkContext.defaultParallelism,
                       n_docs // 12_500)
        if resume and len(done) >= n_shards \
                and (store.path / "meta.json").exists():
            return store

    # term layout needs docstats (dl) BEFORE encoding; doc layout emits
    # dl in-pass as pseudo-term rows and derives docstats afterwards
    if layout == "term" and not (resume and
                                 _usable_stats_dir(store.path / "docstats")):
        (build_doc_stats(tokenize_corpus(docs, cfg, syn, text_col=text_col,
                                         token_filter=token_filter))
         .withColumn("batch", F.lit(INITIAL_BATCH))
         .write.mode("overwrite").partitionBy("batch")
         .parquet(str(store.path / "docstats")))

    # ---- stage B: segments per shard ----
    missing = [k for k in range(n_shards) if k not in done]
    if missing:
        batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old_batch = spark.conf.get(batch_key, "10000")
        if layout == "doc":
            segs = build_segments_maponly(
                docs, cfg, syn, n_docs=n_docs, n_shards=n_shards,
                store_positions=store_positions, text_col=text_col,
                token_filter=token_filter)
            if len(missing) < n_shards:
                segs = segs.filter(F.col("shard").isin(missing))
            # one task per shard ⇒ one term-sorted file per shard dir.
            # With sub-range routing active (n_shards below the core
            # count — indexer round 6) each shard's f sub-encoders
            # would otherwise each write a file: f× parquet footers
            # for EVERY later query's segment scan (measured ~+10% on
            # 0.4 s queries). The encoded rows are tiny next to the
            # tokenized input, so one exchange of them restores the
            # 1-file-per-shard layout while tokenize+encode keeps all
            # cores (§8: decide/encode on all cores, move the compact
            # result once).
            from .codec import BLOCK_DOCS as _bd
            f_sub = max(1, min(spark.sparkContext.defaultParallelism
                               // max(n_shards, 1),
                               (n_docs // max(n_shards, 1))
                               // (50 * _bd)))
            if f_sub > 1:
                write_df = (segs.repartition(max(len(missing), 1),
                                             "shard")
                            .sortWithinPartitions("term", "salt",
                                                  "block_seq"))
            else:
                # already partitioned by shard + term-sorted in-worker
                write_df = segs
        else:
            tokens = tokenize_corpus(docs, cfg, syn, text_col=text_col,
                                     token_filter=token_filter).persist()
            tokens.count()  # materialize before the big-batch conf below
            doc_stats = spark.read.parquet(str(store.path / "docstats")) \
                .select("doc_id", "dl")
            segs = encode_segments_from_tokens(
                tokens, doc_stats, n_docs=n_docs, n_shards=n_shards,
                target_tokens_per_task=target_postings_per_task,
                store_positions=store_positions)
            if len(missing) < n_shards:
                segs = segs.filter(F.col("shard").isin(missing))
            write_df = (segs.repartition(max(len(missing), 1), "shard")
                        .sortWithinPartitions("term", "salt", "block_seq"))
            # token rows are slim — stream them to the Python encoder in
            # big Arrow batches (the session default is sized for fat
            # content strings)
            spark.conf.set(batch_key, "131072")
        try:
            with _timed("B.segments"):
                (write_df.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("shard").parquet(seg_dir))
        finally:
            spark.conf.set(batch_key, old_batch)
        if docmap_thread is not None:
            docmap_thread.join()
            docmap_thread = None
    if docmap_thread is not None:
        docmap_thread.join()
    if docmap_errs:
        raise docmap_errs[0]
    if assigned:
        docs.unpersist()

    # ---- stage B'/C: manifest lineage + derived stats — three
    # independent scans of the written segments, scheduled concurrently
    # from threads (Spark runs concurrent jobs; overlapping them removes
    # most of the per-job serial floor that dominates small builds) ----
    segs_all = spark.read.parquet(seg_dir)
    ts_dir = store.path / "termstats"
    build_id = uuid.uuid4().hex
    stats_out: list = []

    def _manifest_job():
        if not missing:
            return
        stats_out.extend(
            spark.read.parquet(seg_dir)
            .filter(F.col("shard").isin(missing))
            .groupBy("shard")
            .agg(F.count("*").alias("rows"),
                 (F.sum(F.length("doc_bytes")) +
                  F.sum(F.length("tf_bytes")) +
                  F.sum(F.length("dl_bytes"))).alias("bytes"),
                 _digest_expr())
            .collect())

    obs_dl: list = []

    def _docstats_job():
        if layout == "doc" and (missing or
                                not _usable_stats_dir(store.path
                                                      / "docstats")):
            # observe sum(dl) DURING the write (round 6): the avgdl
            # finisher otherwise re-reads the docstats parquet it just
            # wrote only to sum one column — a whole extra job
            from pyspark.sql import Observation
            obs = Observation()
            (decode_docstats_rows(
                segs_all.filter(F.col("term") == DOCSTATS_TERM))
             .withColumn("batch", F.lit(INITIAL_BATCH))
             .observe(obs, F.sum("dl").alias("total_dl"))
             .write.mode("overwrite").partitionBy("batch")
             .parquet(str(store.path / "docstats")))
            obs_dl.append(int(obs.get["total_dl"] or 0))

    def _termstats_job():
        if missing or not _usable_stats_dir(ts_dir):
            (segs_all.filter(F.col("term") != DOCSTATS_TERM)
             .groupBy("term")
             .agg(F.sum("n_docs").cast("long").alias("df"),
                  F.sum("sum_tf").alias("cf"))
             .withColumn("batch", F.lit(INITIAL_BATCH))
             .write.mode("overwrite").partitionBy("batch")
             .parquet(str(ts_dir)))

    with _timed("C.stats"):
        _run_concurrent(_manifest_job, _docstats_job, _termstats_job)

    if missing:
        # checkpoint: per-shard rows/bytes/digest lineage (manifest
        # still commits before meta — the real commit point)
        found = set()
        for r in stats_out:
            found.add(int(r["shard"]))
            manifest["shards"][str(int(r["shard"]))] = {
                "status": "done", "rows": int(r["rows"]),
                "bytes": int(r["bytes"] or 0), "digest": int(r["digest"]),
                "build_id": build_id}
        for k in missing:
            if k not in found:  # shard legitimately empty
                manifest["shards"][str(k)] = {
                    "status": "done", "rows": 0, "bytes": 0, "digest": 0,
                    "build_id": build_id}
        store._write_manifest(manifest)

    with _timed("C.avgdl"):
        if obs_dl:
            total_dl = obs_dl[0]   # observed during the docstats write
        else:                      # resume / term layout: read stats
            row = spark.read.parquet(str(store.path / "docstats")) \
                .agg(F.sum("dl").alias("total_dl")).collect()[0]
            total_dl = int(row["total_dl"] or 0)
    bid = manifest["shards"].get("0", {}).get("build_id", uuid.uuid4().hex)
    batches = {}
    if batch_tag is not None:
        batches[batch_tag] = {"status": "done", "build_id": bid,
                              "n_docs": n_docs, "shards": [0, n_shards],
                              "partition": INITIAL_BATCH}
    meta = IndexMeta(
        build_id=bid,
        n_docs=n_docs,
        avgdl=(total_dl / n_docs) if (n_docs and total_dl) else 1.0,
        n_shards=n_shards, k1=k1, b=b,
        cfg={"n": cfg.n, "delimiters": cfg.delimiters,
             "expand": cfg.expand, "ignore_case": cfg.ignore_case,
             "emit_short_blocks": cfg.emit_short_blocks,
             "offsets": cfg.offsets},
        dict_fingerprint=syn.fingerprint() if syn else None,
        source=source, store_positions=store_positions,
        created_utc=time.time(), layout=layout, text_col=text_col,
        total_dl=total_dl, stats_batches=[INITIAL_BATCH], batches=batches,
        format=FORMAT_VERSION,
        uses_token_filter=token_filter is not None)
    store._write_meta(meta)
    return store


def new_shard_segments(spark: SparkSession, store: IndexStore,
                       old_shards: int,
                       new_total_shards: int | None = None) -> DataFrame:
    """Segments of shards appended after ``old_shards`` — a partition-
    pruned scan (``shard`` is the partition column, so only the new
    shards' parquet files are ever listed/read). This is the ONLY
    segment input the append stats refresh touches: per-append cost is
    O(new batch), not O(index) (round-2 verdict: the full-index
    re-aggregation per micro-batch was the last scale-killer).

    The UPPER bound matters for crash safety: a LARGER crashed append
    may have left stale shard partitions above this append's range
    (dynamic overwrite replaces only the shards it re-writes); they are
    invisible to queries (shard < meta.n_shards) and must be invisible
    to the stats refresh too, or their df/cf/dl would leak into the
    committed delta."""
    df = spark.read.parquet(str(store.path / "segments")) \
        .filter(F.col("shard") >= old_shards)
    if new_total_shards is not None:
        df = df.filter(F.col("shard") < new_total_shards)
    return df


def _clear_uncommitted(store: IndexStore, old_shards: int,
                       batch_part: str) -> None:
    """Remove partitions a crashed prior append may have left. Every
    shard dir >= the committed n_shards and every ``batch=<this
    position>`` stats/docmap partition is uncommitted BY DEFINITION
    (single-writer contract; meta is the commit point), so deleting
    them is always safe — and necessary: dynamic partition overwrite
    replaces only partitions the new write actually produces, so an
    append whose output is empty (or smaller-sharded than the crashed
    attempt) would otherwise leave stale in-range data that the stats
    refresh and readers would then adopt (code-review finding). Runs
    through the store's FS shim — works wherever the commit layer
    does (HDFS/S3A/local)."""
    seg = store.path / "segments"
    if seg.exists():
        for d in seg.glob("shard=*"):
            try:
                k = int(d.name.split("=", 1)[1])
            except ValueError:
                continue
            if k >= old_shards:
                d.rmtree()
    for sub in ("docstats", "termstats", "docmap"):
        p = store.path / sub / f"batch={batch_part}"
        if p.exists():
            p.rmtree()


def append_to_index(spark: SparkSession, store: IndexStore,
                    new_corpus: DataFrame,
                    syn: SynonymDict | None = None,
                    docs_per_shard: int | None = None,
                    source: str = "<append>",
                    batch_tag: str | None = None,
                    allow_dict_change: bool = False,
                    fold_stats_every: int = 64,
                    token_filter=None,
                    tombstone_ids: DataFrame | None = None) -> IndexStore:
    """Incrementally add documents: new docs get ids starting at the
    current N and become NEW shards appended after the existing ones —
    existing segment partitions are untouched (the doc-range sharding
    makes appends pure partition additions, like Lucene adding
    segments). Global stats stay exact with O(new batch) work:

    - docstats: the new docs' (doc_id, dl) rows land in a NEW batch
      partition (pure partition append);
    - termstats: the new shards' (term, df, cf) DELTA lands in a new
      batch partition; readers merge-on-read (df/cf are sums). Nothing
      ever re-aggregates the existing shards. Once the committed delta
      count exceeds ``fold_stats_every`` the append also folds all
      termstats partitions into one (an O(vocab) aggregation of the
      SMALL stats table — never the segments), so the reader-side merge
      and the committed-partition list stay bounded under continuous
      ingest: amortized cost O(vocab / fold_stats_every) per batch;
    - avgdl: meta carries exact integer ``total_dl``; the append adds
      the delta sum, so avgdl == a full rebuild's bit-for-bit.

    Commit protocol (at-least-once safe): every data partition name is
    derived from the append POSITION (``at-<old N>`` — the committed
    doc count; ``batch_tag`` is only the idempotence key), leftovers
    from any crashed prior attempt are removed up front
    (``_clear_uncommitted`` — they are uncommitted by definition under
    the single-writer contract), and readers are gated on meta —
    shard < n_shards, doc_id < n_docs, termstats batch ∈
    stats_batches. The single ``meta.json`` write at the end publishes
    ALL of it atomically, including the ``batch_tag`` idempotence
    record: a replayed micro-batch is a no-op iff its batch is fully
    visible. There is no window where the tag is committed but the
    data isn't (round-2 advice #1), and crashed-attempt leftovers can
    neither accumulate nor be adopted under any tag mixing (round-2
    advice #3 + round-3 review).

    Concurrency contract: ONE writer at a time (the streaming sink is
    naturally serial; two concurrent appends would race the manifest's
    read-modify-write and the shard-number allocation). Readers are
    always safe — they see the last committed meta.

    Concurrency is ENFORCED (not just documented): a ``writer.lock``
    is taken with create-exclusive semantics for the duration of the
    append; a second concurrent append fails fast with
    ``ConcurrentWriterError``. A crashed writer leaves a stale lock —
    ``store.break_lock()`` is the operator override (the lock is an
    operational guard, not part of the commit protocol: correctness
    still comes from the meta commit point).

    ``allow_dict_change=True`` reproduces the reference's dynamic
    dictionary reload semantics (SynonymLoader.java:55-74 hot-swaps the
    SynonymMap; SynonymPluginTest.java:367-484 pins the consequences):
    documents indexed BEFORE the change keep their old tokens, the new
    batch is tokenized with the NEW rules, and meta.dict_fingerprint
    advances so query-time analysis follows the new dictionary — ES
    behavior exactly (old docs need a reindex, see
    ``rebuild_if_dict_changed``). Default False: a changed fingerprint
    raises, keeping single-dictionary indexes consistent.

    ``tombstone_ids`` (a doc_id DataFrame) additionally deletes those
    existing docs in the SAME meta commit — the atomic delete+add that
    ``deletes.upsert_docs`` builds on (Lucene updateDocument).
    """
    store.acquire_writer_lock(owner=source)
    try:
        return _append_locked(
            spark, store, new_corpus, syn, docs_per_shard, source,
            batch_tag, allow_dict_change, fold_stats_every, token_filter,
            tombstone_ids)
    finally:
        store.release_writer_lock()


def _append_locked(spark, store, new_corpus, syn, docs_per_shard,
                   source, batch_tag, allow_dict_change,
                   fold_stats_every, token_filter,
                   tombstone_ids=None) -> IndexStore:
    meta = store.meta()
    cfg = TokenizerConfig(**meta.cfg)
    if meta.uses_token_filter != (token_filter is not None):
        raise ValueError(
            "token_filter mismatch: the index was built "
            + ("THROUGH a token filter — pass the same filter to "
               "append_to_index" if meta.uses_token_filter else
               "WITHOUT a token filter — appending filtered tokens "
               "would split the index across two analyzers")
            + " (the filter is analyzer config, not index data — like "
              "an ES analyzer chain)")
    new_fp = syn.fingerprint() if syn is not None else None
    if new_fp != meta.dict_fingerprint and not allow_dict_change:
        if syn is None:
            raise ValueError("index was built with a synonym dictionary; "
                             "pass the same rules to append_to_index")
        raise ValueError("synonym dictionary differs from the one the "
                         "index was built with (fingerprint mismatch); "
                         "rebuild, or pass allow_dict_change=True for "
                         "the reference's reload semantics (old docs "
                         "keep old tokens)")

    if batch_tag is not None and \
            meta.batches.get(batch_tag, {}).get("status") == "done":
        return store  # replayed micro-batch: already committed

    old_n, old_shards = meta.n_docs, meta.n_shards
    per_shard = docs_per_shard or max(1, (old_n + old_shards - 1)
                                      // old_shards)

    # ids continue after the existing range; deterministic like stage A
    base = with_sha256(new_corpus, col=meta.text_col)
    if "doc_id" in new_corpus.columns:
        docs = base.withColumn("doc_id", F.col("doc_id") + F.lit(old_n))
        docs = docs.persist()
        n_new = docs.count()
    else:
        # size the id buckets from the batch count we need anyway —
        # letting assign_doc_ids auto-count would add a full extra job
        # on the unpersisted batch (per-micro-batch cost on the
        # streaming path)
        from .docids import bucket_count
        base = base.persist()
        n_new = base.count()
        docs = (assign_doc_ids(base, buckets=bucket_count(n_new))
                .withColumn("doc_id", F.col("doc_id") + F.lit(old_n))
                .persist())
        docs.count()  # materialize before dropping the base cache
        base.unpersist()
    add_shards = max(1, (n_new + per_shard - 1) // per_shard)
    new_total_shards = old_shards + add_shards
    build_id = uuid.uuid4().hex

    # one sub-dir per append (partition column). The name is derived
    # from the append POSITION for EVERY append (the idempotence KEY is
    # still the tag): any append starting from the same committed old_n
    # — a same-tag replay, an untagged retry, or a different batch
    # after an abandoned crashed attempt — targets the same partitions,
    # and _clear_uncommitted removes every leftover in range first, so
    # crashed-attempt data can neither accumulate nor be adopted even
    # when this append produces less output than the crashed one did.
    batch_part = f"at-{old_n}"
    _clear_uncommitted(store, old_shards, batch_part)
    if n_new == 0:
        # nothing to index: commit only the idempotence record so a
        # replayed empty batch still no-ops
        docs.unpersist()
        if batch_tag is not None and batch_tag not in meta.batches:
            batches = dict(meta.batches)
            batches[batch_tag] = {
                "status": "done", "build_id": build_id, "n_docs": 0,
                "shards": [old_shards, old_shards], "partition": None}
            store._write_meta(IndexMeta(
                **{**asdict(meta), "batches": batches,
                   "build_id": build_id, "created_utc": time.time()}))
        return store
    keep = [c for c in ["doc_id", "repo", "path", "commit", "lang",
                        "content_sha256"] if c in docs.columns]
    (docs.select(*keep).withColumn("batch", F.lit(batch_part))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch").parquet(str(store.path / "docmap")))

    # segments for the new doc range only: shift ids into [0, n_new),
    # shard locally, then shift shard numbers up past the old ones
    shifted = docs.withColumn("doc_id", F.col("doc_id") - F.lit(old_n))
    segs = build_segments_maponly(
        shifted, cfg, syn, n_docs=n_new, n_shards=add_shards,
        store_positions=meta.store_positions, text_col=meta.text_col,
        token_filter=token_filter)
    segs = (segs
            .withColumn("shard", F.col("shard") + F.lit(old_shards))
            .withColumn("first_doc", F.col("first_doc") + F.lit(old_n))
            .withColumn("last_doc", F.col("last_doc") + F.lit(old_n)))
    # NOTE doc gaps inside blocks are shift-invariant (deltas); only
    # first_doc anchors them, and docstats pseudo-rows shift the same way
    seg_dir = str(store.path / "segments")
    (segs.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("shard").parquet(seg_dir))
    docs.unpersist()

    # ---- stats refresh from the NEW shards only (three independent
    # jobs over the same partition-pruned scan, overlapped) ----
    new_segs = new_shard_segments(spark, store, old_shards,
                                  new_total_shards)
    lineage: list = []
    dl_sum: list = []

    def _lineage_job():
        lineage.extend(
            new_segs.groupBy("shard")
            .agg(F.count("*").alias("rows"),
                 (F.sum(F.length("doc_bytes")) + F.sum(F.length("tf_bytes"))
                  + F.sum(F.length("dl_bytes"))).alias("bytes"),
                 _digest_expr())
            .collect())

    def _docstats_job():
        delta = decode_docstats_rows(
            new_segs.filter(F.col("term") == DOCSTATS_TERM))
        (delta.withColumn("batch", F.lit(batch_part))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch").parquet(str(store.path / "docstats")))
        row = spark.read.parquet(str(store.path / "docstats")) \
            .filter(F.col("batch") == batch_part) \
            .agg(F.sum("dl").alias("s")).collect()[0]
        dl_sum.append(int(row["s"] or 0))

    def _termstats_job():
        (new_segs.filter(F.col("term") != DOCSTATS_TERM)
         .groupBy("term")
         .agg(F.sum("n_docs").cast("long").alias("df"),
              F.sum("sum_tf").alias("cf"))
         .withColumn("batch", F.lit(batch_part))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch").parquet(str(store.path / "termstats")))

    with _timed("append.stats"):
        _run_concurrent(_lineage_job, _docstats_job, _termstats_job)

    # stage tombstones (upsert: the old versions of updated keys) —
    # they become visible only through the same meta commit below, so
    # delete+add is atomic (Lucene updateDocument). Resolution happened
    # against the COMMITTED docmap (the caller's plan baked in the
    # pre-append partition list), so new docs can never self-tombstone.
    del_part, n_del_new = None, 0
    if tombstone_ids is not None:
        from .deletes import _write_tombstones
        del_part, n_del_new = _write_tombstones(
            spark, store, meta, tombstone_ids, old_n)

    # shard lineage may land in the manifest before the commit — those
    # shards are invisible until meta advances n_shards
    manifest = store.manifest()
    found = set()
    for r in lineage:
        found.add(int(r["shard"]))
        manifest["shards"][str(int(r["shard"]))] = {
            "status": "done", "rows": int(r["rows"]),
            "bytes": int(r["bytes"] or 0), "digest": int(r["digest"]),
            "build_id": build_id}
    for k in range(old_shards, new_total_shards):
        if k not in found:  # shard legitimately empty
            manifest["shards"][str(k)] = {
                "status": "done", "rows": 0, "bytes": 0, "digest": 0,
                "build_id": build_id}
    store._write_manifest(manifest)

    # ---- THE commit: one meta.json write publishes docs, shards,
    # stats partition, exact totals, and the idempotence record ----
    total_dl = meta.total_dl + (dl_sum[0] if dl_sum else 0)
    n_docs = old_n + n_new
    # avgdl denominator excludes docs physically purged by incremental
    # merges (their dl already left total_dl) — matches scoring N
    n_avg = n_docs - meta.n_purged
    batches = dict(meta.batches)
    # keyed by the idempotence TAG (replay check); partition recorded
    batches[batch_tag or batch_part] = {
        "status": "done", "build_id": build_id, "n_docs": n_new,
        "shards": [old_shards, new_total_shards], "partition": batch_part}
    stats_batches = list(meta.stats_batches)
    if batch_part not in stats_batches:
        stats_batches.append(batch_part)
    folded_away: list[str] = []
    if len(stats_batches) > fold_stats_every:
        # fold every committed delta + this batch's into ONE partition.
        # Deterministic name + dynamic overwrite => retry-safe; the
        # fold only becomes visible through the meta commit below. The
        # read enumerates the committed batch SUBDIRECTORIES (basePath
        # keeps the partition column) so the output root is never also
        # a read path — dynamically overwriting a root you are reading
        # is rejected or racy on some Spark versions/catalogs (round-3
        # advice). Folded-away delta dirs are vacuumed after the meta
        # commit below.
        fold_part = f"fold-at-{n_docs}"
        ts_root = store.path / "termstats"
        srcs = [str(ts_root / f"batch={b}") for b in stats_batches
                if (ts_root / f"batch={b}").exists()]
        (spark.read.option("basePath", str(ts_root))
         .parquet(*srcs)
         .groupBy("term")
         .agg(F.sum("df").cast("long").alias("df"),
              F.sum("cf").cast("long").alias("cf"))
         .withColumn("batch", F.lit(fold_part))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch").parquet(str(ts_root)))
        folded_away = stats_batches
        stats_batches = [fold_part]
    store._write_meta(IndexMeta(
        build_id=build_id, n_docs=n_docs,
        avgdl=(total_dl / n_avg) if (n_avg and total_dl) else 1.0,
        n_shards=new_total_shards, k1=meta.k1, b=meta.b, cfg=meta.cfg,
        dict_fingerprint=new_fp if allow_dict_change
        else meta.dict_fingerprint,
        source=f"{meta.source} + {source}",
        store_positions=meta.store_positions,
        created_utc=time.time(), layout=meta.layout,
        text_col=meta.text_col, total_dl=total_dl,
        stats_batches=stats_batches, batches=batches,
        format=FORMAT_VERSION,
        uses_token_filter=meta.uses_token_filter,
        delete_batches=meta.delete_batches + ([del_part] if del_part
                                              else []),
        routed_batches=meta.routed_batches + ([del_part] if del_part
                                              else []),
        n_deleted=meta.n_deleted + n_del_new,
        dead_shards=meta.dead_shards, n_purged=meta.n_purged,
        purged_batches=meta.purged_batches))
    # vacuum: once the fold's meta is committed, the folded-away delta
    # partitions are unreferenced garbage — reclaim them here instead
    # of waiting for compact_index, so the termstats dir count stays
    # bounded (≤ fold_stats_every + 1) under continuous ingest. Safe
    # under the single-writer lock; the reader-side gate is the
    # committed-partition list + ignoreMissingFiles (round-3 task #5).
    for b in folded_away:
        p = store.path / "termstats" / f"batch={b}"
        if p.exists():
            p.rmtree()
    # observability mirror (committed state only; never authoritative)
    manifest["batches"] = batches
    store._write_manifest(manifest)
    return store


def compact_index(spark: SparkSession, store: IndexStore, out_dir: str,
                  docs_per_shard: int | None = None) -> IndexStore:
    """Merge small shards into right-sized ones (Lucene forceMerge
    analogue). Streaming ingest appends one shard set per micro-batch;
    after many batches query parallelism granularity degrades and file
    counts grow. Because shards are DISJOINT doc ranges, compaction is
    a pure relabeling: consecutive shards coalesce until the combined
    doc count reaches ``docs_per_shard`` — no postings are re-encoded
    (blocks are anchored by absolute first_doc; a query worker already
    merges multiple blocks per term). Writes a complete NEW index at
    ``out_dir`` (old index untouched — crash-safe), carrying docmap /
    docstats / termstats / meta over unchanged.

    When the index carries tombstones (``meta.delete_batches``),
    compaction is instead a PURGING merge — deleted docs drop out of
    every posting list, ids renumber densely, and all stats recompute
    over live docs only, exactly Lucene's merge applying liveDocs —
    delegated to ``deletes.purge_merge``.
    """
    from .indexer import DOCSTATS_TERM  # local import to avoid cycle noise

    meta = store.meta()
    if meta.delete_batches:
        from .deletes import purge_merge
        return purge_merge(spark, store, out_dir,
                           docs_per_shard=docs_per_shard)
    per = docs_per_shard or max(1, (meta.n_docs + DEFAULT_SHARDS - 1)
                                // DEFAULT_SHARDS)
    # per-shard doc counts from the docstats pseudo-rows (tiny: one row
    # group per shard, never the vocabulary). Coalescing follows DOC
    # RANGE order, not shard-id order: after an incremental
    # merge_shards the replacement shards live at high ids but cover
    # mid-range docs, and grouping by id would hand one worker
    # non-adjacent ranges (sparse WAND windows, overlapping range
    # routing).
    counts, lows = {}, {}
    for r in (store.segments(spark)
              .filter(F.col("term") == DOCSTATS_TERM)
              .groupBy("shard").agg(F.sum("n_docs").alias("nd"),
                                    F.min("first_doc").alias("lo"))
              .collect()):
        counts[int(r["shard"])] = int(r["nd"])
        lows[int(r["shard"])] = int(r["lo"])
    mapping = []  # (old_shard, new_shard)
    new_id, acc = 0, 0
    for old in sorted(counts, key=lambda s: lows[s]):
        if acc >= per:
            new_id += 1
            acc = 0
        mapping.append((old, new_id))
        acc += counts[old]
    n_new = new_id + 1
    map_df = spark.createDataFrame(mapping, "shard int, new_shard int")

    dst = IndexStore(out_dir, fs=store.fs)
    dst.path.mkdir(parents=True, exist_ok=True)
    segs = (store.segments(spark)
            .join(F.broadcast(map_df), "shard")
            .drop("shard").withColumnRenamed("new_shard", "shard"))
    (segs.repartition(max(n_new, 1), "shard")
     .sortWithinPartitions("term", "salt", "first_doc")
     .write.mode("overwrite").partitionBy("shard")
     .parquet(str(dst.path / "segments")))
    store.docmap(spark).write.mode("overwrite").partitionBy("batch") \
        .parquet(str(dst.path / "docmap"))
    # fold the per-append stats deltas back into ONE partition: after
    # many streamed micro-batches this is what bounds the reader-side
    # merge (and the stats_batches list) — compaction is the stats GC
    (store.docstats(spark).withColumn("batch", F.lit(INITIAL_BATCH))
     .write.mode("overwrite").partitionBy("batch")
     .parquet(str(dst.path / "docstats")))
    (store.termstats(spark).withColumn("batch", F.lit(INITIAL_BATCH))
     .write.mode("overwrite").partitionBy("batch")
     .parquet(str(dst.path / "termstats")))
    if meta.purged_batches:
        # the copied docmap still carries stale rows for merged-away
        # docs, so the purged-id record must follow it (folded to one
        # partition like the stats)
        (store.purged(spark).withColumn("batch", F.lit(INITIAL_BATCH))
         .write.mode("overwrite").partitionBy("batch")
         .parquet(str(dst.path / "purged")))

    build_id = uuid.uuid4().hex
    stats = (spark.read.parquet(str(dst.path / "segments"))
             .groupBy("shard")
             .agg(F.count("*").alias("rows"),
                  (F.sum(F.length("doc_bytes")) + F.sum(F.length("tf_bytes"))
                   + F.sum(F.length("dl_bytes"))).alias("bytes"),
                  _digest_expr())
             .collect())
    manifest = {"shards": {str(int(r["shard"])): {
        "status": "done", "rows": int(r["rows"]),
        "bytes": int(r["bytes"] or 0), "digest": int(r["digest"]),
        "build_id": build_id} for r in stats},
        # idempotence records survive compaction: a streaming sink
        # whose target is swapped to the compacted index must still
        # no-op replayed micro-batch tags (round-2 advice #4)
        "batches": dict(meta.batches)}
    dst._write_manifest(manifest)
    dst._write_meta(IndexMeta(
        build_id=build_id, n_docs=meta.n_docs, avgdl=meta.avgdl,
        n_shards=n_new, k1=meta.k1, b=meta.b, cfg=meta.cfg,
        dict_fingerprint=meta.dict_fingerprint,
        source=f"{meta.source} [compacted]",
        store_positions=meta.store_positions,
        created_utc=time.time(), layout=meta.layout,
        text_col=meta.text_col, total_dl=meta.total_dl,
        stats_batches=[INITIAL_BATCH], batches=dict(meta.batches),
        format=FORMAT_VERSION,
        uses_token_filter=meta.uses_token_filter,
        # dead shards are not copied (segments() filters them); purged
        # ids stay gone from the id space accounting
        n_purged=meta.n_purged,
        purged_batches=[INITIAL_BATCH] if meta.purged_batches else []))
    return dst


def rebuild_if_dict_changed(spark: SparkSession, store: IndexStore,
                            corpus: DataFrame,
                            syn: SynonymDict | None,
                            out_dir: str | None = None,
                            **build_kwargs) -> tuple[IndexStore, bool]:
    """The batch analogue of the reference's dynamic dictionary reload
    (SynonymLoader.java:55-74 hot-swaps the SynonymMap when the rule
    file's mtime changes; integration suites
    SynonymPluginTest.java:366-484,487-626 pin reindex-after-reload
    behavior).

    Compares ``syn``'s fingerprint with the one pinned in the index
    meta: unchanged -> no-op (returns the same store, False); changed
    -> full rebuild from ``corpus`` with the index's own cfg (returns
    the new store, True). Rebuild writes to ``out_dir`` (default: in
    place, resume=False so every shard re-encodes under the new rules).

    The cheap alternative when only QUERY-time expansion must follow
    the new rules — accepting that document-side tokenization still
    reflects the old dictionary — is to keep the index and pass the new
    rules to ``search(..., syn=new_syn)``; that trade-off is the
    reference's search_analyzer-vs-index_analyzer split.
    """
    meta = store.meta()
    if meta.uses_token_filter:
        raise ValueError(
            "index was built through a token_filter; its dictionary "
            "lives in the filter (analyzer config), not in meta — "
            "rebuild explicitly with build_index(token_filter=...) "
            "under the new rules")
    new_fp = syn.fingerprint() if syn else None
    if new_fp == meta.dict_fingerprint:
        return store, False
    cfg = TokenizerConfig(**meta.cfg)
    kwargs = dict(cfg=cfg, syn=syn, k1=meta.k1, b=meta.b,
                  n_shards=meta.n_shards,
                  store_positions=meta.store_positions, layout=meta.layout,
                  text_col=meta.text_col,
                  source=f"{meta.source} [dict-reload]", resume=False)
    kwargs.update(build_kwargs)
    new_store = build_index(spark, corpus, out_dir or str(store.path),
                            **kwargs)
    return new_store, True


def verify_content_sha(spark: SparkSession, corpus: DataFrame,
                       store: IndexStore) -> int:
    """Per-row invariant vs the source (north rule): every (key, sha256)
    in the docmap matches a fresh hash of the source. Returns mismatch
    count (0 = pass)."""
    keys = [c for c in ["repo", "path", "commit"] if c in corpus.columns]
    src = with_sha256(corpus).select(*keys,
                                     F.col("content_sha256").alias("src_sha"))
    dm = store.docmap(spark).select(*keys, "content_sha256")
    joined = dm.join(src, keys, "left")
    return joined.filter(
        (F.col("src_sha").isNull()) |
        (F.col("src_sha") != F.col("content_sha256"))).count()
