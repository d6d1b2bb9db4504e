"""Continuous index ingestion (Structured Streaming).

The reference is batch-per-document with a hot-reloadable dictionary —
no stream semantics to port (SURVEY §2.5: "we do not fabricate"
watermarks/session windows). What a production engine DOES need is
index tailing: new corpus files appear, the index follows. That is
micro-batch ``foreachBatch`` over a file source feeding
``append_to_index``.

Delivery semantics, honestly: foreachBatch is AT-LEAST-ONCE (a batch
can replay after a crash between the sink work and the checkpoint
commit). The sink is made effectively-once by ``append_to_index``'s
``batch_tag`` idempotence: each micro-batch commits under
``stream-batch-<id>`` in the index manifest, a replayed id is a no-op,
and a half-appended crash is invisible to readers (segment/docmap
reads are gated on the meta commit) and overwritten by the retry
(dynamic partition overwrite). The streaming checkpoint provides
exactly-once FILE PICKUP; the manifest provides per-shard lineage
within each batch.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from .index_store import IndexStore, append_to_index, build_index
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig

STREAM_SCHEMA = ("repo string, path string, commit string, "
                 "lang string, content string")


def ingest_rate_stream(stream, ts_col: str = "event_time",
                       text_col: str = "content",
                       window: str = "1 minute",
                       watermark: str = "2 minutes"):
    """Windowed ingest telemetry over a document stream: docs/bytes per
    event-time window, late data handled by a watermark (classic
    Structured Streaming windowed aggregation — rows later than
    ``watermark`` behind the max seen event time are dropped and the
    window finalizes). Returns a streaming DataFrame
    (window_start, window_end, n_docs, n_bytes)."""
    from pyspark.sql import functions as F
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.octet_length(F.col(text_col))).alias("n_bytes"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "n_docs", "n_bytes"))


class DictWatcher:
    """Query/ingest-time dictionary reload for long-running sessions —
    the streaming analogue of the reference's mtime poll
    (SynonymLoader.java:55-74 re-reads synonyms_path when the file
    timestamp changes, on every reset(); enabled by ``dynamic_reload``
    + ``reload_interval`` per README).

    ``current()`` re-stats the rules file no more than once per
    ``interval`` seconds and re-parses only when the (mtime, size)
    signature changed; swapped dictionaries take effect for every
    subsequent call. Thread-safe for the single-writer streaming loop.

    ``fs`` routes the stat/read through the store's filesystem shim
    (default local; pass ``fs.HadoopFS`` to watch a rules file on
    HDFS/S3 — the realistic place for shared cluster config).
    """

    def __init__(self, dict_path: str, interval: float = 1.0, fs=None):
        from .fs import LocalFS
        self.path = dict_path
        self._fs = fs or LocalFS()
        self.interval = interval
        self._sig: tuple | None = None
        self._last_check = 0.0
        self._syn: SynonymDict | None = None
        self.reloads = -1  # first load is not a "reload"
        self.last_error: str | None = None
        self.current()

    def current(self) -> SynonymDict | None:
        import time as _time
        now = _time.monotonic()
        if self._sig is not None and now - self._last_check < self.interval:
            return self._syn
        self._last_check = now
        # torn-read / missing-file guards for non-atomic writers
        # (echo/redirect, delete+recreate): if the file is absent or
        # changed between stat and read, skip this poll — the next one
        # sees the settled file. A parse failure keeps the old
        # dictionary and is surfaced via last_error/stderr (a
        # half-written rules file must never kill the streaming query
        # or index a batch under truncated rules). The FIRST load still
        # propagates every error — config mistakes fail fast.
        try:
            sig = self._fs.stat(self.path)
            if sig == self._sig:
                return self._syn
            text = self._fs.read_text(self.path)
            if self._fs.stat(self.path) != sig:
                return self._syn
            syn = SynonymDict.parse(text)
        except Exception as e:
            if self.reloads < 0:
                raise
            if repr(e) != self.last_error:  # once per distinct failure
                self.last_error = repr(e)
                import sys
                print(f"[synspark] dictionary reload of {self.path} "
                      f"failed, keeping previous rules: {e!r}",
                      file=sys.stderr, flush=True)
            return self._syn
        self.last_error = None
        self._sig = sig
        old_fp = self._syn.fingerprint() if self._syn else None
        new_fp = syn.fingerprint() if syn else None
        if new_fp != old_fp or self.reloads < 0:
            self._syn = syn
            self.reloads += 1
        return self._syn


def stream_ingest(spark: SparkSession, input_dir: str, index_dir: str,
                  checkpoint_dir: str,
                  cfg: TokenizerConfig | None = None,
                  syn: SynonymDict | None = None,
                  n_shards_first: int = 8,
                  poll_files_per_batch: int = 64,
                  text_col: str = "content",
                  schema=None,
                  dict_path: str | None = None,
                  dict_poll_interval: float = 1.0,
                  fs=None,
                  mode: str = "append",
                  key_cols: list[str] | None = None,
                  auto_merge_fraction: float | None = None):
    """Tail ``input_dir`` (parquet corpus files) into the index at
    ``index_dir``. Returns the StreamingQuery; callers own its
    lifecycle (``awaitTermination`` / ``stop``).

    First micro-batch bootstraps the index (build_index, itself
    resumable) — and records the SAME ``stream-batch-<id>`` idempotence
    tag as any other batch, so a replayed bootstrap (crash between the
    build's meta commit and the streaming checkpoint commit) no-ops
    instead of double-indexing batch 0. Later batches append
    idempotently per batch_id (see module docstring).

    ``dict_path`` enables live dictionary reload (the reference's
    ``dynamic_reload`` mode): the rules file's mtime is polled before
    every micro-batch and a changed dictionary applies to all
    SUBSEQUENT documents — previously indexed docs keep their old
    tokens until reindexed, exactly ES's behavior when an analyzer's
    synonyms change (SynonymPluginTest.java:367-484: after swapping
    東京,とうきょう → 東京,TOKYO only newly indexed docs carry the new
    stacked tokens). ``dict_path`` and ``syn`` are mutually exclusive.

    ``mode="upsert"`` makes each micro-batch REPLACE documents by key
    (default key: repo/path — ES's index-by-id through a streaming
    sink) instead of blind-appending; ``auto_merge_fraction`` then
    runs the TieredMergePolicy analogue after every batch so the
    tombstones continuous upserts generate stay bounded without any
    operator action (``deletes.auto_merge``: meta-only gate per batch,
    exact per-shard merge when a shard crosses the fraction). A
    micro-batch with two rows for one key fails fast (see
    ``upsert_docs``) — dedupe upstream, e.g. with
    ``stream_dedup.dedup_stream_exact``.
    """
    cfg = cfg or TokenizerConfig()
    if mode not in ("append", "upsert"):
        raise ValueError(f"mode must be append|upsert, got {mode!r}")
    if dict_path is not None and syn is not None:
        raise ValueError("pass either syn (pinned rules) or dict_path "
                         "(live-reloaded rules), not both")
    watcher = DictWatcher(dict_path, dict_poll_interval, fs=fs) \
        if dict_path is not None else None
    stream = (spark.readStream
              .schema(schema or STREAM_SCHEMA)
              .option("maxFilesPerTrigger", poll_files_per_batch)
              .parquet(input_dir))

    def process(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        cur_syn = watcher.current() if watcher is not None else syn
        # drop any streaming-unsafe native ids: append assigns from keys
        bdf = batch_df.drop("doc_id")
        store = IndexStore(index_dir, fs=fs)
        tag = f"stream-batch-{batch_id}"
        if (store.path / "meta.json").exists():
            if mode == "upsert":
                from .deletes import auto_merge, upsert_docs
                upsert_docs(batch_df.sparkSession, store, bdf,
                            syn=cur_syn, key_cols=key_cols,
                            source=tag, batch_tag=tag,
                            allow_dict_change=watcher is not None)
                if auto_merge_fraction is not None:
                    # run the policy on a worker thread: py4j executes
                    # callback-originated JVM calls ON the stream
                    # execution thread, whose remaining stack (under
                    # the streaming + callback frames) is too shallow
                    # for Catalyst planning of the merge jobs
                    # (observed java.util.regex StackOverflowError); a
                    # fresh Python thread gets a fresh JVM gateway
                    # thread with full stack. The upsert is already
                    # committed — a crash here only defers the merge.
                    def _policy():
                        auto_merge(batch_df.sparkSession, store,
                                   min_deleted_fraction=
                                   auto_merge_fraction,
                                   source=f"{tag}:auto-merge")
                    t = threading.Thread(target=_policy,
                                         name=f"auto-merge-{batch_id}")
                    t.start()
                    t.join()
            else:
                append_to_index(batch_df.sparkSession, store, bdf,
                                syn=cur_syn, source=tag, batch_tag=tag,
                                allow_dict_change=watcher is not None)
        else:
            build_index(batch_df.sparkSession, bdf, index_dir, cfg=cfg,
                        syn=cur_syn, n_shards=n_shards_first,
                        text_col=text_col, source=tag, batch_tag=tag,
                        fs=fs)

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime="1 second")
            .start())
