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


def stream_ingest(spark: SparkSession, input_dir: str, index_dir: str,
                  checkpoint_dir: str,
                  cfg: TokenizerConfig | None = None,
                  syn: SynonymDict | None = None,
                  n_shards_first: int = 8,
                  poll_files_per_batch: int = 64,
                  text_col: str = "content",
                  schema=None):
    """Tail ``input_dir`` (parquet corpus files) into the index at
    ``index_dir``. Returns the StreamingQuery; callers own its
    lifecycle (``awaitTermination`` / ``stop``).

    First micro-batch bootstraps the index (build_index, itself
    resumable); later ones append idempotently per batch_id (see
    module docstring for the exact guarantees).
    """
    cfg = cfg or TokenizerConfig()
    stream = (spark.readStream
              .schema(schema or STREAM_SCHEMA)
              .option("maxFilesPerTrigger", poll_files_per_batch)
              .parquet(input_dir))

    def process(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        # drop any streaming-unsafe native ids: append assigns from keys
        bdf = batch_df.drop("doc_id")
        store = IndexStore(index_dir)
        if (store.path / "meta.json").exists():
            append_to_index(batch_df.sparkSession, store, bdf, syn=syn,
                            source=f"stream-batch-{batch_id}",
                            batch_tag=f"stream-batch-{batch_id}")
        else:
            build_index(batch_df.sparkSession, bdf, index_dir, cfg=cfg,
                        syn=syn, n_shards=n_shards_first,
                        text_col=text_col,
                        source=f"stream-batch-{batch_id}")

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime="1 second")
            .start())
