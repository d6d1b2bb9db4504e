"""Continuous index ingestion: Structured Streaming foreachBatch →
bootstrap + append; exactly-once file pickup via checkpoint."""

import time
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from synspark.index_store import IndexStore
from synspark.query import search
from synspark.streaming import stream_ingest
from synspark.tokenizer import TokenizerConfig

pytestmark = pytest.mark.spark


def _drop(spark, path: Path, n0: int, n1: int, text: str):
    df = spark.range(n0, n1).select(
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"),
        F.col("id").cast("string").alias("commit"),
        F.lit("t").alias("lang"),
        F.lit(text).alias("content"))
    df.coalesce(1).write.mode("append").parquet(str(path))


def _wait_docs(store: IndexStore, want: int, timeout: float = 90.0) -> int:
    t0 = time.time()
    n = -1
    while time.time() - t0 < timeout:
        try:
            n = store.meta().n_docs
            if n >= want:
                return n
        except Exception:
            pass
        time.sleep(1.0)
    return n


def test_stream_ingest(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    idx = tmp_path / "idx"
    chk = tmp_path / "chk"

    _drop(spark, inp, 0, 40, "alpha beta gamma")
    q = stream_ingest(spark, str(inp), str(idx), str(chk),
                      cfg=TokenizerConfig(n=2, expand=False),
                      n_shards_first=2)
    try:
        store = IndexStore(str(idx))
        assert _wait_docs(store, 40) == 40

        _drop(spark, inp, 1000, 1025, "delta epsilon")
        assert _wait_docs(store, 65) == 65

        hits_a = search(spark, store, "alpha beta", k=100,
                        phrase=True).count()
        hits_d = search(spark, store, "delta", k=100).count()
        assert hits_a == 40 and hits_d == 25
    finally:
        q.stop()
    # restart with same checkpoint: no reprocessing of old files
    q2 = stream_ingest(spark, str(inp), str(idx), str(chk),
                       cfg=TokenizerConfig(n=2, expand=False))
    try:
        time.sleep(6)
        assert IndexStore(str(idx)).meta().n_docs == 65
    finally:
        q2.stop()


def test_crashed_half_append_invisible(spark, tmp_path_factory):
    """A crash between segment write and the meta commit must leave the
    index readable AND the orphan partitions invisible (segments/docmap
    reads are gated on the meta commit, written last)."""
    import shutil

    from synspark.index_store import append_to_index, build_index

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.lit("c").alias("commit"),
        F.lit("t").alias("lang"), F.lit("alpha beta gamma").alias("content"))
    out = tmp_path_factory.mktemp("crash") / "index"
    st = build_index(spark, docs, str(out),
                     cfg=TokenizerConfig(n=2, expand=False), n_shards=2,
                     source="crash-test")
    n_shards = st.meta().n_shards

    # simulate the half-append: orphan segment partition + docmap batch
    # dir on disk, meta/manifest never advanced. A real crashed append
    # always writes doc_ids CONTINUING after the committed range
    # (>= n_docs), a fresh shard number (>= n_shards), and the
    # position-derived partition name at-<old N> (which the retry —
    # tagged or not — dynamically overwrites).
    src = out / "segments" / "shard=0"
    shutil.copytree(src, out / "segments" / f"shard={n_shards + 5}")
    orphan_rows = spark.range(50, 70).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.lit("c").alias("commit"),
        F.lit("t").alias("lang"),
        F.sha2(F.col("id").cast("string"), 256).alias("content_sha256"),
        F.lit("at-50").alias("batch"))
    orphan_rows.write.mode("overwrite").parquet(
        str(out / "docmap" / "batch=at-50"))

    # commit gating hides both orphans from readers
    assert st.segments(spark).select("shard").distinct().count() == n_shards
    assert st.docmap(spark).count() == 50

    # the retried batch (same tag) REPLACES its own leftovers
    retry = spark.range(50, 70).select(
        (F.col("id") - F.lit(50)).alias("doc_id"),
        F.concat(F.lit("x"), F.col("id")).alias("repo"),
        F.lit("f").alias("path"), F.lit("c").alias("commit"),
        F.lit("t").alias("lang"), F.lit("delta epsilon").alias("content"))
    st = append_to_index(spark, st, retry, source="retry",
                         batch_tag="orphan")
    assert st.meta().n_docs == 70
    assert st.docmap(spark).count() == 70  # orphan dir replaced, not added
    assert st.docmap(spark).select("doc_id").distinct().count() == 70


def test_stream_dict_reload(spark, tmp_path):
    """Live dictionary reload in a long-running ingest (the reference's
    dynamic_reload: SynonymLoader.java:55-74 polls the rule file's
    mtime; SynonymPluginTest.java:367-484 pins the semantics): docs
    ingested BEFORE the file change keep old tokens, docs after use the
    new rules, and queries analyzed with the current dictionary yield
    東京→2 / とうきょう→0 / TOKYO→2."""
    from synspark.query import count_matches
    from synspark.synonyms import SynonymDict

    inp = tmp_path / "in"
    inp.mkdir()
    idx, chk = tmp_path / "idx", tmp_path / "chk"
    rules = tmp_path / "synonym.txt"
    rules.write_text("東京,とうきょう", encoding="utf-8")

    _drop(spark, inp, 0, 1, "東京")
    q = stream_ingest(spark, str(inp), str(idx), str(chk),
                      cfg=TokenizerConfig(n=2, expand=True),
                      n_shards_first=1, dict_path=str(rules),
                      dict_poll_interval=0.1)
    try:
        store = IndexStore(str(idx))
        assert _wait_docs(store, 1) == 1
        syn1 = SynonymDict.parse("東京,とうきょう")

        def hits(text, syn):
            return count_matches(spark, store, text, mode="and",
                                 syn=syn).collect()[0]["hits"]

        assert hits("東京", syn1) == 1
        assert hits("とうきょう", syn1) == 1
        assert hits("TOKYO", syn1) == 0

        # swap the rules file mid-stream (mtime_ns changes); the next
        # micro-batch picks it up without any operator call
        rules.write_text("東京,TOKYO", encoding="utf-8")
        _drop(spark, inp, 1, 2, "東京")
        assert _wait_docs(store, 2) == 2
        syn2 = SynonymDict.parse("東京,TOKYO")
        assert store.meta().dict_fingerprint == syn2.fingerprint()
        assert hits("東京", syn2) == 2
        assert hits("とうきょう", syn2) == 0
        assert hits("TOKYO", syn2) == 2
    finally:
        q.stop()


def test_stream_dedup_across_batches(spark, tmp_path_factory):
    """Stateful streaming exact dedup (applyInPandasWithState): each
    distinct content emitted once across micro-batches; state survives
    between triggers."""
    from synspark.datapipe.stream_dedup import dedup_stream

    src = tmp_path_factory.mktemp("sdedup_src")
    ckpt = tmp_path_factory.mktemp("sdedup_ck")

    def drop(n0, n1, texts):
        df = spark.createDataFrame(
            [(i, texts[i % len(texts)]) for i in range(n0, n1)],
            "doc_id long, text string")
        df.coalesce(1).write.mode("append").parquet(str(src))

    drop(0, 6, ["aaa", "bbb", "ccc"])  # two of each
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (dedup_stream(stream).writeStream.format("memory")
         .queryName("sdedup_out").outputMode("append")
         .option("checkpointLocation", str(ckpt)).start())
    try:
        q.processAllAvailable()
        rows1 = spark.sql("select * from sdedup_out").collect()
        assert sorted(r["text"] for r in rows1) == ["aaa", "bbb", "ccc"]
        assert all(r["doc_id"] in (0, 1, 2) for r in rows1)  # first seen
        # batch 2: all repeats + one new content -> only the new one
        drop(100, 104, ["aaa", "bbb", "ddd", "ccc"])
        q.processAllAvailable()
        rows2 = spark.sql("select * from sdedup_out").collect()
        assert sorted(r["text"] for r in rows2) == ["aaa", "bbb", "ccc",
                                                    "ddd"]
        assert {r["text"]: r["doc_id"] for r in rows2}["ddd"] == 102
    finally:
        q.stop()


def test_ingest_rate_stream_watermark(spark, tmp_path_factory):
    """Watermarked windowed aggregation: per-window doc/byte counts;
    a row later than the watermark behind max event time is dropped."""
    from synspark.streaming import ingest_rate_stream

    src = tmp_path_factory.mktemp("rate_src")
    ckpt = tmp_path_factory.mktemp("rate_ck")

    def drop(rows):
        spark.createDataFrame(
            rows, "doc_id long, event_time timestamp, content string") \
            .coalesce(1).write.mode("append").parquet(str(src))

    import datetime as dt
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    drop([(i, t0 + dt.timedelta(seconds=10 * i), "x" * 10)
          for i in range(6)])  # window 12:00 has 6 docs
    stream = (spark.readStream
              .schema("doc_id long, event_time timestamp, content string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (ingest_rate_stream(stream).writeStream.format("memory")
         .queryName("rate_out").outputMode("append")
         .option("checkpointLocation", str(ckpt)).start())
    try:
        q.processAllAvailable()
        # advance event time far enough to close the 12:00 window
        # (watermark = max_event - 2min must pass 12:01)
        drop([(100, t0 + dt.timedelta(minutes=5), "y" * 20)])
        q.processAllAvailable()
        # a straggler behind the watermark: must NOT reopen the window
        drop([(101, t0 + dt.timedelta(seconds=30), "z" * 30)])
        q.processAllAvailable()
        drop([(102, t0 + dt.timedelta(minutes=10), "w")])
        q.processAllAvailable()
        rows = {r["window_start"]: r
                for r in spark.sql("select * from rate_out").collect()}
        w0 = rows[t0]
        assert w0["n_docs"] == 6 and w0["n_bytes"] == 60  # straggler dropped
    finally:
        q.stop()
