"""Streaming exact deduplication — emit each distinct content once
across ALL micro-batches (the continuous-ingest analogue of
``exact_dup_groups``; a training-data firehose dedups before landing).

Custom stateful operator via ``applyInPandasWithState``: groups are
content hashes, per-group state is a single "already emitted" flag +
running duplicate count. State is partitioned by the hash key across
executors and checkpointed by Structured Streaming, so the seen-set
scales horizontally and survives restarts — never a driver-side set.

No watermark/timeout by design: exact dedup state must live for the
stream's lifetime (content can repeat arbitrarily late). For bounded
state under TTL semantics, pass ``ttl_minutes`` to age out hashes via
processing-time timeouts — then a repeat AFTER the TTL re-emits, the
documented trade-off.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

_STATE_SCHEMA = StructType([
    StructField("emitted", LongType()),      # 0/1
    StructField("dup_count", LongType()),    # duplicates suppressed
])


def dedup_stream(stream: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 ttl_minutes: int | None = None) -> DataFrame:
    """streaming DataFrame -> streaming DataFrame of first-seen rows
    (``id_col``, ``text_col``, dup_key), exactly one row per distinct
    content across the whole stream. Within a micro-batch the smallest
    ``id_col`` wins (deterministic)."""
    keyed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
        F.md5(F.col(text_col)).alias("dup_key"))

    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("dup_key", StringType()),
    ])

    def fn(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        emitted, dups = state.get if state.exists else (0, 0)
        first = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            dups += len(pdf)
            if not emitted:
                cand = pdf.loc[pdf["doc_id"].idxmin()]
                if first is None or cand["doc_id"] < first["doc_id"]:
                    first = cand
        if first is not None and not emitted:
            emitted = 1
            dups -= 1
            yield pd.DataFrame({"doc_id": [int(first["doc_id"])],
                                "text": [first["text"]],
                                "dup_key": [key[0]]})
        state.update((emitted, dups))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_minutes is not None
               else GroupStateTimeout.NoTimeout)
    return keyed.groupBy("dup_key").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=_STATE_SCHEMA,
        outputMode="append", timeoutConf=timeout)
