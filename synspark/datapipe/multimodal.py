"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libs):
``decode_image_stub`` derives deterministic fake metadata from the
bytes. The Spark-side contract — schema, batch shape, partitioning,
UDF signature — is real and tested; swap ``_decode_one`` for a real
decoder (PIL/libav) in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), False),    # opaque encoded bytes
    StructField("mime", StringType(), True),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("sha256", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])


def as_media(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Test fixture: wrap a text column as fake encoded media bytes."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _decode_one(kind: str, payload: bytes) -> dict:
    """STUB decoder: deterministic fake dims from a hash of the bytes.
    Replace with PIL/av in production (raise NotImplementedError there
    if the lib is missing rather than returning fakes)."""
    h = hashlib.sha256(payload or b"")
    hd = h.digest()
    n = len(payload or b"")
    meta = {"n_bytes": n, "sha256": h.hexdigest(),
            "width": None, "height": None, "n_frames": None}
    if kind == "image":
        meta["width"] = 16 * (1 + hd[0] % 64)
        meta["height"] = 16 * (1 + hd[1] % 64)
        meta["n_frames"] = 1
    elif kind == "video":
        meta["width"] = 16 * (1 + hd[0] % 64)
        meta["height"] = 16 * (1 + hd[1] % 64)
        meta["n_frames"] = 1 + hd[2] % 250
    else:  # audio
        meta["n_frames"] = 1 + int.from_bytes(hd[2:4], "big") % 48000
    return meta


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: one Arrow batch of (media_id, kind, payload)
    in, one batch of typed metadata out. Map-only — scales with input
    partitions; tune maxRecordsPerBatch down for large payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                recs.append({"media_id": int(mid), "kind": kind,
                             **_decode_one(kind, bytes(payload or b""))})
            yield pd.DataFrame(recs, columns=[f.name for f in
                                              DECODED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """STUB feature extractor with REAL Spark plumbing: one Arrow batch
    of (media_id, payload) in, one batch of unit-scaled feature columns
    out (mapInPandas; swap the sha-derived fake for a model forward
    pass in production — batch shape and schema stay the same).
    Features are the first ``dim`` sha256 bytes / 255."""
    import numpy as np

    cols = [f"f{i}" for i in range(dim)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.zeros((len(pdf), dim), dtype=np.float64)
            ids = np.zeros(len(pdf), dtype=np.int64)
            for j, (mid, payload) in enumerate(zip(pdf["media_id"],
                                                   pdf["payload"])):
                d = hashlib.sha256(bytes(payload or b"")).digest()
                ids[j] = int(mid)
                feats[j] = [b / 255.0 for b in d[:dim]]
            yield pd.DataFrame({"media_id": ids,
                                **{c: feats[:, i]
                                   for i, c in enumerate(cols)}})

    schema = "media_id long, " + ", ".join(f"{c} double" for c in cols)
    return df.select("media_id", "payload").mapInPandas(run, schema=schema)


def resize_plan(decoded: DataFrame, target_w: int = 224,
                target_h: int = 224) -> DataFrame:
    """Aspect-preserving resize plan for images/videos — built-in
    expressions over the decoded dims (the actual pixel work would ride
    the same mapInPandas shape as decode_media): scale = min(tw/w,
    th/h) capped at 1.0 (never upscale), output dims rounded."""
    v = decoded.filter(F.col("width").isNotNull())
    scale = F.round(F.least(
        F.lit(float(target_w)) / F.col("width"),
        F.lit(float(target_h)) / F.col("height"),
        F.lit(1.0)), 6)
    return v.select(
        "media_id", "kind", "width", "height",
        scale.alias("scale"),
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"))


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for videos: explode frame indices 0..n_frames
    step every_n — built-in sequence+explode, no UDF."""
    v = decoded.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"))
