"""Inverted-index construction (SURVEY §2.4 E3–E7).

Pipeline (all DataFrame; Python only inside Arrow-batched UDFs):

  corpus ──mapInPandas(tokenize)──▶ tokens(doc_id, term, pos, pos_inc)
         ──groupBy(term, doc_id)──▶ postings(term, doc_id, tf, positions)
         ──salt join (hot terms)──▶ (term, salt) groups
         ──applyInPandas(encode)──▶ segment blocks (delta+varint, block-max)
         ──write parquet partitioned by term bucket, sorted by term──▶ index

Scale notes (designed for 10^12 docs / 1000 executors, tested local):
  - tokenization is map-only (no shuffle); Arrow batch size bounds the
    Python worker's memory; per-block memoization exploits the heavy
    repetition in code corpora.
  - the invert groupBy benefits from partial (map-side) aggregation of
    tf; positions use collect_list which Spark aggregates partially too.
  - term skew (Zipf bigrams) is handled explicitly: a first-pass df
    count assigns ``s_t = ceil(df/target)`` salts per hot term; the
    salt is derived from ``doc_id`` by RANGE (``doc_id * s_t // N``),
    so per-salt blocks cover disjoint docID ranges and the global
    posting list is the salt-ordered concatenation — merge is free
    (SURVEY E5/E6). AQE alone can't fix aggregation skew; this can.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from .codec import BLOCK_DOCS, encode_blocks
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig, _tokenize_block, blocks

TOKENS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("term", StringType(), False),
    StructField("pos", IntegerType(), False),
    StructField("start", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("pos_inc", IntegerType(), False),
])

SEGMENT_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("shard", IntegerType(), False),
    StructField("salt", IntegerType(), False),
    StructField("block_seq", IntegerType(), False),
    StructField("first_doc", LongType(), False),
    StructField("last_doc", LongType(), False),
    StructField("n_docs", IntegerType(), False),
    StructField("max_tf", IntegerType(), False),
    StructField("sum_tf", LongType(), False),
    StructField("max_tfnorm", DoubleType(), False),
    StructField("doc_bytes", BinaryType(), False),
    StructField("tf_bytes", BinaryType(), False),
    StructField("dl_bytes", BinaryType(), False),
    StructField("pos_bytes", BinaryType(), True),
])


def tokenize_corpus(df: DataFrame, cfg: TokenizerConfig,
                    syn: SynonymDict | None,
                    id_col: str = "doc_id", text_col: str = "content",
                    keep_offsets: bool = True) -> DataFrame:
    """corpus -> flat tokens DataFrame via mapInPandas (Arrow batches,
    flat numpy/list output — faster than ArrayType(Struct)+explode
    because no struct-array materialization). Lucene position = running
    cumsum of pos_inc - 1 per doc."""
    n, expand, ignore_case, delims = cfg.n, cfg.expand, cfg.ignore_case, cfg.delimiters
    syn_local = syn  # closure-captured; pickled once per python worker

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            doc_ids, terms, poss, starts, ends, pis = [], [], [], [], [], []
            for did, text in zip(pdf[id_col].to_numpy(), pdf[text_col]):
                if not text:
                    continue
                pos = -1
                for blk_start, block in blocks(text, delims):
                    toks = cache.get(block)
                    if toks is None:
                        toks = _tokenize_block(block, n, expand, ignore_case,
                                               syn_local)
                        if len(cache) < 65536:
                            cache[block] = toks
                    for word, s, e, pi in toks:
                        pos += pi
                        doc_ids.append(did)
                        terms.append(word)
                        poss.append(pos)
                        starts.append(blk_start + s)
                        ends.append(blk_start + e)
                        pis.append(pi)
            yield pd.DataFrame({
                "doc_id": np.asarray(doc_ids, dtype=np.int64),
                "term": terms,
                "pos": np.asarray(poss, dtype=np.int32),
                "start": np.asarray(starts, dtype=np.int32),
                "end": np.asarray(ends, dtype=np.int32),
                "pos_inc": np.asarray(pis, dtype=np.int32),
            })

    toks = df.select(id_col, text_col).mapInPandas(run, schema=TOKENS_SCHEMA)
    if not keep_offsets:
        toks = toks.drop("start", "end")
    return toks


def build_postings(tokens: DataFrame, store_positions: bool = True) -> DataFrame:
    """tokens -> postings(term, doc_id, tf[, positions]) — plain hash
    aggregation (partial+final, whole-stage codegen)."""
    aggs = [F.count("*").cast("int").alias("tf")]
    if store_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return tokens.groupBy("term", "doc_id").agg(*aggs)


def build_doc_stats(tokens: DataFrame) -> DataFrame:
    """doc_id -> dl. dl = number of positions = sum(pos_inc) (Lucene
    discountOverlaps: stacked posInc=0 tokens don't add length, so
    expand=true doesn't skew BM25 norms)."""
    return tokens.groupBy("doc_id").agg(
        F.sum("pos_inc").cast("int").alias("dl"))


def plan_salts(postings: DataFrame, target_postings_per_task: int) -> DataFrame:
    """First pass of the two-pass skew plan: df per term -> number of
    salts for hot terms. Returns only terms with s_t > 1 (broadcast-able:
    Zipf head is small by definition)."""
    return (
        postings.groupBy("term").agg(F.count("*").alias("df"))
        .withColumn("n_salts",
                    F.ceil(F.col("df") / F.lit(target_postings_per_task))
                    .cast("int"))
        .filter(F.col("n_salts") > 1)
        .select("term", "n_salts")
    )


def encode_segments_from_tokens(tokens: DataFrame, doc_stats: DataFrame,
                                n_docs: int, avgdl: float,
                                k1: float = 1.2, b: float = 0.75,
                                n_shards: int = 8,
                                target_tokens_per_task: int = 1 << 20,
                                block_docs: int = BLOCK_DOCS,
                                store_positions: bool = True,
                                num_partitions: int | None = None) -> DataFrame:
    """Single-stream segment build (the fast path used by build_index):

      tokens ⋈ dl ──repartition(term, shard, salt)──sortWithinPartitions
             ──mapInPandas(batch encoder)──▶ segment blocks

    vs. the classic postings-aggregate + per-group applyInPandas
    (``encode_segments``) this removes one full shuffle (the
    collect_list invert) and the per-group pandas overhead — the
    encoder consumes each sorted partition as a stream, computing tf /
    positions / tfnorm with numpy per (term, shard, salt) run (Lucene's
    per-segment postings writer, expressed as a Spark partition
    stream). Skew census counts token OCCURRENCES (cheap map-side
    partial agg) and bounds rows-per-encoder-group via per-term doc
    sub-range salts.
    """
    census = (tokens.groupBy("term").agg(F.count("*").alias("occ"))
              .filter(F.col("occ") > target_tokens_per_task)
              .withColumn("n_salts",
                          F.ceil(F.col("occ") / F.lit(target_tokens_per_task))
                          .cast("int"))
              .select("term", "n_salts"))
    nd = max(n_docs, 1)
    t = (tokens.select("doc_id", "term", "pos")
         .join(F.broadcast(census), "term", "left")
         .withColumn("n_salts", F.coalesce(F.col("n_salts"), F.lit(1)))
         .join(doc_stats, "doc_id")
         .withColumn("shard", ((F.col("doc_id") * F.lit(n_shards))
                               / F.lit(nd)).cast("int"))
         .withColumn("salt", (((F.col("doc_id") * F.lit(n_shards)
                                * F.col("n_salts")) / F.lit(nd)).cast("long")
                              - F.col("shard").cast("long")
                              * F.col("n_salts")).cast("int"))
         .select("term", "shard", "salt", "doc_id", "pos", "dl"))

    parts = num_partitions or tokens.sparkSession.sparkContext \
        .defaultParallelism
    part = (t.repartition(parts, "term", "shard", "salt")
            .sortWithinPartitions("term", "shard", "salt", "doc_id", "pos"))

    out_cols = [f.name for f in SEGMENT_SCHEMA.fields]

    def encode_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for (term, shard, salt), g in pdf.groupby(
                ["term", "shard", "salt"], sort=False):
            doc = g["doc_id"].to_numpy()
            udocs, starts, tfs = np.unique(doc, return_index=True,
                                           return_counts=True)
            dls = g["dl"].to_numpy()[starts].astype(np.int64)
            tfs = tfs.astype(np.int64)
            tfn = tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
            pos = (g["pos"].to_numpy().astype(np.int64)
                   if store_positions else None)
            # np.unique sorts ascending and the partition is sorted by
            # (doc_id, pos), so positions are already grouped per doc
            for i, r in enumerate(encode_blocks(udocs.astype(np.int64),
                                                tfs, tfn, pos, dls,
                                                block_docs)):
                recs.append({"term": term, "shard": int(shard),
                             "salt": int(salt), "block_seq": i, **r})
        return pd.DataFrame(recs, columns=out_cols)

    def run(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                continue
            term = pdf["term"].to_numpy()
            shard = pdf["shard"].to_numpy()
            salt = pdf["salt"].to_numpy()
            last_key = (term[-1], shard[-1], salt[-1])
            not_last = np.flatnonzero(
                (term != last_key[0]) | (shard != last_key[1])
                | (salt != last_key[2]))
            cut = int(not_last[-1]) + 1 if len(not_last) else 0
            complete, buf = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(complete):
                yield encode_pdf(complete)
        if buf is not None and len(buf):
            yield encode_pdf(buf)

    return part.mapInPandas(run, schema=SEGMENT_SCHEMA)


def encode_segments(postings: DataFrame, doc_stats: DataFrame,
                    n_docs: int, avgdl: float,
                    k1: float = 1.2, b: float = 0.75,
                    n_shards: int = 8,
                    target_postings_per_task: int = 1 << 20,
                    block_docs: int = BLOCK_DOCS) -> DataFrame:
    """postings -> encoded segment blocks, document-sharded + skew-salted.

    Two-level doc-range partitioning (both deterministic arithmetic on
    the dense doc_id — no sampling, so rebuilds are identical):

    - ``shard = doc_id * n_shards // N`` — the GLOBAL doc-range shard
      shared by all terms (classic document-partitioned index: every
      shard holds complete postings for its docs, so query workers are
      independent per shard).
    - ``salt`` — within (term, shard), hot terms (df from a first-pass
      count) are further split into ``s_t`` doc SUB-ranges, bounding the
      per-task group size; per-salt ranges stay disjoint, so the shard's
      posting list is the salt-ordered concatenation (merge is free).

    tfnorm = tf / (tf + k1*(1-b+b*dl/avgdl)) is precomputed per posting
    so each block carries its exact BM25 block-max (max_tfnorm); WAND
    upper-bounds a block by idf*max_tfnorm. dl is embedded per posting
    (varint) so scoring needs no docstats join at query time.
    """
    has_pos = "positions" in postings.columns
    salt_map = plan_salts(postings, target_postings_per_task)
    nd = max(n_docs, 1)

    p = (
        postings.join(F.broadcast(salt_map), "term", "left")
        .withColumn("n_salts", F.coalesce(F.col("n_salts"), F.lit(1)))
        .withColumn("shard", ((F.col("doc_id") * F.lit(n_shards))
                              / F.lit(nd)).cast("int"))
        .withColumn("salt", (((F.col("doc_id") * F.lit(n_shards)
                               * F.col("n_salts")) / F.lit(nd)).cast("long")
                             - F.col("shard").cast("long")
                             * F.col("n_salts")).cast("int"))
        .join(doc_stats.hint("shuffle_hash"), "doc_id")
        .withColumn("tfnorm",
                    F.col("tf") / (F.col("tf") + F.lit(k1) *
                                   (F.lit(1 - b) + F.lit(b) * F.col("dl")
                                    / F.lit(avgdl))))
    )

    cols = ["term", "shard", "salt", "doc_id", "tf", "dl", "tfnorm"] + \
        (["positions"] if has_pos else [])

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard, salt = key
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        docs = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["dl"].to_numpy()[order].astype(np.int64)
        tfnorms = pdf["tfnorm"].to_numpy()[order]
        pos_concat = None
        if has_pos:
            plists = pdf["positions"].to_numpy()[order]
            pos_concat = (np.concatenate([np.asarray(x, dtype=np.int64)
                                          for x in plists])
                          if len(plists) else np.zeros(0, np.int64))
        recs = encode_blocks(docs, tfs, tfnorms, pos_concat, dls, block_docs)
        return pd.DataFrame([
            {"term": term, "shard": int(shard), "salt": int(salt),
             "block_seq": i, **r}
            for i, r in enumerate(recs)
        ], columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return p.select(*cols).groupBy("term", "shard", "salt").applyInPandas(
        encode, schema=SEGMENT_SCHEMA)
