"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

The engine's input table has the shape pinned by BASELINE.json
``input_hint``: ``(repo, path, commit, lang, content)`` — an Iceberg
table in production, parquet in this sandbox. This generator
synthesizes it deterministically (seed folded into each row id, so the
output is identical regardless of partitioning or parallelism) at any
scale: content mixes Zipf-skewed code-like text, the golden-fixture
alphabet, Japanese fixture docs, and multi-block delimiter cases.

Spark-first: rows are produced distributed via ``spark.range(n)`` +
``mapInPandas`` — no driver-side materialization, scales linearly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, StringType, LongType

CORPUS_SCHEMA = StructType([
    StructField("row_id", LongType(), False),
    StructField("repo", StringType(), False),
    StructField("path", StringType(), False),
    StructField("commit", StringType(), False),
    StructField("lang", StringType(), False),
    StructField("content", StringType(), False),
])

_EXTS = ["py", "java", "scala", "md"]
_LANGS = ["python", "java", "scala", "text"]

# Zipf-skewed code vocabulary: first entries are extremely hot so hot
# bigrams ('in', 're', 'e;', '))') appear, exercising skew handling
_VOCAB = (
    "in re if is e; )) == != def for val var int str len map get set "
    "return import class public static void private final override lazy "
    "match case yield await async lambda filter reduce foreach println "
    "self this super null none true false try except finally raise throw "
    "new delete sizeof template typename struct union enum extern switch"
).split()

_ASCII_FIXTURES = ["ba", "abb", "bbabb", "edcba", "fedcbabcdef", "abba",
                   "ababb", "ccabcca", "dcbabcd", "gfedcabcdefga"]
_JP_FIXTURES = ["あいうえお", "東京", "ロンウイット", "あいうえお　かきくけこ",
                "明日は東京へ行く", "あいうえお かきくけこ さしすせそ"]


def _content_for(i: int) -> str:
    """Deterministic content for global row id ``i`` (seed=42 folded in)."""
    kind = i % 10
    rng = np.random.RandomState((42 * 1_000_003 + i) % (2**31 - 1))
    if kind <= 3:  # code-like: Zipf-hot keywords + unique identifiers
        n_words = 60 + int(rng.zipf(1.7) % 240)
        idx = np.minimum(rng.zipf(1.3, size=n_words) - 1, len(_VOCAB) - 1)
        seps = rng.choice([" ", " ", " ", "\t", "\n"], size=n_words)
        # ~1/3 unique identifiers (realistic for source code; keeps the
        # tokenizer honest — an all-hot-vocab corpus is 100% memoizable)
        uniq = rng.random_sample(size=n_words) < 0.33
        suffix = rng.randint(0, 1 << 30, size=n_words)
        parts = []
        for j, w in enumerate(idx):
            if uniq[j]:
                parts.append(f"{_VOCAB[w]}_{suffix[j]:x}")
            else:
                parts.append(_VOCAB[w])
            parts.append(seps[j])
        return "".join(parts[:-1])
    if kind <= 5:  # golden-alphabet strings incl. exact fixture inputs
        base = _ASCII_FIXTURES[i % len(_ASCII_FIXTURES)]
        extra = "".join(rng.choice(list("abcdefg"), size=int(rng.randint(0, 12))))
        return base + (" " + extra if extra else "")
    if kind <= 7:  # Japanese fixture docs (incl. U+3000 delimiter)
        return _JP_FIXTURES[i % len(_JP_FIXTURES)]
    # multi-block text with all delimiters; occasional huge block
    if i % 1000 == 8:
        blk = "x" * (4095 + (i // 1000) % 3)  # 4095/4096/4097 boundary cases
        return blk + " " + "yz" * 5
    words = rng.choice(_VOCAB, size=8)
    return " \t".join(words[:4]) + "\n\r　" + " ".join(words[4:])


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    repo = [f"org{i % 7}/repo{i % 23}" for i in ids]
    path = [f"src/m{i % 11}/f{i}.{_EXTS[i % 4]}" for i in ids]
    commit = [hashlib.sha1(f"c{i}".encode()).hexdigest() for i in ids]
    lang = [_LANGS[i % 4] for i in ids]
    content = [_content_for(int(i)) for i in ids]
    return pd.DataFrame({"row_id": ids, "repo": repo, "path": path,
                         "commit": commit, "lang": lang, "content": content})


def generate_corpus(spark: SparkSession, n_docs: int,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` rows."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy())

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
        .withColumnRenamed("row_id", "doc_id")
    )


def with_sha256(df: DataFrame, col: str = "content") -> DataFrame:
    """Per-row content fingerprint — the invariant carried through the
    build and re-checked against the source table (north rule). Built-in
    ``sha2`` (JVM-side, codegen) — no UDF."""
    return df.withColumn("content_sha256", F.sha2(F.col(col), 256))
