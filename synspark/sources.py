"""Corpus sources (SURVEY E1).

Production input is an Iceberg table of source-code repositories
(BASELINE input_hint); the sandbox has no Iceberg runtime, so
``read_corpus`` resolves in order: explicit ``format``, an
Iceberg/catalog table name, a parquet path. Catalyst handles column
pruning / partition pruning / split planning either way — the engine
only ever expresses ``select`` + ``filter`` on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(spark: SparkSession, source: str,
                fmt: str | None = None,
                langs: list[str] | None = None) -> DataFrame:
    """Load the corpus from an Iceberg table name, a parquet path, or
    (explicit ``fmt``) jsonl / csv / raw-text files.

    - ``json``/``jsonl``: one document object per line.
    - ``csv``: header row with corpus columns.
    - ``text``: one document per FILE (wholetext) — repo/path derive
      from the file name, content is the file body.
    ``langs`` pushes a language filter into the scan (partition/file
    pruning when the table is partitioned or sorted by lang).
    """
    df = None
    if fmt in ("json", "jsonl"):
        df = spark.read.json(source)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(source)
    elif fmt == "text":
        df = (spark.read.option("wholetext", "true").text(source)
              .select(F.lit("").alias("repo"),
                      F.input_file_name().alias("path"),
                      F.lit("").alias("commit"),
                      F.lit("").alias("lang"),
                      F.col("value").alias("content")))
    elif fmt == "iceberg" or (fmt is None and "/" not in source):
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception:
            try:  # catalog table without the iceberg source alias
                df = spark.read.table(source)
            except Exception:
                df = None
    if df is None:
        df = spark.read.parquet(source)
    missing = [c for c in ("content",) if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus at {source!r} lacks required columns {missing}; "
            f"expected shape {CORPUS_COLUMNS}")
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    return df
