"""ES suggesters over the term dictionary: ``term`` (did-you-mean
spell correction) and ``completion`` (prefix autocomplete).

Host-engine surfaces (ES ``suggest`` API backed by Lucene
DirectSpellChecker / the suggest module) that deployments of the
reference analyzer use for search-box UX. Both resolve purely against
``termstats`` — no postings are touched:

- **term suggester**: every input token joins (broadcast — the token
  list is tiny) against ONE column-pruned dictionary scan; the edit
  distance, length-window and shared-prefix gates are all JVM codegen
  expressions, and per-token top-N selection is a window over the
  (small) surviving candidate set. Lucene walks a per-segment fuzzy
  FST intersection instead; both are one dictionary pass bounded by
  max_edits.
- **completion suggester**: a StartsWith-pruned dictionary range scan
  ordered by weight (df) — the FST-with-weights lookup, re-expressed
  as the sorted term column's row-group-pruned parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .index_store import IndexStore
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig, tokenize

_MODES = ("missing", "popular", "always")


def suggest_terms(spark: SparkSession, store: IndexStore, text: str,
                  size: int = 5, max_edits: int = 2,
                  prefix_length: int = 1, min_word_length: int = 4,
                  suggest_mode: str = "missing",
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None) -> DataFrame:
    """ES ``term`` suggester: per analyzed token, the top ``size``
    dictionary corrections within ``max_edits`` (ES/Lucene limit 2),
    sharing the first ``prefix_length`` chars (DirectSpellChecker
    default 1), scored by string similarity
    1 − d / min(len(candidate), len(token)) with (similarity DESC,
    df DESC, term ASC) order — the suggester's default
    ``sort: score``. Tokens shorter than ``min_word_length`` (ES
    default 4) are never corrected.

    ``suggest_mode``: ``missing`` (default — only correct tokens
    absent from the index), ``popular`` (only candidates more frequent
    than the token), ``always``.

    Returns (token, suggestion, df, score), ordered (token ASC,
    score DESC, df DESC, suggestion ASC)."""
    if suggest_mode not in _MODES:
        raise ValueError(f"suggest_mode must be one of {_MODES}")
    if not 1 <= max_edits <= 2:
        raise ValueError("max_edits must be 1 or 2 (Lucene "
                         "DirectSpellChecker limit)")
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    toks = sorted({w for w, *_ in tokenize(text, cfg, syn)
                   if len(w) >= min_word_length})
    out_schema = ("token string, suggestion string, df long, "
                  "score double")
    if not toks:
        return spark.createDataFrame([], out_schema)
    # token df for the mode gates — one term-pruned dictionary probe
    tdfs = store.term_dfs(spark, toks, build_id=meta.build_id)
    tokdf = spark.createDataFrame(
        [(t, int(tdfs.get(t, 0))) for t in toks],
        "token string, tdf long")

    ts = store.termstats(spark).select("term", "df")
    cond = F.length("term").between(
        F.length("token") - max_edits, F.length("token") + max_edits)
    if prefix_length > 0:
        cond = cond & (F.substring("term", 1, prefix_length)
                       == F.substring("token", 1, prefix_length))
    cand = (ts.join(F.broadcast(tokdf), cond)
            .withColumn("dist", F.levenshtein(F.col("term"),
                                              F.col("token"),
                                              threshold=max_edits))
            .filter(F.col("dist").between(1, max_edits)))
    if suggest_mode == "missing":
        cand = cand.filter(F.col("tdf") == 0)
    elif suggest_mode == "popular":
        cand = cand.filter(F.col("df") > F.col("tdf"))
    cand = cand.withColumn(
        "score",
        F.lit(1.0) - F.col("dist")
        / F.least(F.length("term"), F.length("token")))
    w = Window.partitionBy("token").orderBy(
        F.desc("score"), F.desc("df"), F.asc("term"))
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= size)
            .select(F.col("token"), F.col("term").alias("suggestion"),
                    F.col("df"), F.col("score"))
            .orderBy(F.asc("token"), F.desc("score"), F.desc("df"),
                     F.asc("suggestion")))


def suggest_completion(spark: SparkSession, store: IndexStore,
                       prefix: str, size: int = 5) -> DataFrame:
    """ES ``completion`` suggester with df as the weight: the top
    ``size`` dictionary terms under ``prefix``, heaviest first
    (weight DESC, term ASC — deterministic). The StartsWith prunes the
    sorted term column's parquet row groups, the Lucene-FST analogue.
    Returns (suggestion, weight)."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    return (store.termstats(spark)
            .filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term")).limit(size)
            .select(F.col("term").alias("suggestion"),
                    F.col("df").alias("weight")))
