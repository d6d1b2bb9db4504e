"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python in the hot path; each has an exact
ANSI-SQL mirror for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELIM_RE = "[ \\t\\n\\r\\u3000]+"
STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "for", "on", "with"]


def _words(col):
    # split on engine delimiters; filter empties (leading delimiter)
    return F.filter(F.split(col, DELIM_RE), lambda w: F.length(w) > 0)


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + char/byte lengths per doc."""
    w = _words(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(w).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: mean word length, stopword ratio,
    non-alnum ratio. Deterministic, SQL-mirrorable arithmetic."""
    w = _words(F.col(text_col))
    n_tok = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x))))
    n_alnum = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
    n_chars = F.length(F.col(text_col))
    sum_word_chars = F.aggregate(F.transform(w, lambda x: F.length(x)),
                                 F.lit(0), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(F.when(n_tok > 0, sum_word_chars.cast("double") / n_tok)
                .otherwise(0.0), 6)
        .alias("mean_word_len"),
        F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0), 6)
        .alias("stopword_ratio"),
        F.round(F.when(n_chars > 0, n_alnum / n_chars).otherwise(0.0), 6)
        .alias("alnum_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Script-ratio language heuristic: ja if >20% kana/CJK, else en if
    >50% ascii letters, else 'other'. (A real pipeline would plug a
    model here; the Spark plumbing and the contract are what matter.)"""
    n = F.length(F.col(text_col))
    jp = n - F.length(F.regexp_replace(
        F.col(text_col), "[\\u3040-\\u30ff\\u4e00-\\u9fff]", ""))
    asc = F.length(F.regexp_replace(
        F.col(text_col), "[^a-zA-Z]", ""))
    return df.select(
        F.col(id_col),
        F.when(n == 0, F.lit("other"))
        .when(jp / n > 0.2, F.lit("ja"))
        .when(asc / n > 0.5, F.lit("en"))
        .otherwise(F.lit("other")).alias("lang_pred"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: exact (sha256) and normalized (lowercased,
    whitespace-collapsed) — the usual near-exact dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), DELIM_RE, " ")
    return df.select(
        F.col(id_col),
        F.sha2(F.col(text_col), 256).alias("sha256"),
        F.md5(norm).alias("norm_md5"),
    )
