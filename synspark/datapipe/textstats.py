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


# GPT-2-style pre-tokenizer (BPE front end), lookahead-free so the
# same pattern runs under Java regex (Spark) and RE2 (DuckDB oracle) —
# both leftmost-first alternation, ASCII \s, Unicode \p{L}/\p{N}
BPE_RE = ("'s|'t|'re|'ve|'m|'ll|'d"
          "| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+")


def subword_counts(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token estimate per doc — the budget number an LLM
    pretraining pipeline actually plans with (subword count tracks BPE
    vocab tokenization far better than whitespace words). Pure built-in
    regexp_extract_all: codegen, no UDF."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_subwords"),
        F.size(_words(F.col(text_col))).alias("n_words"),
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


EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\b\d{9,}\b"


def scrub_pii(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing (training-data hygiene): emails, IPv4 addresses,
    and long digit runs (phone/account shaped) replaced by typed
    placeholders. Pure regexp_replace chain (codegen; RE2-compatible
    patterns so the oracle mirrors exactly). Returns (id, text,
    n_redactions)."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        LONGNUM_RE, "<NUM>")
    n_red = (F.size(F.split(scrubbed, "<EMAIL>")) - 1
             + F.size(F.split(scrubbed, "<IP>")) - 1
             + F.size(F.split(scrubbed, "<NUM>")) - 1)
    return df.select(F.col(id_col), scrubbed.alias("text"),
                     n_red.cast("int").alias("n_redactions"))


def chunk_documents(df: DataFrame, max_tokens: int = 64,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into training-sized chunks of ≤ ``max_tokens``
    whitespace tokens with ``overlap`` tokens of context between
    consecutive chunks — the standard LLM pretraining shard step.
    Pure built-ins: split → sequence of chunk starts (stride =
    max_tokens - overlap) → slice + explode. Deterministic chunk ids.
    Returns (id, chunk_id, n_tokens, chunk)."""
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    w = _words(F.col(text_col))
    n = F.size(w)
    # chunk starts: 0, stride, 2*stride, ... while start < n (at least
    # one chunk for non-empty docs); last chunk may be short
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / F.lit(stride)).cast("int") + 1)
    # a trailing chunk fully contained in the previous one is dropped:
    # start >= n - overlap contributes no new tokens
    starts = F.filter(
        F.transform(F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: i * F.lit(stride)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n))
    chunks = F.transform(
        starts, lambda s: F.struct(
            (s / F.lit(stride)).cast("int").alias("chunk_id"),
            F.slice(w, s + 1, F.lit(max_tokens)).alias("toks")))
    ex = df.select(F.col(id_col), n.alias("_n"),
                   F.explode(chunks).alias("c")) \
        .filter(F.col("_n") > 0)
    return ex.select(
        F.col(id_col),
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.toks").alias("n_tokens"),
        F.concat_ws(" ", "c.toks").alias("chunk"))
