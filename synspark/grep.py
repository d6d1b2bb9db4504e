"""Gram-accelerated regex search over the source corpus (code grep).

The reference's n-gram analyzer exists to serve SUBSTRING search over
code/CJK text (LUCENE-5252; reference README.md:7) — and the flagship
code-search application of an n-gram index is regex search accelerated
by a required-gram prefilter, the public design of Google Code Search
(R. Cox, "Regular Expression Matching with a Trigram Index",
swtch.com/~rsc/regexp/regexp4.html) and of Zoekt. This module is that
operator, Spark-native:

1. **Plan**: extract the pattern's REQUIRED literal runs — substrings
   every possible match must contain — conservatively (any top-level
   alternation or a too-short run degrades to no prefilter, never to
   a wrong one). Runs are split at the analyzer's delimiters (index
   grams never span blocks) and lowered when the index folds case.
2. **Prefilter**: the runs' n-grams become one AND match over the
   inverted index (`match_ids` — per-shard vectorized set algebra,
   block-range skips, liveDocs honored). On a web-scale corpus this
   is the difference between grepping everything and decoding a few
   posting lists: candidates ∝ the rarest gram's df.
3. **Verify**: candidates join back to the source table (the
   `input_hint` corpus) and the real regex runs JVM-side
   (codegen `rlike` / `regexp_count` — no Python in the loop).

Scale shape: the verify join is a semi-join of (small) candidate ids
against the corpus — broadcastable when selective; the full-scan
fallback (no required grams) is exactly what every engine does for
`.*`-ish patterns, minus the index decode. False positives cost one
regex evaluation each; false negatives are impossible by construction
(a literal run contains no delimiter, so it sits inside one block and
all its grams are indexed).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_store import IndexStore
from .query import match_ids
from .tokenizer import DEFAULT_DELIMITERS, TokenizerConfig

_META = set(".^$*+?{}[]|()\\")
# escapes that are regex classes/anchors, not literal chars
_CLASS_ESCAPES = set("dDsSwWbBAZzGQEnrtfv0123456789")


def required_grams(pattern: str, n: int = 2,
                   delimiters: str = DEFAULT_DELIMITERS,
                   ignore_case: bool = True) -> list[str] | None:
    """The index n-grams every match of ``pattern`` must contain, or
    ``None`` when no sound prefilter exists (top-level alternation,
    or no literal run of length ≥ n).

    Conservative by construction:
    - any ``|`` anywhere disables the prefilter (a branch may avoid
      every literal; intersecting per-branch requirements is the
      known refinement and is future work);
    - a quantifier (``* + ? {``) makes its operand optional/repeated —
      the preceding char (or whole class/group) drops out of the run;
    - classes, dots, anchors, groups and non-literal escapes break
      runs; escaped literals (``\\.``) continue them;
    - runs are split at the analyzer's delimiters — a literal space
      in the pattern means "block boundary in the doc", which the
      gram dictionary never crosses.
    """
    # soundness guards — shapes where a literal run might NOT be
    # required by every match: alternation branches, (?=...)/(?:...)
    # constructs (their bodies aren't plain text), quantified groups
    # ("(abc)?" makes the whole group optional). Each degrades to
    # no-prefilter, never to a wrong one.
    if "|" in pattern or "(?" in pattern \
            or re.search(r"\)[*+?{]", pattern):
        return None
    runs: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            if nxt in _CLASS_ESCAPES:
                flush()
            else:                        # escaped literal (\. \* \\ …)
                cur.append(nxt)
            i += 2
            # a quantifier after the escape binds to it — the escaped
            # char drops out AND the run before it ends (the pieces
            # around "x\.+y" are not contiguous in matches)
            if i < len(pattern) and pattern[i] in "*+?{" and cur:
                cur.pop()
                flush()
            continue
        if c in "*+?{":
            if cur:
                cur.pop()                # operand is optional/repeated
            flush()
            if c == "{":                 # skip {m,n}
                j = pattern.find("}", i)
                i = (j if j != -1 else i) + 1
                continue
            i += 1
            continue
        if c == "[":
            flush()
            j = i + 1
            if j < len(pattern) and pattern[j] == "^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1                   # literal ] first in class
            # walk to the closing ] honoring escapes — a plain find()
            # would stop at an ESCAPED ] inside the class and leak
            # class-interior chars into the required runs (false
            # negatives)
            while j < len(pattern) and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            i = (j if j < len(pattern) else len(pattern) - 1) + 1
            continue
        if c in _META:
            flush()
            i += 1
            continue
        cur.append(c)
        i += 1
    flush()

    grams: set[str] = set()
    delims = set(delimiters)
    for run in runs:
        if ignore_case:
            run = run.lower()
        # split at delimiters: index grams never span blocks
        part: list[str] = []
        parts: list[str] = []
        for ch in run:
            if ch in delims:
                parts.append("".join(part))
                part = []
            else:
                part.append(ch)
        parts.append("".join(part))
        for p in parts:
            for k in range(len(p) - n + 1):
                grams.add(p[k:k + n])
    return sorted(grams) or None


def _candidates(spark: SparkSession, store: IndexStore,
                corpus: DataFrame, pattern: str,
                doc_where: str | None):
    """(joined frame, used_prefilter): corpus rows surviving the gram
    prefilter (or the whole corpus when none applies)."""
    meta = store.meta()
    cfg = TokenizerConfig(**meta.cfg)
    # SOUNDNESS GUARD: on a dictionary-anchored index grams never
    # straddle a synonym-match boundary (the tokenizer's whole point,
    # LUCENE-5252), so a literal run overlapping a dict surface in
    # the DOC may be missing some of its grams from the index — an
    # AND prefilter over them would false-negative. No dictionary ⇒
    # every delimiter-free substring's grams are indexed and the
    # prefilter is exact-superset; with one, degrade to the verified
    # full scan (code-search deployments index grep fields dict-free).
    grams = None if meta.dict_fingerprint is not None else \
        required_grams(pattern, n=cfg.n,
                       delimiters=cfg.delimiters,
                       ignore_case=cfg.ignore_case)
    if "doc_id" not in corpus.columns:
        raise ValueError("grep corpus needs a doc_id column aligned "
                         "with the index (pass the table the index "
                         "was built from)")
    if grams is None:
        base = corpus
        if doc_where is not None:
            base = base.filter(doc_where)
        return base, False
    ids = match_ids(spark, store, groups=[[g] for g in grams],
                    mode="and", doc_where=doc_where)
    return corpus.join(ids, "doc_id", "semi"), True


def grep_search(spark: SparkSession, store: IndexStore,
                corpus: DataFrame, pattern: str,
                text_col: str = "content",
                doc_where: str | None = None) -> DataFrame:
    """Docs matching a regex, with per-doc occurrence counts (the
    ``grep -c`` shape): ``(doc_id, n_matches)``, doc_id ASC. The
    pattern is Java/Spark regex syntax (it runs as codegen
    ``regexp_count``); keep to the common RE subset for portability.
    ``doc_where`` pre-restricts by metadata (lang, repo, path — the
    code-search scoping filters), pushed into both the prefilter and
    the fallback scan."""
    re.compile(pattern)                  # fail fast, driver-side
    cand, _used = _candidates(spark, store, corpus, pattern,
                              doc_where)
    return (cand.select(
                "doc_id",
                F.regexp_count(F.col(text_col), F.lit(pattern))
                 .cast("long").alias("n_matches"))
            .filter(F.col("n_matches") > 0)
            .orderBy("doc_id"))


def grep_lines(spark: SparkSession, store: IndexStore,
               corpus: DataFrame, pattern: str,
               text_col: str = "content",
               doc_where: str | None = None) -> DataFrame:
    """Matching LINES (the ``grep -n`` shape): ``(doc_id, line_no,
    line)``, 1-based line numbers, ordered (doc_id, line_no). Line
    split + per-line regex all stay JVM-side (posexplode + rlike)."""
    re.compile(pattern)
    cand, _used = _candidates(spark, store, corpus, pattern,
                              doc_where)
    lines = cand.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n"))
         .alias("off", "line"))
    return (lines.filter(F.col("line").rlike(pattern))
            .select("doc_id",
                    (F.col("off") + 1).cast("long").alias("line_no"),
                    "line")
            .orderBy("doc_id", "line_no"))


def grep_count(spark: SparkSession, store: IndexStore,
               corpus: DataFrame, pattern: str,
               text_col: str = "content",
               doc_where: str | None = None) -> DataFrame:
    """Matching-doc count (``grep -l | wc -l``): one ``hits`` row."""
    re.compile(pattern)
    cand, _used = _candidates(spark, store, corpus, pattern,
                              doc_where)
    return (cand.filter(F.col(text_col).rlike(pattern))
            .agg(F.count("*").cast("long").alias("hits")))
