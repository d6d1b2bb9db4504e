"""ES multi-term queries over the term dictionary: fuzzy, wildcard,
regexp.

The reference plugin supplies the analyzer; fuzzy/wildcard/regexp are
host-engine surfaces (Lucene FuzzyQuery / WildcardQuery / RegexpQuery
behind ES's ``fuzzy``, ``match{fuzziness}``, ``wildcard``, ``regexp``
queries) that every deployment of the reference runs against the terms
the analyzer produced. Like ``prefix`` (query.py), each rewrites to a
term-dictionary expansion + the standard distributed match/score
machinery:

- **Term selection** runs against ``termstats`` — one parquet scan
  with the selective predicates JVM-side (``levenshtein`` / ``like`` /
  ``rlike`` are all Catalyst expressions inside whole-stage codegen;
  no Python touches the dictionary). Cheap prefilters (length window,
  literal prefix) are pushed BELOW the expensive predicate so parquet
  row-group min/max stats on the sorted ``term`` column prune the
  scan, mirroring how Lucene walks only the automaton-intersecting
  FST range (FuzzyTermsEnum / CompiledAutomaton.getTermsEnum).
- **Matching** feeds the expansion to the same group machinery as any
  analyzed query: constant_score rewrites (the ES default for these
  queries) build ONE or-group; scoring rewrites make each expanded
  term its own SHOULD clause ranked by the block-max WAND path.

Scale shape: the driver receives only ≤ max_expansions term STRINGS
(the Lucene top_terms_N rewrite cap); everything else is executors.
At web scale the dictionary scan is the cost — it is one
column-pruned pass over (term, df), embarrassingly parallel, and for
fuzzy/prefix-anchored patterns row-group pruned; ES pays the
analogous per-segment FST walk.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_store import IndexStore
from .query import count_matches, match_ids, search, search_bool

# ES "AUTO" fuzziness breakpoints (Fuzziness.AUTO: [0,3) -> 0,
# [3,6) -> 1, [6,inf) -> 2).
AUTO_LOW, AUTO_HIGH = 3, 6
# Lucene LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
MAX_FUZZ = 2


def auto_fuzziness(term: str) -> int:
    """ES ``fuzziness: AUTO`` — edit-distance budget by term length."""
    n = len(term)
    return 0 if n < AUTO_LOW else (1 if n < AUTO_HIGH else 2)


# --------------------------------------------------------------------
# fuzzy
# --------------------------------------------------------------------

def fuzzy_terms(spark: SparkSession, store: IndexStore, term: str,
                fuzziness: int | None = None, prefix_length: int = 0,
                max_expansions: int = 50) -> list[tuple[str, int]]:
    """Dictionary terms within ``fuzziness`` edits of ``term`` as
    ``[(term, distance)]``, selected like Lucene's
    TopTermsBlendedFreqScoringRewrite picks its cap: closest first,
    then highest df, term ASC ties — deterministic, so rewrites
    reproduce across engines. ``fuzziness=None`` is ES AUTO.

    ``prefix_length`` (ES parameter, default 0) requires the first
    chars to match exactly — on a web-scale dictionary this is the
    knob that turns the scan into a prefix-pruned range, exactly why
    ES docs recommend it. The length window |len(t) − len(q)| ≤ f is
    a necessary condition for distance ≤ f, applied before the
    levenshtein expression (which itself takes the early-exit
    ``threshold`` form)."""
    f = auto_fuzziness(term) if fuzziness is None else int(fuzziness)
    if not 0 <= f <= MAX_FUZZ:
        raise ValueError(f"fuzziness must be 0..{MAX_FUZZ} (Lucene "
                         f"LevenshteinAutomata limit), got {f}")
    if not term:
        raise ValueError("fuzzy term must be non-empty")
    ts = store.termstats(spark)
    if prefix_length > 0:
        ts = ts.filter(F.col("term").startswith(term[:prefix_length]))
    if f == 0:                          # exact term lookup
        ts = ts.filter(F.col("term") == term) \
               .withColumn("dist", F.lit(0))
    else:
        ts = (ts.filter(F.length("term").between(len(term) - f,
                                                 len(term) + f))
              .withColumn(
                  "dist", F.levenshtein(F.col("term"), F.lit(term),
                                        threshold=f))
              .filter(F.col("dist") >= 0))  # threshold: -1 = beyond f
    rows = (ts.orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term", "dist").collect())
    return sorted((r.term, r.dist) for r in rows)


def _fuzzy_clauses(expansions: list[tuple[str, int]],
                   qlen: int) -> list[tuple[list[str], float]]:
    """(group, boost) SHOULD clauses with Lucene FuzzyTermsEnum's
    similarity boost: 1 − dist / min(len(term), len(query)). Exact
    matches boost 1.0; degenerate expansions whose boost would be ≤ 0
    (distance consumes the whole shorter string) are dropped — Lucene
    gives them score 0, and the WAND bound machinery requires strictly
    positive clause boosts."""
    out: list[tuple[list[str], float]] = []
    for t, d in expansions:
        boost = 1.0 if d == 0 else 1.0 - d / min(len(t), qlen)
        if boost > 0:
            out.append(([t], boost))
    return out


def search_fuzzy(spark: SparkSession, store: IndexStore, term: str,
                 k: int = 10, fuzziness: int | None = None,
                 prefix_length: int = 0,
                 max_expansions: int = 50) -> DataFrame:
    """ES ``fuzzy`` query, scored: each expansion becomes a SHOULD
    clause with its own idf × the Lucene distance boost, summed over
    matched clauses (BooleanQuery of boosted TermQuery — the
    scoring_boolean shape of FuzzyQuery's rewrite), ranked by the
    shard-parallel block-max WAND."""
    exp = fuzzy_terms(spark, store, term, fuzziness, prefix_length,
                      max_expansions)
    clauses = _fuzzy_clauses(exp, len(term))
    if not clauses:
        return spark.createDataFrame([], "doc_id long, score double")
    return search_bool(spark, store, should=clauses,
                       min_should_match=1, k=k)


def count_fuzzy(spark: SparkSession, store: IndexStore, term: str,
                fuzziness: int | None = None, prefix_length: int = 0,
                max_expansions: int = 50) -> DataFrame:
    """ES ``fuzzy`` hit count (constant_score: doc-set union over the
    expansion, no scoring)."""
    exp = fuzzy_terms(spark, store, term, fuzziness, prefix_length,
                      max_expansions)
    return _count_expanded(spark, store, [t for t, _d in exp])


# --------------------------------------------------------------------
# wildcard
# --------------------------------------------------------------------

_LIKE_SPECIAL = ("\\", "%", "_")


def wildcard_to_like(pattern: str) -> str:
    """ES/Lucene wildcard (``*`` any run, ``?`` one char) → SQL LIKE
    with ``\\`` escaping, so literal ``%``/``_``/``\\`` in terms can't
    false-match. Lucene's ``\\``-escaped wildcard metachars stay
    literal."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            out.append("\\" + nxt if nxt in _LIKE_SPECIAL else nxt)
            i += 2
            continue
        if c == "*":
            out.append("%")
        elif c == "?":
            out.append("_")
        elif c in _LIKE_SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _literal_prefix(pattern: str) -> str:
    """Leading literal run before the first unescaped wildcard — the
    index-pruning anchor (Lucene WildcardQuery's prefix automaton)."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c in "*?":
            break
        if c == "\\" and i + 1 < len(pattern):
            out.append(pattern[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def wildcard_terms(spark: SparkSession, store: IndexStore,
                   pattern: str,
                   max_expansions: int | None = None) -> list[str]:
    """Dictionary terms matching an ES ``wildcard`` pattern. The
    literal prefix (if any) is pushed as a StartsWith BELOW the LIKE
    so the sorted term column's row-group stats prune the scan; the
    LIKE itself is a codegen'd JVM expression. Capped selection is the
    deterministic top-df rewrite (df DESC, term ASC), like prefix."""
    if not pattern:
        raise ValueError("wildcard pattern must be non-empty")
    ts = store.termstats(spark)
    pre = _literal_prefix(pattern)
    if pre:
        ts = ts.filter(F.col("term").startswith(pre))
    ts = ts.filter(F.like(F.col("term"), F.lit(wildcard_to_like(pattern)),
                          F.lit("\\")))
    if max_expansions is not None:
        ts = ts.orderBy(F.desc("df"), F.asc("term")) \
               .limit(max_expansions)
    return sorted(r.term for r in ts.select("term").collect())


def count_wildcard(spark: SparkSession, store: IndexStore,
                   pattern: str,
                   max_expansions: int | None = None) -> DataFrame:
    """ES ``wildcard`` hit count (constant_score — the ES default)."""
    return _count_expanded(
        spark, store, wildcard_terms(spark, store, pattern,
                                     max_expansions))


def search_wildcard(spark: SparkSession, store: IndexStore,
                    pattern: str, k: int = 10,
                    max_expansions: int = 50) -> DataFrame:
    """ES ``wildcard`` under the scoring_boolean rewrite: every
    expanded term its own BM25 SHOULD clause (its own idf), same WAND
    path as ``search_prefix``."""
    terms = wildcard_terms(spark, store, pattern, max_expansions)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return search(spark, store, "", k=k, mode="or",
                  groups=[[t] for t in terms])


# --------------------------------------------------------------------
# regexp
# --------------------------------------------------------------------

def regexp_terms(spark: SparkSession, store: IndexStore,
                 pattern: str,
                 max_expansions: int | None = None) -> list[str]:
    """Dictionary terms fully matching an ES ``regexp`` pattern
    (Lucene RegexpQuery is ANCHORED — the whole term must match, so
    the pattern is wrapped ``^(?:...)$``). The regex evaluates
    JVM-side (codegen RLike); a literal prefix, when the pattern has
    one, is pushed as StartsWith for row-group pruning."""
    if not pattern:
        raise ValueError("regexp pattern must be non-empty")
    re.compile(pattern)                 # fail fast on driver
    ts = store.termstats(spark)
    pre = _regex_literal_prefix(pattern)
    if pre:
        ts = ts.filter(F.col("term").startswith(pre))
    ts = ts.filter(F.col("term").rlike(f"^(?:{pattern})$"))
    if max_expansions is not None:
        ts = ts.orderBy(F.desc("df"), F.asc("term")) \
               .limit(max_expansions)
    return sorted(r.term for r in ts.select("term").collect())


_REGEX_META = set(".^$*+?{}[]|()\\")


def _regex_literal_prefix(pattern: str) -> str:
    """Leading run of plain literal chars (stop at the first regex
    metachar; back off one char if the NEXT char is a quantifier,
    which binds to the last literal)."""
    out: list[str] = []
    for i, c in enumerate(pattern):
        if c in _REGEX_META:
            if c in "*+?{" and out:
                out.pop()               # quantifier binds prev char
            break
        out.append(c)
    return "".join(out)


def count_regexp(spark: SparkSession, store: IndexStore, pattern: str,
                 max_expansions: int | None = None) -> DataFrame:
    """ES ``regexp`` hit count (constant_score rewrite)."""
    return _count_expanded(
        spark, store, regexp_terms(spark, store, pattern,
                                   max_expansions))


def search_regexp(spark: SparkSession, store: IndexStore,
                  pattern: str, k: int = 10,
                  max_expansions: int = 50) -> DataFrame:
    """ES ``regexp`` under the scoring_boolean rewrite."""
    terms = regexp_terms(spark, store, pattern, max_expansions)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return search(spark, store, "", k=k, mode="or",
                  groups=[[t] for t in terms])


# --------------------------------------------------------------------
# match_phrase_prefix
# --------------------------------------------------------------------

def _phrase_prefix_groups(spark: SparkSession, store: IndexStore,
                          text: str, syn=None, cfg=None,
                          max_expansions: int | None = 50):
    """Analyze ``text`` and replace the LAST position group with the
    prefix expansion of its (first) term — Lucene
    MultiPhrasePrefixQuery: the final position accepts ANY dictionary
    term continuing the typed prefix, earlier positions stay exact.
    Returns None when the expansion is empty (no dictionary term has
    the prefix — the query matches nothing)."""
    from .query import analyze_query, prefix_terms
    from .tokenizer import TokenizerConfig
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    groups = analyze_query(text, cfg, syn)
    if not groups:
        return None
    last = groups[-1][0]
    exp = prefix_terms(spark, store, last, max_expansions)
    if not exp:
        return None
    return groups[:-1] + [exp]


def search_phrase_prefix(spark: SparkSession, store: IndexStore,
                         text: str, k: int = 10,
                         max_expansions: int | None = 50,
                         syn=None, cfg=None,
                         doc_where: str | None = None) -> DataFrame:
    """ES ``match_phrase_prefix`` (search-as-you-type): phrase
    adjacency over the analyzed positions with the last position
    prefix-expanded (Lucene MultiPhrasePrefixQuery). Rides the
    engine's existing multi-position-group phrase machinery — the
    expanded last position is just a synonym-like group, verified
    per shard like any MultiPhraseQuery; ranking is the phrase
    contract (BM25 over the groups, blended idf for the expanded
    position, restricted to adjacency-verified docs).

    ``max_expansions`` is the ES parameter (default 50, top-df
    selection); ``None`` expands the whole dictionary range — exact
    prefix-continuation semantics, the configuration the contract
    oracle mirrors with a raw-text regex."""
    groups = _phrase_prefix_groups(spark, store, text, syn, cfg,
                                   max_expansions)
    if groups is None:
        return spark.createDataFrame([], "doc_id long, score double")
    return search(spark, store, "", k=k, mode="and", phrase=True,
                  groups=groups, doc_where=doc_where)


def count_phrase_prefix(spark: SparkSession, store: IndexStore,
                        text: str, max_expansions: int | None = 50,
                        syn=None, cfg=None,
                        doc_where: str | None = None) -> DataFrame:
    """Distributed hit count for ``match_phrase_prefix``."""
    groups = _phrase_prefix_groups(spark, store, text, syn, cfg,
                                   max_expansions)
    if groups is None:
        return spark.range(1).select(
            F.lit(0).cast("long").alias("hits"))
    return count_matches(spark, store, mode="and", phrase=True,
                         groups=groups, doc_where=doc_where)


# --------------------------------------------------------------------
# shared
# --------------------------------------------------------------------

def _count_expanded(spark: SparkSession, store: IndexStore,
                    terms: list[str]) -> DataFrame:
    if not terms:
        return spark.range(1).select(F.lit(0).cast("long").alias("hits"))
    return count_matches(spark, store, mode="or", groups=[terms])


def expanded_ids(spark: SparkSession, store: IndexStore,
                 terms: list[str]) -> DataFrame:
    """Matching doc ids of any expansion as a distributed frame (the
    scroll surface for constant_score multi-term queries)."""
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    return match_ids(spark, store, mode="or", groups=[terms])
