"""Query engine: synonym-expanded n-gram queries -> BM25 top-k
(SURVEY §2.4 E8-E11).

Scoring contract (defines the engine's truth; the naive DataFrame
scorer is the in-repo oracle and the WAND path must be rank-identical):

- The query text is analyzed with the index analyzer (same tokenizer
  code path, driver-side — reference SynonymPluginTest.java:636-638).
  Tokens group by Lucene position (cumsum of posInc); each position is
  a group of alternative terms (stacked synonyms + boundary partials).
- Per group p: df_p = max df over alternatives (Lucene SynonymQuery
  blending); tf_p(doc) = sum of the alternatives' tfs in the doc.
- idf = ln(1 + (N - df + 0.5)/(df + 0.5));
  score(doc) = sum_p idf_p * tf_p/(tf_p + k1*(1-b+b*dl/avgdl)).
- mode="and": doc must match every group (conjunctive, the
  match_phrase-shaped semantics of the reference fixtures);
  mode="or": disjunctive (classic WAND setting).
- phrase=True restricts ranking to docs passing positional-adjacency
  verification (MultiPhraseQuery semantics: Lucene ranks among
  phrase-matching docs only); verification happens inside each shard
  worker before top-k admission. count_matches() gives exact hit
  totals as a distributed aggregate (the reference's total-hits idiom)
  without materializing candidates.
- Rank determinism: (score DESC, doc_id ASC), float64 end-to-end.

Execution: the index is document-sharded; the WAND runner processes
shards in parallel (applyInPandas over shard groups), each worker
holding only the query terms' blocks for its shard — self-contained
(dl is embedded in blocks), no shuffle beyond the tiny top-k union.
Block-max pruning: docs are swept in windows; a window is decoded only
if its bound (from per-block max_tf/min_dl) can beat the kth score.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .codec import (decode_block, decode_impacts, decode_plens,
                    decode_positions, varint_decode)
from .index_store import IndexStore
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig, tokenize

# docs per pruning window. Smaller windows = finer block-max bounds
# (better pruning on saturating common terms) at more bound-sort
# overhead. The env var is read ON THE DRIVER at plan time and rides
# to executors inside the serialized QueryPlan — on a real cluster a
# driver-only env var does not reach executor Python workers, so an
# executor-side read would silently ignore the knob (results are
# exact at any window size; this is purely the perf dial).
WAND_WINDOW = int(__import__("os").environ.get(
    "SYNSPARK_WAND_WINDOW", "4096"))


# --------------------------------------------------------------------
# query analysis (E8) + _analyze debug API (E12)
# --------------------------------------------------------------------

def analyze_df(spark: SparkSession, text: str,
               cfg: TokenizerConfig | None = None,
               syn: SynonymDict | None = None) -> DataFrame:
    """The reference's `_analyze` REST surface as a DataFrame
    (SynonymPluginTest.java:438-448): token, start/end offsets,
    position."""
    cfg = cfg or TokenizerConfig()
    toks = tokenize(text, cfg, syn)
    pos = -1
    rows = []
    for w, s, e, pi in toks:
        pos += pi
        rows.append((w, s, e, pi, pos))
    return spark.createDataFrame(
        rows or [], "token string, start_offset int, end_offset int, "
                    "pos_inc int, position int")

def analyze_query(text: str, cfg: TokenizerConfig,
                  syn: SynonymDict | None) -> list[list[str]]:
    """Query text -> per-position alternative term groups."""
    toks = tokenize(text, cfg, syn)
    groups: list[list[str]] = []
    pos = -1
    for word, _s, _e, pi in toks:
        pos += pi
        while len(groups) <= pos:
            groups.append([])
        if word not in groups[pos]:
            groups[pos].append(word)
    return [g for g in groups if g]


@dataclass
class QueryPlan:
    groups: list[list[str]]     # alternative terms per position
    idfs: list[float]           # blended idf per position
    n_docs: int
    avgdl: float
    k1: float
    b: float
    # pruning-window size, resolved on the DRIVER (env knob) so it
    # reaches executors via plan serialization, not via os.environ
    window: int = WAND_WINDOW
    # boolean-query shape (ES bool / minimum_should_match):
    # kinds[i] ∈ {'m','s','n','f'} tags groups[i] as must / should /
    # must_not / filter (Lucene BooleanClause.Occur; 'f' is the ES
    # filter context — required like must, never scores like
    # must_not). None keeps the legacy mode-driven semantics
    # (mode="and" ≡ all-must, "or" ≡ all-should msm=1). msm = minimum
    # number of 's' groups a doc must match
    # (BooleanQuery.setMinimumNumberShouldMatch).
    kinds: list[str] | None = None
    msm: int = 0
    # ES match_phrase ``slop`` (Lucene SloppyPhraseScorer edit
    # distance). Plan-carried so it reaches the shard workers like
    # ``window``; only the phrase match/count path honors it.
    slop: int = 0
    # Lucene SpanNearQuery shape (two clauses): (n0, slop, in_order)
    # where groups[:n0] is clause 0's gram run and groups[n0:] is
    # clause 1's. slop counts INDEX POSITIONS between the spans
    # (NearSpans totalGap); in_order=False also admits clause-1-first
    # and overlapping spans, exactly NearSpansUnordered's
    # maxEnd − minStart − Σlen ≤ slop criterion.
    span: tuple | None = None
    # per-clause positional gates (round 6, the Lucene
    # SloppyPhraseMatcher-in-the-scorer shape): each (start, n) names a
    # contiguous slice groups[start:start+n] analyzed from ONE quoted
    # phrase; the slice's docs must ALSO satisfy exact adjacency
    # (token-graph walk, identical to ``phrase=True``'s frontier) for
    # the clause to take effect. Gate semantics follow kinds[start]:
    # 'm' — doc excluded unless the run verifies (required phrase);
    # 'n' — doc excluded IF the run verifies (negated phrase; the
    #       slice's groups never score or join not_docs — only the
    #       adjacency-verified docs are excluded);
    # 's' — the slice's group scores are REVOKED for docs where the
    #       run does not verify, and a verified run counts as the
    #       doc's admission ticket alongside the base msm (optional
    #       phrase under default_operator=or — true Lucene OR).
    # This lets query_string verify phrases inside the ONE WAND pass
    # instead of separate match_ids jobs + id-set routing.
    phrase_runs: list[tuple[int, int]] | None = None

    @property
    def terms(self) -> list[str]:
        return sorted({t for g in self.groups for t in g})

    def occur(self, mode: str) -> tuple[list[int], list[int],
                                        list[int], list[int], int]:
        """(must, should, must_not, filter group indices, msm) under
        either the explicit ``kinds`` tagging or the legacy
        ``mode``."""
        n = len(self.groups)
        if self.kinds is None:
            if mode == "and":
                return list(range(n)), [], [], [], 0
            return [], list(range(n)), [], [], max(1, self.msm)
        m = [i for i, k in enumerate(self.kinds) if k == "m"]
        s = [i for i, k in enumerate(self.kinds) if k == "s"]
        x = [i for i, k in enumerate(self.kinds) if k == "n"]
        f = [i for i, k in enumerate(self.kinds) if k == "f"]
        return m, s, x, f, self.msm


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def plan_query(spark: SparkSession, store: IndexStore, text: str,
               syn: SynonymDict | None = None,
               cfg: TokenizerConfig | None = None,
               groups: list[list[str]] | None = None) -> QueryPlan:
    """``groups`` overrides query analysis with pre-built per-position
    alternative groups — the hook for analyzers the index tokenizer
    doesn't express (e.g. the reference's msg2 shape: plain ngram
    tokenizer + synonym token FILTER at query time; build groups with
    synfilter.analyze_query_filtered)."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    if groups is None:
        groups = analyze_query(text, cfg, syn)
    terms = sorted({t for g in groups for t in g})
    dfs = store.term_dfs(spark, terms, build_id=meta.build_id)
    # scoring N = maxDoc minus docs physically removed by incremental
    # merges (Lucene: merged-away docs leave docFreq/maxDoc, unmerged
    # tombstones keep counting until their shard merges)
    n_eff = meta.n_docs - meta.n_purged
    idfs = [idf(n_eff, max((dfs.get(t, 0) for t in g), default=0))
            for g in groups]
    return QueryPlan(groups=groups, idfs=idfs, n_docs=n_eff,
                     avgdl=meta.avgdl, k1=meta.k1, b=meta.b)


def plan_bool(spark: SparkSession, store: IndexStore,
              must=None, should=None, must_not=None, filter=None,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None,
              min_should_match: int | None = None) -> QueryPlan:
    """ES ``bool`` query plan (Lucene BooleanQuery over per-position
    SynonymQuery clauses). ``must`` / ``should`` / ``must_not`` each
    accept a query text, a list of texts, or pre-built groups
    (list[list[str]]); every analyzed PER-POSITION GROUP becomes one
    clause of that kind — exactly what an ES ``match`` clause compiles
    to (a BooleanQuery of per-term subqueries), so
    ``{match: {f: {query: "a b", minimum_should_match: 2}}}`` is
    ``plan_bool(should="a b", min_should_match=2)``.

    Semantics (Lucene BooleanClause.Occur):
    - every must group is required and scores;
    - should groups are optional and score when matched; at least
      ``min_should_match`` of them must match (default: 0 when must
      clauses exist, else 1 — the ES default);
    - a doc matching ANY must_not group is excluded (match clause
      operator=or, the ES default); must_not never scores (idf 0);
    - every filter group is required but NEVER scores (the ES filter
      context / Lucene FILTER occur — idf 0, pure doc-set gate).
      min_should_match defaults follow ES exactly: 1 when should
      clauses exist with no must/filter, else 0.

    Scoring: sum of matched must+should group scores in ascending
    group order — Lucene DisjunctionSumScorer, bit-stable against the
    naive oracle's ordered fold.

    Per-clause boost (ES ``{match: {f: {query: ..., boost: 2.0}}}``,
    Lucene BoostQuery): pass a ``(clause, boost)`` tuple anywhere a
    clause is accepted — every group the clause analyzes to scores
    ×boost (folded into the group idf, so WAND bounds, the oracle and
    explain all inherit it). Boost on a must_not clause is ignored
    (it never scores, same as ES)."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)

    def gs(x) -> list[tuple[list[str], float]]:
        """[(group, boost)] for one occur kind."""
        if x is None:
            return []
        if isinstance(x, str) or (isinstance(x, tuple) and len(x) == 2
                                  and isinstance(x[1], (int, float))):
            x = [x]
        out: list[tuple[list[str], float]] = []
        for clause in x:
            boost = 1.0
            if isinstance(clause, tuple) and len(clause) == 2 \
                    and isinstance(clause[1], (int, float)):
                clause, boost = clause[0], float(clause[1])
            if boost <= 0:
                # boost 0 would zero the group's WAND bound while the
                # group still matches docs — the must/msm window gates
                # key off bound > 0, so exactness requires positive
                # boosts (ES's boost:0 relevance-kill is served by
                # must_not-free filter contexts instead)
                raise ValueError("clause boost must be > 0")
            if isinstance(clause, str):
                out.extend((g, boost)
                           for g in analyze_query(clause, cfg, syn))
            else:                      # pre-built group (list[str])
                out.append((list(clause), boost))
        return out

    mg, sg, xg, fg = gs(must), gs(should), gs(must_not), gs(filter)
    if not (mg or sg or fg):
        raise ValueError("bool query needs at least one must, should "
                         "or filter clause (pure must_not matches "
                         "everything-but — unbounded)")
    tagged = mg + sg + xg + fg
    groups = [g for g, _b in tagged]
    boosts = [b for _g, b in tagged]
    kinds = ["m"] * len(mg) + ["s"] * len(sg) + ["n"] * len(xg) \
        + ["f"] * len(fg)
    terms = sorted({t for g in groups for t in g})
    dfs = store.term_dfs(spark, terms, build_id=meta.build_id)
    n_eff = meta.n_docs - meta.n_purged
    idfs = [0.0 if k in "nf" else
            bo * idf(n_eff, max((dfs.get(t, 0) for t in g), default=0))
            for g, k, bo in zip(groups, kinds, boosts)]
    msm = (min_should_match if min_should_match is not None
           else (1 if (sg and not mg and not fg) else 0))
    if msm > len(sg):
        raise ValueError(f"min_should_match={msm} exceeds the "
                         f"{len(sg)} should clauses")
    return QueryPlan(groups=groups, idfs=idfs, n_docs=n_eff,
                     avgdl=meta.avgdl, k1=meta.k1, b=meta.b,
                     kinds=kinds, msm=msm)


# --------------------------------------------------------------------
# decoded postings view (shared by the naive oracle)
# --------------------------------------------------------------------

def _postings_blocks(spark: SparkSession, store: IndexStore,
                     terms: list[str],
                     doc_ids: list[int] | None = None) -> DataFrame:
    """Block rows feeding decoded_postings, with the optional doc-range
    predicate applied at block metadata (exposed for plan tests)."""
    blocks = store.segments(spark).filter(F.col("term").isin(terms)) \
        .select("term", "first_doc", "last_doc", "n_docs", "doc_bytes",
                "tf_bytes", "dl_bytes")
    if doc_ids is not None:
        cond = None
        for d in doc_ids:
            c = (F.col("first_doc") <= d) & (F.col("last_doc") >= d)
            cond = c if cond is None else (cond | c)
        blocks = blocks.filter(cond)
    return blocks


def decoded_postings(spark: SparkSession, store: IndexStore,
                     terms: list[str],
                     doc_ids: list[int] | None = None) -> DataFrame:
    """Blocks for ``terms`` -> flat (term, doc_id, tf, dl) DataFrame.
    The parquet scan prunes on term via row-group stats (files are
    sorted by term within each shard).

    ``doc_ids`` restricts to specific documents and — the point — is
    pushed to BLOCK METADATA before any decode: only blocks whose
    [first_doc, last_doc] range covers a requested doc are read
    (predicate on the block row) or decoded (mask inside the worker).
    explain_score's cost drops from every-block-of-every-query-term
    (linear in df) to ~one block per term (round-3 verdict, wrong #2)."""
    blocks = _postings_blocks(spark, store, terms, doc_ids)
    want = np.asarray(sorted(doc_ids), dtype=np.int64) \
        if doc_ids is not None else None

    def run(batches):
        for pdf in batches:
            outs = {"term": [], "doc_id": [], "tf": [], "dl": []}
            for t, fd, nd, db, tb, lb in zip(
                    pdf["term"], pdf["first_doc"], pdf["n_docs"],
                    pdf["doc_bytes"], pdf["tf_bytes"], pdf["dl_bytes"]):
                docs, tfs = decode_block(fd, db, tb, nd)
                dls = varint_decode(lb, nd).astype(np.int64)
                if want is not None:
                    m = np.isin(docs, want)
                    docs, tfs, dls = docs[m], tfs[m], dls[m]
                    nd = len(docs)
                outs["term"].extend([t] * nd)
                outs["doc_id"].append(docs)
                outs["tf"].append(tfs)
                outs["dl"].append(dls)
            yield pd.DataFrame({
                "term": outs["term"],
                "doc_id": np.concatenate(outs["doc_id"]) if outs["doc_id"]
                else np.zeros(0, np.int64),
                "tf": np.concatenate(outs["tf"]) if outs["tf"]
                else np.zeros(0, np.int64),
                "dl": np.concatenate(outs["dl"]) if outs["dl"]
                else np.zeros(0, np.int64),
            })

    return blocks.mapInPandas(
        run, schema="term string, doc_id long, tf long, dl long")


# --------------------------------------------------------------------
# naive DataFrame scorer — the oracle (E10 fallback path)
# --------------------------------------------------------------------

def score_matches(spark: SparkSession, store: IndexStore, text: str,
                  mode: str = "and",
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  postings: DataFrame | None = None,
                  groups: list[list[str]] | None = None,
                  plan: QueryPlan | None = None,
                  doc_where: str | None = None) -> DataFrame:
    """Score EVERY matching live doc — the un-truncated frame
    ``(doc_id, score, ng)`` feeding score-all consumers (field
    collapse, top_hits/sampler aggregations, function_score rerank):
    exactly what an ES search with aggregations does, where the
    collector must visit all matches so WAND-style early termination
    is off by contract. Decode is still restricted to the QUERY terms'
    postings (O(Σ df), the information-theoretic floor for exact
    score-all), the group map is broadcast, and the per-doc aggregate
    is a partial-agg hash shuffle bounded by matching docs — never the
    corpus. ``ng`` is the number of distinct matched groups (the
    coordination count downstream msm/AND gates reuse).

    Score accumulation is the same ascending-gid ordered fold the WAND
    worker uses, so scores are bit-identical to ``search`` for the
    same doc (fuzz-pinned rank identity).

    ``postings`` may inject an alternative (term, doc_id, tf, dl) source
    (e.g. pre-encoding postings in tests, proving codec round-trip).
    ``groups`` overrides analysis, same as ``search(groups=...)``.
    ``plan`` overrides analysis entirely (the bool-query oracle hook:
    a kinds-tagged plan from ``plan_bool``/``_apply_msm`` gets the
    declarative must/should/must_not + minimum_should_match gates —
    the in-repo cross-check for ``search_bool``).
    """
    if plan is None:
        plan = plan_query(spark, store, text, syn, cfg, groups)
    if not plan.groups:
        return spark.createDataFrame(
            [], "doc_id long, score double, ng int")
    p = postings if postings is not None else \
        decoded_postings(spark, store, plan.terms)

    gm = [(t, gi, plan.idfs[gi]) for gi, g in enumerate(plan.groups)
          for t in g]
    group_map = spark.createDataFrame(gm, "term string, gid int, gidf double")

    k1, b, avgdl = plan.k1, plan.b, plan.avgdl
    per_group = (
        p.join(F.broadcast(group_map), "term")
        .groupBy("doc_id", "gid")
        .agg(F.sum("tf").alias("tfg"), F.first("dl").alias("dl"),
             F.first("gidf").alias("gidf"))
        # association matters at the ULP: WAND computes idf * (tf/denom)
        # (and its block bound equals exactly that when max_tf/min_dl
        # coincide with a doc's tf/dl — the float-safe equality). The
        # oracle must parenthesize identically or ~20% of docs diverge
        # by 1 ULP and near-ties rank-split (latent until a delete
        # exposed the tail of the top-k; round-4 fix, fuzz-pinned).
        .withColumn("gscore",
                    F.col("gidf") * (F.col("tfg") /
                    (F.col("tfg") + F.lit(k1) *
                     (F.lit(1 - b) + F.lit(b) * F.col("dl")
                      / F.lit(avgdl)))))
    )
    # deterministic summation: left-fold gscores in ascending gid order,
    # bit-identical to the WAND worker's accumulation (float addition is
    # non-associative; unordered SUM would diverge at the ULP level and
    # break rank-identity on near-ties)
    agg = per_group.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("gid", "gscore"))),
            F.lit(0.0),
            lambda acc, x: acc + x["gscore"],
        ).alias("score"),
        F.collect_set("gid").alias("gids"))
    if plan.kinds is not None:
        # ES bool gates, fully declarative (Catalyst folds the tiny
        # literal arrays): must ⊆ matched, |matched ∩ should| ≥ msm,
        # matched ∩ must_not = ∅. Not-group gscores are 0.0 (idf 0) so
        # the ordered fold above is bit-identical to the WAND worker's
        # musts+shoulds accumulation (x + 0.0 == x for finite x).
        musts, shoulds, nots, filts, msm = plan.occur(mode)

        def _cnt(ids: list[int]):
            return F.size(F.array_intersect(
                F.col("gids"), F.array(*[F.lit(i) for i in ids])))

        if musts:
            agg = agg.filter(_cnt(musts) == len(musts))
        if filts:
            agg = agg.filter(_cnt(filts) == len(filts))
        if shoulds and msm >= 1:
            agg = agg.filter(_cnt(shoulds) >= msm)
        if nots:
            agg = agg.filter(_cnt(nots) == 0)
    elif mode == "and":
        agg = agg.filter(F.size("gids") == len(plan.groups))
    if store.meta().delete_batches:
        # liveDocs anti-join before the top-k cut (stats above already
        # include deleted docs — Lucene pre-merge semantics)
        agg = agg.join(store.deletes(spark), "doc_id", "left_anti")
    if doc_where is not None:
        # doc-values filter, declaratively: semi-join the docmap rows
        # passing the predicate before the top-k cut (scoring stats
        # unchanged — filters never affect idf/avgdl, exactly ES)
        agg = agg.join(store.docmap(spark).filter(doc_where)
                       .select("doc_id"), "doc_id", "left_semi")
    return agg.select("doc_id", "score",
                      F.size("gids").cast("int").alias("ng"))


def score_naive(spark: SparkSession, store: IndexStore, text: str,
                k: int = 10, mode: str = "and",
                syn: SynonymDict | None = None,
                cfg: TokenizerConfig | None = None,
                postings: DataFrame | None = None,
                groups: list[list[str]] | None = None,
                plan: QueryPlan | None = None,
                doc_where: str | None = None) -> DataFrame:
    """Pure declarative BM25 top-k: ``score_matches`` + orderBy/limit.
    Catalyst handles partial aggregation and the top-k sort; this is
    the cross-check for WAND."""
    return (score_matches(spark, store, text, mode, syn, cfg, postings,
                          groups, plan, doc_where)
            .select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


# --------------------------------------------------------------------
# block-max WAND (E10 primary path)
# --------------------------------------------------------------------

def _deletes_by_shard(spark: SparkSession, store: IndexStore,
                      meta=None) -> DataFrame | None:
    """Tombstoned doc_ids routed to their shard — (shard, doc_id), or
    None when the index has no committed deletes (the common case: the
    query plan is then byte-identical to a delete-free engine). Routing
    is a broadcast range join against the tiny shard-range frame —
    tombstones flow executor-to-executor, never through the driver, and
    each shard worker receives only ITS tombstones (Lucene's
    per-segment liveDocs shape)."""
    meta = meta or store.meta()
    if not meta.delete_batches:
        return None
    # fast path: every delete commit since v8 also wrote a shard-routed
    # mirror, so the hot serving path is a plain parquet scan — no
    # range join, no shard_doc_ranges job per query (round-4 task #5)
    routed = store.deletes_routed(spark)
    if routed is not None:
        return routed
    ranges = store.shard_doc_ranges(spark)
    return (store.deletes(spark)
            .join(F.broadcast(ranges),
                  (F.col("doc_id") >= F.col("lo"))
                  & (F.col("doc_id") <= F.col("hi")))
            .select("shard", "doc_id"))


def _del_array(right: pd.DataFrame) -> np.ndarray | None:
    return np.sort(right["doc_id"].to_numpy().astype(np.int64)) \
        if len(right) else None


# Lucene keeps liveDocs RESIDENT per segment; the analogue here is a
# broadcast of the (small) routed tombstone map instead of a per-query
# cogroup exchange. Above this many tombstones (~4 MB of int64 ids)
# queries fall back to the cogroup — bounded driver/executor memory,
# and the measured cogroup cost at millions of tombstones is the
# documented merge-policy trigger anyway.
DELETES_BROADCAST_MAX = int(__import__("os").environ.get(
    "SYNSPARK_DELETES_BROADCAST_MAX", "262144"))


def _deletes_runtime(spark: SparkSession, store: IndexStore, meta=None):
    """How this query applies tombstones:
    - None: no committed deletes — plan identical to a delete-free
      engine;
    - ("map", Broadcast[{shard: sorted int64 ids}]): small tombstone
      sets ride a Spark broadcast into the single-sided grouped map
      (no cogroup, no second shuffle) — Lucene's resident liveDocs;
      cached on the store per (build_id, delete commits), so serving
      loops pay the one tiny collect once;
    - ("df", DataFrame): large sets keep the routed-cogroup path.
    """
    meta = meta or store.meta()
    if not meta.delete_batches:
        return None
    if meta.n_deleted <= DELETES_BROADCAST_MAX:
        key = (meta.build_id, tuple(meta.delete_batches))
        cached = getattr(store, "_dels_bcast", None)
        if cached is not None and cached[0] == key:
            return ("map", cached[1])
        rows = _deletes_by_shard(spark, store, meta).collect()
        m: dict[int, list] = {}
        for r in rows:
            m.setdefault(int(r["shard"]), []).append(int(r["doc_id"]))
        bc = spark.sparkContext.broadcast(
            {s: np.sort(np.asarray(v, np.int64)) for s, v in m.items()})
        store._dels_bcast = (key, bc)
        return ("map", bc)
    return ("df", _deletes_by_shard(spark, store, meta))


def _route_ids(spark: SparkSession, store: IndexStore,
               ids: DataFrame):
    """Route an arbitrary ``doc_id`` frame to its shards and pick the
    liveDocs delivery shape: ("map", Broadcast[{shard: sorted ids}])
    when the set fits the resident-bitset budget, else
    ("df", (shard, doc_id)) riding the executor-to-executor cogroup.
    Shared by the doc-values allowlist and the query_string
    phrase-gate / phrase-exclusion id sets."""
    ranges = store.shard_doc_ranges(spark)
    routed = (ids.join(F.broadcast(ranges),
                       (F.col("doc_id") >= F.col("lo"))
                       & (F.col("doc_id") <= F.col("hi")))
              .select("shard", "doc_id"))
    # ONE job decides the delivery shape AND feeds the broadcast: a
    # limit(MAX+1) collect — a separate count() would recompute the
    # whole id-set job (for a phrase gate that's a full match pass)
    # just to learn the size. Only the rare over-budget set pays a
    # second (cogroup-side) evaluation.
    rows = routed.limit(DELETES_BROADCAST_MAX + 1).collect()
    if len(rows) <= DELETES_BROADCAST_MAX:
        m: dict[int, list] = {}
        for r in rows:
            m.setdefault(int(r["shard"]), []).append(int(r["doc_id"]))
        bc = spark.sparkContext.broadcast(
            {s: np.sort(np.asarray(v, np.int64)) for s, v in m.items()})
        return ("map", bc)
    return ("df", routed)


def _allow_runtime(spark: SparkSession, store: IndexStore, meta,
                   doc_where: str | None,
                   allow_df: DataFrame | None = None):
    """Doc-values filter (ES term/terms/range queries on keyword /
    numeric metadata fields, run in the bool FILTER context): resolve
    ``doc_where`` — a Spark SQL boolean expression over docmap columns
    (repo, path, commit, lang, ...) — to a per-shard doc-id ALLOWLIST,
    routed exactly like liveDocs (Lucene evaluates filters per segment
    and intersects the bitset during scoring; this is that shape).

    Returns None (no filter), ("map", Broadcast[{shard: sorted ids}])
    for selective filters, or ("df", (shard, doc_id) DataFrame) for
    large allowlists — which then ride the executor-to-executor
    cogroup, never the driver. The docmap scan pushes ``doc_where``
    into parquet (predicate pushdown on the metadata columns).

    Scale note: allowlist volume is proportional to filter
    selectivity. A highly UNSELECTIVE filter (e.g. 20% of a 10^12-doc
    corpus) is the wrong plan shape for an id list in any engine —
    deploy those as separate per-tenant indexes (the ES
    index-per-tenant idiom) or accept the one bounded shuffle of the
    cogroup path. Stale docmap rows (docs already purged by merges)
    are harmless here: an allow id with no postings simply never
    matches.

    ``allow_df`` (a ``doc_id`` frame, e.g. the ids matching a
    query_string must-phrase) intersects with the ``doc_where``
    allowlist — both gates must hold. Per-commit caching applies only
    to the pure-predicate form; id-frame gates are query-specific.

    Cached on the store per (build_id, docmap generation, predicate)
    so serving loops pay the resolve once per commit."""
    if doc_where is None and allow_df is None:
        return None
    key = (meta.build_id, meta.n_docs, meta.n_purged,
           tuple(meta.delete_batches), str(doc_where))
    if allow_df is None:
        cached = getattr(store, "_allow_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
    if doc_where is not None:
        ids = store.docmap(spark).filter(doc_where).select("doc_id")
        if allow_df is not None:
            ids = ids.join(allow_df.select("doc_id").distinct(),
                           "doc_id", "semi")
    else:
        ids = allow_df.select("doc_id").distinct()
    rt = _route_ids(spark, store, ids)
    if allow_df is None:
        store._allow_cache = (key, rt)
    return rt


_EMPTY_IDS = np.zeros(0, np.int64)


def _merge_ids(a: np.ndarray | None,
               b: np.ndarray | None) -> np.ndarray | None:
    """Sorted union of two optional sorted id arrays (liveDocs mask ∪
    query-level exclusion set)."""
    if a is None:
        return b
    if b is None or not len(b):
        return a
    return np.union1d(a, b)


def _masked_apply(spark: SparkSession, store: IndexStore, meta,
                  blocks: DataFrame, fn, schema: str,
                  doc_where: str | None = None,
                  allow_df: DataFrame | None = None,
                  exclude_df: DataFrame | None = None) -> DataFrame:
    """Shared shard-parallel runner for every match/score path: calls
    ``fn(pdf, deleted, allowed)`` per shard with the liveDocs mask and
    the optional doc-values allowlist routed in.

    Plan shapes (identical to the historical per-path code when no
    filter is given, so delete-free plans stay byte-identical to a
    delete-free engine):
    - no mask needs a frame: single-sided grouped map, masks via 0-2
      tiny broadcasts;
    - any mask too large to broadcast: ONE cogroup against the union
      frame (shard, doc_id, allow) — flagged rows split back out in
      the worker; the other mask may still ride its broadcast.

    ``allow_df`` intersects the doc_where allowlist (see
    _allow_runtime); ``exclude_df`` is a query-level doc-id EXCLUSION
    set (query_string must_not phrases) that merges into the liveDocs
    mask inside each worker — to the matcher an excluded doc is
    indistinguishable from a deleted one."""
    rt = _deletes_runtime(spark, store, meta)
    art = _allow_runtime(spark, store, meta, doc_where, allow_df)
    ert = _route_ids(spark, store,
                     exclude_df.select("doc_id").distinct()) \
        if exclude_df is not None else None
    has_allow = art is not None
    del_bc = rt[1] if rt is not None and rt[0] == "map" else None
    al_bc = art[1] if has_allow and art[0] == "map" else None
    ex_bc = ert[1] if ert is not None and ert[0] == "map" else None
    has_excl_df = ert is not None and ert[0] == "df"
    rights = []
    if rt is not None and rt[0] == "df":
        rights.append(rt[1].select(
            "shard", "doc_id", F.lit(False).alias("allow")))
    if has_excl_df:
        rights.append(ert[1].select(
            "shard", "doc_id", F.lit(False).alias("allow")))
    if has_allow and art[0] == "df":
        rights.append(art[1].select(
            "shard", "doc_id", F.lit(True).alias("allow")))

    if not rights:
        def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
            sh = int(key[0])
            deleted = del_bc.value.get(sh) if del_bc is not None \
                else None
            if ex_bc is not None:
                deleted = _merge_ids(deleted, ex_bc.value.get(sh))
            # a filtered query's shard with no allow entries matches
            # NOTHING — empty array, never None
            allowed = (al_bc.value.get(sh, _EMPTY_IDS)
                       if al_bc is not None else None)
            return fn(pdf, deleted, allowed)

        return _fanout(blocks).groupBy("shard").applyInPandas(
            run, schema=schema)

    right = rights[0]
    for extra in rights[1:]:
        right = right.unionByName(extra)

    def run2(key, left: pd.DataFrame,
             rp: pd.DataFrame) -> pd.DataFrame:
        sh = int(key[0])
        deleted = del_bc.value.get(sh) if del_bc is not None else None
        if (rt is not None and del_bc is None) or has_excl_df:
            d = rp[~rp["allow"]] if len(rp) else rp
            deleted = _merge_ids(deleted, _del_array(d))
        if ex_bc is not None:
            deleted = _merge_ids(deleted, ex_bc.value.get(sh))
        if not has_allow:
            allowed = None
        elif al_bc is not None:
            allowed = al_bc.value.get(sh, _EMPTY_IDS)
        else:
            a = rp[rp["allow"]] if len(rp) else rp
            allowed = np.sort(a["doc_id"].to_numpy().astype(np.int64))
        return fn(left, deleted, allowed)

    return (_fanout(blocks).groupBy("shard")
            .cogroup(_fanout(right).groupBy("shard"))
            .applyInPandas(run2, schema=schema))


def _fanout(df: DataFrame, key: str = "shard") -> DataFrame:
    """Pin the grouped-map exchange to a real fan-out. AQE's
    post-shuffle coalescing sees only the tiny encoded-blocks shuffle
    (tens of MB at 10M docs) and folds the applyInPandas stage into
    ONE task — serializing every shard worker through a single Python
    process (measured: the 10M synonym flood spent 11.5s of worker
    time strictly serially; the scan stage's 800 tasks masked it).
    A USER-SPECIFIED repartition is exempt from AQE coalescing, so
    grouping on its output keeps defaultParallelism tasks — one wave
    of real parallel workers. Groups (shards) hash uniformly; fewer
    groups than tasks just leaves cheap empty tasks."""
    spark = df.sparkSession
    n = max(1, spark.sparkContext.defaultParallelism)
    return df.repartition(n, key)


def _wand_shard(pdf: pd.DataFrame, plan: QueryPlan, k: int, mode: str,
                phrase: bool = False,
                deleted: np.ndarray | None = None,
                after: tuple | None = None,
                allowed: np.ndarray | None = None) -> pd.DataFrame:
    """Exact top-k for one shard. Windowed block-max pruning: windows
    are visited in descending upper bound; a window is decoded only if
    its bound beats the running kth-best score.

    ``phrase=True`` verifies positional adjacency (MultiPhraseQuery —
    some alternative of every query position at consecutive index
    positions) INSIDE the worker, per window, BEFORE top-k admission:
    ranking is among phrase-matching docs only (Lucene semantics), all
    shard-local — no candidate set ever leaves the executor."""
    n_groups = len(plan.groups)
    # ES bool / minimum_should_match occur tags (plan.kinds=None keeps
    # the legacy mode-driven all-must / all-should shapes bit-for-bit)
    musts, shoulds, nots, filts, msm = plan.occur(mode)
    must_set, not_set = set(musts), set(nots)
    filt_set = set(filts)
    # per-clause positional gates (see QueryPlan.phrase_runs): which
    # group slices need an adjacency walk, and with which semantics
    runs = plan.phrase_runs or []
    run_gis = {gi for s, n in runs for gi in range(s, s + n)}
    srun_gis = {gi for s, n in runs if s in set(shoulds)
                for gi in range(s, s + n)}

    # organize blocks per group; block upper bound from (max_tf, min_dl)
    first = pdf["first_doc"].to_numpy()
    last = pdf["last_doc"].to_numpy()
    mtf = pdf["max_tf"].to_numpy().astype(np.float64)
    mdl = pdf["min_dl"].to_numpy().astype(np.float64)
    maxn = mtf / (mtf + plan.k1 * (1 - plan.b + plan.b * mdl / plan.avgdl))
    lo = int(first.min())
    hi = int(last.max())
    # One window size for every mode, measured BOTH ways on the
    # 10M-doc index (BENCH/BASELINE.md round 4): a first probe on a
    # vocabulary-mismatched query (empty AND intersection) suggested
    # finer AND windows — but that only sharpened the dead-window skip
    # on a query where every window is dead. Re-probed on real-hit
    # queries (410k matching docs), finer windows are strictly worse
    # in both modes (6.0s vs 3.5s for AND at w/4: per-window decode
    # call overhead, no extra pruning when every group is everywhere).
    # SYNSPARK_WAND_WINDOW stays the operator knob (plan-carried).
    win = plan.window or WAND_WINDOW
    n_win = (hi - lo) // win + 1

    # Per-group, per-window upper bound — the MIN of two valid bounds:
    #
    # (1) subadditive: idf * min(1, Σ_terms max_block_tfnorm). Within
    #     one term: max of its blocks' (max_tf, min_dl) tfnorm. Across
    #     a group's alternatives the blended tf SUMS and tfnorm is
    #     subadditive with sup 1.0. Same shape as Lucene's
    #     SynonymQuery bound — valid but an over-estimate that is
    #     never ATTAINED by a real doc, so the tie-aware window skip
    #     below could not fire for multi-alternative groups.
    # (2) blended (round-4 verdict task #3): the group score is
    #     idf * f(Σ_t tf_t, dl) with f(x, dl) monotone in x and
    #     antitone in dl, so idf * f(Σ_t wmax_tf_t, wmin_dl) bounds it
    #     — computed from the same per-window (max_tf, min_dl)
    #     metadata, mirroring the scoring expression BIT-EXACTLY. On
    #     the saturating-tie worst case (the reference's own fixture
    #     shape at scale: thousands-to-millions of IDENTICAL docs,
    #     SynonymPluginTest.java:133-161) every doc attains every
    #     term's window max and the window min dl simultaneously, so
    #     this bound EQUALS the tied score and the tie-aware skip
    #     prunes the flood after the first k admissions — the fix
    #     Lucene needed quantized impacts for falls out of window
    #     metadata here.
    #
    # Neither bound dominates: (2) can exceed (1) when one alternative
    # lives only in long-doc blocks (its own min_dl ≫ the group's),
    # (1) exceeds (2) whenever Σ f(a_t) > f(Σ a_t) binds (common —
    # that's subadditivity). min of two valid bounds is valid.
    # vectorized block-metadata fold: per-(term, window) aggregates
    # via factorized codes + scatter .at updates (a per-row Python
    # loop here was ~30µs/row — at 16 queries × 800 shards × ~900
    # rows it was the batch-serving ceiling)
    codes, uterm_arr = pd.factorize(pdf["term"])
    codes = codes.astype(np.int64)
    uterms = {t: i for i, t in enumerate(uterm_arr)}
    mtf_i = pdf["max_tf"].to_numpy().astype(np.int64)
    mdl_i = pdf["min_dl"].to_numpy().astype(np.int64)
    nT = len(uterms)
    ub_term = np.zeros(nT * n_win)
    mtf_term = np.zeros(nT * n_win, dtype=np.int64)
    mdl_term = np.full(nT * n_win, np.iinfo(np.int64).max,
                       dtype=np.int64)
    w0a = (first - lo) // win
    w1a = (last - lo) // win
    flat = codes * n_win + w0a
    one = w0a == w1a                      # almost every block: one window
    np.maximum.at(ub_term, flat[one], maxn[one])
    np.maximum.at(mtf_term, flat[one], mtf_i[one])
    np.minimum.at(mdl_term, flat[one], mdl_i[one])
    for i in np.flatnonzero(~one):        # rare window-spanning blocks
        s = slice(codes[i] * n_win + w0a[i], codes[i] * n_win + w1a[i] + 1)
        np.maximum(ub_term[s], maxn[i], out=ub_term[s])
        np.maximum(mtf_term[s], mtf_i[i], out=mtf_term[s])
        np.minimum(mdl_term[s], mdl_i[i], out=mdl_term[s])
    ub_term = ub_term.reshape(nT, n_win)
    mtf_term = mtf_term.reshape(nT, n_win)
    mdl_term = mdl_term.reshape(nT, n_win)

    rows_by_ti = {ti: np.flatnonzero(codes == ti) for ti in range(nT)}
    blk_rows_by_gid: list[np.ndarray] = [
        np.sort(np.concatenate(
            [rows_by_ti[uterms[t]] for t in g if t in uterms] or
            [np.zeros(0, np.int64)]))
        for g in plan.groups]

    # quantized impacts (v8): decode EVERY block's pareto pairs with
    # ONE vectorized varint pass over the concatenated buffers (per-row
    # decode_impacts calls were ~8µs each — another batch ceiling), then
    # per-(term, window) slices by binary search (a term's blocks are
    # doc-disjoint, so first_doc and last_doc are both sorted). A block
    # without impacts (pre-v8) poisons its (term, window)s -> fallback.
    has_imp = "imp_bytes" in pdf.columns
    imp_f: list = [None] * len(pdf)
    imp_d: list = [None] * len(pdf)
    if has_imp:
        bufs = pdf["imp_bytes"].tolist()
        present = [i for i, b in enumerate(bufs) if b is not None]
        if present:
            allv = varint_decode(
                b"".join(bufs[i] for i in present)).astype(np.int64)
            pos = 0
            for i in present:
                p = int(allv[pos])
                imp_f[i] = allv[pos + 1:pos + 1 + p]
                imp_d[i] = allv[pos + 1 + p:pos + 1 + 2 * p]
                pos += 1 + 2 * p
    ti_first: dict[int, tuple] = {}
    for ti, rws in rows_by_ti.items():
        o = np.argsort(first[rws], kind="stable")
        rws = rws[o]
        ti_first[ti] = (rws, first[rws], last[rws])

    def _impact_bound(rows: list[int], w: int) -> float | None:
        """max over breakpoint dls d of f(Σ_t F_t(d), d), where F_t(d)
        = the largest pareto tf among term t's pairs with dl <= d — a
        true upper bound (every posting is dominated by a pair; f is
        monotone in tf, antitone in dl), attained whenever one doc
        population supplies every term's F at its own dl. Expression
        mirrors the scorer bit-exactly. None => no impact data for
        some present term (pre-v8 block): caller keeps other bounds."""
        d0, d1 = lo + w * win, lo + (w + 1) * win
        fts = []
        ds = []
        for ti in rows:
            rws, fs_, ls_ = ti_first[ti]
            j0 = np.searchsorted(ls_, d0)
            j1 = np.searchsorted(fs_, d1)
            sel = rws[j0:j1]
            if len(sel) == 0:
                continue               # term absent in window: F_t = 0
            fls = [imp_f[r] for r in sel]
            if any(x is None for x in fls):
                return None
            f = np.concatenate(fls)
            d = np.concatenate([imp_d[r] for r in sel])
            o = np.lexsort((f, d))
            d, f = d[o], f[o]
            fc = np.maximum.accumulate(f)
            fts.append((d, fc))
            ds.append(d)
        if not ds:
            return 0.0
        D = np.unique(np.concatenate(ds))
        tsum = np.zeros(len(D), dtype=np.int64)
        for d_arr, fc in fts:
            idx = np.searchsorted(d_arr, D, side="right") - 1
            tsum += np.where(idx >= 0, fc[np.maximum(idx, 0)], 0)
        tf_f = tsum.astype(np.float64)
        dl_f = D.astype(np.float64)
        bd = tf_f / (tf_f + plan.k1 *
                     (1 - plan.b + plan.b * dl_f / plan.avgdl))
        return float(bd.max())

    ub = np.zeros((n_groups, n_win))
    # per-(group, window) PRESENCE — required-group (must/filter)
    # window gates and the m-of-n gate key off this, independent of
    # scoring (a filter group scores 0 but still gates windows)
    pres = np.zeros((n_groups, n_win), dtype=bool)
    for gi, g in enumerate(plan.groups):
        rows = [uterms[t] for t in g if t in uterms]
        if not rows:
            continue
        if gi in not_set or gi in filt_set:
            # never scores: ub row stays 0; filters keep presence
            if gi in filt_set:
                pres[gi] = ub_term[rows].sum(axis=0) > 0
            continue
        pres[gi] = ub_term[rows].sum(axis=0) > 0
        bound = np.minimum(ub_term[rows].sum(axis=0), 1.0)
        if len(rows) > 1:
            # blended bound, expression mirroring the scorer below
            # (tfn = utf / (utf + k1*(1-b+b*udl/avgdl))) so that when
            # a doc attains (Σ wmax_tf, wmin_dl) the bound is the
            # bit-identical float — equality, not 1-ULP-off, which
            # would otherwise risk pruning a tie out of rank order.
            # Absent terms contribute tf 0 and an int64-max dl
            # sentinel; an all-absent window divides 0 by +inf-ish
            # and stays 0.
            ts = mtf_term[rows].sum(axis=0).astype(np.float64)
            dl = mdl_term[rows].min(axis=0).astype(np.float64)
            blended = ts / (ts + plan.k1 *
                            (1 - plan.b + plan.b * dl / plan.avgdl))
            np.minimum(bound, blended, out=bound)
        if has_imp:
            # impact bound: sharper than both on mixed-population
            # windows (the (max_tf, min_dl) chimera never occurs in a
            # real doc there); min of valid bounds is valid
            for w in np.flatnonzero(bound > 0):
                ibw = _impact_bound(rows, int(w))
                if ibw is not None and ibw < bound[w]:
                    bound[w] = ibw
        ub[gi] = plan.idfs[gi] * bound

    req = musts + filts
    if req:
        # a window missing any required (must/filter) group can't match
        alive = pres[req].all(axis=0)
    else:
        alive = np.ones(n_win, dtype=bool)
    if shoulds and msm >= 1 and (req or msm > 1):
        # m-of-n: a window where fewer than msm should groups have any
        # posting can't produce a match (group absent in window ⇒
        # absent in every doc of the window). Skipped for the trivial
        # pure-should msm=1 case (win_ub > 0 already implies it).
        alive &= pres[shoulds].sum(axis=0) >= msm
    win_ub = ub.sum(axis=0) * alive

    order = np.argsort(-win_ub, kind="stable")
    # bounded top-k state: min-heap of (score, -doc_id) — root is the
    # WORST kept hit under the (score DESC, doc_id ASC) rank order, so
    # heappushpop keeps exactly the k best regardless of k (no
    # sort-per-window, no unbounded list)
    heap: list[tuple[float, int]] = []
    theta = -1.0

    k1, b, avgdl = plan.k1, plan.b, plan.avgdl

    has_pl = "pl_bytes" in pdf.columns

    ndocs_arr = pdf["n_docs"].to_numpy().astype(np.int64)
    doc_bytes_l = pdf["doc_bytes"].tolist()
    tf_bytes_l = pdf["tf_bytes"].tolist()
    dl_bytes_l = pdf["dl_bytes"].tolist()

    def decode_group_window(gi: int, d0: int, d1: int, want_pos: bool):
        """decoded merged postings of group gi limited to [d0, d1);
        with ``want_pos`` also the flat (doc, position, pos_len)
        occurrence arrays (union over the group's alternative
        terms).

        All selected blocks decode in ONE varint pass per stream
        (buffers concatenated, segmented cumsum re-anchors each block
        at its first_doc): per-block decode calls were ~40µs of fixed
        numpy overhead each — the batch-serving ceiling once pruning
        removed the large decodes."""
        rows = blk_rows_by_gid[gi]
        sel = rows[(first[rows] < d1) & (last[rows] >= d0)]
        if len(sel) == 0:
            z = np.zeros(0, np.int64)
            return z, z, z, z, z, z
        counts = ndocs_arr[sel]
        ends = np.cumsum(counts)
        starts = ends - counts
        gaps = varint_decode(
            b"".join(doc_bytes_l[i] for i in sel)).astype(np.int64)
        # segmented cumsum: blocks encode gap 0 at their start, so the
        # running sum minus its value at each block boundary, plus the
        # block's first_doc, recovers absolute ids
        acc = np.cumsum(gaps)
        base = np.repeat(acc[starts] - gaps[starts], counts)
        docs = acc - base + np.repeat(first[sel], counts)
        tfs = varint_decode(
            b"".join(tf_bytes_l[i] for i in sel)).astype(np.int64)
        dls = varint_decode(
            b"".join(dl_bytes_l[i] for i in sel)).astype(np.int64)
        m = (docs >= d0) & (docs < d1)
        pdocs_all, pvals_all, plens_all = [], [], []
        if want_pos:
            # positions stay per-block (phrase-only path; per-doc
            # delta chains need per-block tf alignment)
            for j, i in enumerate(sel):
                mb = m[starts[j]:ends[j]]
                if not mb.any():
                    continue
                tfb = tfs[starts[j]:ends[j]]
                docb = docs[starts[j]:ends[j]]
                pos = decode_positions(pdf["pos_bytes"].iat[i], tfb)
                pl = decode_plens(pdf["pl_bytes"].iat[i] if has_pl
                                  else None, tfb)
                mk = np.repeat(mb, tfb)
                pdocs_all.append(np.repeat(docb, tfb)[mk])
                pvals_all.append(pos[mk])
                plens_all.append(pl[mk])
        docs = docs[m]
        tfs = tfs[m]
        dls = dls[m]
        if len(docs) == 0:
            z = np.zeros(0, np.int64)
            return z, z, z, z, z, z
        # merge alternatives: sum tf per doc
        udocs, inv = np.unique(docs, return_inverse=True)
        utf = np.zeros(len(udocs), np.int64)
        np.add.at(utf, inv, tfs)
        udl = np.zeros(len(udocs), np.int64)
        udl[inv] = dls
        z = np.zeros(0, np.int64)
        pdocs = np.concatenate(pdocs_all) if pdocs_all else z
        pvals = np.concatenate(pvals_all) if pvals_all else z
        plens = np.concatenate(plens_all) if plens_all else z
        return udocs, utf, udl, pdocs, pvals, plens

    for w in order:
        bound = float(win_ub[w])
        # strict < so exact score ties (identical docs) are never pruned
        # away from the doc_id ASC tie-break — rank-identity guarantee
        if bound <= 0 or (len(heap) >= k and bound < theta):
            continue  # pruned: window can't beat current top-k
        if len(heap) >= k and bound == theta and lo + w * win > -heap[0][1]:
            # tie-aware skip: the bound EQUALS the kth score, so this
            # window can only produce ties — and under (score DESC,
            # doc_id ASC) a tie enters only with a SMALLER id than the
            # kth item's; every doc here starts past it. Exact and
            # free. Scope note: fires only when the bound is ATTAINED
            # (single-term groups whose block max coincides with the
            # doc's tf/dl); for multi-alternative groups the bound
            # over-estimates (subadditive Σ over alternatives — same
            # as Lucene's SynonymQuery), so the identical-doc synonym
            # flood still decodes its full posting volume: scoring 2M
            # matching docs exactly IS the work there (measured 13s at
            # 10M docs; argsort stability keeps equal-bound windows in
            # ascending doc order either way).
            continue
        d0, d1 = lo + w * win, lo + (w + 1) * win
        gdocs: list[np.ndarray] = []
        gscores: list[np.ndarray] = []
        # phrase verification walks the token GRAPH: a token occupies
        # span [pos, pos + pos_len); group gi+1 must START where some
        # surviving group-gi token ENDS (how MultiPhraseQuery consumes
        # posLength — SynonymFilter.java:472-526's single-token output
        # spanning a multi-word match phrase-matches through here).
        # frontier holds the live (doc - d0) << 32 | boundary keys; for
        # span-1 indexes (pl_bytes absent) this chain is exactly the
        # old start-key intersection.
        frontier: np.ndarray | None = None
        not_docs: list[np.ndarray] = []
        filt_docs: list[np.ndarray] = []
        gkinds: list[bool] = []        # True = must, aligned w/ gdocs
        pos_by_gi: dict = {}           # run groups' flat position arrays
        srun_docs: list = []           # (gi, udocs, scores) for 's' runs
        dead = False
        for gi in range(n_groups):
            if gi in not_set or gi in filt_set:
                if gi in run_gis:
                    # negated-phrase slice: positions feed the run walk;
                    # docs do NOT join not_docs (only adjacency-verified
                    # docs are excluded, not every doc with the terms)
                    _nd, _utf, _udl, pdocs, pvals, plens = \
                        decode_group_window(gi, d0, d1, True)
                    pos_by_gi[gi] = (pdocs, pvals, plens)
                    continue
                # never scores: docs only — no tf/dl, no phrase walk
                nd_, *_rest = decode_group_window(gi, d0, d1, False)
                if gi in filt_set:
                    if len(nd_) == 0:  # required: window dead
                        dead = True
                        break
                    filt_docs.append(nd_)
                elif len(nd_):
                    not_docs.append(nd_)
                continue
            udocs, utf, udl, pdocs, pvals, plens = \
                decode_group_window(gi, d0, d1,
                                    phrase or gi in run_gis)
            if gi in run_gis:
                pos_by_gi[gi] = (pdocs, pvals, plens)
            if len(udocs) == 0:
                # a phrase needs every group regardless of boolean mode
                if gi in must_set or phrase:
                    dead = True
                    break
                continue
            tfn = utf / (utf + k1 * (1 - b + b * udl / avgdl))
            if gi in srun_gis:
                # optional-phrase slice: scored SEPARATELY below, only
                # for docs whose run verifies (score revocation would
                # break the oracle's bit-exact ordered fold)
                srun_docs.append((gi, udocs, plan.idfs[gi] * tfn))
                continue
            gdocs.append(udocs)
            gkinds.append(gi in must_set)
            gscores.append(plan.idfs[gi] * tfn)
            if phrase:
                dk = (pdocs - d0) << np.int64(32)
                if frontier is None:
                    frontier = np.unique(dk | (pvals + plens))
                else:
                    sel = np.isin(dk | pvals, frontier)
                    frontier = np.unique((dk | (pvals + plens))[sel])
                if len(frontier) == 0:
                    dead = True
                    break
        if dead or not (gdocs or srun_docs):
            continue
        # vectorized merge: concatenation is gid-major, and np.add.at
        # applies additions in element order — so each doc's group
        # scores accumulate in ascending-gid order, bit-identical to
        # the oracle's ordered left-fold (float addition order matters).
        # 's'-run docs join the universe with ZERO contribution here
        # (adding 0.0 cannot perturb the base fold); their scores fold
        # separately per run, gated by the adjacency walk.
        base_concat = gdocs + [d for _g, d, _s in srun_docs]
        alldocs = np.concatenate(base_concat)
        allsc = np.concatenate(
            gscores + [np.zeros(len(d)) for _g, d, _s in srun_docs]) \
            if srun_docs else np.concatenate(gscores)
        u, inv = np.unique(alldocs, return_inverse=True)
        sc = np.zeros(len(u), np.float64)
        np.add.at(sc, inv, allsc)
        nbase = sum(len(d) for d in gdocs)
        keep = np.ones(len(u), dtype=bool)
        if musts and len(musts) == len(gdocs):
            # every decoded scoring group is a must (legacy mode="and"
            # is always here): per-doc occurrence count over the merged
            # base concat IS the must-match count
            keep &= np.bincount(inv[:nbase],
                                minlength=len(u)) == len(gdocs)
        elif musts:
            dm = np.concatenate([d for d, m_ in zip(gdocs, gkinds)
                                 if m_])
            # dm ⊆ u by construction, so searchsorted is an exact
            # index map — per-doc must-group match count
            keep &= np.bincount(np.searchsorted(u, dm),
                                minlength=len(u)) == len(musts)
        has_sruns = bool(srun_gis)
        if shoulds and msm >= 1 and (musts or msm > 1) \
                and not (has_sruns and not musts):
            # minimum_should_match: ≥ msm should groups per doc (when
            # no must exists and msm == 1 every merged doc trivially
            # qualifies — skip the count). With optional-phrase runs
            # and no must, admission is base-msm OR verified-run —
            # handled in the run block below.
            ds = [d for d, m_ in zip(gdocs, gkinds) if not m_]
            cnt = np.zeros(len(u), np.int64)
            if ds:
                cnt = np.bincount(np.searchsorted(u, np.concatenate(ds)),
                                  minlength=len(u))
            keep &= cnt >= msm
        for fd in filt_docs:
            # filter context: required, never scores (ES bool filter /
            # Lucene FILTER occur) — pure doc-set intersection; bounds
            # stay valid (intersection only removes candidates)
            keep &= np.isin(u, fd)
        if not_docs:
            # must_not exclusion (Lucene ReqExclScorer): removing docs
            # only lowers attainable window scores, bounds stay valid
            keep &= ~np.isin(u, np.concatenate(not_docs))
        if phrase:
            verified = np.unique(frontier >> np.int64(32)) + d0
            keep &= np.isin(u, verified)
        if runs:
            # per-clause adjacency walks (QueryPlan.phrase_runs). Each
            # run replays the token-graph frontier of ``phrase=True``
            # over its own slice; masks only remove candidates (or, for
            # 's' runs, add a separately-folded side), so every window
            # bound stays a valid upper bound.
            znil = np.zeros(0, np.int64)
            in_any = np.zeros(len(u), dtype=bool)
            for s_, n_ in runs:
                fr = None
                for gi in range(s_, s_ + n_):
                    pdocs, pvals, plens = pos_by_gi.get(
                        gi, (znil, znil, znil))
                    if len(pdocs) == 0:
                        fr = znil
                        break
                    dk = (pdocs - d0) << np.int64(32)
                    if fr is None:
                        fr = np.unique(dk | (pvals + plens))
                    else:
                        sel_ = np.isin(dk | pvals, fr)
                        fr = np.unique((dk | (pvals + plens))[sel_])
                    if len(fr) == 0:
                        break
                vdocs = (np.unique(fr >> np.int64(32)) + d0) \
                    if fr is not None and len(fr) else znil
                if s_ in not_set:
                    if len(vdocs):
                        keep &= ~np.isin(u, vdocs)
                elif s_ in must_set:
                    keep &= np.isin(u, vdocs)
                else:
                    # optional phrase: fold ITS groups' scores (ordered
                    # within the run) and add the folded side only for
                    # verified docs — exactly the exhaustive path's
                    # coalesce(base,0)+coalesce(side,0) summation
                    inV = np.isin(u, vdocs) if len(vdocs) \
                        else np.zeros(len(u), dtype=bool)
                    in_any |= inV
                    rdocs = [d for g_, d, _s in srun_docs
                             if s_ <= g_ < s_ + n_]
                    if rdocs and inV.any():
                        rsc = np.zeros(len(u), np.float64)
                        np.add.at(
                            rsc,
                            np.searchsorted(u, np.concatenate(rdocs)),
                            np.concatenate(
                                [s for g_, _d, s in srun_docs
                                 if s_ <= g_ < s_ + n_]))
                        sc = np.where(inV, sc + rsc, sc)
            if has_sruns and not musts and msm >= 1:
                # no-must admission: ≥ msm base should groups OR a
                # verified optional phrase (the exhaustive path's
                # full-outer-join membership)
                ds = [d for d, m_ in zip(gdocs, gkinds) if not m_]
                cnt = np.zeros(len(u), np.int64)
                if ds:
                    cnt = np.bincount(
                        np.searchsorted(u, np.concatenate(ds)),
                        minlength=len(u))
                keep &= (cnt >= msm) | in_any
        if deleted is not None:
            # liveDocs mask BEFORE heap admission: a deleted doc must
            # never displace a live one from the shard's top-k. Window
            # bounds stay valid (removing docs only lowers attainable
            # scores), so pruning exactness is unaffected.
            keep &= ~np.isin(u, deleted)
        if allowed is not None:
            # doc-values filter (ES filter context on metadata): pure
            # intersection with the shard's allowlist, same soundness
            # argument as the masks above
            keep &= np.isin(u, allowed)
        if after is not None:
            # search_after cursor: admit only docs ranking STRICTLY
            # after (score DESC, doc_id ASC) the cursor. Exact float
            # equality is sound here because scores are bit-stable
            # across runs (ordered accumulation) — the cursor from
            # page N reproduces exactly on page N+1.
            cs, cd = after
            keep &= (sc < cs) | ((sc == cs) & (u > cd))
        if len(heap) >= k:
            # vectorized admission pre-filter against the CURRENT kth
            # item: a candidate not beating (score, -doc) of heap[0]
            # now can never enter (theta only rises within the loop),
            # so this is exactly the heappushpop admission test hoisted
            # to numpy — the per-doc Python loop below then sees ~k
            # survivors per window instead of every tying candidate
            # (millions on the identical-doc synonym fixture). On that
            # measured worst case decode volume dominates (13s at 10M
            # docs is ~14M decoded postings), but the loop is no
            # longer a second ceiling behind it.
            th_s, th_nd = heap[0]
            keep &= (sc > th_s) | ((sc == th_s) & (-u > th_nd))
        for d, s in zip(u[keep].tolist(), sc[keep].tolist()):
            item = (s, -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heappushpop(heap, item)
        if len(heap) >= k:
            theta = heap[0][0]

    results = sorted(heap, key=lambda x: (-x[0], -x[1]))
    out = pd.DataFrame(
        {"doc_id": [-nd for _s, nd in results],
         "score": [s for s, _nd in results]})
    return out.astype({"doc_id": "int64", "score": "float64"}) if len(out) \
        else pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                           "score": pd.Series([], dtype="float64")})


def search(spark: SparkSession, store: IndexStore, text: str, k: int = 10,
           mode: str = "and", phrase: bool = False,
           syn: SynonymDict | None = None,
           cfg: TokenizerConfig | None = None,
           groups: list[list[str]] | None = None,
           after: tuple | None = None,
           min_should_match: int | None = None,
           doc_where: str | None = None,
           min_score: float | None = None) -> DataFrame:
    """BM25 top-k via shard-parallel block-max WAND. ``phrase=True``
    ranks among phrase-matching docs only (MultiPhraseQuery semantics):
    adjacency is verified inside each shard worker before top-k
    admission — fully distributed, nothing collected driver-side.

    ``after=(score, doc_id)`` is ES search_after pagination: return
    the k hits ranking strictly after the cursor in (score DESC,
    doc_id ASC) order — deep pagination without deep heaps (each page
    keeps a k-sized heap; cursor filtering happens before admission,
    so page N+1 costs the same as page 1). Sound because ranks are
    deterministic and scores bit-stable across runs.

    ``min_should_match=m`` (mode="or" only) is the ES match-query
    parameter: a doc must match at least m of the query's position
    groups (Lucene BooleanQuery.setMinimumNumberShouldMatch — WAND is
    natively this m-of-n operator). mode="and" is m = n_groups;
    mode="or" default is m = 1.

    ``doc_where`` is the ES filter context over METADATA doc values —
    a Spark SQL boolean expression on docmap columns (e.g.
    ``"lang = 'java'"``, ``"repo = 'r1' AND path LIKE 'src/%'"``).
    Matching docs are restricted to the filter's allowlist BEFORE
    heap admission (never scores, never affects idf/avgdl — exactly
    ES: filters don't change scoring stats), routed per shard like
    liveDocs (see _allow_runtime for the scale shape).

    ``min_score`` is the ES search-body parameter: hits scoring
    below the floor drop out. Applied as a filter on the top-k
    output — exact, because removing sub-floor docs can never
    promote a doc that wasn't already in the unfiltered top-k (the
    result just shrinks below k when the floor bites)."""
    meta = store.meta()
    if phrase and not meta.store_positions:
        raise ValueError("phrase=True requires an index built with "
                         "store_positions=True (this one has none)")
    plan = plan_query(spark, store, text, syn, cfg, groups)
    if not plan.groups:
        return spark.createDataFrame([], "doc_id long, score double")
    plan = _apply_msm(plan, mode, min_should_match, phrase)
    out = _wand_topk(spark, store, meta, plan, k, mode, phrase, after,
                     doc_where)
    if min_score is not None:
        out = out.filter(F.col("score") >= float(min_score))
    return out


def _apply_msm(plan: QueryPlan, mode: str,
               min_should_match: int | None,
               phrase: bool = False) -> QueryPlan:
    """Tag the plan's groups all-should with the given m (ES match
    minimum_should_match). No-op when m is None."""
    if min_should_match is None:
        return plan
    if phrase:
        raise ValueError("min_should_match does not apply to phrase "
                         "queries (adjacency already requires every "
                         "position)")
    if mode != "or":
        raise ValueError("min_should_match applies to mode='or' "
                         "(mode='and' already requires every group)")
    if not 1 <= min_should_match <= len(plan.groups):
        raise ValueError(f"min_should_match={min_should_match} out of "
                         f"range for {len(plan.groups)} groups")
    plan.kinds = ["s"] * len(plan.groups)
    plan.msm = min_should_match
    return plan


def search_bool(spark: SparkSession, store: IndexStore,
                must=None, should=None, must_not=None, filter=None,
                k: int = 10,
                min_should_match: int | None = None,
                syn: SynonymDict | None = None,
                cfg: TokenizerConfig | None = None,
                after: tuple | None = None,
                doc_where: str | None = None) -> DataFrame:
    """ES ``bool`` query: BM25 top-k over must/should/must_not/filter
    clauses (see plan_bool for the exact Lucene BooleanQuery
    semantics). Runs on the same shard-parallel block-max WAND as
    ``search`` — must_not and filter groups decode docs-only inside
    each worker (Lucene ReqExclScorer / FILTER occur) and never
    contribute to bounds or scores; window pruning stays exact because
    exclusion/intersection only lowers attainable scores.

    Needs at least one scoring (must/should) clause — a filter-only
    bool has no ranking signal (every ES score is 0); resolve those
    with ``match_ids(plan=plan_bool(filter=...))`` or
    ``count_matches``. With ``{should, filter}`` and the ES-default
    min_should_match=0, ranked results are the positive-score matches
    (docs matching the filter but no should clause score 0 and can
    only appear below them; use match_ids for the exhaustive set)."""
    plan = plan_bool(spark, store, must, should, must_not, filter,
                     syn, cfg, min_should_match)
    if not any(kk in "ms" for kk in plan.kinds):
        raise ValueError("search_bool needs a scoring (must/should) "
                         "clause; filter-only matching is served by "
                         "match_ids/count_matches")
    meta = store.meta()
    return _wand_topk(spark, store, meta, plan, k, "or", False, after,
                      doc_where)


def _wand_topk(spark: SparkSession, store: IndexStore, meta,
               plan: QueryPlan, k: int, mode: str,
               phrase: bool = False,
               after: tuple | None = None,
               doc_where: str | None = None,
               allow_df: DataFrame | None = None,
               exclude_df: DataFrame | None = None) -> DataFrame:
    """The shard-parallel WAND execution behind ``search``, taking a
    pre-built plan (so multi-field search can run it per field without
    re-analysis)."""
    # column pruning matters here: pos_bytes is the FATTEST stream
    # (every occurrence's delta-coded position) and a non-phrase query
    # never touches it — reading it anyway made the parquet scan, not
    # the decode, the multi-term query bottleneck at 10M docs
    cols = ["term", "shard", "first_doc", "last_doc", "n_docs",
            "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes",
            "imp_bytes"]
    if phrase or plan.phrase_runs:
        cols += ["pos_bytes", "pl_bytes"]
    blocks = store.segments(spark) \
        .filter(F.col("term").isin(plan.terms)).select(*cols)

    empty = {"doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}

    def fn(pdf: pd.DataFrame, deleted, allowed) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(empty)
        return _wand_shard(pdf, plan, k, mode, phrase,
                           deleted=deleted, after=after,
                           allowed=allowed)

    topk = _masked_apply(spark, store, meta, blocks, fn,
                         "doc_id long, score double", doc_where,
                         allow_df, exclude_df)
    return topk.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_batch(spark: SparkSession, store: IndexStore,
                 texts: list[str], k: int = 10, mode: str = "and",
                 phrase: bool = False,
                 syn: SynonymDict | None = None,
                 cfg: TokenizerConfig | None = None,
                 groups_list: list[list[list[str]]] | None = None,
                 after_list: list[tuple | None] | None = None,
                 plans: list[QueryPlan] | None = None,
                 doc_where: str | None = None) -> DataFrame:
    """Answer MANY queries in one Spark job: one planning pass, one
    blocks scan for the union of all query terms, per-shard workers run
    every query's WAND against their slice. Amortizes per-job overhead
    (~1s) across the batch — the realistic offline-serving shape.
    Returns (query_id, doc_id, score), each query's exact top-k,
    rank-identical to per-query ``search``.

    ``groups_list`` (one per-position groups value per query, as in
    ``search(groups=...)``) overrides analysis — batch serving for
    filter-composed analyzers.

    ``after_list`` (one ``(score, doc_id)`` cursor or None per query)
    is per-query search_after pagination, same semantics as
    ``search(after=...)`` — page N+1 of a batch costs the same one
    job as page 1.

    ``plans`` (mutually exclusive with texts/groups_list) serves
    PRE-BUILT QueryPlans — notably kinds-tagged bool plans from
    ``plan_bool``: a mixed batch of bool/msm/plain queries runs in the
    same single job (each worker applies each plan's occur tags; the
    batch mode arg is ignored for kinds-tagged plans)."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    if plans is not None:
        if texts:
            raise ValueError("pass either texts or plans, not both")
        n_q = len(plans)
    else:
        n_q = len(texts)
    if groups_list is not None and len(groups_list) != n_q:
        raise ValueError("groups_list must have one entry per query")
    if after_list is not None and len(after_list) != n_q:
        raise ValueError("after_list must have one entry per query")
    afters = after_list if after_list is not None else [None] * n_q
    if plans is None:
        groups_per_q = groups_list if groups_list is not None \
            else [analyze_query(t, cfg, syn) for t in texts]
        all_terms = sorted({t for gs in groups_per_q
                            for g in gs for t in g})
    else:
        all_terms = sorted({t for p in plans for t in p.terms})
    if not all_terms:
        return spark.createDataFrame([],
                                     "query_id int, doc_id long, score double")
    if plans is None:
        dfs = store.term_dfs(spark, all_terms, build_id=meta.build_id)
        # scoring N must match plan_query's n_eff (maxDoc minus
        # merged-away docs) or batch scores diverge from single-query
        # search after an incremental merge — pinned by
        # test_search_batch_merged_identity
        n_eff = meta.n_docs - meta.n_purged
        plans = []
        for gs in groups_per_q:
            idfs = [idf(n_eff, max((dfs.get(t, 0) for t in g),
                                   default=0))
                    for g in gs]
            plans.append(QueryPlan(groups=gs, idfs=idfs, n_docs=n_eff,
                                   avgdl=meta.avgdl, k1=meta.k1,
                                   b=meta.b))

    if phrase and any(p.kinds is not None for p in plans):
        raise ValueError("phrase=True is not supported with "
                         "kinds-tagged bool plans")
    cols = ["term", "shard", "first_doc", "last_doc", "n_docs",
            "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes",
            "imp_bytes"]
    if phrase:
        cols += ["pos_bytes", "pl_bytes"]
    blocks = store.segments(spark) \
        .filter(F.col("term").isin(all_terms)).select(*cols)

    def _run_all(pdf: pd.DataFrame, deleted: np.ndarray | None,
                 allowed: np.ndarray | None) -> pd.DataFrame:
        outs = []
        for qi, plan in enumerate(plans):
            if not plan.groups or len(pdf) == 0:
                continue
            terms = set(plan.terms)
            sub = pdf[pdf["term"].isin(terms)]
            if not len(sub):
                continue
            res = _wand_shard(sub.reset_index(drop=True), plan, k, mode,
                              phrase, deleted=deleted, after=afters[qi],
                              allowed=allowed)
            if len(res):
                res.insert(0, "query_id", np.int32(qi))
                outs.append(res)
        if not outs:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int32"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    topk = _masked_apply(spark, store, meta, blocks, _run_all,
                         "query_id int, doc_id long, score double",
                         doc_where)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("doc_id"))
    return (topk.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k).drop("_r")
            .orderBy("query_id", F.desc("score"), F.asc("doc_id")))


def fetch_sources(spark: SparkSession, store: IndexStore,
                  hits: DataFrame, corpus: DataFrame | None = None
                  ) -> DataFrame:
    """Hydrate a (doc_id, score) result with the document itself — the
    reference's search response carries the full _source
    (SynonymPluginTest.java:163-168 reads msg fields off hits).

    Joins the hits to the docmap (broadcast — k rows) for the document
    keys; with ``corpus`` also joins the original table on those keys
    to return its columns (content etc.). Ordering is preserved via
    the score column."""
    dm = store.docmap(spark)
    keep = [c for c in ["repo", "path", "commit", "lang",
                        "content_sha256"] if c in dm.columns]
    out = dm.select("doc_id", *keep).join(F.broadcast(hits), "doc_id")
    if corpus is not None:
        keys = [c for c in ["repo", "path", "commit"]
                if c in corpus.columns and c in keep]
        if not keys and "doc_id" in corpus.columns:
            keys = ["doc_id"]  # corpora keyed by native doc_id
        fresh = [c for c in corpus.columns
                 if c in keys or c not in out.columns]
        out = out.join(corpus.select(*fresh), keys, "left")
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


def highlight(spark: SparkSession, store: IndexStore, hits: DataFrame,
              corpus: DataFrame, text: str,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None,
              max_spans: int = 10) -> DataFrame:
    """Character-offset highlight spans for the query's terms in each
    hit (the ES highlighter surface). The index stores positions, not
    offsets, so hits are hydrated with their source text and
    re-analyzed Arrow-batched with the SAME tokenizer config — exactly
    how ES's plain highlighter re-analyzes stored fields. Returns
    (doc_id, start, end, term) rows, ≤ ``max_spans`` per doc in
    offset order."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    qterms = {t for g in analyze_query(text, cfg, syn) for t in g}
    hydrated = fetch_sources(spark, store, hits, corpus=corpus) \
        .select("doc_id", F.col(meta.text_col).alias("_text"))
    n, expand, ignore_case = cfg.n, cfg.expand, cfg.ignore_case
    syn_local, terms_local, cap = syn, qterms, max_spans

    def run(batches):
        from .tokenizer import tokenize as _tok
        cfg_l = TokenizerConfig(n=n, expand=expand,
                                ignore_case=ignore_case)
        for pdf in batches:
            out = {"doc_id": [], "start": [], "end": [], "term": []}
            for did, body in zip(pdf["doc_id"], pdf["_text"]):
                if not body:
                    continue
                k = 0
                for w, s, e, _pi in _tok(body, cfg_l, syn_local):
                    if w in terms_local:
                        out["doc_id"].append(int(did))
                        out["start"].append(s)
                        out["end"].append(e)
                        out["term"].append(w)
                        k += 1
                        if k >= cap:
                            break
            yield pd.DataFrame(out)

    return hydrated.mapInPandas(
        run, schema="doc_id long, start int, end int, term string") \
        .orderBy("doc_id", "start")


def explain_score(spark: SparkSession, store: IndexStore, text: str,
                  doc_id: int, syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None) -> DataFrame:
    """Per-group BM25 score breakdown for one document — the ES
    ``_explain`` surface. Returns (gid, terms, tf, dl, idf, gscore);
    the sum of gscore over rows is exactly the doc's search score
    (same ordered accumulation)."""
    plan = plan_query(spark, store, text, syn, cfg)
    empty_schema = ("gid int, terms string, tf long, dl long, "
                    "idf double, gscore double")
    if not plan.groups:
        return spark.createDataFrame([], empty_schema)
    # ES _explain on a deleted doc reports not-found (liveDocs checked
    # before scoring); a purged doc falls out naturally (no postings)
    if store.meta().delete_batches and \
            store.deletes(spark).filter(F.col("doc_id") == doc_id) \
            .limit(1).count():
        return spark.createDataFrame([], empty_schema)
    # doc filter pushed to block metadata: ~one block per term decoded,
    # not the terms' full posting lists (df-linear — round-3 finding)
    p = decoded_postings(spark, store, plan.terms, doc_ids=[doc_id])
    gm = [(t, gi, plan.idfs[gi], "|".join(plan.groups[gi]))
          for gi, g in enumerate(plan.groups) for t in g]
    group_map = spark.createDataFrame(
        gm, "term string, gid int, gidf double, terms string")
    k1, b, avgdl = plan.k1, plan.b, plan.avgdl
    return (p.join(F.broadcast(group_map), "term")
            .groupBy("gid", "terms")
            .agg(F.sum("tf").alias("tf"), F.first("dl").alias("dl"),
                 F.first("gidf").alias("idf"))
            .withColumn("gscore",
                        F.col("idf") * (F.col("tf") /
                        (F.col("tf") + F.lit(k1) *
                         (F.lit(1 - b) + F.lit(b) * F.col("dl")
                          / F.lit(avgdl)))))
            .select("gid", "terms", "tf", "dl", "idf", "gscore")
            .orderBy("gid"))


# --------------------------------------------------------------------
# distributed boolean / phrase match counting (E9 + E11)
# --------------------------------------------------------------------

def _count_shard(pdf: pd.DataFrame, plan: QueryPlan, mode: str,
                 phrase: bool, stats: dict | None = None,
                 deleted: np.ndarray | None = None,
                 allowed: np.ndarray | None = None) -> int:
    """Number of matching docs in one shard (see _match_shard)."""
    return len(_match_shard(pdf, plan, mode, phrase, stats, deleted,
                            allowed))


def _match_shard(pdf: pd.DataFrame, plan: QueryPlan, mode: str,
                 phrase: bool, stats: dict | None = None,
                 deleted: np.ndarray | None = None,
                 allowed: np.ndarray | None = None) -> np.ndarray:
    """Matching doc ids in one shard — whole-shard vectorized
    set algebra over the decoded postings, no ranking, no top-k state.
    Phrase adjacency via (doc, start) key intersection across groups.

    Intersection order is RAREST-FIRST (groups sorted by posting
    volume) and, once a candidate set exists, a block is decoded only
    if some candidate doc falls inside its [first_doc, last_doc] range
    — the block skip data already rides on every block, so a selective
    AND decodes the frequent terms' blocks only where the rare term
    actually has docs. Exactness is unaffected: a skipped block cannot
    contain a doc that survives the intersection. ``stats`` (optional
    dict) receives ``decoded_blocks`` for plan assertions."""
    by_term: dict[str, list[int]] = {}
    for i, t in enumerate(pdf["term"]):
        by_term.setdefault(t, []).append(i)
    first = pdf["first_doc"].to_numpy()
    last = pdf["last_doc"].to_numpy()
    nds = pdf["n_docs"].to_numpy()
    decoded = [0]
    # posLength graph present? Only filter-composed indexes with
    # multi-word rules write pl_bytes; everywhere else the spans are
    # all 1 and the (cheaper, order-free) start-key path applies.
    has_pl = "pl_bytes" in pdf.columns and pdf["pl_bytes"].notna().any()

    def block_rows(g: list[str]) -> list[int]:
        return [i for t in g for i in by_term.get(t, ())]

    doc_bytes_l = pdf["doc_bytes"].tolist()
    tf_bytes_l = pdf["tf_bytes"].tolist()

    def group_arrays(g: list[str], want_pos: bool,
                     cand: np.ndarray | None):
        """(unique doc array, flat (doc, pos, pos_len) occurrence
        arrays), restricted to blocks whose doc range can intersect
        ``cand``. Selected blocks decode in ONE varint pass per stream
        (concatenated buffers + segmented cumsum — the same batching
        as the WAND worker; per-block decode calls are ~40µs of fixed
        overhead each)."""
        sel = []
        for i in block_rows(g):
            if cand is not None:
                j = np.searchsorted(cand, first[i])
                if j >= len(cand) or cand[j] > last[i]:
                    continue  # no candidate inside this block's range
            sel.append(i)
        z = np.zeros(0, np.int64)
        if not sel:
            return z, z, z, z
        decoded[0] += len(sel)
        sel = np.asarray(sel, dtype=np.int64)
        counts = nds[sel].astype(np.int64)
        ends = np.cumsum(counts)
        starts = ends - counts
        gaps = varint_decode(
            b"".join(doc_bytes_l[i] for i in sel)).astype(np.int64)
        acc = np.cumsum(gaps)
        base = np.repeat(acc[starts] - gaps[starts], counts)
        docs_flat = acc - base + np.repeat(
            first[sel].astype(np.int64), counts)
        pd_all, pv_all, pl_all = [], [], []
        if want_pos:
            tfs_flat = varint_decode(
                b"".join(tf_bytes_l[i] for i in sel)).astype(np.int64)
            for j, i in enumerate(sel):
                tfb = tfs_flat[starts[j]:ends[j]]
                docb = docs_flat[starts[j]:ends[j]]
                pos = decode_positions(pdf["pos_bytes"].iat[i], tfb)
                pd_all.append(np.repeat(docb, tfb))
                pv_all.append(pos)
                if has_pl:
                    pl_all.append(decode_plens(pdf["pl_bytes"].iat[i],
                                               tfb))
        docs = np.unique(docs_flat)
        pdc = np.concatenate(pd_all) if pd_all else z
        pvc = np.concatenate(pv_all) if pv_all else z
        plc = np.concatenate(pl_all) if pl_all else (
            np.ones(len(pdc), np.int64) if want_pos else z)
        return docs, pdc, pvc, plc

    znil = np.zeros(0, np.int64)

    def done(docs) -> np.ndarray:
        if stats is not None:
            stats["decoded_blocks"] = decoded[0]
        return znil if isinstance(docs, int) else docs

    def live(docs: np.ndarray) -> np.ndarray:
        # liveDocs filter on the FINAL matching set (ES total hits
        # count live matches only); intermediate intersections may
        # carry deleted docs — harmless, they only widen block skips
        if deleted is not None and len(docs):
            docs = docs[~np.isin(docs, deleted)]
        # doc-values allowlist (ES filter context on metadata)
        if allowed is not None and len(docs):
            docs = docs[np.isin(docs, allowed)]
        return docs

    # rarest first: posting volume (Σ n_docs over the group's blocks)
    # as the df proxy — valid for AND/phrase (intersection commutes)
    order = list(range(len(plan.groups)))
    if mode == "and" or phrase:
        vol = [sum(int(nds[i]) for i in block_rows(g))
               for g in plan.groups]
        order.sort(key=lambda gi: vol[gi])

    if phrase and plan.span is not None:
        # Lucene SpanNearQuery, two clauses (plan_span enforces the
        # arity): each clause's occurrence STARTS come from the exact-
        # phrase start algorithm over its gram-run slice; the near
        # test is a bounded delta-window membership probe — clause-1
        # start minus clause-0 start must land in [L0, L0+slop]
        # (ordered: gap ∈ [0, slop]) or, unordered, in
        # [−(L1+slop), L0+slop] (clause-1-first gap plus the always-
        # admissible overlap region). ≤ L0+L1+2·slop+1 probes, all
        # vectorized; clause-1 block decodes are gated by clause-0's
        # surviving doc set.
        if has_pl:
            raise ValueError("span_near is not supported on "
                             "posLength-graph (token-filter "
                             "composed) indexes")
        n0, sl, in_order = plan.span
        lo = int(first.min()) if len(pdf) else 0

        def span_starts(gslice, cand0):
            st, c = None, cand0
            for off, g in enumerate(gslice):
                _d, pdc, pvc, _plc = group_arrays(g, True, c)
                ok = pvc >= off
                enc = ((pdc[ok] - lo) << np.int64(32)) \
                    | (pvc[ok] - off)
                enc = np.unique(enc)
                st = enc if st is None else \
                    np.intersect1d(st, enc, assume_unique=True)
                if len(st) == 0:
                    return None, None
                c = np.unique(st >> np.int64(32)) + lo
            return st, c

        k0, cand = span_starts(plan.groups[:n0], None)
        if k0 is None:
            return done(0)
        k1, _c1 = span_starts(plan.groups[n0:], cand)
        if k1 is None:
            return done(0)
        L0, L1 = n0, len(plan.groups) - n0
        pd1 = (k1 >> np.int64(32))
        pv1 = k1 & np.int64(0xFFFFFFFF)
        deltas = range(L0, L0 + sl + 1) if in_order \
            else range(-(L1 + sl), L0 + sl + 1)
        hits = []
        for delta in deltas:
            q = pv1 - delta
            m = q >= 0
            if not m.any():
                continue
            sel = np.isin((pd1[m] << np.int64(32)) | q[m], k0)
            if sel.any():
                hits.append(pd1[m][sel])
        if not hits:
            return done(0)
        return done(live(np.unique(np.concatenate(hits)) + lo))

    if phrase and has_pl and plan.slop == 0:
        # posLength graph: adjacency is "group gi+1 starts where a
        # surviving gi token ENDS" — inherently sequential in group
        # order (the frontier chain from _wand_shard), so rarest-first
        # reordering doesn't apply; block decodes are still gated by
        # the shrinking frontier's doc set from group 1 on.
        lo = int(first.min()) if len(pdf) else 0
        frontier: np.ndarray | None = None
        cand: np.ndarray | None = None
        for gi in range(len(plan.groups)):
            _docs, pdc, pvc, plc = group_arrays(plan.groups[gi], True,
                                                cand)
            dk = (pdc - lo) << np.int64(32)
            if frontier is None:
                frontier = np.unique(dk | (pvc + plc))
            else:
                sel = np.isin(dk | pvc, frontier)
                frontier = np.unique((dk | (pvc + plc))[sel])
            if len(frontier) == 0:
                return done(0)
            cand = np.unique(frontier >> np.int64(32)) + lo
        return done(live(np.unique(frontier >> np.int64(32)) + lo))

    if phrase and plan.slop > 0:
        # ES match_phrase ``slop`` — exact Lucene SloppyPhraseScorer
        # semantics for a TWO-position phrase (the planner enforces
        # the arity): occurrences (p0, p1) of the two groups match
        # iff the move distance |(p1 - p0) - 1| <= slop, so a
        # one-word gap costs 1 and transposed adjacent terms cost 2
        # (the ES-documented behavior). Vectorized as ≤ 2·slop+1
        # membership probes of shifted position keys — no per-doc
        # loops; group-1 block decodes are gated by group-0's doc
        # set exactly like the exact-phrase path.
        if has_pl:
            raise ValueError("slop is not supported on posLength-"
                             "graph (token-filter composed) indexes")
        lo = int(first.min()) if len(pdf) else 0
        d0, pd0, pv0, _pl0 = group_arrays(plan.groups[0], True, None)
        if len(d0) == 0:
            return done(0)
        k0 = np.unique(((pd0 - lo) << np.int64(32)) + pv0)
        _d1, pd1, pv1, _pl1 = group_arrays(plan.groups[1], True, d0)
        hits = []
        for delta in range(1 - plan.slop, 2 + plan.slop):
            q = pv1 - delta
            m = q >= 0
            if not m.any():
                continue
            sel = np.isin(((pd1[m] - lo) << np.int64(32)) + q[m], k0)
            if sel.any():
                hits.append(pd1[m][sel])
        if not hits:
            return done(0)
        return done(live(np.unique(np.concatenate(hits))))

    if phrase:
        lo = int(first.min()) if len(pdf) else 0
        starts: np.ndarray | None = None
        cand: np.ndarray | None = None
        for gi in order:
            _docs, pdc, pvc, _plc = group_arrays(plan.groups[gi], True,
                                                 cand)
            ok = pvc >= gi
            enc = ((pdc[ok] - lo) << np.int64(32)) | (pvc[ok] - gi)
            enc = np.unique(enc)
            starts = enc if starts is None else \
                np.intersect1d(starts, enc, assume_unique=True)
            if len(starts) == 0:
                return done(0)
            # surviving docs (sorted: starts is sorted and >>32 is
            # monotone) gate the next group's block decodes
            cand = np.unique(starts >> np.int64(32)) + lo
        return done(live(np.unique(starts >> np.int64(32)) + lo))

    if plan.kinds is not None:
        # ES bool matching (must/should/must_not + msm), same
        # vectorized set algebra: musts intersect rarest-first with
        # candidate-gated block decodes; shoulds decode ONLY when msm
        # requires them (gated by the must survivors — a gated block
        # may contribute non-candidate docs to the m-of-n count, which
        # the final intersect discards); must_not decodes are gated by
        # the surviving candidates and subtract last.
        musts, shoulds, nots, filts, msm = plan.occur(mode)
        req = musts + filts       # matching treats filter ≡ must
        vol = [sum(int(nds[i]) for i in block_rows(g))
               for g in plan.groups]
        acc_b: np.ndarray | None = None
        for gi in sorted(req, key=lambda g: vol[g]):
            docs, _pd, _pv, _pl = group_arrays(plan.groups[gi], False,
                                               acc_b)
            if len(docs) == 0:
                return done(0)
            acc_b = docs if acc_b is None else \
                np.intersect1d(acc_b, docs, assume_unique=True)
            if len(acc_b) == 0:
                return done(0)
        need_cnt = bool(shoulds) and msm >= 1 and (bool(req) or msm > 1)
        if need_cnt:
            per_g = []
            for gi in shoulds:
                docs, _pd, _pv, _pl = group_arrays(plan.groups[gi],
                                                   False, acc_b)
                if len(docs):
                    per_g.append(docs)
            if per_g:
                u, c = np.unique(np.concatenate(per_g),
                                 return_counts=True)
                qual = u[c >= msm]    # per-group docs unique ⇒ c =
            else:                     # number of matching should groups
                qual = znil
            acc_b = qual if acc_b is None else \
                np.intersect1d(acc_b, qual, assume_unique=True)
        elif not req:
            # pure-should msm ≤ 1: plain union
            for gi in shoulds:
                docs, _pd, _pv, _pl = group_arrays(plan.groups[gi],
                                                   False, None)
                acc_b = docs if acc_b is None else \
                    np.union1d(acc_b, docs)
        if acc_b is None:
            acc_b = znil
        for gi in nots:
            if len(acc_b) == 0:
                break
            nd_, _pd, _pv, _pl = group_arrays(plan.groups[gi], False,
                                              acc_b)
            if len(nd_):
                acc_b = acc_b[~np.isin(acc_b, nd_)]
        return done(live(acc_b))

    acc: np.ndarray | None = None
    for gi in order:
        docs, _pd, _pv, _pl = group_arrays(
            plan.groups[gi], False, acc if mode == "and" else None)
        if mode == "and":
            if len(docs) == 0:
                return done(0)
            acc = docs if acc is None else \
                np.intersect1d(acc, docs, assume_unique=True)
            if len(acc) == 0:
                return done(0)
        else:
            acc = docs if acc is None else \
                np.union1d(acc, docs)
    return done(live(acc) if acc is not None else znil)


def _apply_slop(plan: QueryPlan, phrase: bool, slop: int) -> QueryPlan:
    """Validate + attach ES match_phrase ``slop`` to the plan."""
    if not slop:
        return plan
    if slop < 0:
        raise ValueError("slop must be >= 0")
    if not phrase:
        raise ValueError("slop requires phrase=True")
    if len(plan.groups) != 2:
        raise ValueError(
            "sloppy phrase matching is implemented for two-position "
            f"queries (got {len(plan.groups)} positions); exact "
            "Lucene semantics for longer phrases need the full "
            "SloppyPhraseScorer repeat machinery")
    plan.slop = slop
    return plan


def plan_span(spark: SparkSession, store: IndexStore,
              first_text: str, second_text: str, slop: int = 0,
              in_order: bool = True,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None) -> QueryPlan:
    """Lucene ``span_near`` plan with two span clauses. Each clause
    text analyzes to a gram RUN (its per-position groups — on a word
    index, one group; on the n-gram index, the word's gram sequence,
    so a clause is itself a span of width len(groups)). ``slop``
    counts index positions between the spans (NearSpans totalGap);
    ``in_order=False`` is NearSpansUnordered (either order, overlaps
    admitted). ES surface: ``span_near: {clauses: [...], slop,
    in_order}`` — the proximity operator behind legal/patent-style
    "A within N of B" searches."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    g0 = analyze_query(first_text, cfg, syn)
    g1 = analyze_query(second_text, cfg, syn)
    if not g0 or not g1:
        raise ValueError("span_near needs two non-empty clauses")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    groups = g0 + g1
    terms = sorted({t for g in groups for t in g})
    dfs = store.term_dfs(spark, terms, build_id=meta.build_id)
    n_eff = meta.n_docs - meta.n_purged
    idfs = [idf(n_eff, max((dfs.get(t, 0) for t in g), default=0))
            for g in groups]
    return QueryPlan(groups=groups, idfs=idfs, n_docs=n_eff,
                     avgdl=meta.avgdl, k1=meta.k1, b=meta.b,
                     span=(len(g0), int(slop), bool(in_order)))


def span_near_count(spark: SparkSession, store: IndexStore,
                    first_text: str, second_text: str,
                    slop: int = 0, in_order: bool = True,
                    syn: SynonymDict | None = None,
                    cfg: TokenizerConfig | None = None,
                    doc_where: str | None = None) -> DataFrame:
    """Distributed hit count for a two-clause ``span_near``."""
    plan = plan_span(spark, store, first_text, second_text, slop,
                     in_order, syn, cfg)
    return count_matches(spark, store, phrase=True, plan=plan,
                         doc_where=doc_where)


def span_near_ids(spark: SparkSession, store: IndexStore,
                  first_text: str, second_text: str,
                  slop: int = 0, in_order: bool = True,
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  doc_where: str | None = None) -> DataFrame:
    """Matching doc ids for a two-clause ``span_near`` (distributed
    frame — the scroll/filter surface)."""
    plan = plan_span(spark, store, first_text, second_text, slop,
                     in_order, syn, cfg)
    return match_ids(spark, store, phrase=True, plan=plan,
                     doc_where=doc_where)


def count_matches(spark: SparkSession, store: IndexStore,
                  text: str = "", mode: str = "and",
                  phrase: bool = False,
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  groups: list[list[str]] | None = None,
                  min_should_match: int | None = None,
                  plan: QueryPlan | None = None,
                  slop: int = 0,
                  doc_where: str | None = None) -> DataFrame:
    """Total hit count (the reference's query-then-read-total idiom,
    SynonymPluginTest.java:149-169) as a DISTRIBUTED aggregate: each
    shard worker counts its matches (applyInPandas), partials sum in a
    single tiny reduction. Never materializes candidate doc ids — the
    scale-safe replacement for ``search(k=huge).count()``.

    Returns a one-row DataFrame ``hits long``.

    ``min_should_match`` mirrors search(); ``plan`` overrides text
    analysis with a pre-built QueryPlan (the bool-query hook:
    ``count_matches(..., plan=plan_bool(...))`` is the ES bool count
    surface — must/should/must_not with exact distributed totals).

    ``slop`` (with ``phrase=True``) is ES match_phrase slop — exact
    Lucene move-distance semantics, implemented for TWO-position
    queries (|Δpos − 1| ≤ slop; transpositions cost 2). Longer sloppy
    phrases would need the full SloppyPhraseScorer repeat machinery
    and raise instead of approximating."""
    meta = store.meta()
    if phrase and not meta.store_positions:
        raise ValueError("phrase=True requires an index built with "
                         "store_positions=True (this one has none)")
    if plan is None:
        plan = plan_query(spark, store, text, syn, cfg, groups)
        plan = _apply_msm(plan, mode, min_should_match, phrase)
    elif plan.kinds is not None and phrase:
        raise ValueError("phrase=True is not supported with a "
                         "kinds-tagged bool plan (phrase adjacency "
                         "is defined over required positions only)")
    plan = _apply_slop(plan, phrase, slop)
    if not plan.groups:
        return spark.createDataFrame([(0,)], "hits long")

    cols = ["term", "shard", "first_doc", "last_doc", "n_docs",
            "doc_bytes", "tf_bytes"]
    if phrase:
        cols += ["pos_bytes", "pl_bytes"]
    blocks = store.segments(spark) \
        .filter(F.col("term").isin(plan.terms)).select(*cols)

    def fn(pdf: pd.DataFrame, deleted, allowed) -> pd.DataFrame:
        n = _count_shard(pdf, plan, mode, phrase, deleted=deleted,
                         allowed=allowed) if len(pdf) else 0
        return pd.DataFrame({"hits": pd.Series([n], dtype="int64")})

    partials = _masked_apply(spark, store, meta, blocks, fn,
                             "hits long", doc_where)
    return partials.agg(
        F.coalesce(F.sum("hits"), F.lit(0)).cast("long").alias("hits"))


def match_ids(spark: SparkSession, store: IndexStore, text: str = "",
              mode: str = "and", phrase: bool = False,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None,
              groups: list[list[str]] | None = None,
              min_should_match: int | None = None,
              plan: QueryPlan | None = None,
              slop: int = 0,
              doc_where: str | None = None,
              sliced: tuple[int, int] | None = None) -> DataFrame:
    """ALL matching (live) doc ids as a DataFrame ``doc_id long`` —
    the scale-safe scroll-all-hits surface feeding
    ``deletes.delete_by_query`` (ES ``_delete_by_query`` resolves its
    victim set the same way: a match query, not a ranked top-k). The
    id set never rides through the driver: each shard worker emits its
    matches (the same vectorized set algebra as ``count_matches``,
    block skips included) and the result stays a distributed frame —
    callers bound it (delete path: parquet write) or aggregate it.

    ``sliced=(i, n)`` is the ES sliced-scroll contract (N workers
    each consuming a disjoint 1/N of the hit stream): keep only docs
    with ``doc_id % n == i``. Slices are disjoint, cover the full
    set, and are deterministic across re-runs — the property scroll
    consumers rely on. The predicate is a Catalyst filter on the
    distributed output (ES likewise filters doc-id hash per slice
    inside each shard)."""
    meta = store.meta()
    if phrase and not meta.store_positions:
        raise ValueError("phrase=True requires an index built with "
                         "store_positions=True (this one has none)")
    if plan is None:
        plan = plan_query(spark, store, text, syn, cfg, groups)
        plan = _apply_msm(plan, mode, min_should_match, phrase)
    elif plan.kinds is not None and phrase:
        raise ValueError("phrase=True is not supported with a "
                         "kinds-tagged bool plan (phrase adjacency "
                         "is defined over required positions only)")
    plan = _apply_slop(plan, phrase, slop)
    if not plan.groups:
        return spark.range(0).select(F.col("id").alias("doc_id"))

    cols = ["term", "shard", "first_doc", "last_doc", "n_docs",
            "doc_bytes", "tf_bytes"]
    if phrase:
        cols += ["pos_bytes", "pl_bytes"]
    blocks = store.segments(spark) \
        .filter(F.col("term").isin(plan.terms)).select(*cols)

    def fn(pdf: pd.DataFrame, deleted, allowed) -> pd.DataFrame:
        docs = _match_shard(pdf, plan, mode, phrase, deleted=deleted,
                            allowed=allowed) \
            if len(pdf) else np.zeros(0, np.int64)
        return pd.DataFrame({"doc_id": pd.Series(docs, dtype="int64")})

    out = _masked_apply(spark, store, meta, blocks, fn,
                        "doc_id long", doc_where)
    if sliced is not None:
        i, n = sliced
        if not (isinstance(n, int) and isinstance(i, int)
                and 0 <= i < n):
            raise ValueError(f"sliced=(id, max) needs 0 <= id < max, "
                             f"got {sliced}")
        out = out.filter(F.pmod(F.col("doc_id"), F.lit(n)) == i)
    return out


def terms_agg(spark: SparkSession, store: IndexStore, field: str,
              text: str = "", mode: str = "and", phrase: bool = False,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None,
              groups: list[list[str]] | None = None,
              min_should_match: int | None = None,
              plan: QueryPlan | None = None,
              size: int = 10,
              doc_where: str | None = None) -> DataFrame:
    """ES ``terms`` aggregation over the query's matching doc set: the
    docmap field's bucket counts, ordered ES-style (doc_count DESC,
    key ASC), as ``(<field>, doc_count)``. Accepts every query shape
    ``match_ids`` does — match text, phrase, or a kinds-tagged bool
    plan — so ``search`` + ``aggs`` request bodies map 1:1.

    Scale shape: the match set stays a distributed frame (the
    match_ids contract), the docmap scan prunes to (doc_id, field),
    the join shuffles on doc_id, and the bucket agg is a map-side
    partial count over at most |buckets| keys — nothing per-doc ever
    reaches the driver; ``size`` bounds the final TakeOrdered. Matches
    are live docs only, so buckets follow deletes/merges like ES
    aggregations follow liveDocs."""
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    dm = store.docmap(spark).select("doc_id", field)
    return (ids.join(dm, "doc_id")
            .groupBy(field)
            .agg(F.count("*").alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc(field))
            .limit(size))


def _field_values(spark: SparkSession, store: IndexStore,
                  field: str) -> DataFrame:
    """(doc_id, <field>) for aggregations / sorting: docmap metadata
    fields, plus the engine's own per-doc numeric ``dl`` (indexed
    token count, the ES ``token_count``-ish field) from docstats."""
    if field == "dl":
        return store.docstats(spark)
    dm = store.docmap(spark)
    if field not in dm.columns:
        raise ValueError(f"unknown doc field {field!r}; have "
                         f"{dm.columns} + 'dl'")
    return dm.select("doc_id", field)


def stats_agg(spark: SparkSession, store: IndexStore, field: str,
              text: str = "", mode: str = "and", phrase: bool = False,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None,
              groups: list[list[str]] | None = None,
              min_should_match: int | None = None,
              plan: QueryPlan | None = None,
              doc_where: str | None = None) -> DataFrame:
    """ES ``stats`` metric aggregation over the match set's numeric
    field: ONE row ``(count, min, max, avg, sum)``. Same query-shape
    surface as ``terms_agg`` (any ``match_ids`` query). avg is rounded
    to 6 decimals for cross-engine comparability; min/max/sum are
    exact longs.

    Scale shape: match frame ⋈ (doc_id, field) on doc_id, then one
    map-side-partial global aggregate — a single scalar row crosses to
    the driver."""
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    v = _field_values(spark, store, field)
    return (ids.join(v, "doc_id").agg(
        F.count(field).cast("long").alias("count"),
        F.min(field).cast("long").alias("min"),
        F.max(field).cast("long").alias("max"),
        F.round(F.avg(field), 6).alias("avg"),
        F.sum(field).cast("long").alias("sum")))


def histogram_agg(spark: SparkSession, store: IndexStore, field: str,
                  interval: int, text: str = "", mode: str = "and",
                  phrase: bool = False,
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  groups: list[list[str]] | None = None,
                  min_should_match: int | None = None,
                  plan: QueryPlan | None = None,
                  min_doc_count: int = 0,
                  doc_where: str | None = None) -> DataFrame:
    """ES ``histogram`` aggregation over the match set:
    ``key = floor(field / interval) * interval`` buckets with
    doc_count, key ASC. ES's default ``min_doc_count=0`` semantics —
    empty buckets BETWEEN the first and last occupied bucket are
    materialized with doc_count 0 (via one ``sequence`` over the
    2-value bounds row, not a driver loop); ``min_doc_count=1`` skips
    the fill. Integer intervals only (the engine's numeric doc fields
    are token counts).

    Scale shape: one doc_id join + bucket-key aggregate (map-side
    partial over ≤ value-range/interval keys); the zero-fill joins a
    ≤ |buckets|-row generated frame against the counts — never
    per-doc."""
    if interval <= 0 or int(interval) != interval:
        raise ValueError("interval must be a positive integer")
    interval = int(interval)
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    v = _field_values(spark, store, field)
    keyed = (ids.join(v, "doc_id")
             .withColumn("key", (F.floor(F.col(field) / interval)
                                 * interval).cast("long")))
    counts = keyed.groupBy("key").agg(
        F.count("*").cast("long").alias("doc_count"))
    if min_doc_count == 0:
        bounds = counts.agg(F.min("key").alias("lo"),
                            F.max("key").alias("hi"))
        keys = (bounds.where(F.col("lo").isNotNull())
                .select(F.explode(F.sequence(
                    "lo", "hi", F.lit(interval))).alias("key")))
        counts = (keys.join(counts, "key", "left")
                  .select("key", F.coalesce("doc_count", F.lit(0))
                          .cast("long").alias("doc_count")))
    elif min_doc_count > 1:
        counts = counts.filter(F.col("doc_count") >= min_doc_count)
    return counts.orderBy(F.asc("key"))


def cardinality_agg(spark: SparkSession, store: IndexStore,
                    field: str, text: str = "", mode: str = "and",
                    phrase: bool = False,
                    syn: SynonymDict | None = None,
                    cfg: TokenizerConfig | None = None,
                    groups: list[list[str]] | None = None,
                    min_should_match: int | None = None,
                    plan: QueryPlan | None = None,
                    exact: bool = True, rsd: float = 0.05,
                    doc_where: str | None = None) -> DataFrame:
    """ES ``cardinality`` aggregation: distinct values of ``field``
    over the match set, ONE row ``(value)``. ES's implementation is
    HyperLogLog++; so is Spark's ``approx_count_distinct`` — that is
    the 100 TB path (``exact=False``, rsd-tunable, fixed-size sketch
    per partition, no distinct shuffle). ``exact=True`` (default here)
    runs the exact distinct count so results are oracle-comparable;
    at scale it is still one hash-distinct shuffle bounded by the
    number of DISTINCT values, not docs."""
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    v = _field_values(spark, store, field)
    j = ids.join(v, "doc_id")
    if exact:
        agg = F.count_distinct(F.col(field))
    else:
        agg = F.approx_count_distinct(field, rsd)
    return j.agg(agg.cast("long").alias("value"))


def percentiles_agg(spark: SparkSession, store: IndexStore,
                    field: str, percents=(25.0, 50.0, 75.0, 95.0,
                                          99.0),
                    text: str = "", mode: str = "and",
                    phrase: bool = False,
                    syn: SynonymDict | None = None,
                    cfg: TokenizerConfig | None = None,
                    groups: list[list[str]] | None = None,
                    min_should_match: int | None = None,
                    plan: QueryPlan | None = None,
                    exact: bool = True, accuracy: int = 10000,
                    doc_where: str | None = None) -> DataFrame:
    """ES ``percentiles`` metric aggregation over the match set's
    numeric field: ONE row, a ``p<percent>`` column per requested
    percent (linear interpolation between closest ranks — the
    continuous quantile both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` implement, so results are oracle-exact).

    Scale: ES serves this with a t-digest sketch, never exactly —
    ``exact=False`` is that 100 TB path (Spark
    ``percentile_approx``, a fixed-size QuantileSummaries sketch
    merged map-side, ``accuracy`` trades error for memory). The exact
    default buffers the match set's VALUES per executor (fine for
    per-doc scalars at sandbox scale; at web scale prefer the
    sketch, as ES itself does). Values are rounded to 6 decimals for
    cross-engine hash stability."""
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    v = _field_values(spark, store, field)
    j = ids.join(v, "doc_id")
    fn = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, accuracy))

    def pname(p) -> str:
        # p25, p99, p99_9 — never rstrip digits off integers
        # ('10'.rstrip('0') would collide 10 and 100 into 'p1')
        return "p" + (str(int(p)) if float(p) == int(p)
                      else str(float(p)).replace(".", "_"))

    names = [pname(p) for p in percents]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentiles in {percents}")
    cols = [F.round(fn(F.col(field), F.lit(float(p) / 100.0)), 6)
            .alias(n) for p, n in zip(percents, names)]
    return j.agg(*cols)


def range_agg(spark: SparkSession, store: IndexStore, field: str,
              ranges: list[tuple[float | None, float | None]],
              text: str = "", mode: str = "and", phrase: bool = False,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None,
              groups: list[list[str]] | None = None,
              min_should_match: int | None = None,
              plan: QueryPlan | None = None,
              doc_where: str | None = None) -> DataFrame:
    """ES ``range`` bucket aggregation: one row per requested range
    (``from`` inclusive, ``to`` exclusive, None = open end) with its
    doc_count — EVERY range materializes even when empty, keyed
    ``from-to`` exactly like ES (``*`` for an open end), in the given
    range order.

    Scale shape: ranges may overlap (a doc lands in every range that
    contains it — ES semantics), so the bucket map is a ≤ |ranges|-way
    conditional sum in ONE aggregate pass over the joined match set —
    no explode, no per-range scan."""
    if not ranges:
        raise ValueError("range_agg needs at least one range")
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    v = _field_values(spark, store, field)
    j = ids.join(v, "doc_id")

    def key(lo, hi):
        a = "*" if lo is None else f"{lo:g}"
        b = "*" if hi is None else f"{hi:g}"
        return f"{a}-{b}"

    aggs = []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) >= lo)
        if hi is not None:
            cond = cond & (F.col(field) < hi)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(key(lo, hi)))
    one = j.agg(*aggs)
    # unpivot to ES's (key, doc_count) bucket rows, preserving the
    # request order via a rank column dropped at the end
    pairs = [(i, key(lo, hi)) for i, (lo, hi) in enumerate(ranges)]
    sel = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(kk).alias("key"),
                 F.coalesce(F.col(kk), F.lit(0)).alias("doc_count"))
        for i, kk in pairs])
    return (one.select(F.explode(sel).alias("b"))
            .select("b.i", "b.key", "b.doc_count")
            .orderBy("i").drop("i"))


def terms_stats_agg(spark: SparkSession, store: IndexStore,
                    field: str, metric_field: str,
                    text: str = "", mode: str = "and",
                    phrase: bool = False,
                    syn: SynonymDict | None = None,
                    cfg: TokenizerConfig | None = None,
                    groups: list[list[str]] | None = None,
                    min_should_match: int | None = None,
                    plan: QueryPlan | None = None,
                    size: int = 10,
                    doc_where: str | None = None) -> DataFrame:
    """ES SUB-AGGREGATION (``aggs: {terms: {field}, aggs: {stats:
    {metric_field}}}``): the match set bucketed by ``field`` with a
    per-bucket ``stats`` metric — one row per bucket ``(key,
    doc_count, min, max, avg, sum)``, buckets by doc_count DESC then
    key ASC (the terms-agg order), top ``size``.

    Scale shape: ONE aggregate pass computes the bucket count and
    every metric together (map-side partials per bucket key) — ES
    likewise pushes sub-aggregation collectors into the same
    per-segment pass; nesting adds metric columns, never extra
    scans."""
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    dm = store.docmap(spark)
    if field in dm.columns and metric_field in dm.columns:
        # both from the docmap: ONE scan + join, not two
        j = ids.join(dm.select("doc_id", field, metric_field),
                     "doc_id")
    else:
        j = ids.join(_field_values(spark, store, field), "doc_id") \
               .join(_field_values(spark, store, metric_field),
                     "doc_id")
    return (j.groupBy(F.col(field).alias("key"))
            .agg(F.count("*").cast("long").alias("doc_count"),
                 F.min(metric_field).cast("long").alias("min"),
                 F.max(metric_field).cast("long").alias("max"),
                 F.round(F.avg(metric_field), 6).alias("avg"),
                 F.sum(metric_field).cast("long").alias("sum"))
            .orderBy(F.desc("doc_count"), F.asc("key"))
            .limit(size))


def composite_agg(spark: SparkSession, store: IndexStore, field: str,
                  size: int = 10, after: str | None = None,
                  text: str = "", mode: str = "and",
                  phrase: bool = False,
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  groups: list[list[str]] | None = None,
                  min_should_match: int | None = None,
                  plan: QueryPlan | None = None,
                  doc_where: str | None = None) -> DataFrame:
    """ES ``composite`` aggregation over one terms source: buckets in
    KEY order (ASC) so pagination is a cursor, not a deep heap —
    ``after`` returns the ``size`` buckets with key strictly greater
    (the ES after-key contract). Unlike ``terms_agg`` (top-N by
    count, unpageable beyond its size), composite streams the WHOLE
    bucket space across pages at constant cost per page.

    Scale shape: the key-range predicate lands before the bucket
    aggregate, so page N+1's shuffle carries only keys past the
    cursor — the same pre-admission cursoring as search_after."""
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    v = _field_values(spark, store, field)
    j = ids.join(v, "doc_id")
    if after is not None:
        j = j.filter(F.col(field) > F.lit(after))
    return (j.groupBy(field)
            .agg(F.count("*").cast("long").alias("doc_count"))
            .orderBy(F.asc(field)).limit(size))


def search_sorted(spark: SparkSession, store: IndexStore,
                  sort: list[tuple[str, str]], text: str = "",
                  mode: str = "and", phrase: bool = False,
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  groups: list[list[str]] | None = None,
                  min_should_match: int | None = None,
                  plan: QueryPlan | None = None,
                  k: int = 10,
                  doc_where: str | None = None,
                  after: tuple | None = None) -> DataFrame:
    """ES field ``sort``: top-k of the match set ordered by doc
    fields instead of _score (``"sort": [{"dl": "desc"},
    {"lang": "asc"}]``), final tiebreak doc_id ASC (the ES shard-doc
    tiebreaker). Returns ``(doc_id, <sort fields...>)``.

    ``after`` is sort-keyed ``search_after`` pagination: the previous
    page's last row as ``(<sort values...>, doc_id)``; only rows
    strictly after that cursor in the total sort order are admitted,
    so page N+1 costs the same one job as page 1 and never re-ships
    earlier pages (the ES deep-pagination contract).

    Scale shape: the match frame joins each sort field's (doc_id,
    value) projection on doc_id, the cursor filter is a codegen
    lexicographic predicate applied BEFORE the cut, then
    TakeOrderedAndProject — a per-partition k-heap + driver merge of
    n_partitions·k rows, never a full sort."""
    if not sort:
        raise ValueError("sort needs at least one (field, direction)")
    ids = match_ids(spark, store, text, mode, phrase, syn, cfg,
                    groups, min_should_match, plan,
                    doc_where=doc_where)
    df = ids
    order = []
    for field, direction in sort:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction {direction!r} not asc/desc")
        df = df.join(_field_values(spark, store, field), "doc_id")
        order.append(F.asc(field) if direction == "asc"
                     else F.desc(field))
    order.append(F.asc("doc_id"))
    if after is not None:
        keys = [f for f, _ in sort] + ["doc_id"]
        dirs = [d for _, d in sort] + ["asc"]
        if len(after) != len(keys):
            raise ValueError(f"after needs {len(keys)} values "
                             f"(<sort fields...>, doc_id)")
        # strictly-after-cursor in the total order: OR over i of
        # (all keys < i equal) AND (key i past the cursor per its
        # direction) — pure codegen comparisons, no UDF
        cond = F.lit(False)
        for i, (key, d) in enumerate(zip(keys, dirs)):
            ci = F.col(key) > F.lit(after[i]) if d == "asc" \
                else F.col(key) < F.lit(after[i])
            for j in range(i):
                ci = ci & (F.col(keys[j]) == F.lit(after[j]))
            cond = cond | ci
        df = df.filter(cond)
    return (df.orderBy(*order).limit(k)
            .select("doc_id", *[f for f, _ in sort]))


def prefix_terms(spark: SparkSession, store: IndexStore, prefix: str,
                 max_expansions: int | None = None) -> list[str]:
    """Index terms matching an ES ``prefix`` query, resolved from the
    term dictionary (termstats). Selection under ``max_expansions`` is
    the Lucene ``top_terms_N`` rewrite: highest-df terms first, term
    ASC tiebreak — deterministic, so rewrites are reproducible.

    Scale shape: the StartsWith predicate pushes below the termstats
    delta-sum to the parquet scan (min/max row-group pruning on the
    sorted term column), and the driver receives only the ≤
    max_expansions term STRINGS (unbounded expansion returns the
    prefix's whole dictionary range — fine for real prefixes; a
    pathological one-letter prefix over a web-scale unigram dictionary
    should pass max_expansions, as ES's rewrite caps do)."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    ts = store.termstats(spark).filter(F.col("term").startswith(prefix))
    if max_expansions is not None:
        ts = ts.orderBy(F.desc("df"), F.asc("term")) \
               .limit(max_expansions)
    return sorted(r.term for r in ts.select("term", "df").collect())


def count_prefix(spark: SparkSession, store: IndexStore, prefix: str,
                 max_expansions: int | None = None) -> DataFrame:
    """ES ``prefix`` query hit count (constant_score rewrite — the ES
    default: matching is a doc-set union over the expanded terms, no
    scoring). One group of all expanded terms feeds the distributed
    match workers; uncapped by default like Lucene's blended
    constant-score rewrite."""
    terms = prefix_terms(spark, store, prefix, max_expansions)
    if not terms:
        return spark.range(1).select(F.lit(0).cast("long").alias("hits"))
    return count_matches(spark, store, mode="or", groups=[terms])


def prefix_ids(spark: SparkSession, store: IndexStore, prefix: str,
               max_expansions: int | None = None) -> DataFrame:
    """Matching doc ids of a constant-score ES ``prefix`` query, as a
    distributed ``doc_id long`` frame (the scroll surface)."""
    terms = prefix_terms(spark, store, prefix, max_expansions)
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    return match_ids(spark, store, mode="or", groups=[terms])


def search_prefix(spark: SparkSession, store: IndexStore, prefix: str,
                  k: int = 10,
                  max_expansions: int = 50) -> DataFrame:
    """ES ``prefix`` query under the ``scoring_boolean`` rewrite:
    every expanded term becomes its own BM25 SHOULD clause (its own
    idf), ranked by the same shard-parallel block-max WAND as any
    disjunction — the rewrite Lucene applies when a MultiTermQuery
    must score. ``max_expansions`` caps the clause count (ES's
    rewrite parameter; default 50 like fuzzy/prefix expansion
    defaults) with the deterministic top-df selection from
    ``prefix_terms``."""
    terms = prefix_terms(spark, store, prefix, max_expansions)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return search(spark, store, "", k=k, mode="or",
                  groups=[[t] for t in terms])


def mlt_terms(spark: SparkSession, store: IndexStore, text: str,
              max_query_terms: int = 25, min_term_freq: int = 2,
              min_doc_freq: int = 5,
              syn: SynonymDict | None = None,
              cfg: TokenizerConfig | None = None) -> list[str]:
    """ES ``more_like_this`` interesting-term selection: tokenize the
    liked text with the INDEX analyzer, keep terms with
    tf ≥ min_term_freq and df ≥ min_doc_freq (the ES defaults are
    2 / 5), rank by tf·idf (rounded to 6 decimals so the selection is
    reproducible across engines), term ASC ties, take the top
    ``max_query_terms`` (ES default 25). df lookups ride the
    term-filtered termstats scan — only |distinct terms| rows reach
    the driver."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    toks = [w for w, *_ in tokenize(text, cfg, syn)]
    if not toks:
        return []
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    dfs = store.term_dfs(spark, sorted(tf), build_id=meta.build_id)
    n_eff = meta.n_docs - meta.n_purged
    cand = [(round(tf[t] * idf(n_eff, dfs.get(t, 0)), 6), t)
            for t in tf
            if tf[t] >= min_term_freq
            and dfs.get(t, 0) >= max(1, min_doc_freq)]
    cand.sort(key=lambda x: (-x[0], x[1]))
    return [t for _s, t in cand[:max_query_terms]]


def more_like_this(spark: SparkSession, store: IndexStore, like,
                   corpus: DataFrame | None = None,
                   text_col: str = "content", k: int = 10,
                   max_query_terms: int = 25, min_term_freq: int = 2,
                   min_doc_freq: int = 5,
                   syn: SynonymDict | None = None,
                   cfg: TokenizerConfig | None = None) -> DataFrame:
    """ES ``more_like_this``: find docs similar to ``like`` — a free
    text (the ES ``like: ["..."]`` form) or an int doc_id (the
    ``like: [{_id: ...}]`` form; needs ``corpus`` to fetch the text,
    and the liked doc is excluded from results like ES's default
    ``include: false``). The selected interesting terms (see
    ``mlt_terms``) each become their own BM25 SHOULD clause ranked by
    the standard shard-parallel WAND — Lucene's MLT builds exactly
    this BooleanQuery.

    Scale shape: one driver-side tokenize of ONE document + a
    term-filtered df lookup, then a normal ≤25-clause disjunction —
    identical cost profile to any OR query."""
    exclude: int | None = None
    if isinstance(like, int):
        if corpus is None:
            raise ValueError("like=<doc_id> needs the corpus "
                             "DataFrame to fetch the document text")
        if "doc_id" in corpus.columns:
            # corpus keyed by native doc_id (kept by build_index)
            rows = (corpus.filter(F.col("doc_id") == like)
                    .select(text_col).collect())
        else:
            # resolve the engine id through the docmap's document
            # keys, exactly like fetch_sources
            dm = store.docmap(spark)
            keys = [c for c in ("repo", "path", "commit")
                    if c in corpus.columns and c in dm.columns]
            if not keys:
                raise ValueError("corpus shares no document keys "
                                 "(repo/path/commit or doc_id) with "
                                 "this index's docmap")
            rows = (dm.filter(F.col("doc_id") == like).select(*keys)
                    .join(corpus, keys).select(text_col).collect())
        if not rows:
            raise ValueError(f"doc_id {like} not found in corpus")
        text, exclude = rows[0][0], like
    else:
        text = like
    terms = mlt_terms(spark, store, text, max_query_terms,
                      min_term_freq, min_doc_freq, syn, cfg)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    hits = search(spark, store, "", k=k + (1 if exclude is not None
                                           else 0),
                  mode="or", groups=[[t] for t in terms])
    if exclude is not None:
        hits = (hits.filter(F.col("doc_id") != exclude)
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    return hits


def rescore(spark: SparkSession, store: IndexStore, text: str,
            rescore_text: str, k: int = 10, window_size: int = 50,
            query_weight: float = 1.0,
            rescore_query_weight: float = 1.0,
            score_mode: str = "total", mode: str = "and",
            syn: SynonymDict | None = None,
            cfg: TokenizerConfig | None = None) -> DataFrame:
    """ES ``rescore`` (query rescorer): re-rank the primary query's
    top ``window_size`` hits by combining their primary score with a
    secondary query's BM25 score, per ``score_mode`` —
    total (default), multiply, avg, max, min — with the ES
    query_weight / rescore_query_weight factors. Docs in the window
    that don't match the secondary query keep a 0 secondary score
    (match-query OR semantics), exactly like ES.

    Divergence note: ES applies the window PER SHARD; this engine is
    one logical index, so the window is global — the stricter, more
    predictable contract.

    Scale shape: the window is k-bounded (≤ window_size ids on the
    driver, like any top-k), and the secondary scoring is candidate-
    restricted — ``decoded_postings(doc_ids=window)`` prunes decode to
    blocks whose doc range covers a window doc, so the rescore query's
    full posting lists are never scanned (the reason ES rescore is
    cheap: scoring ~50 docs, not df docs)."""
    combiner = {
        "total": lambda p, s: p + s,
        "multiply": lambda p, s: p * s,
        "avg": lambda p, s: (p + s) / 2.0,
        "max": lambda p, s: F.greatest(p, s),
        "min": lambda p, s: F.least(p, s),
    }.get(score_mode)
    if combiner is None:
        raise ValueError(f"score_mode {score_mode!r} not in "
                         "total/multiply/avg/max/min")
    primary = search(spark, store, text, k=window_size, mode=mode,
                     syn=syn, cfg=cfg)
    window = primary.collect()          # ≤ window_size rows
    if not window:
        return spark.createDataFrame([], "doc_id long, score double")
    ids = [int(r.doc_id) for r in window]
    meta = store.meta()
    plan2 = plan_query(spark, store, rescore_text, syn, cfg)
    if plan2.groups:
        sec = _field_group_scores(spark, store, meta, plan2,
                                  mode="or", cand_ids=ids)
    else:
        sec = spark.createDataFrame([], "doc_id long, fscore double")
    prim = spark.createDataFrame(
        [(int(r.doc_id), float(r.score)) for r in window],
        "doc_id long, pscore double")
    p = F.col("pscore") * F.lit(float(query_weight))
    s = F.col("fscore") * F.lit(float(rescore_query_weight))
    # window docs that don't match the rescore query keep their
    # (weighted) primary score — the combiner only applies to matched
    # docs (under "total" this equals p + 0, the ES behavior; under
    # multiply/avg/max/min combining with an absent score would be
    # wrong)
    final = F.when(F.col("fscore").isNull(), p) \
        .otherwise(combiner(p, s))
    return (prim.join(sec, "doc_id", "left")
            .select("doc_id", final.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def _field_group_scores(spark: SparkSession, fstore: IndexStore, meta,
                        plan: QueryPlan, mode: str,
                        cand_ids: list[int] | None = None) -> DataFrame:
    """One field's exact per-doc BM25 fold (doc_id, fscore) — the
    declarative scorer shared by ``search_fields`` (candidate-
    restricted) and ``search_fields_scan`` (full decode). When
    ``cand_ids`` is given, the restriction is pushed to BLOCK METADATA
    (``decoded_postings(doc_ids=...)``): only blocks whose doc range
    covers a candidate are decoded — ~one block per term per
    candidate run instead of the term's whole posting list."""
    # beyond this many candidates the per-doc block predicate stops
    # paying (a huge OR tree); fall back to full decode + semi-join
    pushdown = cand_ids if (cand_ids is not None
                            and len(cand_ids) <= 1024) else None
    p = decoded_postings(spark, fstore, plan.terms, doc_ids=pushdown)
    if cand_ids is not None and pushdown is None:
        cand_df = spark.createDataFrame([(int(d),) for d in cand_ids],
                                        "doc_id long")
        p = p.join(F.broadcast(cand_df), "doc_id", "left_semi")
    gm = [(t, gi, plan.idfs[gi]) for gi, g in enumerate(plan.groups)
          for t in g]
    group_map = spark.createDataFrame(
        gm, "term string, gid int, gidf double")
    k1, b, avgdl = plan.k1, plan.b, plan.avgdl
    per_group = (
        p.join(F.broadcast(group_map), "term")
        .groupBy("doc_id", "gid")
        .agg(F.sum("tf").alias("tfg"), F.first("dl").alias("dl"),
             F.first("gidf").alias("gidf"))
        .withColumn("gscore",
                    F.col("gidf") * (F.col("tfg") /
                    (F.col("tfg") + F.lit(k1) *
                     (F.lit(1 - b) + F.lit(b) * F.col("dl")
                      / F.lit(avgdl))))))
    agg = per_group.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("gid", "gscore"))),
            F.lit(0.0), lambda acc, x: acc + x["gscore"],
        ).alias("fscore"),
        F.count("*").alias("ngroups"))
    if mode == "and":
        agg = agg.filter(F.col("ngroups") == len(plan.groups))
    if meta.delete_batches:
        agg = agg.join(fstore.deletes(spark), "doc_id", "left_anti")
    return agg.select("doc_id", "fscore")


def _fields_total(spark: SparkSession, planned: list, mode: str,
                  cand_ids: list[int] | None,
                  combine: str = "sum",
                  tie_breaker: float = 0.0) -> DataFrame:
    """Cross-field combine (doc_id, score) over the planned fields,
    from each field's boost-weighted exact BM25:

    - ``combine="sum"`` — most_fields: Σ_f boost_f × BM25_f, ordered
      per-field fold so the sum is bit-stable (same association as
      the scan oracle);
    - ``combine="dismax"`` — best_fields / Lucene
      DisjunctionMaxQuery: max_f + tie_breaker × Σ(others), the ES
      ``dis_max`` scorer. tie_breaker=0 is pure best-field."""
    per_field = []
    for fi, (fstore, boost, plan, meta) in enumerate(planned):
        agg = _field_group_scores(spark, fstore, meta, plan, mode,
                                  cand_ids)
        per_field.append(agg.select(
            "doc_id",
            (F.col("fscore") * F.lit(float(boost))).alias("fscore"),
            F.lit(fi).alias("_f")))
    un = per_field[0]
    for f in per_field[1:]:
        un = un.unionByName(f)
    arr = F.array_sort(F.collect_list(F.struct("_f", "fscore")))
    ssum = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["fscore"])
    if combine == "sum":
        return un.groupBy("doc_id").agg(ssum.alias("score"))
    smax = F.array_max(F.transform(arr, lambda x: x["fscore"]))
    return un.groupBy("doc_id").agg(
        (smax + F.lit(float(tie_breaker)) * (ssum - smax))
        .alias("score"))


def _plan_fields(spark, fields, text, syn, cfg) -> list:
    planned = []
    for fname, (fstore, boost) in sorted(fields.items()):
        meta = fstore.meta()
        fcfg = cfg or TokenizerConfig(**meta.cfg)
        plan = plan_query(spark, fstore, text, syn, fcfg)
        if plan.groups:
            planned.append((fstore, boost, plan, meta))
    return planned


def search_fields_scan(spark: SparkSession, fields: dict, text: str,
                       k: int = 10,
                       mode: str = "and",
                       syn: SynonymDict | None = None,
                       cfg: TokenizerConfig | None = None,
                       type: str = "most_fields",
                       tie_breaker: float = 0.0) -> DataFrame:
    """The declarative full-decode multi_match scorer — every posting
    of every query term in every field is decoded (df-linear). Kept as
    the in-repo oracle for ``search_fields``; use that WAND-pruned
    path for serving."""
    planned = _plan_fields(spark, fields, text, syn, cfg)
    if not planned:
        return spark.createDataFrame([], "doc_id long, score double")
    out = _fields_total(spark, planned, mode, None,
                        combine="dismax" if type == "best_fields"
                        else "sum", tie_breaker=tie_breaker)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_fields(spark: SparkSession, fields: dict, text: str,
                  k: int = 10,
                  mode: str = "and",
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  type: str = "most_fields",
                  tie_breaker: float = 0.0) -> DataFrame:
    """ES ``multi_match`` (most_fields / best_fields) over per-field
    indexes: ``fields`` maps field name -> (IndexStore, boost).
    ``type="best_fields"`` scores Lucene's DisjunctionMaxQuery —
    max over fields plus ``tie_breaker`` × the rest (the ES
    ``dis_max`` query; 0 ≤ tie_breaker ≤ 1). The reference's
    msg1/msg2 deployment indexes each field separately (one analyzer
    chain per field — our ``build_index(text_col=...)`` shape,
    SynonymPluginTest.java:106-131); ES then scores a bool-should of
    per-field match queries:

    - a doc matches if AT LEAST ONE field's query matches (each field
      applies ``mode`` with its own analyzer/stats);
    - score = Σ over matching fields of boost_f × BM25_f(doc) — each
      field uses ITS OWN df/N/avgdl (per-field norms, exactly ES).

    Requires the field indexes to share doc ids: built from the same
    corpus (native ids, or the deterministic key-derived assignment —
    identical either way).

    EXACT top-k without a full posting scan — Fagin-style threshold
    algorithm over per-field block-max WAND:

    1. per field: WAND top-k' (the ``search`` fast path, per-field
       plans/norms/liveDocs, k' starts at k) → candidate ids C and
       the field's k'-th score s_f (0 when the field exhausted, i.e.
       returned < k' hits: every matching doc is already in C);
    2. exact totals for C only — the declarative fold restricted to
       candidate blocks (block-metadata pushdown, ~one block per term
       per candidate instead of whole posting lists);
    3. soundness gate: any doc outside C scores ≤ τ = Σ_f boost_f×s_f
       in every field, so if the k-th exact total beats τ (or every
       field exhausted), the top-k is PROVEN exact; otherwise deepen
       k' ×4 and repeat (terminates: k' reaches every field's hit
       count and all fields exhaust).

    A common term no longer costs a df-linear decode per field — the
    round-4 scale hole; ``search_fields_scan`` remains the oracle.

    The threshold gate adapts to the combine: a doc outside C scores
    at most boost_f × s_f in each field, so its most_fields total is
    ≤ τ_sum = Σ_f boost_f s_f, and its best_fields total is
    ≤ τ_max = M + tie_breaker × (τ_sum − M) with M = max_f boost_f s_f
    (b + tb(S − b) is increasing in b for tb ≤ 1 — the max-field
    choice dominates)."""
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError("tie_breaker must be in [0, 1]")
    combine = "dismax" if type == "best_fields" else "sum"
    planned = _plan_fields(spark, fields, text, syn, cfg)
    if not planned:
        return spark.createDataFrame([], "doc_id long, score double")

    kk = max(k, 1)
    while True:
        cand: set[int] = set()
        fbounds: list[float] = []
        exhausted = True
        for fstore, boost, plan, meta in planned:
            hits = _wand_topk(spark, fstore, meta, plan, kk,
                              mode).collect()
            cand.update(int(r.doc_id) for r in hits)
            if len(hits) >= kk:
                exhausted = False
                fbounds.append(float(boost) * hits[-1].score)
            # else: every matching doc of this field is in C; docs
            # outside C score 0 here — contributes nothing to τ
        if not cand:
            return spark.createDataFrame([],
                                         "doc_id long, score double")
        s_all = sum(fbounds)
        if combine == "sum" or not fbounds:
            tau = s_all
        else:
            m = max(fbounds)
            tau = m + tie_breaker * (s_all - m)
        totals = _fields_total(spark, planned, mode, sorted(cand),
                               combine=combine,
                               tie_breaker=tie_breaker)
        top = totals.orderBy(F.desc("score"),
                             F.asc("doc_id")).limit(k).collect()
        if exhausted or (len(top) == k and top[-1].score > tau):
            return spark.createDataFrame(
                [(int(r.doc_id), float(r.score)) for r in top],
                "doc_id long, score double")
        kk *= 4
