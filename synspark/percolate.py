"""Percolation — reverse search (the ES ``percolate`` query): REGISTER
queries once, then stream documents through them and ask "which
registered queries does this doc match?". The canonical alerting /
routing / classification shape for an ingest pipeline: saved searches
fire as documents arrive.

ES's percolator indexes each query's extracted terms and pre-selects
candidate queries by term intersection before verifying. The same
two-sided design here, Spark-first:

- ``register_queries`` analyzes each query with the INDEX'S analyzer
  (the reference's tokenizer defines what a term is — reference:
  src/main/java/.../NGramSynonymTokenizerFactory.java) into a flat
  ``(query_id, gid, term, n_groups, required)`` frame — one row per
  alternative per position group, synonym expansion included. This is
  the percolator "index": a plain DataFrame, persistable as parquet.
- ``percolate`` matches a document frame against it. A doc matches
  when its distinct matched GROUPS ≥ ``required`` (AND ⇒ all groups,
  OR ⇒ 1, minimum_should_match ⇒ m) — must/should semantics; any
  synonym alternative satisfies its group.

Two execution paths, same results:

- **broadcast (default)**: the registered-query table rides a
  broadcast and each Arrow batch decides its docs LOCALLY — zero
  shuffle, zero state. This is why ``percolate`` works UNCHANGED on a
  Structured Streaming frame (stateless mapInPandas, append mode):
  saved-search alerting over a stream is the same call.
- **distributed (broadcast=False)**: for query sets too large for one
  executor's memory — doc terms ⋈ query terms on term (shuffle
  bounded by Σ per-doc distinct terms × queries-per-term), then a
  (doc, query) group count against ``required``. The 100 TB path when
  "queries" number in the hundreds of millions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import analyze_query
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig

__all__ = ["register_queries", "percolate"]


def _spread(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fan the (id, text) projection out to one partition per core
    before the tokenize pass. Single-file corpora (every sf table, and
    any small ingest batch) arrive as a handful of input splits, so the
    mapInPandas tokenizer otherwise runs on that many cores (measured:
    6 tasks / 9.9s at sf1.0 vs 32 tasks / ~1s — the round-5 ``_fanout``
    lesson applied to percolation, guide §2.6). Only the two needed
    columns are shuffled (§2.3), only when the input is under-split,
    and never on a streaming frame (the broadcast path's zero-shuffle
    statelessness is the streaming contract)."""
    sel = docs.select(id_col, text_col)
    if docs.isStreaming:
        return sel
    n = max(1, docs.sparkSession.sparkContext.defaultParallelism)
    if sel.rdd.getNumPartitions() >= n:
        return sel
    return sel.repartition(n)

REG_SCHEMA = ("query_id long, gid int, term string, n_groups int, "
              "required int")


def register_queries(spark: SparkSession,
                     queries: list[tuple],
                     cfg: TokenizerConfig,
                     syn: SynonymDict | None = None) -> DataFrame:
    """Analyze ``queries`` — tuples ``(query_id, text, mode[, msm])``
    with mode in {"and", "or", "msm"} — into the percolator frame.
    Queries are tiny relative to documents (they're what users SAVE);
    analysis happens driver-side exactly like single-query planning,
    and the result is a DataFrame you can persist and re-load as
    parquet."""
    rows = []
    for q in queries:
        qid, text, mode = q[0], q[1], q[2]
        msm = q[3] if len(q) > 3 else None
        groups = analyze_query(text, cfg, syn)
        if not groups:
            continue
        if mode == "and":
            required = len(groups)
        elif mode == "or":
            required = 1
        elif mode == "msm":
            if not msm or msm < 1:
                raise ValueError(f"query {qid}: mode='msm' needs a "
                                 "positive minimum_should_match")
            required = min(int(msm), len(groups))
        else:
            raise ValueError(f"query {qid}: mode {mode!r} not in "
                             "('and', 'or', 'msm')")
        for gid, g in enumerate(groups):
            for t in g:
                rows.append((int(qid), gid, t, len(groups), required))
    return spark.createDataFrame(rows, REG_SCHEMA)


def percolate(spark: SparkSession, reg: DataFrame, docs: DataFrame,
              cfg: TokenizerConfig, syn: SynonymDict | None = None,
              text_col: str = "content", id_col: str = "doc_id",
              broadcast: bool = True) -> DataFrame:
    """Match every document in ``docs`` against the registered
    queries. Returns ``(<id_col>, query_id)`` — one row per (doc,
    matching query). Works on a STREAMING ``docs`` frame too (the
    broadcast path is stateless; ES percolation during ingest is
    exactly this).

    ``broadcast=True`` collects the reg frame to a driver dict once
    and ships it with the Arrow workers; ``broadcast=False`` keeps
    everything distributed (term-join + group count) for huge query
    sets."""
    if docs.isStreaming and not broadcast:
        raise ValueError("streaming percolation requires the "
                         "broadcast path (stateless per-batch match)")
    if broadcast:
        by_term: dict[str, list[tuple[int, int]]] = {}
        req: dict[int, int] = {}
        for r in reg.collect():
            by_term.setdefault(r["term"], []).append(
                (int(r["query_id"]), int(r["gid"])))
            req[int(r["query_id"])] = int(r["required"])
        bc = spark.sparkContext.broadcast((by_term, req))
        n, expand, ignore_case = cfg.n, cfg.expand, cfg.ignore_case

        def run(batches):
            from .tokenizer import _tokenize_block, blocks
            cfg_l = TokenizerConfig(n=n, expand=expand,
                                    ignore_case=ignore_case)
            delims = cfg_l.delimiters
            terms_map, req_l = bc.value
            # percolation only needs each doc's DISTINCT matched query
            # terms, so tokenize per BLOCK with the indexer's memo
            # shape and cache each block's matching (qid, gid) hits —
            # real corpora repeat blocks heavily, so most blocks cost
            # one dict lookup instead of a re-tokenize (round 6,
            # guide §4.5 amortized per-task state)
            hit_cache: dict = {}

            def block_hits(block):
                hits = hit_cache.get(block)
                if hits is None:
                    hits = tuple(
                        e for w in
                        {t[0] for t in _tokenize_block(
                            block, n, expand, ignore_case, syn,
                            cfg_l.emit_short_blocks)}
                        for e in terms_map.get(w, ()))
                    if len(hit_cache) < 65536:
                        hit_cache[block] = hits
                return hits

            for pdf in batches:
                out_id, out_q = [], []
                for did, body in zip(pdf[id_col], pdf[text_col]):
                    if not body:
                        continue
                    hit: dict[int, set[int]] = {}
                    for _bs, block in blocks(body, delims):
                        for qid, gid in block_hits(block):
                            hit.setdefault(qid, set()).add(gid)
                    for qid, gids in hit.items():
                        if len(gids) >= req_l[qid]:
                            out_id.append(did)
                            out_q.append(qid)
                yield pd.DataFrame({id_col: out_id,
                                    "query_id": out_q})

        id_type = dict(zip(docs.columns,
                           [f.dataType.simpleString()
                            for f in docs.schema.fields]))[id_col]
        return _spread(docs, id_col, text_col).mapInPandas(
            run, schema=f"{id_col} {id_type}, query_id long")

    # distributed path: doc terms ⋈ reg on term, group count vs required
    n, expand, ignore_case = cfg.n, cfg.expand, cfg.ignore_case

    def tok(batches):
        from .tokenizer import tokenize as _tok
        cfg_l = TokenizerConfig(n=n, expand=expand,
                                ignore_case=ignore_case)
        for pdf in batches:
            out_id, out_t = [], []
            for did, body in zip(pdf[id_col], pdf[text_col]):
                if not body:
                    continue
                for w in {w for w, *_ in _tok(body, cfg_l, syn)}:
                    out_id.append(did)
                    out_t.append(w)
            yield pd.DataFrame({id_col: out_id, "term": out_t})

    id_type = dict(zip(docs.columns,
                       [f.dataType.simpleString()
                        for f in docs.schema.fields]))[id_col]
    doc_terms = _spread(docs, id_col, text_col).mapInPandas(
        tok, schema=f"{id_col} {id_type}, term string")
    matched = (doc_terms.join(reg, "term")
               .select(id_col, "query_id", "gid", "required")
               .distinct()
               .groupBy(id_col, "query_id", "required")
               .agg(F.count("*").alias("_m"))
               .filter(F.col("_m") >= F.col("required")))
    return matched.select(id_col, "query_id")
