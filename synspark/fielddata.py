"""Re-analysis ("fielddata") surfaces: ES ``significant_terms`` and
the ``_termvectors`` API.

Both need the TERMS OF SPECIFIC DOCUMENTS — the forward view the
inverted index doesn't store. ES's answer for text fields is the same
one used here: re-analyze the stored source with the index's own
analyzer (significant_terms on text requires ``fielddata=true`` —
analyze-on-read; ``_termvectors`` computes vectors on the fly from
_source when they weren't stored at index time). The reference plugin
defines that analyzer (reference: src/main/java/.../
NGramSynonymTokenizerFactory.java); the host features consuming it
are what this module re-expresses.

Scale shapes (100 TB):
- re-analysis is Arrow-batched mapInPandas over ONLY the hydrated doc
  set — the match set for significant_terms (aggregations visit
  matches, never the corpus), the requested ids for term vectors;
- foreground term counts are a distinct + partial-agg count bounded by
  the foreground's vocabulary;
- background stats come from the index's termstats frame (term, df,
  cf) — a term-filtered parquet scan semi-joined to the foreground
  vocabulary, NEVER a corpus re-scan; df/cf are the same merge-on-read
  additive stats every query plan uses;
- nothing per-document crosses the driver; ``size`` bounds the final
  TakeOrdered.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_store import IndexStore
from .query import match_ids
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig

__all__ = ["significant_terms_agg", "term_vectors"]


def _hydrate(spark: SparkSession, store: IndexStore, ids: DataFrame,
             corpus: DataFrame, meta) -> DataFrame:
    """(doc_id, _text) for the given id frame — docmap keys ⋈ corpus,
    the fetch_sources join without the score ordering."""
    dm = store.docmap(spark)
    keys = [c for c in ["repo", "path", "commit"]
            if c in dm.columns and c in corpus.columns]
    if not keys and "doc_id" in corpus.columns:
        keys = ["doc_id"]  # corpora keyed by native doc_id
    if not keys:
        raise ValueError("corpus shares no join keys with the docmap "
                         "(need repo/path/commit or doc_id)")
    sel = dm.select("doc_id", *[k for k in keys if k != "doc_id"]) \
        .join(ids, "doc_id", "left_semi")
    return sel.join(corpus.select(*keys, meta.text_col), keys) \
        .select("doc_id", F.col(meta.text_col).alias("_text"))


def _doc_terms(hydrated: DataFrame, cfg: TokenizerConfig,
               syn: SynonymDict | None, counts: bool) -> DataFrame:
    """Re-analyze hydrated docs → (doc_id, term[, tf]): the fielddata
    load, Arrow-batched, same tokenizer the index was built with."""
    n, expand, ignore_case = cfg.n, cfg.expand, cfg.ignore_case
    want_tf = counts

    def run(batches):
        from .tokenizer import tokenize as _tok
        cfg_l = TokenizerConfig(n=n, expand=expand,
                                ignore_case=ignore_case)
        for pdf in batches:
            out = {"doc_id": [], "term": []}
            if want_tf:
                out["tf"] = []
            for did, body in zip(pdf["doc_id"], pdf["_text"]):
                if not body:
                    continue
                seen: dict[str, int] = {}
                for w, *_ in _tok(body, cfg_l, syn):
                    seen[w] = seen.get(w, 0) + 1
                for w, c in seen.items():
                    out["doc_id"].append(int(did))
                    out["term"].append(w)
                    if want_tf:
                        out["tf"].append(c)
            yield pd.DataFrame(out)

    schema = "doc_id long, term string" + (", tf long" if counts else "")
    return hydrated.mapInPandas(run, schema=schema)


def significant_terms_agg(spark: SparkSession, store: IndexStore,
                          corpus: DataFrame, text: str = "",
                          mode: str = "and",
                          syn: SynonymDict | None = None,
                          cfg: TokenizerConfig | None = None,
                          groups: list[list[str]] | None = None,
                          min_should_match: int | None = None,
                          plan=None, size: int = 10,
                          min_doc_count: int = 1,
                          sample_size: int | None = None,
                          doc_where: str | None = None) -> DataFrame:
    """ES ``significant_terms`` over the match set: terms unusually
    frequent in the FOREGROUND (matching docs) vs the BACKGROUND (the
    whole index), scored with ES's default JLH —
    ``(fg% − bg%) · (fg% / bg%)`` when fg% > bg%, else 0 (absolute
    change × relative change; zero-or-negative lift never surfaces).
    Returns ``(term, doc_count, bg_count, score_r)`` ordered score_r
    DESC, term ASC, limited to ``size``.

    Foreground doc counts come from re-analysis of the matching docs
    (the fielddata contract above); background df comes from the
    index's termstats — so like ES, background counts follow Lucene's
    pre-merge semantics (tombstoned docs still count until merged) and
    the denominator is the index's maxDoc-equivalent, while the
    foreground is live matches only.

    ``sample_size`` is the ES ``sampler`` aggregation composed around
    significant_terms: the foreground becomes the ``sample_size``
    BEST-SCORING matches (BM25, rounded-score/doc_id deterministic
    cut) instead of all matches — the standard trick for keeping the
    fielddata re-analysis cost fixed when the match set is huge and
    only the head is representative."""
    meta = store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    if sample_size is not None:
        from .query import score_matches
        scored = score_matches(spark, store, text, mode, syn, cfg,
                               groups=groups, plan=plan,
                               doc_where=doc_where)
        ids = (scored.withColumn("_r", F.round("score", 6))
               .orderBy(F.desc("_r"), F.asc("doc_id"))
               .limit(int(sample_size)).select("doc_id"))
    else:
        ids = match_ids(spark, store, text, mode, syn=syn, cfg=cfg,
                        groups=groups,
                        min_should_match=min_should_match,
                        plan=plan, doc_where=doc_where)
    hyd = _hydrate(spark, store, ids, corpus, meta)
    fg = (_doc_terms(hyd, cfg, syn, counts=False)
          .groupBy("term")
          .agg(F.count("*").cast("long").alias("doc_count")))
    if min_doc_count > 1:
        fg = fg.filter(F.col("doc_count") >= min_doc_count)
    fg_total = ids.agg(F.count("*").cast("double").alias("_fgn"))
    bg = (store.termstats(spark)
          .groupBy("term").agg(F.sum("df").cast("long")
                               .alias("bg_count")))
    n_bg = float(meta.n_docs - meta.n_purged)
    fgp = F.col("doc_count") / F.col("_fgn")
    bgp = F.col("bg_count") / F.lit(n_bg)
    jlh = F.when(fgp > bgp, (fgp - bgp) * (fgp / bgp)) \
        .otherwise(F.lit(0.0))
    return (fg.join(bg, "term").crossJoin(F.broadcast(fg_total))
            .withColumn("score_r", F.round(jlh, 6))
            .filter(F.col("score_r") > 0)
            .select("term", "doc_count", "bg_count", "score_r")
            .orderBy(F.desc("score_r"), F.asc("term")).limit(size))


def term_vectors(spark: SparkSession, store: IndexStore,
                 corpus: DataFrame, doc_ids: list[int],
                 syn: SynonymDict | None = None,
                 term_statistics: bool = True) -> DataFrame:
    """The ES ``_termvectors`` API for ``doc_ids``: per-document term
    frequencies, re-derived on the fly from _source exactly as ES does
    when vectors weren't stored. With ``term_statistics`` (ES's
    opt-in flag) each term also carries the collection-wide ``df`` and
    ``ttf`` from termstats. Returns
    ``(doc_id, term, tf[, df, ttf])`` ordered (doc_id, term).

    ``syn`` must be the dict the index was built with (analyzer =
    config, not index data — the same contract append enforces via
    meta.dict_fingerprint).

    The requested-id frame drives everything — hydration, re-analysis,
    and the term-filtered termstats join are all bounded by the
    requested docs and their vocabulary."""
    meta = store.meta()
    cfg = TokenizerConfig(**meta.cfg)
    ids = spark.createDataFrame([(int(i),) for i in doc_ids],
                                "doc_id long")
    hyd = _hydrate(spark, store, ids, corpus, meta)
    tv = _doc_terms(hyd, cfg, syn, counts=True)
    if term_statistics:
        stats = (store.termstats(spark)
                 .groupBy("term")
                 .agg(F.sum("df").cast("long").alias("df"),
                      F.sum("cf").cast("long").alias("ttf")))
        tv = tv.join(stats, "term", "left") \
            .select("doc_id", "term", "tf",
                    F.coalesce("df", F.lit(0)).alias("df"),
                    F.coalesce("ttf", F.lit(0)).alias("ttf"))
    return tv.orderBy("doc_id", "term")
