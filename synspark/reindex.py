"""ES document-lifecycle surfaces: ``_reindex`` and
``_update_by_query``.

Every long-lived deployment of the reference analyzer eventually
reshapes its indexes: copy a query-filtered subset into a new index
(``_reindex`` — analyzer upgrades, index splits, retention carve-outs)
or rewrite the matched documents in place (``_update_by_query`` —
backfills, scrubbing). Both are thin COMPOSITIONS of operators this
engine already hash-verifies: the match side is ``match_ids`` (the
distributed scroll that also feeds delete_by_query), the write side
is ``build_index`` / ``upsert_docs``.

Scale shape: the matched-id frame semi-joins the source table (the
``input_hint`` corpus) — candidates ∝ query selectivity, never a
driver materialization; the rebuild/upsert inherits the indexer's
bucketed-id, salted-shard pipeline unchanged. ES's own _reindex is
likewise scroll + bulk-index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .index_store import IndexStore, build_index
from .query import QueryPlan, match_ids
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig


def _matched_rows(spark: SparkSession, store: IndexStore,
                  corpus: DataFrame, query: str, mode: str,
                  phrase: bool, syn, cfg,
                  plan: QueryPlan | None,
                  doc_where: str | None) -> DataFrame:
    """Corpus rows whose doc matches the query (live docs only) —
    via doc_id when the corpus carries it, else via the docmap
    (repo, path, commit) keys."""
    ids = match_ids(spark, store, query, mode=mode, phrase=phrase,
                    syn=syn, cfg=cfg, plan=plan, doc_where=doc_where)
    if "doc_id" in corpus.columns:
        return corpus.join(ids, "doc_id", "semi")
    keys = [c for c in ("repo", "path", "commit")
            if c in corpus.columns]
    if not keys:
        raise ValueError("corpus needs doc_id or repo/path/commit "
                         "key columns to align with the index")
    dm = store.docmap(spark).select("doc_id", *keys)
    matched_keys = dm.join(ids, "doc_id", "semi").select(*keys) \
                     .distinct()
    return corpus.join(matched_keys, keys, "semi")


def reindex(spark: SparkSession, src_store: IndexStore,
            corpus: DataFrame, dst_path: str,
            query: str = "", mode: str = "and", phrase: bool = False,
            syn: SynonymDict | None = None,
            cfg: TokenizerConfig | None = None,
            plan: QueryPlan | None = None,
            doc_where: str | None = None,
            transform=None,
            dst_cfg: TokenizerConfig | None = None,
            dst_syn: SynonymDict | None = None,
            n_shards: int | None = 8,
            source: str = "<reindex>") -> IndexStore:
    """ES ``_reindex``: build a NEW index at ``dst_path`` from the
    source-table rows matching ``query`` (+ optional ``doc_where``
    metadata filter) on the source index. ``transform(df) -> df``
    rewrites the rows in flight (the ES ingest-pipeline/script hook);
    ``dst_cfg``/``dst_syn`` re-analyze under a NEW analyzer — the
    reason ES users reindex at all (analyzer changes are not
    hot-applicable to an existing inverted index).

    Destination ids are freshly assigned (ES too: _reindex re-indexes,
    ids are per-index): a corpus doc_id column is densified
    deterministically by rank so the subset keeps a valid dense id
    space and a stable orig→new mapping (new = rank of orig)."""
    meta = src_store.meta()
    cfg = cfg or TokenizerConfig(**meta.cfg)
    rows = _matched_rows(spark, src_store, corpus, query, mode,
                         phrase, syn, cfg, plan, doc_where)
    if transform is not None:
        rows = transform(rows)
    if "doc_id" in rows.columns:
        # dense 0..M-1 by ascending original id (rank is a one-column
        # sort window over the SUBSET — bounded by selectivity; key
        # corpora instead carry repo/path/commit and take the
        # indexer's bucketed assignment)
        w = Window.orderBy(F.col("doc_id").asc())
        rows = rows.withColumn("doc_id",
                               (F.row_number().over(w) - 1)
                               .cast("long"))
    return build_index(spark, rows, dst_path,
                       cfg=dst_cfg or cfg, syn=dst_syn or syn,
                       n_shards=n_shards, source=source,
                       resume=False)


def update_by_query(spark: SparkSession, store: IndexStore,
                    corpus: DataFrame, transform,
                    query: str = "", mode: str = "and",
                    phrase: bool = False,
                    syn: SynonymDict | None = None,
                    cfg: TokenizerConfig | None = None,
                    plan: QueryPlan | None = None,
                    doc_where: str | None = None,
                    key_cols: list[str] | None = None,
                    batch_tag: str | None = None,
                    auto_merge_fraction: float | None = None
                    ) -> IndexStore:
    """ES ``_update_by_query``: apply ``transform(df) -> df`` to the
    source rows matching the query and UPSERT the results — each
    rewritten doc replaces its old version by key in one atomic
    commit (``deletes.upsert_docs``: old ids resolve against the
    committed docmap, append + tombstones publish together; a
    ``batch_tag`` replay no-ops). The un-matched corpus is untouched,
    exactly ES semantics."""
    from .deletes import upsert_docs
    rows = _matched_rows(spark, store, corpus, query, mode, phrase,
                         syn, cfg, plan, doc_where)
    new_docs = transform(rows)
    return upsert_docs(spark, store, new_docs, syn=syn,
                       key_cols=key_cols, batch_tag=batch_tag,
                       source="<update_by_query>",
                       auto_merge_fraction=auto_merge_fraction)
