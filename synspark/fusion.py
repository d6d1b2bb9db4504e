"""Hybrid lexical + vector retrieval with reciprocal rank fusion.

Modern deployments of the reference analyzer pair BM25 with dense
vectors (the public ES 8 ``retriever: {rrf: ...}`` surface): a
lexical top-window and a kNN top-window fuse by RECIPROCAL RANK —
``score(d) = Σ_r 1 / (rank_constant + rank_r(d))`` (Cormack &
Clarke's RRF; the ES default rank_constant is 60) — which needs no
score calibration between BM25's unbounded sums and cosine's [−1, 1].

Determinism contract: each retriever's ranks are assigned over its
6-dp-ROUNDED scores with doc_id ASC tiebreak — the same rounding the
top-k contract rows use — so ranks (and therefore RRF scores) are
reproducible across engines to the ULP-noise floor. Docs outside a
retriever's window contribute 0 from that retriever (the ES window
semantics).

Scale shape: the retrievers do all the heavy lifting (shard-parallel
WAND; distributed dot products); fusion itself touches only
2 × window rows — one tiny sort + one full-outer join on doc_id. At
web scale the vector side would swap brute force for the IVF layout
(`datapipe.similarity.ivf_topk_indexed`) with fusion unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .index_store import IndexStore
from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig

RANK_CONSTANT = 60


def ranked_window(df: DataFrame, score_col: str, window: int,
                  id_col: str = "doc_id") -> DataFrame:
    """(id, rank) for the top ``window`` rows of a retriever result:
    rank 1-based over (round(score, 6) DESC, id ASC). The
    single-partition sort is bounded by ``window`` rows — fusion
    inputs are already top-k-sized."""
    w = Window.orderBy(F.col("_s").desc(), F.col("doc_id").asc())
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.round(F.col(score_col), 6).alias("_s"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= window)
            .select("doc_id", "rank"))


def rrf_fuse(ranked: list[DataFrame], k: int = 10,
             rank_constant: int = RANK_CONSTANT) -> DataFrame:
    """Fuse pre-ranked (doc_id, rank) frames → (doc_id, rrf_score)
    top-k, score DESC / doc_id ASC. Missing-from-a-window docs get 0
    from that retriever."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked input")
    parts = [r.select("doc_id",
                      (F.lit(1.0) / (F.lit(float(rank_constant))
                                     + F.col("rank"))).alias("c"))
             for r in ranked]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy("doc_id")
            .agg(F.round(F.sum("c"), 6).alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
            .limit(k))


def hybrid_search(spark: SparkSession, store: IndexStore,
                  text: str, embeddings: DataFrame | None,
                  query_vec: list[float], k: int = 10,
                  window: int = 100,
                  rank_constant: int = RANK_CONSTANT,
                  mode: str = "and",
                  syn: SynonymDict | None = None,
                  cfg: TokenizerConfig | None = None,
                  doc_where: str | None = None,
                  ivf_path: str | None = None,
                  n_planes: int = 6, seed: int = 42,
                  probes: int = 8) -> DataFrame:
    """ES hybrid retriever: BM25 (shard-parallel WAND) ∪ cosine kNN
    over ``embeddings`` (vec_id aligned with doc_id), fused by RRF.
    Returns (doc_id, rrf_score) top-k.

    Vector backend: brute force over ``embeddings`` by default; pass
    ``ivf_path`` (a ``datapipe.similarity.write_ivf_index`` layout)
    for the 100 TB path — probing becomes partition pruning at the
    parquet scan and only the probed buckets' rows are scored.
    ``probes = 2**n_planes`` degenerates to exact brute force; fewer
    probes trade recall for scan volume exactly like ES's
    ``num_candidates``."""
    from .datapipe.similarity import brute_force_topk, ivf_topk_indexed
    from .query import search
    # fetch 2× the window raw, then rank/cut on ROUNDED scores inside
    # ranked_window — the same slack the top-k contract rows use so a
    # raw-score ULP flip at the window boundary can't change the
    # fused input set across engines
    lex = search(spark, store, text, k=window * 2, mode=mode, syn=syn,
                 cfg=cfg, doc_where=doc_where)
    if ivf_path is not None:
        vec = ivf_topk_indexed(spark, ivf_path, query_vec,
                               dim=len(query_vec), k=window * 2,
                               n_planes=n_planes, seed=seed,
                               probes=probes)
    else:
        if embeddings is None:
            raise ValueError("hybrid_search needs embeddings or "
                             "ivf_path")
        vec = brute_force_topk(embeddings, query_vec, k=window * 2)
    vec = vec.withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse([ranked_window(lex, "score", window),
                     ranked_window(vec, "cosine", window)],
                    k=k, rank_constant=rank_constant)
