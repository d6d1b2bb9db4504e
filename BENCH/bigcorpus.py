"""Query-latency-vs-corpus-size evidence, one step larger (round-3
verdict task #9): build the deterministic synthetic corpus at ~10M
docs (6x the 1.6M harness) and measure WAND / phrase / batch query
latencies, giving the "latency growth is task scheduling, not
per-shard work" claim a third point on the curve.

Usage: python BENCH/bigcorpus.py [n_docs] [threads]
Prints one JSON line; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
WORK = Path("/tmp/synspark_bigcorpus")


def main() -> None:
    from synspark.corpus import generate_corpus
    from synspark.index_store import IndexStore, build_index
    from synspark.query import count_matches, search, search_batch
    from synspark.session import get_spark
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig

    spark = get_spark(app="bigcorpus", master=f"local[{THREADS}]",
                      shuffle_partitions=THREADS)
    spark.sparkContext.setLogLevel("ERROR")
    syn = SynonymDict.parse("あ,かき\n東京,とうきょう\ndata,info\nsort,order")
    cfg = TokenizerConfig(n=2, expand=True, ignore_case=True)

    corpus_dir = WORK / f"corpus_{N_DOCS}"
    if not (corpus_dir / "_SUCCESS").exists():
        shutil.rmtree(corpus_dir, ignore_errors=True)
        generate_corpus(spark, N_DOCS, partitions=THREADS * 8) \
            .write.mode("overwrite").parquet(str(corpus_dir))
    corpus = spark.read.parquet(str(corpus_dir))

    idx_dir = WORK / f"idx_{N_DOCS}"
    build_sec = None
    if not (Path(idx_dir) / "meta.json").exists():
        t0 = time.time()
        build_index(spark, corpus, str(idx_dir), cfg=cfg, syn=syn,
                    n_shards=None, source="bigcorpus", resume=True)
        build_sec = time.time() - t0
    store = IndexStore(str(idx_dir))
    meta = store.meta()

    out = {"n_docs": meta.n_docs, "n_shards": meta.n_shards,
           "threads": THREADS}
    if build_sec is not None:
        out["build_sec"] = round(build_sec, 2)
        out["docs_per_sec"] = round(meta.n_docs / build_sec, 1)

    def lat(name, fn, repeats=3):
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        out[name] = round(min(ts), 3)

    # vocabulary-consistent queries (the synthetic corpus speaks code
    # keywords; a documents-table phrase here is an empty intersection
    # and only measures dead-window pruning — round-4 correction,
    # BENCH/BASELINE.md). Hit counts at 10M: "return import" 410k AND.
    lat("q_bm25_wand", lambda: search(
        spark, store, "return import", k=10, mode="and").collect())
    lat("q_bm25_or", lambda: search(
        spark, store, "return import", k=10, mode="or").collect())
    lat("q_phrase_count", lambda: count_matches(
        spark, store, "match case", phrase=True).collect())
    lat("q_synonym_wand", lambda: search(
        spark, store, "かきいうえお", k=10, mode="and", syn=syn).collect())
    qs = ["return import", "match case", "filter reduce", "class static",
          "yield await", "async lambda", "public void", "try except",
          "new delete", "struct union", "switch case", "val var",
          "int str", "len map", "get set", "for val"]
    lat("q_batch16", lambda: search_batch(
        spark, store, qs, k=10, mode="and").collect())

    # round-5 score-all + reverse-search surfaces at the same scale:
    # collapse must score EVERY match (410k docs for the AND pair) and
    # window them; percolation streams the whole corpus past saved
    # queries (broadcast path, zero shuffle) — the throughput number
    # that matters for alerting-at-ingest.
    from synspark.percolate import percolate, register_queries
    from synspark.rank import search_collapsed
    lat("q_collapse", lambda: search_collapsed(
        spark, store, "lang", "return import", mode="and",
        k=10).collect())
    reg = register_queries(
        spark, [(1, "return import", "and"), (2, "match case", "msm", 3),
                (3, "yield await", "or"), (4, "public void", "and"),
                (5, "struct union", "msm", 2), (6, "async", "or")],
        TokenizerConfig(n=2, expand=False, ignore_case=True))
    t0 = time.time()
    n_pairs = percolate(spark, reg, corpus,
                        TokenizerConfig(n=2, expand=False,
                                        ignore_case=True),
                        text_col="content").count()
    out["percolate6_sec"] = round(time.time() - t0, 3)
    out["percolate6_pairs"] = int(n_pairs)
    out["percolate_docs_per_sec"] = round(
        meta.n_docs / out["percolate6_sec"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
