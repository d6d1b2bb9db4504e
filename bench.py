"""Headline benchmark (driver-run per round; ONE JSON line on stdout).

Workload (SPARK_GRAFT_SF_DIR, default sf0.1; local[$SPARK_GRAFT_CPUS]):
  - index-build throughput over the deterministic synthetic source-code
    corpus (BASELINE.md headline: docs/sec), full engine config
    (n=2, synonym dict, expand=true, positions stored)
  - bigram index build over the sf documents table
  - BM25/WAND/phrase query latencies
  - representative datapipe ops (minhash-LSH dedup, ANN cosine)

Every headline number is the MIN over $SPARK_GRAFT_BENCH_REPEATS runs
(default 3) — min, not median: the sandbox shares a noisy host
(±25-40% scatter documented in BENCH/BASELINE.md) and the minimum is
the best estimate of the engine's cost with noise stripped, making
round-over-round deltas meaningful.

Scaling-efficiency evidence (north rule, N vs 4N executors) lives in
BENCH/scaling.py — run separately, results recorded in BENCH/BASELINE.md.

A/B mode (round-4 verdict task #10 — first-class drift adjudication):
``python bench.py --ab <git-ref>`` checks out ``<git-ref>`` into a
temp dir (git archive, repo untouched) and runs HEAD and the ref
INTERLEAVED (ref,head,ref,head,... one full bench subprocess each,
min-of-$SPARK_GRAFT_BENCH_REPEATS per side) so host drift hits both
sides equally; prints ONE JSON line with both query maps and the
head/ref ratio per query. Round-over-round nominal drift is then
self-adjudicating instead of relying on ad-hoc disclosure (round 4's
across-the-board ~15% "regression" was 1.65× host steal, proven by
exactly this experiment run by hand).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from synspark.corpus import generate_corpus
    from synspark.index_store import build_index
    from synspark.query import count_matches, search
    from synspark.session import get_spark
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig

    spark = get_spark(app="synspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    def lat(name, fn, repeats=REPEATS):
        """min-of-repeats (noise-stripped engine cost; see docstring)."""
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        queries[name] = round(min(ts), 3)
        return min(ts)

    # -- 1. engine index build over synthetic corpus (headline) -------
    syn = SynonymDict.parse("あ,かき\n東京,とうきょう\ndata,info\nsort,order")
    cfg = TokenizerConfig(n=2, expand=True, ignore_case=True)
    tmp = tempfile.mkdtemp(prefix="synspark_bench_")
    # materialize the synthetic corpus as parquet first: the headline
    # times the ENGINE (read → tokenize → invert → encode → write),
    # not the data generator — mirrors reading a real source table
    generate_corpus(spark, BENCH_DOCS, partitions=CPUS * 2) \
        .write.mode("overwrite").parquet(f"{tmp}/corpus")
    corpus = spark.read.parquet(f"{tmp}/corpus")
    store = None

    def build_synth():
        nonlocal store
        store = build_index(spark, corpus, f"{tmp}/idx", cfg=cfg, syn=syn,
                            n_shards=None, source="bench", resume=False)

    build_sec = lat("index_build_synthetic", build_synth)

    # -- 2. bigram index over sf documents ----------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .withColumnRenamed("text", "content")
    store_docs = None

    def build_docs():
        nonlocal store_docs
        store_docs = build_index(
            spark, docs, f"{tmp}/idx_docs",
            cfg=TokenizerConfig(n=2, expand=False), syn=None,
            n_shards=8, source=f"{SF_DIR}/documents", resume=False)

    lat("index_build_documents", build_docs)

    # -- 3. query latencies -------------------------------------------

    lat("q_bm25_wand", lambda: search(
        spark, store_docs, "data sort merge", k=10, mode="and").collect())
    lat("q_bm25_or", lambda: search(
        spark, store_docs, "data sort merge", k=10, mode="or").collect())
    # k=1000 twins in BOTH boolean modes (round-3 verdict #8: the old
    # single entry was named "wand" but ran mode="or"; q_bm25_or_k1000
    # is the same measurement as rounds 2-3's q_bm25_wand_k1000)
    lat("q_bm25_or_k1000", lambda: search(
        spark, store_docs, "data sort merge", k=1000, mode="or").collect())
    lat("q_bm25_and_k1000", lambda: search(
        spark, store_docs, "data sort merge", k=1000, mode="and").collect())
    lat("q_phrase", lambda: count_matches(
        spark, store_docs, "key order", mode="and",
        phrase=True).collect())
    lat("q_phrase_topk", lambda: search(
        spark, store_docs, "key order", k=10, mode="and",
        phrase=True).collect())
    lat("q_synonym_wand", lambda: search(
        spark, store, "かきいうえお", k=10, mode="and", syn=syn).collect())
    # ES bool + aggs surfaces (round 5): must/should/must_not on the
    # WAND workers; terms buckets over the distributed match set
    from synspark.query import search_bool, terms_agg
    lat("q_bool_topk", lambda: search_bool(
        spark, store_docs, must="data", should="sort merge",
        must_not="key", k=10).collect())
    lat("q_terms_agg", lambda: terms_agg(
        spark, store_docs, "lang", "data sort merge",
        mode="and").collect())

    # batched serving shape: 16 queries in ONE Spark job (one planning
    # pass + one blocks scan) — the realistic offline-serving pattern
    from synspark.query import search_batch
    batch_texts = ["data sort", "key order", "merge index", "sort data",
                   "query plan", "hash join", "scan filter", "node edge",
                   "data merge", "sort key", "index scan", "plan cost",
                   "join order", "filter push", "edge list", "cost model"]
    lat("q_bm25_batch16", lambda: search_batch(
        spark, store_docs, batch_texts, k=10, mode="and").collect())

    # late round-5 surfaces: score-all consumers (collapse = score
    # every match + one window) and percolation throughput (saved
    # searches against the whole documents table — the alerting-at-
    # ingest shape, zero shuffle on the broadcast path)
    from synspark.percolate import percolate, register_queries
    from synspark.rank import search_collapsed
    lat("q_collapse", lambda: search_collapsed(
        spark, store_docs, "lang", "data sort merge", mode="and",
        k=10).collect())
    perc_reg = register_queries(
        spark, [(1, "data sort merge", "and"), (2, "key order", "msm", 3),
                (3, "hash join", "or"), (4, "query plan", "and"),
                (5, "scan filter", "msm", 2), (6, "merge", "or")],
        TokenizerConfig(n=2, expand=False, ignore_case=True))
    lat("q_percolate6", lambda: percolate(
        spark, perc_reg, docs,
        TokenizerConfig(n=2, expand=False, ignore_case=True)).count())

    # -- 3b. liveDocs overhead (round 4): same WAND query with 1% of
    # docs tombstoned — measures the cogroup tombstone-routing path
    # (broadcast range join + per-shard numpy mask) vs the identical
    # untouched plan above ------------------------------------------
    import shutil as _sh

    from synspark.deletes import delete_docs
    _sh.copytree(f"{tmp}/idx_docs", f"{tmp}/idx_docs_del")
    from synspark.index_store import IndexStore
    store_del = IndexStore(f"{tmp}/idx_docs_del")
    delete_docs(spark, store_del,
                doc_ids=docs.filter(F.col("doc_id") % 100 == 7)
                .select("doc_id"))
    lat("q_bm25_wand_deleted", lambda: search(
        spark, store_del, "data sort merge", k=10, mode="and").collect())

    # -- 3c. round-5 closing surfaces: query_string (phrase-gate id
    # routing + metadata pushdown + WAND in one request), search-as-
    # you-type, and cross-index dfs fan-out (two stores, one merge) --
    from synspark.multindex import search_indices
    from synspark.multiterm import search_phrase_prefix
    from synspark.querystring import query_string
    lat("q_query_string", lambda: query_string(
        spark, store_docs,
        '+data "key order" -"slow scan" lang:en sort^2',
        k=10).collect())
    lat("q_phrase_prefix", lambda: search_phrase_prefix(
        spark, store_docs, "key o", k=10,
        max_expansions=None).collect())
    lat("q_multi_index_dfs", lambda: search_indices(
        spark, {"a": store_docs, "b": store_del}, "data sort merge",
        k=10, mode="and", dfs=True).collect())
    # gram-accelerated code grep: required-gram AND prefilter on the
    # index + JVM-side regex verify on the candidate semi-join
    from synspark.grep import grep_search
    lat("q_grep_regex", lambda: grep_search(
        spark, store_docs, docs, "key [a-z]*order").count())
    # hybrid BM25+kNN with RRF fusion (retrievers dominate; fusion is
    # a 2×window-row join)
    from synspark.fusion import hybrid_search
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    lat("q_rrf_hybrid", lambda: hybrid_search(
        spark, store_docs, "data sort merge", emb, qv, k=10,
        window=100).collect())
    # optional-phrase query_string (exhaustive score-all path) and a
    # terms+stats sub-aggregation — the aggregation-grade consumers
    lat("q_qs_opt_phrase", lambda: query_string(
        spark, store_docs, 'merge "key order"', k=10,
        optional_phrases=True).collect())
    from synspark.query import terms_stats_agg
    lat("q_terms_stats_agg", lambda: terms_stats_agg(
        spark, store_docs, "lang", "dl", "data sort merge",
        mode="and").collect())

    # -- 4. datapipe ops ----------------------------------------------
    lat("dp_minhash_lsh",
        lambda: entrymod.q_dp_minhash_lsh(spark, SF_DIR).count())
    lat("dp_ann_cosine",
        lambda: entrymod.q_dp_ann_cosine(spark, SF_DIR).collect())
    lat("dp_dedup_drop",
        lambda: entrymod.q_dp_dedup_drop(spark, SF_DIR).count())
    lat("dp_simhash_dups",
        lambda: entrymod.q_dp_simhash_dups(spark, SF_DIR).count())

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in SF_DIR else 0.0
    out = {
        "metric": "index_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "bench_docs": BENCH_DOCS,
        "docs_per_sec": round(BENCH_DOCS / build_sec, 1),
        "cpus": CPUS,
    }
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


def run_ab(ref: str) -> None:
    """Interleaved HEAD-vs-<ref> benchmark; see module docstring."""
    import shutil
    import subprocess

    def one_run(cwd: str, tag: str) -> dict:
        env = dict(os.environ,
                   SPARK_GRAFT_BENCH_REPEATS="1",
                   SPARK_GRAFT_SF_DIR=SF_DIR,
                   SPARK_GRAFT_CPUS=str(CPUS),
                   SPARK_GRAFT_BENCH_DOCS=str(BENCH_DOCS))
        p = subprocess.run([sys.executable, "bench.py"], cwd=cwd,
                           env=env, capture_output=True, text=True,
                           timeout=3600)
        if p.returncode != 0:
            raise RuntimeError(f"{tag} bench failed:\n{p.stderr[-2000:]}")
        # last stdout line is the JSON contract
        return json.loads(p.stdout.strip().splitlines()[-1])

    tmp = tempfile.mkdtemp(prefix="synspark_ab_")
    try:
        ref_dir = os.path.join(tmp, "ref")
        os.makedirs(ref_dir)
        subprocess.run(
            f"git archive {ref} | tar -x -C {ref_dir}",
            shell=True, cwd=str(REPO), check=True, capture_output=True)
        sha = subprocess.run(["git", "rev-parse", ref], cwd=str(REPO),
                             capture_output=True, text=True,
                             check=True).stdout.strip()
        head_sha = subprocess.run(["git", "rev-parse", "HEAD"],
                                  cwd=str(REPO), capture_output=True,
                                  text=True, check=True).stdout.strip()
        head_q: dict[str, float] = {}
        ref_q: dict[str, float] = {}

        def fold(acc: dict, run: dict) -> None:
            for k, v in run["queries"].items():
                acc[k] = min(acc.get(k, float("inf")), v)

        # strict interleaving: each repeat runs ref then head
        # back-to-back, so a noisy host window inflates both sides
        for _ in range(REPEATS):
            fold(ref_q, one_run(ref_dir, f"ref({ref})"))
            fold(head_q, one_run(str(REPO), "head"))
        ratio = {k: round(head_q[k] / ref_q[k], 3)
                 for k in sorted(head_q) if k in ref_q and ref_q[k] > 0}
        print(json.dumps({
            "metric": "ab_head_over_ref",
            "ref": ref, "ref_sha": sha, "head_sha": head_sha,
            "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
            if "sf" in SF_DIR else 0.0,
            "repeats": REPEATS,
            "head_queries": head_q,
            "ref_queries": ref_q,
            "ratio": ratio,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--ab":
        run_ab(sys.argv[2])
    else:
        main()
