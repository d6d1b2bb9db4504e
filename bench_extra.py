"""Stage-isolated micro-benchmarks for the round-6 optimization pass
(guide §1.4: noop-sink isolation; §1.5: labelled jobs). bench.py is
FROZEN for measurement — numbers produced here are cited in
OPTIMIZATION_r06.md only.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
           [stage ...]
Stages: percolate dedup simhash minhash build docs_build querystring
(default: all). Prints one JSON line per stage timing.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

OUT: dict[str, float] = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def lat(spark, name, fn, repeats=REPEATS):
    ts = []
    for _ in range(repeats):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    OUT[name] = round(min(ts), 3)
    print(f"  {name}: {OUT[name]}", file=sys.stderr)


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from synspark.session import get_spark

    stages = set(sys.argv[1:]) or {
        "percolate", "dedup", "simhash", "minhash", "build", "docs_build",
        "querystring"}

    spark = get_spark(app="synspark-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs_raw = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .withColumnRenamed("text", "content")

    tmp = tempfile.mkdtemp(prefix="synspark_bx_")

    if "percolate" in stages:
        from synspark.percolate import percolate, register_queries
        from synspark.tokenizer import TokenizerConfig
        cfgp = TokenizerConfig(n=2, expand=False, ignore_case=True)
        perc_reg = entrymod_reg = register_queries(
            spark, [(1, "data sort merge", "and"), (2, "key order", "msm", 3),
                    (3, "hash join", "or"), (4, "query plan", "and"),
                    (5, "scan filter", "msm", 2), (6, "merge", "or")], cfgp)
        lat(spark, "percolate6_raw1part",
            lambda: percolate(spark, perc_reg, docs_raw, cfgp).count())

    if {"dedup", "minhash", "simhash"} & stages:
        docs = entrymod._docs(spark, SF_DIR)

    if "minhash" in stages:
        from synspark.datapipe.dedup import (lsh_candidate_groups,
                                             minhash_signatures,
                                             word_shingles)
        lat(spark, "mh_shingles",
            lambda: noop(word_shingles(docs, k=3)))
        sh = word_shingles(docs, k=3)
        lat(spark, "mh_signatures",
            lambda: noop(minhash_signatures(sh, 8)))
        lat(spark, "mh_full",
            lambda: lsh_candidate_groups(
                minhash_signatures(sh, 8), bands=4, rows_per_band=2).count())

    if "dedup" in stages:
        lat(spark, "dedup_drop_full",
            lambda: entrymod.q_dp_dedup_drop(spark, SF_DIR).count())

    if "simhash" in stages:
        from synspark.datapipe.dedup import simhash, simhash_near_dups
        lat(spark, "simhash_sig_only",
            lambda: noop(simhash(docs.withColumnRenamed("content", "text")
                                 if "text" not in docs.columns else docs)))
        lat(spark, "simhash_full",
            lambda: entrymod.q_dp_simhash_dups(spark, SF_DIR).count())

    if "build" in stages:
        from synspark.corpus import generate_corpus
        from synspark.index_store import build_index
        from synspark.synonyms import SynonymDict
        from synspark.tokenizer import TokenizerConfig
        syn = SynonymDict.parse("あ,かき\n東京,とうきょう\ndata,info\nsort,order")
        cfg = TokenizerConfig(n=2, expand=True, ignore_case=True)
        generate_corpus(spark, BENCH_DOCS, partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(f"{tmp}/corpus")
        corpus = spark.read.parquet(f"{tmp}/corpus")
        lat(spark, "index_build_synth",
            lambda: build_index(spark, corpus, f"{tmp}/idx", cfg=cfg,
                                syn=syn, n_shards=None, source="bench",
                                resume=False), repeats=REPEATS)

    if "docs_build" in stages:
        from synspark.index_store import build_index
        from synspark.tokenizer import TokenizerConfig
        lat(spark, "index_build_docs",
            lambda: build_index(spark, docs_raw, f"{tmp}/idx_docs",
                                cfg=TokenizerConfig(n=2, expand=False),
                                syn=None, n_shards=8,
                                source=f"{SF_DIR}/documents",
                                resume=False), repeats=REPEATS)

    if "querystring" in stages:
        from synspark.index_store import build_index
        from synspark.querystring import query_string
        from synspark.tokenizer import TokenizerConfig
        store_docs = build_index(spark, docs_raw, f"{tmp}/idx_docs_qs",
                                 cfg=TokenizerConfig(n=2, expand=False),
                                 syn=None, n_shards=8,
                                 source=f"{SF_DIR}/documents", resume=False)
        lat(spark, "q_query_string",
            lambda: query_string(
                spark, store_docs,
                '+data "key order" -"slow scan" lang:en sort^2',
                k=10).collect())
        lat(spark, "q_qs_opt_phrase",
            lambda: query_string(spark, store_docs, 'merge "key order"',
                                 k=10, optional_phrases=True).collect())

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"sf_dir": SF_DIR, "stages": OUT}))
    spark.stop()


if __name__ == "__main__":
    main()
