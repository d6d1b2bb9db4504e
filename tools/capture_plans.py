"""Capture .explain('formatted') for the round-6-touched queries.

Usage: python tools/capture_plans.py <out_dir> [suffix]
Run from a repo checkout (sys.path[0] decides which code version);
writes <out_dir>/<query>_<suffix>.txt. The judge reads these to check
plan-shape claims (Exchange counts, BatchEvalPython/MapInPandas nodes,
PushedFilters) against OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from synspark.session import get_spark

    spark = get_spark(app="capture-plans", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    frames = {}
    frames["dp_minhash_lsh"] = entrymod.q_dp_minhash_lsh(spark, SF_DIR)
    frames["dp_dedup_drop"] = entrymod.q_dp_dedup_drop(spark, SF_DIR)
    frames["dp_simhash_dups"] = entrymod.q_dp_simhash_dups(spark, SF_DIR)
    frames["dp_jaccard_pairs"] = entrymod.q_dp_jaccard_pairs(spark, SF_DIR)

    # percolate over the raw (under-split) documents read — the bench
    # shape
    from synspark.percolate import percolate, register_queries
    from synspark.tokenizer import TokenizerConfig
    cfgp = TokenizerConfig(n=2, expand=False, ignore_case=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .withColumnRenamed("text", "content")
    reg = register_queries(
        spark, [(1, "data sort merge", "and"), (2, "key order", "msm", 3),
                (3, "hash join", "or"), (4, "query plan", "and"),
                (5, "scan filter", "msm", 2), (6, "merge", "or")], cfgp)
    frames["q_percolate6"] = percolate(spark, reg, docs, cfgp)

    # index build: the segment-encode frame (the routed exchange is the
    # plan-shape claim: repartitionByRange vs 4x hash repartition)
    from synspark.indexer import build_segments_maponly
    frames["index_build_segments"] = build_segments_maponly(
        docs, TokenizerConfig(n=2, expand=False), None,
        n_docs=docs.count(), n_shards=8)

    # query_string over a docs index (one WAND pass vs match_ids jobs)
    import hashlib as _h
    from synspark.index_store import build_index
    from synspark.querystring import query_string
    key = _h.md5(f"{SF_DIR}|plans-idx-v1".encode()).hexdigest()[:10]
    idx = Path(tempfile.gettempdir()) / f"synspark_plans_{key}"
    store = build_index(spark, docs, str(idx),
                        cfg=TokenizerConfig(n=2, expand=False),
                        syn=None, n_shards=8, source="plans",
                        resume=True)
    frames["q_query_string"] = query_string(
        spark, store, '+data "key order" -"slow scan" lang:en sort^2',
        k=10)
    frames["q_qs_opt_phrase"] = query_string(
        spark, store, 'merge "key order"', k=10, optional_phrases=True)

    for name, df in frames.items():
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(explain_str(df))
        print(f"wrote {p}")
    spark.stop()


if __name__ == "__main__":
    main()
