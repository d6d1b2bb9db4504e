"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster in this sandbox, so the same index-build job runs at
two parallelism levels — local[N] and local[4N] — on the same
materialized input, each in a FRESH SparkSession (JVM reused, thread
pool resized). Efficiency = (T_N / T_4N) / 4; the rule wants >= 0.8.

Usage: python BENCH/scaling.py [n_docs] [N]   (defaults 100000, 8)
Writes results JSON to stdout; record in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_build(master_threads: int, corpus_path: str, out: str,
              n_docs: int) -> float:
    from synspark.index_store import build_index
    from synspark.session import get_spark
    from synspark.synonyms import SynonymDict
    from synspark.tokenizer import TokenizerConfig

    spark = get_spark(app=f"scaling-{master_threads}",
                      master=f"local[{master_threads}]",
                      shuffle_partitions=master_threads)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)
    syn = SynonymDict.parse("あ,かき\n東京,とうきょう\ndata,info\nsort,order")
    t0 = time.time()
    build_index(spark, corpus, out,
                cfg=TokenizerConfig(n=2, expand=True), syn=syn,
                n_shards=max(master_threads, 8),
                target_postings_per_task=1 << 18,
                source="scaling", resume=False)
    dt = time.time() - t0
    spark.stop()
    return dt


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # materialize input once
    from synspark.corpus import generate_corpus
    from synspark.session import get_spark
    tmp = tempfile.mkdtemp(prefix="synspark_scaling_")
    s = get_spark(app="scaling-gen", master=f"local[{4 * n}]")
    s.sparkContext.setLogLevel("ERROR")
    generate_corpus(s, n_docs, partitions=4 * n * 2) \
        .write.mode("overwrite").parquet(f"{tmp}/corpus")
    s.stop()

    t_small = run_build(n, f"{tmp}/corpus", f"{tmp}/idx_small", n_docs)
    t_big = run_build(4 * n, f"{tmp}/corpus", f"{tmp}/idx_big", n_docs)
    eff = (t_small / t_big) / 4.0
    print(json.dumps({
        "n_docs": n_docs,
        "parallelism_small": n,
        "parallelism_big": 4 * n,
        "build_sec_small": round(t_small, 2),
        "build_sec_big": round(t_big, 2),
        "docs_per_sec_small": round(n_docs / t_small, 1),
        "docs_per_sec_big": round(n_docs / t_big, 1),
        "scaling_efficiency": round(eff, 3),
        "rule": "efficiency >= 0.8",
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
