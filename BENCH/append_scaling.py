"""Continuous-ingest cost evidence: per-micro-batch append wall time
must stay FLAT as the index grows (round-2 verdict item 1: the old
append re-aggregated ALL segments per batch — linear growth; round 3
reads only the new shards and merges stats on read).

Builds a base index, then appends N equal batches while the index
grows ~(N+1)x; prints per-batch seconds and the ratio of the last-3
mean to the first-3 mean (1.0 = perfectly flat; the old O(index)
refresh would grow roughly linearly toward ~N/3).

Usage: python BENCH/append_scaling.py [batch_docs] [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from synspark.corpus import generate_corpus
    from synspark.index_store import IndexStore, append_to_index, build_index
    from synspark.session import get_spark
    from synspark.tokenizer import TokenizerConfig

    spark = get_spark(app="append-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="synspark_append_"))
    cfg = TokenizerConfig(n=2, expand=False)

    # one corpus, sliced into batches via the deterministic generator
    total = batch_docs * (n_batches + 1)
    generate_corpus(spark, total, partitions=32) \
        .write.mode("overwrite").parquet(str(tmp / "corpus"))
    # deterministic slicing by hash bucket over (repo,path,commit)
    from pyspark.sql import functions as F
    corpus = spark.read.parquet(str(tmp / "corpus")).drop("doc_id") \
        .withColumn("_b", F.pmod(F.xxhash64("repo", "path", "commit"),
                                 F.lit(n_batches + 1)))

    build_index(spark, corpus.filter(F.col("_b") == 0).drop("_b"),
                str(tmp / "idx"), cfg=cfg, n_shards=8, source="base",
                resume=False)
    store = IndexStore(str(tmp / "idx"))

    secs = []
    for i in range(1, n_batches + 1):
        batch = corpus.filter(F.col("_b") == i).drop("_b")
        t0 = time.time()
        append_to_index(spark, store, batch, source=f"b{i}",
                        batch_tag=f"b{i}")
        secs.append(round(time.time() - t0, 3))
        print(f"batch {i:2d}: {secs[-1]:6.2f}s  "
              f"(index now ~{store.meta().n_docs} docs, "
              f"{store.meta().n_shards} shards)", flush=True)

    head = sum(secs[:3]) / 3
    tail = sum(secs[-3:]) / 3
    out = {"batch_docs": batch_docs, "n_batches": n_batches,
           "per_batch_sec": secs,
           "first3_mean": round(head, 3), "last3_mean": round(tail, 3),
           "growth_ratio": round(tail / head, 3),
           "final_docs": store.meta().n_docs}
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
