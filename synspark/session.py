"""SparkSession construction with the engine's recommended configs.

Tuned for the engine's workload: Arrow-vectorized Python exchange,
AQE with skew handling, sane shuffle partitioning. On a real cluster
these come from spark-submit conf; locally this is the one-stop shop.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the synspark package for --py-files-style shipping; lets a
    driver started anywhere run UDFs on executors that don't have the
    repo on PYTHONPATH (north rule: spark-submit --py-files runnable)."""
    pkg_dir = Path(__file__).resolve().parent
    out = Path(tempfile.gettempdir()) / "synspark_pyfiles.zip"
    with zipfile.ZipFile(out, "w") as z:
        for f in sorted(pkg_dir.rglob("*.py")):
            z.write(f, f"synspark/{f.relative_to(pkg_dir)}")
    return str(out)


def get_spark(app: str = "synspark", master: str | None = None,
              shuffle_partitions: int | None = None,
              ship_package: bool = True,
              extra: dict | None = None) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large text cells: keep Arrow batches bounded so the Python
        # worker's memory stays flat (SURVEY §4.4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions
                    or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))))
        # small splits so map stages (read→tokenize) parallelize even on
        # sandbox-sized inputs; a 100 TB deployment overrides this back
        # to 128m+ via spark-submit conf (inputs there have
        # plenty of splits)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
        .config("spark.sql.files.openCostInBytes", "1m")
        # v2 commit: tasks move their own output files — the v1
        # driver-side serial rename is O(#partition dirs) and becomes a
        # visible serial cost with hundreds of shard directories
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm"
                ".version", "2")
        # local mode runs every task in the driver JVM. Measured on this
        # box: 12g G1 beats both 8g (GC thrash at 32 threads) and 24g+
        # (long young-gen pauses); runs are noisy, 12g is the best median
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if ship_package:
        spark.sparkContext.addPyFile(package_zip())
    return spark
