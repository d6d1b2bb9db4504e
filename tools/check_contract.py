"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + column names + order-insensitive value
hash. Usage: python tools/check_contract.py [sf_dir] [query ...]"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from synspark.session import get_spark
    spark = get_spark(app="check-contract", master="local[8]",
                      shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"  {name:22s} rows-only: {len(srows):6d} rows "
                  f"({t1-t0:5.1f}s spark)")
            continue
        orel = con.sql(oracles[name])
        ocols = [c.lower() for c in orel.columns]
        orows = orel.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        sh = value_hash(srows, [c.lower() for c in scols])
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"  {name:22s} {status} rows {len(srows)}/{len(orows)} "
              f"cols={ok_cols} hash={ok_hash} ({t1-t0:5.1f}s spark)")
        if status == "FAIL":
            failures.append(name)
            sset = {tuple(norm_cell(v) for v in r) for r in srows}
            oset = {tuple(norm_cell(v) for v in r) for r in orows}
            print("    spark-only:", list(sset - oset)[:3])
            print("    duck-only :", list(oset - sset)[:3])
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
