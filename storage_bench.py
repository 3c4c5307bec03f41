#!/usr/bin/env python
"""Storage-layout micro-benchmark — reproduces the reference's
repartition + sortWithinPartitions file-size experiment
(M3/notebooks/assignment_3_spark.ipynb cells 29-32;
event_data_pyspark.ipynb cells 1-11; BASELINE.md rows 8-10) on the
driver's testdata.

For each (table, partition key, sort keys) configuration it writes the
table twice — repartitioned only, and repartitioned + sorted within
partitions — and reports total parquet bytes and file counts. Sorted
layouts win when the sort key clusters similar values (run-length /
dictionary encoding); the experiment quantifies by how much.

Usage: python storage_bench.py [sf_dir]  (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

from data_engineering_bootcamp_spark.session import get_spark
from data_engineering_bootcamp_spark.sources.readers import load_table
from data_engineering_bootcamp_spark.sources.writers import (
    write_repartitioned_sorted,
)

EXPERIMENTS = [
    # (table, num_partitions, key, sort_cols) — mirrors the reference's
    # events-by-date and joined-by-key experiments
    ("events", 4, "event_type", ["event_type", "user_id", "ts"]),
    ("lineitem", 16, "l_partkey", ["l_partkey", "l_shipdate"]),
    ("orders", 8, "o_orderpriority", ["o_orderpriority", "o_orderdate"]),
]


def _du(path: str) -> tuple[int, int]:
    files = glob.glob(f"{path}/part-*")
    return sum(os.path.getsize(f) for f in files), len(files)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="storage-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="storage_bench_")
    try:
        for table, n, key, sort_cols in EXPERIMENTS:
            df = load_table(spark, sf_dir, table)
            p_plain = f"{work}/{table}_plain"
            p_sorted = f"{work}/{table}_sorted"
            write_repartitioned_sorted(df, p_plain, n, key)
            write_repartitioned_sorted(df, p_sorted, n, key, sort_cols)
            b_plain, f_plain = _du(p_plain)
            b_sorted, f_sorted = _du(p_sorted)
            out[table] = {
                "partitions": n,
                "key": key,
                "sort_cols": sort_cols,
                "bytes_unsorted": b_plain,
                "bytes_sorted": b_sorted,
                "files": f_sorted,
                "sorted_ratio": round(b_sorted / b_plain, 4),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "storage_layout_bytes", "sf_dir": sf_dir,
                      "experiments": out}))
    spark.stop()


if __name__ == "__main__":
    main()
