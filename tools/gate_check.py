#!/usr/bin/env python
"""Replicate the driver's correctness gate locally: build a VANILLA
SparkSession (no engine session factory — the exact condition that broke
round 1), run every `__spark_entry__.queries()` entry and its
`oracle_sql()` twin at sf0.01, and compare with the driver's semantics
(tests/oracle_harness.compare).

Usage: python tools/gate_check.py [sf_dir] [only_query ...]
Exit code 0 iff every entry passes.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from tests.oracle_harness import compare, duck_con  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Vanilla session on purpose: no nanosAsLong, no shuffle-partition
    # tuning, nothing from the repo's session factory.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                opdf = con.sql(oracles[name]).df()
                problems = compare(sdf, opdf)
            else:
                problems = [] if sdf.count() >= 0 else ["negative rows?"]
                problems.append("no_oracle")
        except Exception as exc:  # noqa: BLE001
            problems = [f"ERROR {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        ok = not problems
        if not ok and problems != ["no_oracle"]:
            n_fail += 1
        results[name] = {"ok": ok, "sec": round(dt, 2), "problems": problems}
        status = "PASS" if ok else "FAIL"
        print(f"{status:4} {name:32} {dt:6.1f}s" + ("" if ok else f"  {problems[0][:200]}"), flush=True)
    print(json.dumps({k: v["ok"] for k, v in results.items()}))
    print(f"\n{len(results) - n_fail}/{len(results)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
