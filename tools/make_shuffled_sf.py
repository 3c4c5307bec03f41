"""Materialize a row-shuffled copy of a testdata sf dir.

Row-order-invariance axis (new r11): at 100 TB the row order a query
sees is an accident of file splits, shuffle hash seeds, and executor
race — NOTHING in a correct operator may depend on it. This tool
rewrites every table with its rows in a deterministic pseudo-random
order (ORDER BY hash(rowid) in DuckDB — stable across runs, wildly
different from the generator's natural order); running the FULL oracle
gate on the shuffled copy then proves every entry is row-order
invariant on BOTH engines at once (the DuckDB views read the same
shuffled files). What this catches that the other axes cannot:
window tie-breaks that silently depended on input order, collect_list
order assumptions, first()/last() without explicit ordering, min-by /
argmax ties resolved by arrival order.

    python tools/make_shuffled_sf.py [src_sf_dir] [dst_dir]
    python tools/gate_check.py <dst_dir> --no-perf-gate

Default dst is .scratch/sf0.01_shuffled under the repo root
(gitignored scratch; ~MBs at sf0.01).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from oracle_harness import TABLES  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            os.path.basename(src.rstrip("/")) + "_shuffled",
        )
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE TEMP TABLE _x AS SELECT * FROM '{src}/{t}.parquet'")
        n = con.sql("SELECT count(*) FROM _x").fetchone()[0]
        con.sql(
            f"COPY (SELECT * FROM _x ORDER BY hash(rowid)) TO '{dst}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        m = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        assert n == m, (t, n, m)
        print(f"{t}: {n} rows shuffled -> {dst}/{t}.parquet")
    print(f"done: {dst}")


if __name__ == "__main__":
    main()
