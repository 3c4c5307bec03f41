"""Differential harness mirroring the driver's correctness gate:
run a catalog query in Spark and its oracle in DuckDB over the same
parquet tables, then compare row count, column names, and values
(order-insensitive, column-name-sorted — the driver's hash semantics).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + row sort + canonical value rendering."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{int(v)}"
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(bool(v))
        # duckdb's .df() renders DATE as midnight datetime64; Spark's
        # toPandas gives datetime.date — align the two renderings
        if hasattr(v, "hour"):
            if (v.hour, v.minute, v.second, getattr(v, "microsecond", 0)) == (
                0,
                0,
                0,
                0,
            ):
                return v.date().isoformat() if hasattr(v, "date") else str(v)
            return str(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(canon)
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count {len(spdf)} != oracle {len(oracle_pdf)}")
    s_cols = sorted(c.lower() for c in spdf.columns)
    o_cols = sorted(c.lower() for c in oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns {s_cols} != oracle {o_cols}")
        return problems
    a = normalize(spdf)
    b = normalize(oracle_pdf)
    if problems:
        return problems
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(3), b[diff_mask].head(3)], keys=["spark", "oracle"]
        )
        problems.append(f"value mismatch on {int(diff_mask.sum())} rows:\n{sample}")
    return problems
