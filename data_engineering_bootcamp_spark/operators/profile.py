"""Table profiling: per-column completeness/cardinality in one pass.

The `ANALYZE`-style utility every warehouse migration starts with:
row count, non-null count, and exact distinct count for every column,
emitted as one long-format DataFrame.

Plan shape: a single aggregate over one scan — Spark plans the N exact
COUNT(DISTINCT)s as one Expand (N× row multiplication feeding
map-side partial aggs), which is the textbook exact-profile cost. At
100 TB swap `exact_distinct=False` to `approx_count_distinct` (HLL,
one pass, no Expand) — the sketch is not oracle-hashable, so the gate
pins the exact form and a unit test pins the approx form's error
envelope. The long format comes from `stack` on the aggregated
single row, so the whole profile stays one Catalyst plan — no driver
collect, no per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile `columns` (default: all) → one row per column with
    (column, n_rows, n_nonnull, n_nulls, n_distinct). n_distinct
    ignores NULLs (COUNT(DISTINCT col) semantics on both engines)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nonnull, n_distinct)",
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_nonnull",
        (F.col("__n") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
    )
