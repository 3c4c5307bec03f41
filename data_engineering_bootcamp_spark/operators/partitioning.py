"""Partition-shape helpers.

`fan_out` fixes the small-input/expensive-expression mismatch: a 5k-doc
parquet file arrives as 1-2 partitions, so per-row-heavy stages
(shingling, signatures, mapInPandas decode) run on 1-2 cores no matter
how many the cluster has. Repartitioning costs one shuffle of the raw
rows — trivial for small inputs — and is skipped entirely when the
input already has enough partitions (the 100 TB case, where the scan
arrives with thousands of splits and a blind repartition would be a
full-corpus shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the cluster's default parallelism iff the input
    has fewer partitions; never repartitions downward."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low `bits` bits of two
    non-negative integer dims — the multi-dimensional clustering key
    behind lakehouse OPTIMIZE ZORDER BY: sorting/range-partitioning by
    this key gives every file a narrow min/max envelope in BOTH dims,
    so per-file statistics prune scans on either predicate (a
    single-column sort clusters one dim and scatters the other).

    Pure bit arithmetic (shift/mask/add over disjoint bit positions) —
    one Catalyst expression, codegen-friendly, and replayed verbatim by
    the SQL oracle; callers truncate/normalize dims into [0, 2^bits)
    first (`x.bitwiseAND(lit(2**bits - 1))`)."""
    if not (1 <= int(bits) <= 31):
        raise ValueError(f"zorder_key: bits must be in [1, 31], got {bits}")
    # widen FIRST: shiftleft on an IntegerType input stays in 32-bit
    # arithmetic, so bit 15 of an int dim lands on shift 31 and wraps
    # to INT_MIN — silently corrupted Morton keys (found by review,
    # confirmed by execution)
    x = x.cast("long")
    y = y.cast("long")
    z: Column | None = None
    for i in range(int(bits)):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xb + yb
        z = term if z is None else z + term
    return z.cast("long")
