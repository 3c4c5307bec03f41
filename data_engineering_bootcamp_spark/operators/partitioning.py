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

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the cluster's default parallelism iff the input
    has fewer partitions; never repartitions downward."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
