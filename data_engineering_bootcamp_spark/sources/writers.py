"""Sinks: bucketed / partitioned / repartition+sortWithinPartitions writers.

Covers SURVEY §2.1 S4-S7 and the physical-layout experiment the reference
runs (M3/notebooks/assignment_3_spark.py:36-42,131-146;
event_data_pyspark.ipynb cells 1-3).

Scale rationale:
- `write_bucketed` pre-shuffles once at write time so later joins on the
  bucket key elide their Exchange entirely (J14, bucket join) — at 100 TB
  that one avoided shuffle per join dominates everything else.
- `write_repartitioned_sorted` is the file-size/compression experiment:
  repartition(n, key) co-locates values, sortWithinPartitions orders them
  for run-length/dictionary-friendly parquet encoding WITHOUT a global
  range exchange (O4: SWP adds no extra shuffle beyond the repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    fmt: str = "parquet",
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """S4/S5: bucketed (+sorted) saveAsTable; Hive-bucketing layout.

    Mirrors `format("orc").bucketBy(16,"match_id").sortBy("match_id")`
    (M3/notebooks/assignment_3_spark.py:36-42). Reading the table back and
    joining on `bucket_col` yields a shuffle-free sort-merge join.
    `path` makes the table external at that location (scratch-friendly:
    DROP TABLE + rmtree cleans up completely).
    """
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """S6/S7: directory-partitioned sink → partition pruning on read."""
    (
        df.repartition(partition_col)
        .write.format(fmt)
        .mode(mode)
        .partitionBy(partition_col)
        .save(path)
    )


def write_repartitioned_sorted(
    df: DataFrame,
    path: str,
    num_partitions: int,
    key: str,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """O4/O5: repartition(n, key) + sortWithinPartitions for compression.

    The reference measures sorted-vs-unsorted file bytes
    (M3/notebooks/assignment_3_spark.ipynb cells 29-32); bench.py
    reproduces that experiment.
    """
    out = df.repartition(num_partitions, key)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.format(fmt).mode(mode).save(path)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_rows_per_file: int,
) -> int:
    """Small-files compaction — the lakehouse OPTIMIZE / Iceberg
    rewrite_data_files maintenance pass: rewrite a fragmented parquet
    directory into ceil(n_rows / target_rows_per_file) files.

    At 100 TB this is the operation that keeps scan parallelism sane:
    streaming sinks and fine-grained upserts accrete thousands of
    KB-sized files whose per-file open/footer cost dominates scans;
    compaction trades one bounded rewrite for every future read. The
    row count comes from parquet metadata (no data read); the rewrite
    is one round-robin repartition — no key shuffle, no skew concern
    — and content is untouched by construction (asserted by the
    catalog entry's oracle, which aggregates straight from the
    source). Returns the target file count.
    """
    n = spark.read.parquet(src).count()
    n_files = max(1, -(-n // target_rows_per_file))
    (
        spark.read.parquet(src)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n_files
