"""Change-data-capture between two table snapshots.

The diff a lakehouse change-data-feed (Delta CDF, Iceberg
changelog-scan) or a warehouse audit job produces: given OLD and NEW
snapshots of the same logical table, classify every key as
insert / delete / update (payload differs) — the input any downstream
incremental consumer (reverse-ETL, cache invalidation, SCD advance)
needs. Complements `scd_incremental` (which APPLIES changes to a
history); this DERIVES the changes from two states.

Spark-first shape: one full-outer equi join on the key columns — one
shuffle per side, streamed compare, no collect. Presence is tracked
with literal marker columns (null after the outer join ⇔ absent), and
payload comparison is NULL-SAFE (`eqNullSafe`), so a null→value or
value→null transition is an update while null→null is unchanged —
the IS DISTINCT FROM semantics an audit diff needs.

At 100 TB both snapshots shuffle on the key; if the snapshots are
bucketed on the key (S4) the exchange elides entirely, and a
partition-pruned diff (only changed date partitions) bounds the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots into change rows.

    Output: keys + `change_type` ('insert' | 'delete' | 'update', plus
    'unchanged' when ``include_unchanged``) + ``old_<c>`` / ``new_<c>``
    for every compare column. Keys must be unique per snapshot (the
    usual primary-key contract for a CDC source).
    """
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=keys, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("change_type", change).drop("_in_old", "_in_new")
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out.select(
        *keys,
        "change_type",
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )
