"""Skew mitigation: salting for hot keys (SURVEY §7 hard-part 8).

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew; salting is the explicit fallback for the cases AQE cannot
fix — a skewed *aggregation* (one reducer owns the hot key) and joins
whose skewed side must stay on a deterministic partitioning.

`salted_aggregate` — two-phase aggregation: spray each key over
`n_salts` sub-keys, partially aggregate, then aggregate the partials.
Catalyst already does map-side partial aggregation, but when one key
dominates, ALL of its partials still meet in one reducer; salting
spreads that final merge over `n_salts` reducers first.

`salted_join` — fact-side rows get a per-row salt (row ordinal by
default — result-invisible, see `with_salt`), the dimension side is
exploded across all salts, and the join key becomes (key, salt) — the
hot key's rows land on `n_salts` reducers instead of one. Works for
inner/left joins onto a dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt",
              entropy: Column | None = None) -> DataFrame:
    """Salt in [0, n_salts).

    Default entropy is `monotonically_increasing_id()` — a per-row
    ordinal, so BYTE-IDENTICAL rows still spread across salts (the
    typical hot key is exactly many identical rows; hashing the row's
    columns, the old default, gave them all ONE salt and zero
    mitigation). The salt never reaches any output (both salted
    operators aggregate/drop it), so its partition-layout dependence is
    result-invisible by construction. Pass `entropy` (e.g.
    `F.xxhash64("row_id")`) when a run-stable salt assignment matters,
    e.g. for debugging a specific reducer."""
    src = (
        entropy
        if entropy is not None
        else F.xxhash64(F.monotonically_increasing_id())
    )
    return df.withColumn(salt_col, F.pmod(src, F.lit(n_salts)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps output column → (input column, fn) with fn in
    {sum, count, min, max}: the decomposable aggregates whose partials
    re-combine exactly (count re-combines via sum).
    """
    recombine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, recombine[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: fact rows salted, dim exploded × n_salts.

    The dim side grows n_salts-fold — use only when the dim is too large
    to broadcast outright but small enough to replicate; for broadcast-
    able dims plain `F.broadcast` already avoids the skew entirely.

    Only inner/left are valid: with right/full-outer, dim keys absent
    from the fact side would surface once per salt replica (n_salts
    duplicate rows), so those modes are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how in {{'inner', 'left'}}, got {how!r}: "
            "the dim side is replicated across salts, so outer-preserving "
            "the dim would emit one row per salt for unmatched dim keys"
        )
    f = with_salt(fact, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
