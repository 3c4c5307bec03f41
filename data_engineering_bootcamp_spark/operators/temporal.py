"""As-of (temporal) join — a custom operator the reference's lesson
material reaches for with window functions over event/order history
(M2 cumulative-table patterns, e.g. bootcamp `2-fact-data-modeling`
lab queries pairing each event with the latest prior state). Spark has
no ASOF JOIN; this is the scalable composition-of-builtins form.

Implementation: union-and-window, NOT a range join.

  1. Tag the left (probe) rows side=1 and the right (state) rows
     side=0, union them by name.
  2. One window partitioned by the join key, ordered by
     (ts, side, tiebreak), running `last(payload, ignorenulls=True)`.
  3. Keep the probe rows; each now carries the most recent right-side
     payload with right_ts <= left_ts (or < for strict).

Scale posture: exactly ONE shuffle (hash partition by key for the
window sort) regardless of how many right rows precede each probe —
versus the range-join form whose candidate set is |left| x |right per
key|. State rows and probe rows stay (key, ts)-sorted within
partitions, so the window is a single linear pass. Skewed keys behave
like any window (one task per hot key); pre-bucketing both inputs by
the key elides the exchange entirely.

Right-side rows must be unique per (key, ts) for deterministic
semantics (the same contract DuckDB's ASOF JOIN assumes); callers
aggregate duplicates away first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` (``<`` when ``strict``) for the
    same ``key`` — LEFT semantics: probe rows with no prior state keep
    NULL payloads.

    Output: all columns of ``left`` plus ``{right_ts}`` (aliased
    ``asof_ts``) and ``payload_cols`` from the matched right row.
    """
    if key not in right.columns:
        raise ValueError(f"asof_join: key {key!r} must exist on both sides")
    lcols = left.columns
    rts_type = right.schema[right_ts].dataType
    lts_type = left.schema[left_ts].dataType
    if rts_type != lts_type:
        from pyspark.sql.types import (
            DateType,
            TimestampNTZType,
            TimestampType,
        )

        # only the LOSSLESS widening (right DATE -> left TIMESTAMP) is
        # performed implicitly; anything else (timestamp->date
        # truncation, string parses) would silently reorder or null
        # the state timeline — the caller must cast explicitly
        widening = isinstance(
            lts_type, (TimestampType, TimestampNTZType)
        ) and isinstance(rts_type, DateType)
        if not widening:
            raise TypeError(
                f"asof_join: {left_ts} is {lts_type.simpleString()} but "
                f"{right_ts} is {rts_type.simpleString()}; an implicit "
                "cast here is lossy (e.g. timestamp->date collapses "
                "sub-day ordering) — cast one side explicitly to the "
                "intended resolution first"
            )
    # side ordinal makes ties deterministic: with on-or-before
    # semantics the state row at an equal timestamp must sort BEFORE
    # the probe row so last() sees it; strict mode flips that.
    probe_side, state_side = (1, 0) if not strict else (0, 1)
    probe = left.select(
        *lcols,
        F.lit(probe_side).alias("_side"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(rts_type).alias("_asof_ts_raw"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    state = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.lit(state_side).alias("_side"),
        F.col(right_ts).cast(left.schema[left_ts].dataType).alias("_ts"),
        F.col(right_ts).alias("_asof_ts_raw"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    ).select(*probe.columns)  # align column order for unionByName
    unioned = probe.unionByName(state)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col("_side"),
        F.last("_asof_ts_raw", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return filled.where(F.col("_side") == probe_side).drop("_side")


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "y_interp",
    ndigits: int = 6,
) -> DataFrame:
    """Linear interpolation of NULL gaps in a per-key series — the
    hypertable/timescale `interpolate()` analog (the reference's
    cumulative-table lessons carry state across gaps with window
    `last()`; this extends that pattern to value reconstruction).

    For every row, `out_col` is
      - `y` itself where observed (round-tripped through the same
        ROUND so observed and interpolated values share a dtype
        contract),
      - `prev_y + (next_y - prev_y) * (x - prev_x) / (next_x - prev_x)`
        (rounded HALF_UP to `ndigits`) where `y` IS NULL and both an
        earlier and a later observation exist in the key's series,
      - NULL at edges (no observation on one side).

    `x_col` may be a date or any numeric; spacing need not be uniform
    (the formula uses true x distances). Rows must be unique per
    (keys, x).

    Scale: TWO window passes over ONE hash partitioning by `keys`
    (backward last + forward first, both ignore-nulls linear scans) —
    never a self-join against the observation set, so cost is
    O(rows) per key regardless of gap lengths. Interpolation is
    inherently sequential per key; parallelism comes from the key
    space, the same contract as any window operator.
    """
    xc = F.col(x_col)
    x_num = (
        F.datediff(xc, F.lit("1970-01-01").cast("date")).cast("double")
        if str(df.schema[x_col].dataType).startswith("Date")
        else xc.cast("double")
    )
    back = (
        Window.partitionBy(*keys)
        .orderBy(xc.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(xc.asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    y = F.col(y_col).cast("double")
    obs_x = F.when(y.isNotNull(), x_num)
    prev_y = F.last(F.when(y.isNotNull(), y), ignorenulls=True).over(back)
    prev_x = F.last(obs_x, ignorenulls=True).over(back)
    next_y = F.first(F.when(y.isNotNull(), y), ignorenulls=True).over(fwd)
    next_x = F.first(obs_x, ignorenulls=True).over(fwd)
    interp = F.when(y.isNotNull(), F.round(y, ndigits)).otherwise(
        F.round(
            prev_y
            + (next_y - prev_y) * (x_num - prev_x) / (next_x - prev_x),
            ndigits,
        )
    )
    return df.withColumn(out_col, interp)
