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


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bucket_fn=None,
) -> DataFrame:
    """Concurrent-interval counting by sweep line — "how many sessions
    were active at each instant" — without ever joining intervals
    against instants (the naive range join is |intervals| × |probes|).

    Each interval [start, end] INCLUSIVE emits +1 at `start` and -1 at
    `end + 1µs`; deltas are grouped per distinct instant (so same-
    instant starts/ends net out before any prefix sum — no tie-order
    ambiguity), and the running sum at instant t is the number of
    intervals covering [t, next_t).

    Scale: a GLOBAL running sum would be a single-partition window, so
    this uses the classic two-phase distributed scan:
      1. per-BUCKET running sum (window hash-partitioned by
         `bucket_fn(ts)`, default calendar day) over the grouped
         deltas;
      2. per-bucket delta totals — a relation bounded by |buckets|
         (days/hours, thousands of rows at ANY data size) — prefix-
         summed by one tiny global window and broadcast back as each
         bucket's carry-in.
    One corpus-scale shuffle (the groupBy/window bucket partitioning);
    the only global window runs on the bounded bucket relation.

    Output: (bucket, ts, n_delta, carry_in, concurrency) — one row per
    distinct boundary instant; `concurrency` = carry_in + local run.
    Buckets with no boundary instants are omitted (their concurrency
    is constant and equals the carry of the next emitted bucket).
    NULL starts/ends and inverted intervals (end < start) are excluded
    — they have no defined coverage."""
    if bucket_fn is None:
        # default calendar-day bucket must be the TZ-free UTC day:
        # F.to_date renders in the session timezone (GATECHECK_tz_r09)
        from ..functions.datelist import utc_date_of_ts

        bucket_fn = utc_date_of_ts
    ivals = df.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    )
    starts = ivals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    )
    ends = ivals.select(
        (F.col(end_col) + F.expr("INTERVAL 1 MICROSECOND")).alias("ts"),
        F.lit(-1).alias("delta"),
    )
    per_ts = (
        starts.unionByName(ends)
        .groupBy(bucket_fn(F.col("ts")).alias("bucket"), "ts")
        .agg(F.sum("delta").alias("n_delta"))
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = per_ts.withColumn("run", F.sum("n_delta").over(wloc))
    totals = per_ts.groupBy("bucket").agg(F.sum("n_delta").alias("bd"))
    wcarry = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = totals.select(
        "bucket",
        F.coalesce(F.sum("bd").over(wcarry), F.lit(0)).alias("carry_in"),
    )
    return local.join(F.broadcast(carry), "bucket").select(
        "bucket",
        "ts",
        "n_delta",
        "carry_in",
        (F.col("carry_in") + F.col("run")).alias("concurrency"),
    )


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
