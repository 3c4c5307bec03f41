"""Datelist-int bitmask layer (SURVEY §2.4 A10/A11, §7 hard-part 2).

The reference stores a month of daily activity as BIT(32)
(M2/tables/user_datelist_int.sql:1-6), built with
`SUM(CASE WHEN is_active THEN POW(2, 32 - days_since) END)::bigint::bit(32)`
(M2/lecture-lab/anaylze_datelist.sql:11-18) and probed with BIT_COUNT and
bitwise AND against literal masks (anaylze_datelist.sql:23-31).

Spark has no BIT(n) type; we standardize on a BIGINT bitmask with the
convention **bit i (1 << i) = `reference_date - i` was active** (i = 0 is
the reference date itself, i = 31 the oldest tracked day). The reference's
two variants disagree on direction (POW(2, 32-days_since) vs 1 << day_idx,
M2/homework/assignmnet_2.sql:156-163); we pick the shift form and document
it here. All pure Catalyst expressions — bit ops stay in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def datelist_int(active_date: Column | str, reference_date: Column | str) -> Column:
    """Aggregate expression: fold active dates within 32 days of
    `reference_date` into a BIGINT bitmask (bit i = ref_date - i active)."""
    active_date = F.col(active_date) if isinstance(active_date, str) else active_date
    reference_date = (
        F.col(reference_date) if isinstance(reference_date, str) else reference_date
    )
    days_since = F.datediff(reference_date, active_date)
    in_window = (days_since >= 0) & (days_since < 32)
    # 2^d via pow: exact in double for d<53, and PySpark's shiftleft only
    # takes a literal bit count. Caller must pass DISTINCT (entity, date)
    # rows so each bit is added at most once.
    weight = F.pow(F.lit(2.0), days_since.cast("double"))
    return F.sum(F.when(in_window, weight).otherwise(F.lit(0.0))).cast("bigint")


def datelist_probe_week(mask: Column | str) -> Column:
    """Was the entity active in the last 7 days? (bitwise AND against the
    low 7 bits — anaylze_datelist.sql:25-27 pattern)."""
    mask = F.col(mask) if isinstance(mask, str) else mask
    return (mask.bitwiseAND(F.lit(0x7F))) > 0


def datelist_probe_month(mask: Column | str) -> Column:
    """Active at all in the tracked 32 days."""
    mask = F.col(mask) if isinstance(mask, str) else mask
    return mask > 0


def datelist_active_days(mask: Column | str) -> Column:
    """BIT_COUNT(mask) — number of active days (anaylze_datelist.sql:23)."""
    mask = F.col(mask) if isinstance(mask, str) else mask
    return F.bit_count(mask)


def epoch_day(df, col_name: str) -> Column:
    """TZ-free calendar-day ordinal (days since 1970-01-01) for a column
    that may be DATE- or TIMESTAMP-typed.

    The two encodings need different expressions (VERDICT r8 #1):

    - ``DateType`` is already a TZ-free day count, read exactly by
      ``datediff(col, '1970-01-01')``. Casting a DATE to long is
      **NULL** in Spark (defined only for timestamps) — the bug this
      helper exists to prevent.
    - ``TimestampType`` must NOT go through ``to_date`` (that renders
      in the session timezone and shifts day boundaries); dividing the
      raw epoch-second instant keeps the boundary pinned to UTC, the
      same wall-clock-as-UTC reading the TZ-naive DuckDB oracle gives.

    Takes the DataFrame (not just the column) because the branch is
    static on the schema dtype — there is no runtime dtype dispatch in
    Catalyst.

    Raises TypeError for any other dtype (ADVICE r9): a STRING or INT
    column falling through to the timestamp arm would cast-to-long into
    silent NULLs (string) or mis-scaled ordinals (int) — the exact
    silent-wrong-answer class this helper exists to prevent.

    TIMESTAMP_NTZ gets its own arm: NTZ cannot cast to long (analysis
    error on Spark 4), and it doesn't need epoch arithmetic — an NTZ
    value IS a TZ-free wall clock, so ``to_date`` reads its calendar
    day without any session-TZ involvement.
    """
    _require_date_or_ts(df, col_name, "epoch_day")
    from pyspark.sql import types as T

    dt = df.schema[col_name].dataType
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col_name), F.lit("1970-01-01")).cast("int")
    ntz = getattr(T, "TimestampNTZType", None)
    if ntz is not None and isinstance(dt, ntz):
        return F.datediff(
            F.to_date(F.col(col_name)), F.lit("1970-01-01")
        ).cast("int")
    return F.floor(F.col(col_name).cast("long") / 86400).cast("int")


def _require_date_or_ts(df, col_name: str, fn_name: str) -> None:
    """Enforce the schemas.py dtype contract at the helper boundary:
    only DATE and TIMESTAMP (with or without TZ) have a well-defined
    TZ-free day reading; anything else must fail loudly, not NULL."""
    from pyspark.sql import types as T

    dt = df.schema[col_name].dataType
    ok = (T.DateType, T.TimestampType)
    ntz = getattr(T, "TimestampNTZType", None)
    if ntz is not None:
        ok = (*ok, ntz)
    if not isinstance(dt, ok):
        raise TypeError(
            f"{fn_name}({col_name!r}): column is {dt.simpleString()}, "
            "need DATE or TIMESTAMP — a string/int column would cast "
            "to silent NULLs on the epoch-arithmetic path"
        )


def utc_date_of_ts(ts: Column | str) -> Column:
    """Session-TZ-free calendar date of a TIMESTAMP instant (its UTC
    day). `F.to_date(ts)` renders the instant in
    spark.sql.session.timeZone — under a non-UTC session every
    midnight-UTC instant lands on the PREVIOUS day, shifting day
    aggregates away from the TZ-naive oracles (GATECHECK_tz_r09 found
    27 such entries). Pure date arithmetic on the raw epoch seconds
    instead: days-since-epoch added to DATE'1970-01-01' — DateType
    carries no timezone, so everything downstream (datediff, trunc,
    dayofmonth, casts to string) stays TZ-free."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.date_add(
        F.to_date(F.lit("1970-01-01")),
        F.floor(ts.cast("long") / 86400).cast("int"),
    )


def utc_date(df, col_name: str) -> Column:
    """`utc_date_of_ts` with the DATE/TIMESTAMP dtype branch of
    `epoch_day`: DATE columns pass through (already TZ-free),
    TIMESTAMP columns take the UTC-day path; TIMESTAMP_NTZ columns are
    TZ-free wall clocks already, so plain `to_date` reads their
    calendar day (NTZ cannot cast to long, which the UTC-day path
    needs). Any other dtype raises TypeError (ADVICE r9 — same
    contract as `epoch_day`)."""
    from pyspark.sql import types as T

    _require_date_or_ts(df, col_name, "utc_date")
    dt = df.schema[col_name].dataType
    if isinstance(dt, T.DateType):
        return F.col(col_name)
    ntz = getattr(T, "TimestampNTZType", None)
    if ntz is not None and isinstance(dt, ntz):
        return F.to_date(F.col(col_name))
    return utc_date_of_ts(col_name)


def utc_ts_lit(wall: str) -> Column:
    """Session-TZ-free TIMESTAMP literal: the instant whose UTC wall
    clock is `wall` ('yyyy-MM-dd' or 'yyyy-MM-dd HH:mm:ss').

    ``F.lit(s).cast("timestamp")`` parses the string in
    spark.sql.session.timeZone, so a date cutoff literal silently moves
    with the session: under Asia/Kolkata (+05:30) a midnight cutoff
    lands 5h30 EARLIER in UTC and drops every midnight-valued boundary
    row. The r12 half-hour-offset gate probe caught `pricing_summary`
    doing exactly this (26 rows at the cutoff instant excluded; the
    America/New_York axis had passed only because the shift direction
    landed in a rowless gap — see GATECHECK_tzhalf_r12.log). The epoch
    is computed driver-side in UTC and emitted as
    ``timestamp_micros(<long literal>)`` — a foldable expression, so
    Catalyst still pushes comparisons against it into the parquet scan
    as a plain timestamp bound."""
    from datetime import datetime, timezone

    fmt = "%Y-%m-%d %H:%M:%S" if " " in wall else "%Y-%m-%d"
    us = int(
        datetime.strptime(wall, fmt)
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1_000_000
    )
    return F.timestamp_micros(F.lit(us))


def utc_ts_str(ts: Column | str) -> Column:
    """Session-TZ-free 'yyyy-MM-dd HH:mm:ss' rendering of a TIMESTAMP
    instant (UTC wall clock). `F.date_format` renders in the session
    timezone; this composes the string from epoch arithmetic only —
    the exact string a TZ-naive engine (the DuckDB oracles) prints
    for the same stored instant."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    secs = ts.cast("long")
    days = F.floor(secs / 86400).cast("long")
    d = F.date_add(F.to_date(F.lit("1970-01-01")), days.cast("int"))
    sod = (secs - days * 86400).cast("int")
    hh = F.lpad(F.floor(sod / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(
        F.floor((sod % 3600) / 60).cast("int").cast("string"), 2, "0"
    )
    ss = F.lpad((sod % 60).cast("string"), 2, "0")
    return F.concat(
        d.cast("string"), F.lit(" "), hh, F.lit(":"), mm, F.lit(":"), ss
    )
