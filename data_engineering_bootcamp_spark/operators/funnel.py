"""Funnel conversion (SURVEY §2.4 A14 + §2.3 J8).

Replicates M4A/lecture-lab/funnel_analysis.sql:1-30: dedup the event
stream, self-join on (user, day) with the theta condition
`later.ts > earlier.ts`, measure conversion from a source event to a
destination event, keep groups with conversion > 0 and enough traffic.

Scale: the self-join is an equi-join on (user_id, event_date) with a
residual time comparison — Catalyst plans a hash/sort-merge join on the
equi keys, NOT a nested loop (J8 note). Both sides shuffle on the same
key; with bucketed storage on user_id the exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datelist import utc_date_of_ts


def funnel_conversion(
    events: DataFrame,
    from_value: str,
    to_value: str,
    step_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_users: int = 0,
) -> DataFrame:
    """Per-day funnel: users who did `from_value` and whether they later
    did `to_value` the same day.

    Output: (event_date DATE, n_users BIGINT, n_converted BIGINT,
    conversion_rate DOUBLE) filtered to conversion_rate > 0 AND
    n_users > min_users (P7 post-aggregation filter).
    """
    deduped = (
        events.where(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            utc_date_of_ts(F.col(ts_col)).alias("event_date"),
            F.col(ts_col).alias("ts"),
            F.col(step_col).alias("step"),
        )
        .dropDuplicates(["user_id", "ts", "step"])  # A14 GROUP BY-all dedup
    )
    a = deduped.where(F.col("step") == from_value).alias("a")
    b = deduped.where(F.col("step") == to_value).alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_date") == F.col("b.event_date"))
        & (F.col("b.ts") > F.col("a.ts")),
        "left",
    )
    per_user = joined.groupBy(
        F.col("a.event_date").alias("event_date"),
        F.col("a.user_id").alias("user_id"),
    ).agg(
        F.max(F.when(F.col("b.ts").isNotNull(), 1).otherwise(0)).alias("converted")
    )
    out = per_user.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("conversion_rate"),
    )
    return out.where(
        (F.col("conversion_rate") > 0) & (F.col("n_users") > min_users)
    )
