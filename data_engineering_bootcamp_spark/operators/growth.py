"""Growth accounting + retention (SURVEY §2.3 J1, M4A patterns).

`growth_accounting` replicates the five-state daily machine of
M4A/lecture-lab/growth_accounting.sql:19-46 (New / Retained /
Resurrected / Churned / Stale) driven by the FULL OUTER JOIN null-state
logic (§7 hard-part 5).

`retention_curve` is the days-since-first-activity analysis
(M4A/lecture-lab/retention_analysis.sql:2).

Scale: both are single-shuffle groupBy/window plans over the activity
key; the daily state machine carries only (user, first_active,
last_active, state) per user — O(users), not O(events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.datelist import utc_date_of_ts


def growth_state(
    y_last_active: Column, t_active_date: Column, ds_col: Column
) -> Column:
    """The CASE state machine (growth_accounting.sql:19-34)."""
    return (
        F.when(y_last_active.isNull() & t_active_date.isNotNull(), "New")
        .when(
            t_active_date.isNotNull()
            & (F.datediff(ds_col, y_last_active) == 1),
            "Retained",
        )
        .when(
            t_active_date.isNotNull() & (F.datediff(ds_col, y_last_active) > 1),
            "Resurrected",
        )
        .when(
            t_active_date.isNull() & (F.datediff(ds_col, y_last_active) == 1),
            "Churned",
        )
        .otherwise("Stale")
    )


def growth_accounting(
    yesterday: DataFrame, today_events: DataFrame, ds: str,
    user_col: str = "user_id", date_col: str = "date_active",
) -> DataFrame:
    """One daily advance of users_growth_accounting
    (FIXTURES.md §B schema; growth_accounting.sql:1-62).

    `yesterday`: (user_id, first_active_date, last_active_date,
    daily_active_state, dates_active, date).
    """
    ds_col = F.lit(ds).cast("date")
    today = (
        today_events.where(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.max(F.col(date_col)).alias("date_active"))
    )
    y = yesterday.alias("y")
    t = today.alias("t")
    joined = y.join(t, F.col("y.user_id") == F.col("t.user_id"), "full_outer")
    return joined.select(
        F.coalesce(F.col("y.user_id"), F.col("t.user_id")).alias("user_id"),
        F.coalesce(F.col("y.first_active_date"), F.col("t.date_active")).alias(
            "first_active_date"
        ),
        F.coalesce(F.col("t.date_active"), F.col("y.last_active_date")).alias(
            "last_active_date"
        ),
        growth_state(
            F.col("y.last_active_date"), F.col("t.date_active"), ds_col
        ).alias("daily_active_state"),
        F.when(
            F.col("y.dates_active").isNull(), F.array(F.col("t.date_active"))
        )
        .when(F.col("t.date_active").isNull(), F.col("y.dates_active"))
        .otherwise(
            F.concat(F.array(F.col("t.date_active")), F.col("y.dates_active"))
        )
        .alias("dates_active"),
        ds_col.alias("date"),
    )


def retention_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic retention: for each day-offset since a user's first active
    date, how many users were active (retention_analysis.sql shape).

    Output: (days_since_first BIGINT, active_users BIGINT) — single
    window-free plan: first-date agg, self-join-free via groupBy twice.
    """
    daily = (
        events.where(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            utc_date_of_ts(F.col(ts_col)).alias("d"),
        )
        .distinct()
    )
    firsts = daily.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        daily.join(firsts, "user_id")
        .select(F.datediff(F.col("d"), F.col("first_d")).alias("days_since_first"))
        .groupBy("days_since_first")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
