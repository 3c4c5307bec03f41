"""Cumulation kernel — the J1 FULL OUTER join pattern (SURVEY §2.3).

The reference's single most repeated shape: yesterday's snapshot
FULL OUTER JOIN today's aggregate, COALESCE both sides, append today's
value to a history array
(M1/lecture-lab/pipeline_query.sql:40-42;
M2/lecture-lab/user_cumulated_populate.sql:24-26;
M4A/lecture-lab/growth_accounting.sql:44-46).

`cumulate` is the generic kernel; `cumulate_datelist` instantiates it for
the users_cumulated date-list table. At scale: both sides shuffle once on
the key (unavoidable for a full-outer), and because the snapshot is
re-partitioned by the same key every day, AQE reuses sane partition
counts; no skew because keys are user-grained.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cumulate(
    yesterday: DataFrame,
    today: DataFrame,
    key: str | list[str],
    columns: dict[str, Callable[[DataFrame, DataFrame], Column]],
) -> DataFrame:
    """Generic full-outer cumulation.

    `columns` maps output column name → builder(y, t) over the two joined
    aliases; builders use F.coalesce across sides as needed.
    """
    keys = [key] if isinstance(key, str) else list(key)
    y = yesterday.alias("y")
    t = today.alias("t")
    cond = None
    for k in keys:
        c = F.col(f"y.{k}").eqNullSafe(F.col(f"t.{k}"))
        cond = c if cond is None else (cond & c)
    joined = y.join(t, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"y.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ]
    out_cols += [builder(y, t).alias(name) for name, builder in columns.items()]
    return joined.select(*out_cols)


def cumulate_datelist(
    yesterday: DataFrame,
    today_events: DataFrame,
    ds: str,
    user_col: str = "user_id",
    date_col: str = "date_active",
) -> DataFrame:
    """users_cumulated daily build
    (M2/lecture-lab/user_cumulated_populate.sql:1-30).

    `yesterday`: (user_id, dates_active ARRAY<DATE>, date).
    `today_events`: raw events already filtered to the target day with a
    `date_active` DATE column.

    Returns (user_id, dates_active, date=ds) with today's date appended
    in front (reference keeps newest-first order:
    user_cumulated_populate.sql:16-22).
    """
    today = (
        today_events.where(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.max(F.col(date_col)).alias("date_active"))
    )
    y = yesterday.select("user_id", "dates_active")

    def dates_active(_y, _t) -> Column:
        return F.when(
            F.col("y.dates_active").isNull(), F.array(F.col("t.date_active"))
        ).when(
            F.col("t.date_active").isNull(), F.col("y.dates_active")
        ).otherwise(
            F.concat(F.array(F.col("t.date_active")), F.col("y.dates_active"))
        )

    out = cumulate(y, today, "user_id", {"dates_active": dates_active})
    return out.withColumn("date", F.lit(ds).cast("date"))


def merge_agg_states(
    states: list[DataFrame],
    keys: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """Merge partial aggregate STATES — the materialized-view
    maintenance kernel: yesterday's per-key (count, sum, min, max)
    table plus today's delta aggregate re-aggregates to exactly the
    full recompute, because these aggregates are commutative monoids
    (count/sum merge by SUM, min by MIN, max by MAX). At 100 TB this
    is the difference between scanning one day and re-scanning the
    corpus; derived ratios (avg = sum DIV count) are computed AFTER the
    merge, never merged themselves — the classic no-averaging-averages
    rule, enforced here by construction since only monoid columns are
    accepted.

    `merges` maps column -> 'sum' | 'min' | 'max'. One union + one
    keyed groupBy; the states' own shuffles already happened when they
    were built.
    """
    allowed = {"sum", "min", "max"}
    bad = {how for how in merges.values() if how not in allowed}
    if bad:
        raise ValueError(
            f"merge_agg_states: non-monoid merge fn(s) {sorted(bad)} — "
            "only sum/min/max states re-aggregate exactly; derive "
            "ratios after the merge"
        )
    if not states:
        raise ValueError("merge_agg_states: need at least one state")
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [getattr(F, how)(F.col(c)).alias(c) for c, how in merges.items()]
    return unioned.groupBy(*keys).agg(*aggs)
