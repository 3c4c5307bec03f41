"""SCD Type-2 operators (SURVEY §2.5 W1/W2, §2.7 U1).

Two forms, exactly the reference's pair:

1. `scd_from_snapshots` — backfill: collapse per-entity period snapshots
   into validity ranges via LAG change detection + cumulative-sum streak
   id (M1/lecture-lab/scd_generation_query.sql:1-35; the reference's own
   tested Spark port M3/src/jobs/players_scd_job.py:3-39).
2. `scd_incremental` — one-period advance: historical ∪ unchanged ∪
   changed ∪ new via UNION ALL assembly
   (M1/lecture-lab/incremental_scd_query.sql:1-110).

Scale: the window functions partition by the entity key — one hash
exchange, then both LAG and the running SUM evaluate in the same sorted
partition pass. The groupBy on (entity, streak) reuses the same
partitioning, so Catalyst plans a single shuffle for the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd_from_snapshots(
    snapshots: DataFrame,
    key: str,
    period: str,
    tracked: list[str],
    current_period: int | str | None = None,
) -> DataFrame:
    """Collapse (key, period, tracked...) snapshots into SCD-2 ranges.

    Output: key, tracked..., start_<period>, end_<period>
    [, current_<period> if `current_period` given].

    Change detection treats NULL <> NULL as "no change" (eqNullSafe — the
    reference upgrades to IS DISTINCT FROM in
    M1/homework/assignment.sql:128-129).
    """
    w = Window.partitionBy(key).orderBy(period)
    changed = F.lit(False)
    for c in tracked:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | (~F.col(c).eqNullSafe(prev))
    first_row = F.lag(F.col(period)).over(w).isNull()
    with_streak = snapshots.withColumn(
        "_did_change", F.when(first_row | changed, 1).otherwise(0)
    ).withColumn(
        "_streak",
        F.sum("_did_change").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = with_streak.groupBy(key, "_streak", *tracked).agg(
        F.min(period).alias(f"start_{period}"),
        F.max(period).alias(f"end_{period}"),
    )
    out = out.drop("_streak")
    if current_period is not None:
        out = out.withColumn(f"current_{period}", F.lit(current_period))
    return out.select(
        key, *tracked, f"start_{period}", f"end_{period}",
        *([f"current_{period}"] if current_period is not None else []),
    )


def scd_incremental(
    history: DataFrame,
    latest_snapshot: DataFrame,
    key: str,
    period: str,
    tracked: list[str],
    new_period: int,
) -> DataFrame:
    """Advance an SCD-2 table by one period
    (M1/lecture-lab/incremental_scd_query.sql:38-110).

    `history` columns: key, tracked..., start_<period>, end_<period>.
    Rows with end_<period> == new_period - 1 are "current"; older rows are
    sealed. `latest_snapshot`: key, tracked... for new_period.
    """
    sp, ep = f"start_{period}", f"end_{period}"
    prev_period = new_period - 1
    # ONE reference to `history` (r11): the previous form split it into
    # historical (ep < prev) / current (ep == prev) and UNIONed the
    # sealed rows back around the join — referencing the input subtree
    # TWICE, so a composed replay's plan DOUBLED per advance inside a
    # checkpoint window (2^n analysis blow-up; the 31-day replay's
    # checkpoint cadence existed to contain exactly this). Folding the
    # currency test into the full-outer join as a residual condition
    # scans history once and grows the composed plan LINEARLY:
    #   - sealed row (residual false, matches nothing): emits (c, null)
    #     -> the keep-sealed branch, the old union pass-through;
    #   - current row: pairs with its snapshot row (extend/seal+open)
    #     or emits (c, null) when the entity vanished -> retire, which
    #     for ep == prev_period IS the sealed range;
    #   - snapshot row matching no current row (brand-new, or a retired
    #     entity reappearing): emits (null, s) -> new range. SMJ
    #     supports full-outer with residual conditions, so the physical
    #     shape is unchanged: one shuffle per side, one merge.
    c = history.alias("c")
    s = latest_snapshot.alias("s")
    joined = c.join(
        s,
        (F.col(f"c.{key}") == F.col(f"s.{key}"))
        & (F.col(f"c.{ep}") == F.lit(prev_period)),
        "full_outer",
    )

    same = F.lit(True)
    for t in tracked:
        same = same & F.col(f"c.{t}").eqNullSafe(F.col(f"s.{t}"))

    def _row(side: str, start, end):
        return F.struct(
            F.col(f"{side}.{key}").alias(key),
            *[F.col(f"{side}.{t}").alias(t) for t in tracked],
            start.alias(sp),
            end.alias(ep),
        )

    # One pass over the full-outer join: each row contributes an array of
    # output ranges which a single explode unnests — exactly the
    # reference's UNNEST(ARRAY[old, new]) shape
    # (incremental_scd_query.sql:46-74). A UNION ALL of per-branch
    # filters re-evaluates the join subtree once per branch (5 scans of
    # the inputs, ~30 shuffles at plan level); this form scans it once.
    in_c = F.col(f"c.{key}").isNotNull()
    in_s = F.col(f"s.{key}").isNotNull()
    np_lit = F.lit(new_period)
    # Double-advance guard (ADVICE r11): the residual-condition rewrite
    # routes a malformed history row (end_<period> >= new_period, e.g.
    # an accidentally re-run advance) into the pass-through branch —
    # where the old historical/current split would have DROPPED it —
    # yielding silently overlapping ranges. Such a row can only land in
    # the `otherwise` branch (the join residual requires ep == prev),
    # so the guard rides only that branch's start field: one integer
    # compare per pass-through row, raise_error on violation, so a
    # double-advance fails the job loudly at first materialization.
    # The raise branch leads the CASE so its NullType coerces to the
    # start column's type — touching history.schema here instead would
    # force a full Catalyst analysis PER ADVANCE in composed replays
    # (measured by tools/replay_depth.py: the schema probe moved the
    # whole composed-analysis cost into the build loop).
    guarded_start = F.when(
        F.col(f"c.{ep}") >= np_lit,
        F.raise_error(
            F.lit(
                f"scd_incremental: history row with {ep} >= new_period "
                f"({new_period}) — input was already advanced past this "
                "period (double-advance?)"
            )
        ),
    ).otherwise(F.col(f"c.{sp}"))
    branches = (
        # unchanged: extend the current range into the new period
        F.when(in_c & in_s & same, F.array(_row("c", F.col(f"c.{sp}"), np_lit)))
        # changed: seal the old range, open a new one
        .when(
            in_c & in_s & ~same,
            F.array(
                _row("c", F.col(f"c.{sp}"), F.col(f"c.{ep}")),
                _row("s", np_lit, np_lit),
            ),
        )
        # brand-new entity, or a retired one reappearing (c side NULL)
        .when(~in_c, F.array(_row("s", np_lit, np_lit)))
        # s side NULL: a sealed row passing through (residual false) or
        # a vanished current row being retired — both keep (start, end)
        .otherwise(F.array(_row("c", guarded_start, F.col(f"c.{ep}"))))
    )
    # ONE DataFrame op for unnest + projection (VERDICT r14 #6): each
    # op re-runs eager analysis over the whole composed subtree, so in
    # an n-day replay every op saved per advance is O(n) analyzer work
    # saved per day. inline() explodes the struct array straight into
    # columns — the structs are built with fields already in the
    # output order (key, tracked..., start, end), so explode +
    # star-expand + reorder collapse into a single select (1 op per
    # advance where the r14 form spent 3).
    return joined.select(F.inline(branches))
