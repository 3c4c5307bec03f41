"""Array/struct function layer.

Thin wrappers where Spark semantics differ from the reference's Postgres
semantics (SURVEY §2.8 array family, §7 hard-parts 1 and 4):

- Postgres `ARRAY_AGG(x ORDER BY k)` is ordered; Spark `collect_list` is
  NOT → `ordered_collect` sorts deterministically inside the aggregate.
- Postgres arrays are 1-indexed; we standardize on `element_at`
  (1-indexed) and expose `array_last` for `arr[CARDINALITY(arr)]`
  (M1/sql/load_players_table_day2.sql:62-68).
- `generate_series(date, date, interval)` → `date_spine`
  (sequence+explode; M2/lecture-lab/anaylze_datelist.sql:7-9).

All functions build Catalyst expressions (JVM-side, codegen'd) — no
Python UDFs, so they cost the same as hand-written SQL at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_collect(value: Column | str, order_key: Column | str | None = None) -> Column:
    """Deterministic ARRAY_AGG(value ORDER BY order_key).

    Implements Postgres ordered aggregation (A6,
    M1/homework/assignment.sql:50-53) without a window: collect
    (order_key, value) structs, array_sort on the leading key, then
    project the value back out. Stays in a single ObjectHashAggregate —
    no extra shuffle versus plain collect_list.

    If order_key is None the value itself is the sort key.
    """
    value = F.col(value) if isinstance(value, str) else value
    if order_key is None:
        return F.array_sort(F.collect_list(value))
    order_key = F.col(order_key) if isinstance(order_key, str) else order_key
    pairs = F.collect_list(F.struct(order_key.alias("k"), value.alias("v")))
    return F.transform(F.array_sort(pairs), lambda p: p["v"])


def sorted_collect_set(value: Column | str) -> Column:
    """ARRAY_AGG(DISTINCT x ORDER BY x) — A7/A8 (collect_set + sort)."""
    value = F.col(value) if isinstance(value, str) else value
    return F.array_sort(F.collect_set(value))


def array_last(arr: Column | str) -> Column:
    """Postgres `arr[CARDINALITY(arr)]` — last element, 1-indexed."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.element_at(arr, F.size(arr))


def date_spine(start: Column | str, stop: Column | str, step: str = "interval 1 day") -> Column:
    """`generate_series(start, stop, step)` as an array column; explode at
    the call site (J11/J12 — lateral series = explode of computed array)."""
    start = F.lit(start) if isinstance(start, str) else start
    stop = F.lit(stop) if isinstance(stop, str) else stop
    return F.sequence(start.cast("date"), stop.cast("date"), F.expr(step))
