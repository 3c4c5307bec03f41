"""asof_join unit coverage: tie semantics, strict mode, missing state,
and equivalence with DuckDB's native ASOF JOIN on the driver testdata
(the catalog entry `asof_latest_order` re-checks this at the gate).
"""

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_bootcamp_spark.operators.temporal import asof_join


def _d(s):
    return dt.date.fromisoformat(s)


def _fixtures(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _d("2024-01-05")),
            (2, 10, _d("2024-01-10")),
            (3, 10, _d("2024-01-01")),  # before any state
            (4, 20, _d("2024-02-01")),  # key with no state at all
        ],
        "row_id long, k long, ts date",
    )
    state = spark.createDataFrame(
        [
            (10, _d("2024-01-05"), "a"),  # exactly at probe 1's ts
            (10, _d("2024-01-03"), "b"),
            (10, _d("2024-01-09"), "c"),
        ],
        "k long, sts date, payload string",
    )
    return probe, state


def test_asof_on_or_before_with_tie(spark):
    probe, state = _fixtures(spark)
    out = asof_join(
        probe, state, key="k", left_ts="ts", right_ts="sts", payload_cols=["payload"]
    )
    got = {r["row_id"]: (r["asof_ts"], r["payload"]) for r in out.collect()}
    assert got[1] == (_d("2024-01-05"), "a")  # tie: on-or-before includes it
    assert got[2] == (_d("2024-01-09"), "c")  # latest prior wins
    assert got[3] == (None, None)  # probe precedes all state
    assert got[4] == (None, None)  # key never has state
    assert out.count() == probe.count()  # LEFT semantics: no row loss


def test_asof_strict_excludes_equal_ts(spark):
    probe, state = _fixtures(spark)
    out = asof_join(
        probe,
        state,
        key="k",
        left_ts="ts",
        right_ts="sts",
        payload_cols=["payload"],
        strict=True,
    )
    got = {r["row_id"]: (r["asof_ts"], r["payload"]) for r in out.collect()}
    assert got[1] == (_d("2024-01-03"), "b")  # equal ts excluded under strict
    assert got[2] == (_d("2024-01-09"), "c")


def test_asof_requires_key_on_right(spark):
    probe, state = _fixtures(spark)
    try:
        asof_join(
            probe,
            state.withColumnRenamed("k", "other"),
            key="k",
            left_ts="ts",
            right_ts="sts",
            payload_cols=["payload"],
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_asof_single_shuffle_plan(spark):
    """The union-and-window form must cost exactly one exchange —
    that is the point of choosing it over a range join."""
    probe, state = _fixtures(spark)
    out = asof_join(
        probe, state, key="k", left_ts="ts", right_ts="sts", payload_cols=["payload"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_duckdb_native(spark, sf_dir):
    import duckdb

    from data_engineering_bootcamp_spark.sources.readers import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", F.to_date(F.col("ts")).alias("ed"))
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        # explicit day resolution: asof_join refuses lossy implicit
        # timestamp->date casts since the r6 review
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("o_orderdate"),
        )
        .agg(F.max("o_orderkey").alias("ok"))
    )
    got = (
        asof_join(ev, od, key="user_id", left_ts="ed", right_ts="o_orderdate",
                  payload_cols=["ok"])
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.count("ok").alias("n_matched"),
            F.sum("ok").alias("sum_ok"),
        )
        .collect()[0]
    )
    want = duckdb.sql(
        f"""
        WITH ev AS (SELECT event_id, user_id, CAST(ts AS DATE) AS ed
                    FROM '{sf_dir}/events.parquet' WHERE user_id IS NOT NULL),
        od AS (SELECT o_custkey AS user_id, o_orderdate, MAX(o_orderkey) AS ok
               FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2)
        SELECT COUNT(*), COUNT(ok), SUM(ok)
        FROM ev ASOF LEFT JOIN od
          ON ev.user_id = od.user_id AND ev.ed >= od.o_orderdate
        """
    ).fetchone()
    assert (got["n"], got["n_matched"], got["sum_ok"]) == want


def test_interpolate_linear_numeric_x(spark):
    from data_engineering_bootcamp_spark.operators.temporal import (
        interpolate_linear,
    )

    # non-uniform x spacing: gap between x=2 (y=10) and x=8 (y=40)
    # interpolates at true x distance, not row position
    rows = [
        ("a", 2, 10.0),
        ("a", 4, None),   # 10 + 30*(2/6) = 20
        ("a", 7, None),   # 10 + 30*(5/6) = 35
        ("a", 8, 40.0),
        ("a", 1, None),   # leading edge -> NULL
        ("a", 9, None),   # trailing edge -> NULL
        ("b", 1, 5.0),    # key isolation: single observation
        ("b", 2, None),   # no following obs -> NULL
    ]
    df = spark.createDataFrame(rows, "k string, x int, y double")
    got = {
        (r.k, r.x): r.y_interp
        for r in interpolate_linear(df, ["k"], "x", "y").collect()
    }
    assert got[("a", 2)] == 10.0 and got[("a", 8)] == 40.0
    assert got[("a", 4)] == 20.0
    assert got[("a", 7)] == 35.0
    assert got[("a", 1)] is None and got[("a", 9)] is None
    assert got[("b", 1)] == 5.0 and got[("b", 2)] is None


def test_interpolate_linear_dates_and_rounding(spark):
    from data_engineering_bootcamp_spark.operators.temporal import (
        interpolate_linear,
    )
    import datetime as dt

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 0.0),
        ("a", d(2024, 1, 2), None),  # 1/3 of the way -> 0.333333
        ("a", d(2024, 1, 4), 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, x date, y double")
    got = {
        r.x.day: r.y_interp
        for r in interpolate_linear(df, ["k"], "x", "y").collect()
    }
    assert got[2] == 0.333333  # HALF_UP at 6dp


def test_interval_concurrency_sweep(spark):
    from data_engineering_bootcamp_spark.operators.temporal import (
        interval_concurrency,
    )
    import datetime as dt

    t = lambda h, m=0, s=0: dt.datetime(2024, 1, 1, h, m, s)  # noqa: E731
    rows = [
        (t(1), t(3)),        # A: 01-03
        (t(2), t(4)),        # B: 02-04 (overlaps A)
        (t(2), t(2)),        # C: point interval at 02
        (t(5), t(5, 30)),    # D: isolated
        (None, t(6)),        # excluded: null start
        (t(7), t(6)),        # excluded: inverted
        # E spans midnight into Jan 2 -> carry into next bucket
        (dt.datetime(2024, 1, 1, 23), dt.datetime(2024, 1, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    got = {
        r.ts: (r.concurrency, r.carry_in)
        for r in interval_concurrency(df, "s", "e").collect()
    }
    assert got[t(1)] == (1, 0)          # A starts
    assert got[t(2)] == (3, 0)          # A + B + point C
    # C ends 1us after 02:00 -> back to 2
    assert got[dt.datetime(2024, 1, 1, 2, 0, 0, 1)] == (2, 0)
    assert got[dt.datetime(2024, 1, 1, 3, 0, 0, 1)] == (1, 0)  # A ends
    assert got[dt.datetime(2024, 1, 1, 4, 0, 0, 1)] == (0, 0)  # B ends
    assert got[t(5)] == (1, 0)
    assert got[t(23)] == (1, 0)         # E starts
    # E's end boundary lands on Jan 2 with carry_in 1 from Jan 1
    assert got[dt.datetime(2024, 1, 2, 1, 0, 0, 1)] == (0, 1)


def test_interval_concurrency_same_instant_net(spark):
    from data_engineering_bootcamp_spark.operators.temporal import (
        interval_concurrency,
    )
    import datetime as dt

    # one interval's exclusive end coincides with another's start:
    # the +1/-1 net at that instant, concurrency stays 1 (no phantom 2)
    a = dt.datetime(2024, 1, 1, 1)
    b = dt.datetime(2024, 1, 1, 2, 0, 0, 1)  # starts 1us after A's end
    rows = [(a, dt.datetime(2024, 1, 1, 2)), (b, dt.datetime(2024, 1, 1, 3))]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    got = {
        r.ts: r.concurrency
        for r in interval_concurrency(df, "s", "e").collect()
    }
    assert got[a] == 1
    assert got[b] == 1  # -1 (A end) and +1 (B start) net at the instant
    assert max(got.values()) == 1
