"""Session-timezone invariance (the GATECHECK_tz contract, in-suite).

Every catalog result must be identical under ANY
spark.sql.session.timeZone: the engine pins calendar-day semantics to
the UTC day of the stored instant (COVERAGE.md round-9 notes), so no
executor/session TZ configuration can change query output. The
`--tz=...` gate mode proves this for all 123 entries per round; these
tests pin the contract into pytest so a session-TZ-sensitive
expression fails CI immediately, including across a DST transition
the testdata's January window never exercises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_bootcamp_spark.functions.datelist import (
    utc_date_of_ts,
    utc_ts_str,
)

ZONES = ["UTC", "America/New_York", "Asia/Kolkata", "Australia/Lord_Howe"]


def _with_tz(spark, tz):
    spark.conf.set("spark.sql.session.timeZone", tz)


@pytest.fixture()
def restore_tz(spark):
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    yield
    spark.conf.set(key, old)


def test_utc_helpers_invariant_across_zones_and_dst(
    spark, tmp_path, restore_tz
):
    """utc_date_of_ts / utc_ts_str return identical values under every
    session TZ, including instants around a US DST fall-back (the
    hardest case: the local wall clock repeats an hour)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    instants_us = [
        0,  # epoch
        694224000_000000,  # 1992-01-01 00:00:00 UTC (midnight boundary)
        1699164000_000000,  # 2023-11-05 06:00:00 UTC (inside NY fall-back)
        1699167600_000000,  # 2023-11-05 07:00:00 UTC (repeated NY hour)
        1704067199_999999,  # 2023-12-31 23:59:59.999999 UTC
    ]
    t = pa.table({"ts": pa.array(instants_us, pa.timestamp("us"))})
    pq.write_table(t, str(tmp_path / "t.parquet"))
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(str(tmp_path / "t.parquet"))

    results = {}
    for tz in ZONES:
        _with_tz(spark, tz)
        rows = (
            df.select(
                utc_date_of_ts("ts").cast("string").alias("d"),
                utc_ts_str("ts").alias("s"),
            )
            .orderBy("s")
            .collect()
        )
        results[tz] = [(r.d, r.s) for r in rows]
    want = results["UTC"]
    assert want[1] == ("1992-01-01", "1992-01-01 00:00:00")
    assert want[4] == ("2023-12-31", "2023-12-31 23:59:59")
    for tz, got in results.items():
        assert got == want, tz


@pytest.mark.parametrize(
    "entry",
    [
        "users_cumulated",  # to_date family (UTC-day aggregation)
        "tumbling_hits",  # F.window + rendered bounds
        "sessionization",  # rendered session_start strings
        "best_stretch",  # o_orderdate (timestamp-encoded) day rollup
        "users_cumulated_replay_31d",  # 31 composed daily advances
    ],
)
def test_catalog_entries_tz_invariant(spark, sf_small, restore_tz, entry):
    """End-to-end: a representative slice of the formerly TZ-sensitive
    entries returns row-identical results under non-UTC session TZs.
    (The full 125-entry proof is the per-round --tz gate run.)"""
    from data_engineering_bootcamp_spark.plans.catalog import QUERIES

    def run():
        df = QUERIES[entry](spark, sf_small)
        cols = sorted(df.columns)
        return sorted(
            tuple(str(v) for v in row)
            for row in df.select(*cols).collect()
        )

    _with_tz(spark, "UTC")
    want = run()
    assert want  # non-empty result, or the invariance proves nothing
    for tz in ZONES[1:]:
        _with_tz(spark, tz)
        assert run() == want, tz


def test_utc_ts_str_matches_python_and_duckdb(spark, tmp_path, restore_tz):
    """Batch cross-engine check: utc_ts_str equals Python's UTC
    rendering AND DuckDB's strftime for 500 seeded-random instants
    spanning 1970-2100, evaluated under a non-UTC session TZ."""
    import datetime as dt

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20240815)
    secs = rng.integers(0, 4_102_444_800, size=500)  # 1970..2100
    micros = secs * 1_000_000 + rng.integers(0, 1_000_000, size=500)
    t = pa.table({"ts": pa.array(micros.tolist(), pa.timestamp("us"))})
    pq.write_table(t, str(tmp_path / "t.parquet"))

    want_py = [
        dt.datetime.fromtimestamp(int(s), dt.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        for s in secs
    ]
    want_duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') FROM "
            f"read_parquet('{tmp_path}/t.parquet')"
        ).fetchall()
    ]
    assert want_py == want_duck  # the two oracles agree with each other

    _with_tz(spark, "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    got = [
        r.s
        for r in spark.read.parquet(str(tmp_path / "t.parquet"))
        .select(utc_ts_str("ts").alias("s"))
        .collect()
    ]
    assert got == want_py


def test_day_helpers_reject_non_temporal_dtypes(spark):
    """ADVICE r9: epoch_day/utc_date must raise TypeError on a STRING
    or INT column instead of falling through to the timestamp arm
    (string casts to long as silent NULLs; int mis-scales)."""
    from data_engineering_bootcamp_spark.functions.datelist import (
        epoch_day,
        utc_date,
    )

    df = spark.createDataFrame(
        [("2024-01-01", 19723)], ["s", "n"]
    ).withColumn("d", F.col("s").cast("date"))
    for bad in ("s", "n"):
        with pytest.raises(TypeError, match="need DATE or TIMESTAMP"):
            epoch_day(df, bad)
        with pytest.raises(TypeError, match="need DATE or TIMESTAMP"):
            utc_date(df, bad)
    # the contract types still pass
    ts = df.withColumn("t", F.col("d").cast("timestamp"))
    assert ts.select(
        epoch_day(ts, "d").alias("a"), epoch_day(ts, "t").alias("b"),
        utc_date(ts, "d").alias("c"), utc_date(ts, "t").alias("e"),
    ).first().a == 19723
    # TIMESTAMP_NTZ: a TZ-free wall clock — must work (it cannot take
    # the cast-to-long arm, which is an analysis error on NTZ) and its
    # calendar day must be the literal wall-clock date under ANY
    # session TZ
    ntz = df.withColumn("t", F.col("s").cast("timestamp_ntz"))
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    try:
        for tz in ZONES:
            spark.conf.set(key, tz)
            row = ntz.select(
                epoch_day(ntz, "t").alias("a"),
                utc_date(ntz, "t").cast("string").alias("c"),
            ).first()
            assert (row.a, row.c) == (19723, "2024-01-01"), tz
    finally:
        spark.conf.set(key, old)


def test_utc_ts_lit_session_tz_free(spark, restore_tz):
    """utc_ts_lit pins the instant to the UTC wall clock under every
    session TZ — the construct lit(s).cast('timestamp') gets WRONG
    (the r12 Kolkata gate probe: a +05:30 session moved a midnight
    cutoff 5h30 earlier and dropped the 26 boundary rows)."""
    from data_engineering_bootcamp_spark.functions.datelist import (
        utc_ts_lit,
    )

    expect_us = 993859200000000  # 2001-06-30 00:00:00 UTC
    got, cast_got = {}, {}
    for tz in ZONES:
        _with_tz(spark, tz)
        row = spark.range(1).select(
            F.unix_micros(utc_ts_lit("2001-06-30")).alias("a"),
            F.unix_micros(
                F.lit("2001-06-30").cast("timestamp")
            ).alias("b"),
        ).first()
        got[tz] = row.a
        cast_got[tz] = row.b
    assert all(v == expect_us for v in got.values()), got
    # and the cast form really is session-dependent — the reason the
    # helper exists; if Spark ever makes the cast TZ-free this reminds
    # us the helper can retire
    assert len(set(cast_got.values())) > 1, cast_got
    # datetime form too
    _with_tz(spark, "Asia/Kolkata")
    assert (
        spark.range(1)
        .select(F.unix_micros(utc_ts_lit("2001-06-30 12:30:45")))
        .first()[0]
        == expect_us + (12 * 3600 + 30 * 60 + 45) * 1_000_000
    )
