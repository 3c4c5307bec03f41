"""Regression: readers must be self-sufficient under ANY SparkSession.

Round-1 driver harness passed a vanilla SparkSession (no engine session
factory), and every events.parquet scan died with PARQUET_TYPE_ILLEGAL
because spark.sql.legacy.parquet.nanosAsLong was set only in
session.get_spark. load_table now sets the conf itself; these tests
reproduce the exact driver condition by UNSETTING the conf first.
"""

import pytest
from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import functions as F

from data_engineering_bootcamp_spark.sources.readers import load_table


def _unset_nanos(spark):
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass


def test_vanilla_session_cannot_read_events_raw(spark, sf_small):
    # precondition for the regression to be meaningful: without the conf,
    # a raw read of events (TIMESTAMP(NANOS) ts) must fail
    _unset_nanos(spark)
    with pytest.raises(AnalysisException, match="PARQUET_TYPE_ILLEGAL"):
        spark.read.parquet(f"{sf_small}/events.parquet").schema


def test_load_table_self_sufficient_on_events(spark, sf_small):
    _unset_nanos(spark)
    ev = load_table(spark, sf_small, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # run an actual events query end-to-end under the vanilla condition
    n = ev.where(F.col("user_id").isNotNull()).groupBy("event_type").count()
    assert n.count() > 0


def test_streaming_gate_self_sufficient(spark, sf_small):
    from data_engineering_bootcamp_spark.plans.catalog_ext import (
        q_streaming_tumbling,
    )

    _unset_nanos(spark)
    out = q_streaming_tumbling(spark, sf_small)
    assert out.count() > 0
    assert set(out.columns) == {"window_start", "event_type", "num_hits"}
