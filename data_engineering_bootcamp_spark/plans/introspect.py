"""Physical-plan introspection shared by tests and tools.

One definition of "how many Exchanges does this plan have" so the
bucket-join assertions (tests/test_writers.py) and the scale bench
(tools/scale_bench.py) can't drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange nodes in the executed plan.

    Counted on the string form of the executedPlan (pre-AQE-execution,
    so counts are stable and don't depend on runtime re-planning);
    includes both shuffle and broadcast exchanges — callers asserting
    "shuffle elided" should hold broadcast structure constant between
    the plans they compare.
    """
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string, for regex-level assertions."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
