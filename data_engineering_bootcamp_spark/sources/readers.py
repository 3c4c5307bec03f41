"""Sources: parquet/CSV readers + temp-view registration.

Covers SURVEY §2.1 S1 (fixed-schema scans), S2 (CSV with header +
inference, M3/notebooks/assignment_3_spark.py:18-23), S3 (temp-view
registration, M3/src/jobs/players_scd_job.py:43).

Scale note: readers return plain DataFrames over columnar parquet so
Catalyst's predicate pushdown / column pruning / partition pruning apply
unchanged on a cluster. No data touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: scan one driver testdata table (TESTDATA.md).

    events.ts is stored as parquet TIMESTAMP(NANOS), which Spark reads
    only as a raw long (spark.sql.legacy.parquet.nanosAsLong) — convert
    to TimestampType here with integer ns→µs division (`div`, not `/`:
    double division would lose precision on 1.7e18-scale values).

    The conf is set HERE, not only in the session factory: callers may
    hand us any vanilla SparkSession (a test harness, a notebook) and a
    scan must not depend on who built the session. Runtime-settable.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """S3: register every testdata table as a temp view for spark.sql()."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    infer: bool = True,
) -> DataFrame:
    """S2: CSV source; explicit schema preferred, inference as convenience."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
