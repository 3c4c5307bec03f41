"""Streaming sources (SURVEY §2.1 S12, §2.9 T1).

`kafka_json_stream` is the production path — the Spark equivalent of the
reference's Kafka+JSON Flink source DDL with a computed event-time column
(M4F/src/job/start_job.py:88-110, aggregation_job.py:53-75). The test
environment has no broker, so tests exercise the identical downstream
plan through `json_file_stream` (same schema, same from_json decode) and
`rate_events_stream` (synthetic load): in Structured Streaming the source
only defines micro-batch input; every transformation after it is
source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# the reference's Flink format string 'yyyy-MM-dd''T''HH:mm:ss.SSS''Z'''
# (start_job.py:97) in Spark datetime-pattern syntax
EVENT_TIME_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def kafka_json_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S12: Kafka JSON source → typed columns.

    value bytes → from_json(schema); Kafka metadata columns are dropped,
    mirroring the Flink source table projection. Requires the
    spark-sql-kafka package on the classpath (production clusters have
    it; the test container does not — tests use json_file_stream).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j")
    ).select("j.*")


def json_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based micro-batch source with the same decode as the Kafka
    path; used by tests (deterministic, no broker) and by backfills."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def rate_events_stream(
    spark: SparkSession, rows_per_second: int = 100
) -> DataFrame:
    """Synthetic event stream off the built-in rate source (load tests)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 97).cast("long").alias("user_id"),
            F.concat(F.lit("host-"), (F.col("value") % 7).cast("string")).alias(
                "host"
            ),
        )
    )
