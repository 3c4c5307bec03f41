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
from pyspark.sql.types import StringType, StructField, StructType

# the reference's Flink format string 'yyyy-MM-dd''T''HH:mm:ss.SSS''Z'''
# (start_job.py:97) in Spark datetime-pattern syntax
EVENT_TIME_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

# The reference's web-traffic source table, column for column
# (M4F/src/job/start_job.py:88-99): all VARCHAR on the wire; the
# computed `event_timestamp AS TO_TIMESTAMP(event_time, ...)` column is
# added by pipelines.with_event_time after the JSON decode.
WEB_EVENTS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("referrer", StringType()),
        StructField("user_agent", StringType()),
        StructField("host", StringType()),
        StructField("ip", StringType()),
        StructField("headers", StringType()),
        StructField("event_time", StringType()),
    ]
)


def kafka_reader_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    group_id: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Config-only builder for the Kafka source reader options — the
    Spark rendering of the reference's source DDL WITH-block
    (start_job.py:100-110): bootstrap servers, topic subscription,
    latest-offset startup, consumer group. Split out from
    `kafka_json_stream` so tests can pin the exact option set without a
    broker on the classpath; auth/SASL properties pass through `extra`
    as `kafka.`-prefixed options."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if group_id is not None:
        opts["kafka.group.id"] = group_id
    if extra:
        opts.update(extra)
    return opts


def kafka_json_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType = WEB_EVENTS_SCHEMA,
    starting_offsets: str = "latest",
    group_id: str | None = None,
) -> DataFrame:
    """S12: Kafka JSON source → typed columns.

    value bytes → from_json(schema); Kafka metadata columns are dropped,
    mirroring the Flink source table projection. Requires the
    spark-sql-kafka package on the classpath (production clusters have
    it; the test container does not — tests use json_file_stream, whose
    decode path is identical, and pin the reader options via
    `kafka_reader_options`).
    """
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_reader_options(
            brokers, topic, starting_offsets, group_id
        ))
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
