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


def normalize_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize an events-style ``ts`` column to TimestampType (LTZ)
    no matter how the parquet writer encoded it. The driver testdata has
    already shipped two encodings across rounds — TIMESTAMP(NANOS)
    (surfaced as a raw ``bigint`` under nanosAsLong) and
    TIMESTAMP(MICROS, isAdjustedToUTC=0) (surfaced as
    ``timestamp_ntz``) — so every reader must branch on the dtype it
    actually got rather than assume one storage world:

    - ``bigint``        → integer ns→µs division + ``timestamp_micros``
      (``div``, not ``/``: double division loses precision at 1.7e18).
    - ``timestamp_ntz`` → reinterpret the naive wall clock as a UTC
      instant (the same reading DuckDB, the oracle, gives naive
      timestamps) via ``make_timestamp(..., 'UTC')`` over tz-free NTZ
      component extraction. Expression-scoped and independent of
      ``spark.sql.session.timeZone`` — a plain cast would shift the
      instant in a non-UTC session, and pinning the session timezone
      here (the previous fix) mutated caller-visible state, silently
      changing parsing/display semantics of unrelated queries.
    - ``timestamp``     → already the normalized form, pass through.

    Works on batch and streaming DataFrames alike (pure column
    expression, no action).
    """
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif kind == "timestamp_ntz":
            df = df.withColumn(
                "ts",
                F.expr(
                    "make_timestamp(year(ts), month(ts), day(ts), "
                    "hour(ts), minute(ts), extract(second from ts), 'UTC')"
                ),
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: scan one driver testdata table (TESTDATA.md).

    events.ts arrives in whatever encoding the current testdata
    generation used (see ``normalize_ts``); nanosAsLong is set so the
    legacy TIMESTAMP(NANOS) encoding is at least readable as a long.

    The confs are set HERE, not only in the session factory: callers
    may hand us any vanilla SparkSession (a test harness, a notebook)
    and a scan must not depend on who built the session. Both are
    runtime-settable and affect only how parquet READS type their
    columns (unlike session.timeZone, which rewrites the semantics of
    unrelated expressions — see normalize_ts).

    inferTimestampNTZ=false makes the reader surface TIMESTAMP(MICROS,
    isAdjustedToUTC=0) as plain TimestampType: the stored micros pass
    through as UTC instants unchanged — the same wall-clock-as-UTC
    reading DuckDB gives, with zero per-row conversion cost and no
    session-timezone dependence. normalize_ts stays as the fallback
    for DataFrames that arrive already typed NTZ.

    SCOPING: both confs are saved and restored around the read, so the
    caller's own unrelated ``spark.read.parquet`` calls keep their
    session's typing (``spark.read.parquet`` resolves the schema
    eagerly, so the confs have done their type-shaping work before the
    restore). One documented residual: when the scan surfaces a legacy
    TIMESTAMP(NANOS) column (a ``bigint`` ts), ``nanosAsLong`` must
    stay set for the session — the per-file parquet schema conversion
    re-reads that conf at EXECUTION time, and restoring it would make
    the deferred scan fail with "Illegal Parquet type" on the
    nanos-encoded file.
    """
    confs = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    df = None
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    finally:
        has_nanos_ts = df is None or any(
            f.name == "ts" and f.dataType.simpleString() == "bigint"
            for f in df.schema.fields
        )
        for k, v in prev.items():
            if k == "spark.sql.legacy.parquet.nanosAsLong" and has_nanos_ts:
                continue  # execution-time dependency, see docstring
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return normalize_ts(spark, df)


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
