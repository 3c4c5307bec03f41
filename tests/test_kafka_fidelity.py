"""Kafka/JDBC fidelity vs the reference job (M4F/src/job/start_job.py).

No broker or Postgres in the sandbox, so these pin (a) the exact reader
option set the Kafka source builder constructs, (b) the reference's
event-time format end-to-end through the identical decode path the
Kafka source uses, (c) the processed_events projection column-for-column,
and (d) the JDBC foreachBatch handler's bindings.
"""

import datetime
import json

from pyspark.sql import functions as F

from data_engineering_bootcamp_spark.streaming.pipelines import (
    processed_events,
    with_event_time,
)
from data_engineering_bootcamp_spark.streaming.sinks import jdbc_batch_writer
from data_engineering_bootcamp_spark.streaming.sources import (
    EVENT_TIME_FORMAT,
    WEB_EVENTS_SCHEMA,
    kafka_reader_options,
)


def test_kafka_reader_options_pin():
    opts = kafka_reader_options(
        "broker1:9092,broker2:9092",
        "bootcamp.events",
        group_id="web-traffic-group",
        extra={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "bootcamp.events",
        "startingOffsets": "latest",  # 'scan.startup.mode' = 'latest-offset'
        "kafka.group.id": "web-traffic-group",
        "kafka.security.protocol": "SASL_SSL",
    }


def test_web_events_schema_matches_reference_columns():
    # start_job.py:88-99 — all VARCHAR; event_timestamp is computed
    assert [f.name for f in WEB_EVENTS_SCHEMA.fields] == [
        "url", "referrer", "user_agent", "host", "ip", "headers",
        "event_time",
    ]
    assert all(f.dataType.simpleString() == "string"
               for f in WEB_EVENTS_SCHEMA.fields)


def test_event_time_format_end_to_end(spark):
    # TO_TIMESTAMP(event_time, 'yyyy-MM-dd''T''HH:mm:ss.SSS''Z''')
    # through the same from_json decode the Kafka source applies
    payload = json.dumps(
        {
            "url": "/cart",
            "referrer": "https://ex.com",
            "user_agent": "UA",
            "host": "shop.ex.com",
            "ip": "10.1.2.3",
            "headers": "{}",
            "event_time": "2024-02-29T23:59:58.123Z",
        }
    )
    decoded = (
        spark.createDataFrame([(payload,)], "value string")
        .select(F.from_json("value", WEB_EVENTS_SCHEMA).alias("j"))
        .select("j.*")
    )
    row = with_event_time(decoded, ts_col="event_timestamp").first()
    assert row.event_timestamp == datetime.datetime(2024, 2, 29, 23, 59, 58, 123000)
    # unparseable strings null out instead of failing the stream
    bad = spark.createDataFrame(
        [("not-a-timestamp",)], "event_time string"
    )
    assert with_event_time(bad, ts_col="ts").first().ts is None
    assert EVENT_TIME_FORMAT == "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def test_processed_events_projection(spark):
    events = spark.createDataFrame(
        [
            ("/a", "r1", "UA", "h1", "1.1.1.1", "{}",
             "2024-01-01T00:00:01.000Z"),
            ("/b", "r2", "UA", "h2", "9.9.9.9", "{}",
             "2024-01-01T00:00:02.500Z"),
        ],
        WEB_EVENTS_SCHEMA,
    )
    geo = spark.createDataFrame(
        [("1.1.1.1", "US", "CA", "SF")],
        "ip string, country string, state string, city string",
    )
    out = processed_events(events, geo)
    # exact sink schema: start_job.py:40-47 / 139-148
    assert out.columns == [
        "ip", "event_timestamp", "referrer", "host", "url", "geodata",
    ]
    rows = {r.ip: r for r in out.collect()}
    assert json.loads(rows["1.1.1.1"].geodata) == {
        "country": "US", "state": "CA", "city": "SF",
    }
    # unmatched ip → empty-string fields, the reference's failed-lookup
    # shape
    assert json.loads(rows["9.9.9.9"].geodata) == {
        "country": "", "state": "", "city": "",
    }
    assert rows["9.9.9.9"].event_timestamp == datetime.datetime(
        2024, 1, 1, 0, 0, 2, 500000
    )


def test_jdbc_batch_writer_bindings():
    fn = jdbc_batch_writer(
        "jdbc:postgresql://db:5432/postgres", "processed_events"
    )
    assert callable(fn)
    assert fn.url == "jdbc:postgresql://db:5432/postgres"
    assert fn.table == "processed_events"
    assert fn.mode == "append"


def test_upsert_merge_sql_semantics_in_duckdb():
    # the generated ON-CONFLICT statement is executable SQL: prove the
    # keep-the-max merge rule (and batch-order independence) by
    # actually running it in DuckDB instead of only pinning the string
    import duckdb

    from data_engineering_bootcamp_spark.streaming.sinks import (
        upsert_merge_sql,
    )

    sql = upsert_merge_sql("store", ["k"], ["ts", "eid"], ["val"])
    assert "ON CONFLICT (k) DO UPDATE" in sql
    assert "WHERE (excluded.ts, excluded.eid) > (store.ts, store.eid)" in sql

    rows = [
        (1, 10, 1, "a"), (1, 30, 2, "c"), (1, 20, 3, "b"),
        (2, 5, 4, "x"), (2, 5, 5, "y"),  # ts tie -> eid breaks it
    ]
    for order in (rows, list(reversed(rows))):
        con = duckdb.connect()
        con.sql(
            "CREATE TABLE store (k INT PRIMARY KEY, ts INT, eid INT,"
            " val VARCHAR)"
        )
        for r in order:
            con.execute(sql, list(r))
        got = {tuple(r) for r in con.sql("SELECT * FROM store").fetchall()}
        assert got == {(1, 30, 2, "c"), (2, 5, 5, "y")}, order
        con.close()
