"""Streaming transformations (SURVEY §2.9 T1-T6).

Every function takes and returns a DataFrame and works identically on a
streaming or a batch frame — the batch catalog queries `tumbling_hits`
and `sessionization` are the batch analogs the DuckDB oracle checks;
the streaming tests replay the same events through these pipelines and
assert equality against the batch run.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sources import EVENT_TIME_FORMAT


def with_event_time(
    df: DataFrame,
    source_col: str = "event_time",
    fmt: str = EVENT_TIME_FORMAT,
    ts_col: str = "ts",
) -> DataFrame:
    """T1: computed event-time column, the Spark form of the Flink DDL
    `event_timestamp AS TO_TIMESTAMP(event_time, fmt)`
    (M4F/src/job/start_job.py:87,97).

    TZ note (the one seam in the engine's session-TZ-free contract
    that follows Spark's parse semantics instead): a pattern-parsed
    string WITHOUT an explicit zone offset is interpreted as wall
    clock in spark.sql.session.timeZone — there is no TZ-free parse
    of a naive string, because a wall-clock string simply does not
    name an instant until a zone is chosen. The engine's own JSON
    sources are TZ-consistent round trips (strings and their
    consumers live in one session), verified end to end by the
    --tz gate mode; an EXTERNAL feed carrying UTC strings should
    append an explicit offset to `fmt` (e.g. "... Z" with "+0000"
    concatenated to the value) so parsing pins to UTC regardless of
    session configuration. Everything DOWNSTREAM of the parsed
    instant (windows, day buckets, renderings) is TZ-free — see
    functions/datelist.py.
    """
    return df.withColumn(ts_col, F.to_timestamp(F.col(source_col), fmt))


def enrich_events(
    events: DataFrame,
    lookup: Mapping[str, tuple[str, str]] | DataFrame,
    key_col: str = "ip",
) -> DataFrame:
    """T6: stateless per-event enrichment.

    The reference enriches with an HTTP geolocation call inside a Flink
    ScalarFunction (M4F/src/job/start_job.py:58-79). Spark-first this is
    NOT a UDF: the lookup is a bounded dimension, so it becomes a
    broadcast left join — JVM-side, no per-row Python, and the stream
    stays append-mode. `lookup` is either a {key: (country, city)} dict
    (the reference's test double) or a prebuilt DataFrame with columns
    (key_col, country, city).
    """
    if isinstance(lookup, Mapping):
        spark = events.sparkSession
        rows = [(k, v[0], v[1]) for k, v in lookup.items()]
        lookup_df = spark.createDataFrame(
            rows, f"{key_col} string, country string, city string"
        )
    else:
        lookup_df = lookup
    return events.join(F.broadcast(lookup_df), on=key_col, how="left")


def processed_events(
    events: DataFrame,
    geo_lookup: DataFrame | None = None,
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """The reference's processed_events projection, column for column
    (M4F/src/job/start_job.py:139-148): SELECT ip, event_timestamp,
    referrer, host, url, get_location(ip) AS geodata.

    `geo_lookup` is a bounded (ip, country, state, city) dimension —
    the Spark form of the reference's per-row HTTP ScalarFunction is a
    broadcast left join (JVM-side, no per-row Python, append-mode
    safe); geodata is rendered as the same JSON object string the
    reference produces ({'country','state','city'}). Without a lookup,
    geodata is the empty-object fallback the reference returns on a
    failed lookup."""
    out = with_event_time(events, ts_col=ts_col)
    if geo_lookup is not None:
        out = out.join(F.broadcast(geo_lookup), on="ip", how="left")
        geodata = F.to_json(
            F.struct(
                F.coalesce(F.col("country"), F.lit("")).alias("country"),
                F.coalesce(F.col("state"), F.lit("")).alias("state"),
                F.coalesce(F.col("city"), F.lit("")).alias("city"),
            )
        )
    else:
        geodata = F.lit("{}")
    return out.select(
        "ip",
        ts_col,
        "referrer",
        "host",
        "url",
        geodata.alias("geodata"),
    )


def tumbling_counts(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    window_duration: str = "5 minutes",
    watermark: str = "15 seconds",
) -> DataFrame:
    """T2+T3/T4: watermarked tumbling-window count keyed by `keys`.

    Flink original: Tumble.over(5 min).on(ts) grouped by (w, host) /
    (w, host, referrer) with a 15-second watermark
    (M4F/src/job/aggregation_job.py:62,96-124). Output carries the window
    start as `window_start`, matching the sink schema (`event_hour`
    renamed generically).
    """
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("num_hits"))
        .select(F.col("w.start").alias("window_start"), *keys, "num_hits")
    )


def sliding_counts(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    slide_duration: str = "5 minutes",
    watermark: str = "15 seconds",
) -> DataFrame:
    """T3/T4, sliding form: watermarked HOPPING-window count keyed by
    `keys` — each event lands in window_duration/slide_duration
    overlapping windows (2 here), the moving-average shape the
    reference's Flink lessons pair with tumbling windows. Same state
    story as tumbling (one window-keyed aggregate; state per open
    window per key, evicted as the watermark passes), with state
    multiplied by the overlap factor — which is exactly why the
    overlap factor is a knob, not a constant.
    """
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(
                F.col(ts_col), window_duration, slide_duration
            ).alias("w"),
            *keys,
        )
        .agg(F.count(F.lit(1)).alias("num_hits"))
        .select(F.col("w.start").alias("window_start"), *keys, "num_hits")
    )


def sessionize_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "15 seconds",
) -> DataFrame:
    """T5: session windows with a 5-minute inactivity gap keyed by
    (ip, host) — the M4F homework spec (M4F/homework/homework.md:1-7).

    One stateful operator only: the per-session rows stream out in
    append mode; the avg-events-per-session comparison is a batch query
    over the sink (SURVEY §7 hard-part 6 — two stateful aggs can't chain
    in one streaming query).
    """
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), *keys)
        .agg(F.count(F.lit(1)).alias("num_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            *keys,
            "num_events",
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the ingest-side twin of the batch
    `dedup_exact` (A14): emit only the first occurrence of each key.

    `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: the plain
    form keeps every key in the state store forever (unbounded state on
    an unbounded stream); the watermarked form evicts keys once the
    event-time watermark passes them by `watermark`, so state is
    bounded by the duplicate-arrival horizon — the contract a 100 TB
    ingest pipeline actually has (dupes arrive near each other: replays,
    at-least-once sources, retried batches). Append-mode safe; chains
    in front of any downstream windowed aggregate.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def avg_events_per_session(sessions: DataFrame, keys: list[str]) -> DataFrame:
    """Batch follow-up over the sessionization sink: average events per
    session per key (the homework's host comparison)."""
    return sessions.groupBy(*keys).agg(
        F.round(F.avg("num_events"), 6).alias("avg_events_per_session"),
        F.count(F.lit(1)).alias("n_sessions"),
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER interval join: each left event matches right
    events with the same key whose timestamp falls in
    [left_ts, left_ts + within] — the click→purchase attribution shape.

    Both sides carry a watermark AND the join condition bounds event
    time in both directions; that pair is what lets the state store
    evict rows once the watermark passes (unbounded state otherwise —
    the #1 stream-stream-join production failure). Inner-join matches
    are emitted as soon as both sides arrive, so a single availableNow
    pass over a finite source emits the complete join — which is what
    makes the entry exactly oracle-checkable as a batch SQL join.

    Column hygiene: sides must not share column names other than the
    key; callers pre-select and alias.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    return lw.join(
        rw,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{right_ts} >= l.{left_ts} AND "
            f"r.{right_ts} <= l.{left_ts} + INTERVAL {within}"
        ),
        "inner",
    )
