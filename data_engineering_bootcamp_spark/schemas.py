"""Explicit StructType registry.

The reference declares fixed DDL for every Postgres table (M1/sql/*.sql,
M2/tables/*.sql) and infers CSV schemas on the Spark side
(M3/notebooks/assignment_3_spark.py:18-23). Our engine gives every table
an explicit schema; inference remains a convenience path in sources.

Two groups:
  TESTDATA — the driver's TPC-H-ish tables (TESTDATA.md / FIXTURES.md §E).
  REFERENCE — reference-domain tables used by unit-test fixtures
  (players, teams, game_details …), mirroring FIXTURES.md §A/§B.

Dtype contract for date-shaped columns (VERDICT r8 #7): the driver's
parquet stores `o_orderdate` / `l_shipdate` as TIMESTAMP(MICROS), and
the registry mirrors that (TimestampType below) — but the ENGINE
contract is that any query consuming them must also accept a true
DateType encoding (a user's own parquet may store date32). Day-ordinal
derivations therefore go through `functions.datelist.epoch_day`, which
dtype-branches: `datediff` for DATE (date→long casts are NULL in
Spark), `floor(epoch_seconds/86400)` for TIMESTAMP. Covered both ways
in tests/test_readers_vanilla.py::test_orderdate_both_encodings.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --------------------------------------------------------------------------
# Reference-domain schemas used in unit tests (FIXTURES.md §A/§B)
# --------------------------------------------------------------------------

SEASON_STATS = T.StructType(
    # composite type season_stats — M1/lecture-lab/players.sql:1-7
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("pts", T.DoubleType()),
        T.StructField("ast", T.DoubleType()),
        T.StructField("reb", T.DoubleType()),
        T.StructField("weight", T.IntegerType()),
    ]
)

PLAYER_SEASONS = T.StructType(
    # M1/sql/player_seasons.sql:1-22 (trimmed to load-bearing columns)
    [
        T.StructField("player_name", T.StringType(), False),
        T.StructField("height", T.StringType()),
        T.StructField("college", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("draft_year", T.StringType()),
        T.StructField("draft_round", T.StringType()),
        T.StructField("draft_number", T.StringType()),
        T.StructField("weight", T.IntegerType()),
        T.StructField("gp", T.DoubleType()),
        T.StructField("pts", T.DoubleType()),
        T.StructField("reb", T.DoubleType()),
        T.StructField("ast", T.DoubleType()),
        T.StructField("season", T.IntegerType(), False),
    ]
)

PLAYERS = T.StructType(
    # cumulative dimension — M1/lecture-lab/players.sql:12-26
    [
        T.StructField("player_name", T.StringType()),
        T.StructField("height", T.StringType()),
        T.StructField("college", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("draft_year", T.StringType()),
        T.StructField("draft_round", T.StringType()),
        T.StructField("draft_number", T.StringType()),
        T.StructField("seasons", T.ArrayType(SEASON_STATS)),
        T.StructField("scoring_class", T.StringType()),
        T.StructField("years_since_last_active", T.IntegerType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("current_season", T.IntegerType()),
    ]
)

PLAYERS_SCD = T.StructType(
    # M1/lecture-lab/players_scd_table.sql:1-9
    [
        T.StructField("player_name", T.StringType()),
        T.StructField("scoring_class", T.StringType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("start_season", T.IntegerType()),
        T.StructField("end_season", T.IntegerType()),
        T.StructField("current_season", T.IntegerType()),
    ]
)

TEAMS = T.StructType(
    # M1/lecture-lab/team_vertices.sql:1-16 fixture shape
    [
        T.StructField("team_id", T.LongType()),
        T.StructField("abbreviation", T.StringType()),
        T.StructField("nickname", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("arena", T.StringType()),
        T.StructField("yearfounded", T.IntegerType()),
    ]
)

VERTICES = T.StructType(
    # M1/lecture-lab/graph_ddls.sql:7-12; map form M3/src/jobs/team_vertex_job.py:9-18
    [
        T.StructField("identifier", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)

EDGES = T.StructType(
    # M1/lecture-lab/graph_ddls.sql:21-33
    [
        T.StructField("subject_identifier", T.StringType()),
        T.StructField("subject_type", T.StringType()),
        T.StructField("object_identifier", T.StringType()),
        T.StructField("object_type", T.StringType()),
        T.StructField("edge_type", T.StringType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)

MONTHLY_USER_SITE_HITS = T.StructType(
    # M2/tables/monthly_user_site_hits.sql:1-9
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("hit_array", T.ArrayType(T.LongType())),
        T.StructField("month_start", T.DateType()),
        T.StructField("first_found_date", T.DateType()),
        T.StructField("date_partition", T.DateType()),
    ]
)

USERS_CUMULATED = T.StructType(
    # M2/tables/users_cumulated.sql:1-6
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("dates_active", T.ArrayType(T.DateType())),
        T.StructField("date", T.DateType()),
    ]
)

WEB_EVENTS = T.StructType(
    # M2/tables/events.sql:1-7 — clickstream events
    [
        T.StructField("url", T.StringType()),
        T.StructField("referrer", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("device_id", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)

STREAM_EVENTS = T.StructType(
    # Kafka JSON web events — M4F/src/job/start_job.py:88-110
    [
        T.StructField("url", T.StringType()),
        T.StructField("referrer", T.StringType()),
        T.StructField("user_agent", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("headers", T.StringType()),
        T.StructField("event_time", T.StringType()),
    ]
)

REFERENCE: dict[str, T.StructType] = {
    "player_seasons": PLAYER_SEASONS,
    "players": PLAYERS,
    "players_scd": PLAYERS_SCD,
    "teams": TEAMS,
    "vertices": VERTICES,
    "edges": EDGES,
    "monthly_user_site_hits": MONTHLY_USER_SITE_HITS,
    "users_cumulated": USERS_CUMULATED,
    "web_events": WEB_EVENTS,
    "stream_events": STREAM_EVENTS,
}
