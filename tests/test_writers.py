"""Sink tests (SURVEY §2.1 S4-S7, §2.6 O4-O5): bucketed saveAsTable
with shuffle-free bucket join, directory partitioning with pruning,
repartition + sortWithinPartitions layout."""

import glob
import os
import re
import uuid

import pytest
from pyspark.sql import functions as F

from data_engineering_bootcamp_spark.sources.writers import (
    write_bucketed,
    write_partitioned,
    write_repartitioned_sorted,
)


@pytest.fixture()
def orders(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/orders.parquet")


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucket_join_elides_shuffle(spark, orders, tmp_path):
    # J14: two 8-bucket tables joined on the bucket key → no Exchange on
    # either side (the reference's bucket-joins-in-iceberg.ipynb lesson).
    # uuid-tagged names + external paths under tmp_path (VERDICT r11 #2,
    # same pattern as the heavy-selfjoin test below): fixed names in the
    # shared spark-warehouse survive an aborted run and every subsequent
    # run then dies with LOCATION_ALREADY_EXISTS.
    tag = uuid.uuid4().hex[:8]
    t_l, t_r = f"t_bucket_l_{tag}", f"t_bucket_r_{tag}"
    left = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    right = orders.select("o_orderkey", "o_orderpriority")
    try:
        write_bucketed(
            left, t_l, "o_orderkey", num_buckets=8, path=str(tmp_path / t_l)
        )
        write_bucketed(
            right, t_r, "o_orderkey", num_buckets=8, path=str(tmp_path / t_r)
        )
        joined = spark.table(t_l).join(spark.table(t_r), "o_orderkey")
        plan = _formatted_plan(joined)
        shuffles = re.findall(r"Arguments: hashpartitioning", plan)
        assert not shuffles, f"bucket join should elide exchanges:\n{plan}"
        assert joined.count() == orders.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_l}")
        spark.sql(f"DROP TABLE IF EXISTS {t_r}")


def test_bucketed_layout_feeds_heavy_selfjoin_paths(spark, sf_small, tmp_path):
    """VERDICT r9 #7 — the reference's M3 bucket-join lesson
    (bucket-joins-in-iceberg.ipynb) end-to-end on the engine's own
    heavy queries: a lineitem table bucketed on l_orderkey removes the
    pair-builder's grouping Exchange (2 → 1: only the final pair-count
    shuffle remains), and an events table bucketed on user_id removes
    the funnel's dedup + both self-join Exchanges (5 → 2: only the
    two aggregation-key shuffles remain). Results must be identical to
    the raw-table runs — layout is semantically transparent.

    Subset co-partitioning is what makes the funnel case work:
    HashPartitioning(user_id) satisfies clustering on
    (user_id, event_date) because equal composite keys share the
    user_id hash (requireAllClusterKeysForCoPartition=false, the
    default)."""
    from data_engineering_bootcamp_spark.operators.funnel import (
        funnel_conversion,
    )
    from data_engineering_bootcamp_spark.operators.graph import (
        build_edges_pairs_grouped,
    )
    from data_engineering_bootcamp_spark.plans.introspect import (
        count_exchanges as n_exchanges,
    )

    from data_engineering_bootcamp_spark.sources.readers import load_table

    # load_table, not raw spark.read.parquet: the events ts column must
    # surface as plain TIMESTAMP (inferTimestampNTZ=false) for the
    # funnel's epoch arithmetic
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ev = load_table(spark, sf_small, "events").where(
        F.col("user_id").isNotNull()
    )
    # uuid-tagged names + external paths under tmp_path (ADVICE r10):
    # fixed names in the shared warehouse collide with a parallel run
    # and inherit stale data from an aborted one — the scale_bench twin
    # already uses this cleanup-safe pattern
    tag = uuid.uuid4().hex[:8]
    t_li, t_ev = f"t_li_bkt_{tag}", f"t_ev_bkt_{tag}"
    try:
        write_bucketed(
            li, t_li, "l_orderkey", num_buckets=8,
            path=str(tmp_path / t_li),
        )
        write_bucketed(
            ev, t_ev, "user_id", num_buckets=8,
            path=str(tmp_path / t_ev),
        )

        raw_pairs = build_edges_pairs_grouped(li, "l_orderkey", "l_partkey")
        bkt_pairs = build_edges_pairs_grouped(
            spark.table(t_li), "l_orderkey", "l_partkey"
        )
        assert n_exchanges(raw_pairs) == 2
        assert n_exchanges(bkt_pairs) == 1
        assert sorted(map(tuple, bkt_pairs.collect())) == sorted(
            map(tuple, raw_pairs.collect())
        )

        raw_funnel = funnel_conversion(ev, "view", "purchase")
        bkt_funnel = funnel_conversion(
            spark.table(t_ev), "view", "purchase"
        )
        assert n_exchanges(raw_funnel) == 5
        assert n_exchanges(bkt_funnel) == 2
        assert sorted(map(tuple, bkt_funnel.collect())) == sorted(
            map(tuple, raw_funnel.collect())
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        spark.sql(f"DROP TABLE IF EXISTS {t_ev}")


def test_partitioned_write_prunes(spark, orders, tmp_path):
    path = str(tmp_path / "part")
    df = orders.withColumn("status", F.col("o_orderstatus"))
    write_partitioned(df.select("o_orderkey", "status"), path, "status")
    dirs = {os.path.basename(p) for p in glob.glob(f"{path}/status=*")}
    assert dirs == {"status=F", "status=O", "status=P"}
    back = spark.read.parquet(path).where(F.col("status") == "F")
    plan = _formatted_plan(back)
    # partition filter must reach the scan, leaving no row-level filter
    assert "PartitionFilters: [isnotnull(status" in plan
    n_f = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f


def test_repartitioned_sorted_layout(spark, orders, tmp_path):
    p_sorted = str(tmp_path / "sorted")
    p_plain = str(tmp_path / "plain")
    cols = orders.select("o_orderkey", "o_custkey", "o_orderpriority")
    write_repartitioned_sorted(
        cols, p_sorted, num_partitions=4, key="o_orderpriority",
        sort_cols=["o_orderpriority", "o_custkey"],
    )
    write_repartitioned_sorted(cols, p_plain, num_partitions=4, key="o_orderpriority")
    files_sorted = glob.glob(f"{p_sorted}/part-*.parquet")
    # repartition(4, key): ≤4 files; hash collisions of the 5 distinct
    # keys can leave some of the 4 partitions empty
    assert 1 <= len(files_sorted) <= 4
    # same rows back
    assert spark.read.parquet(p_sorted).count() == cols.count()
    # the sorted layout should not be larger (run-length/dict encoding
    # wins on sorted data) — the reference's compression experiment
    size = lambda p: sum(
        os.path.getsize(f) for f in glob.glob(f"{p}/part-*.parquet")
    )
    assert size(p_sorted) <= size(p_plain) * 1.05


def test_csv_roundtrip_with_inference(spark, orders, tmp_path):
    # S2: header CSV + schema inference (the reference's CSV read shape,
    # M3/notebooks/assignment_3_spark.py:18-23)
    from data_engineering_bootcamp_spark.sources.readers import read_csv

    path = str(tmp_path / "orders_csv")
    cols = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    cols.write.option("header", "true").mode("overwrite").csv(path)
    back = read_csv(spark, path)
    assert back.count() == cols.count()
    assert dict(back.dtypes)["o_orderkey"] == "int"  # inferred numeric
    assert dict(back.dtypes)["o_totalprice"] == "double"
    got = back.agg({"o_totalprice": "sum"}).collect()[0][0]
    want = cols.agg({"o_totalprice": "sum"}).collect()[0][0]
    assert abs(got - want) < 1e-6 * max(abs(want), 1)


def test_snapshot_guard_bounds_driver_collect(spark):
    # gate snapshots must refuse to pull big results onto the driver
    import pytest

    from data_engineering_bootcamp_spark.plans.catalog_write import _snapshot

    small = spark.range(10).toDF("n")
    assert _snapshot(small, max_rows=10).count() == 10
    with pytest.raises(ValueError, match="exceeds"):
        _snapshot(spark.range(100).toDF("n"), max_rows=99)


def test_training_export_shard_layout(spark, sf_small, tmp_path):
    """VERDICT r15 #1: the training-shard export's physical layout is
    the one the oracle predicts — exactly ONE parquet file per shard
    directory (each shard lives in exactly one task: the pack window
    hash-partitions on shard, the (shard, pack_id) groupBy reuses that
    layout, and the dynamic-partition write adds no repartition) — and
    the pack-and-write tail costs exactly ONE shuffle on the shard key
    on top of the mix's source-key window."""
    from data_engineering_bootcamp_spark.operators.chunking import (
        pack_token_stream,
    )
    from data_engineering_bootcamp_spark.operators.sampling import (
        weighted_mix,
    )
    from data_engineering_bootcamp_spark.plans.introspect import (
        count_exchanges,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    rate = F.lit(20) + F.lit(5) * (
        F.coalesce(
            F.regexp_extract("source", r"(\d+)", 1).cast("int"), F.lit(0)
        )
        % 7
    )
    kept = weighted_mix(docs, ["source"], "doc_id", rate)
    packs = pack_token_stream(kept, capacity=256, n_shards=8)
    # plan posture: mix window (source) + pack window (shard) = 2
    # Exchanges; the (shard, pack_id) groupBy must NOT add a third
    # (hash(shard) satisfies clustering on the superset)
    assert count_exchanges(packs) == 2, _formatted_plan(packs)

    out = str(tmp_path / "shards")
    packs.write.mode("overwrite").partitionBy("shard").parquet(out)
    shard_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    assert shard_dirs == [f"shard={s}" for s in range(8)]
    for d in shard_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: {files}"
    # losslessness: packed token totals survive the write
    back = spark.read.parquet(out).agg(F.sum("n_tokens")).collect()[0][0]
    want = packs.agg(F.sum("n_tokens")).collect()[0][0]
    assert back == want
