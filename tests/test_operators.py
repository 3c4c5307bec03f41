"""Operator unit tests with fake inputs and expected outputs — the
reference's own test strategy (SURVEY §5; M3/src/tests/*), extended to
the engine's kernels. Each test mirrors a reference test where one
exists:

- SCD streaks          ← test_player_scd.py:4-24 (4 rows → 3 ranges)
- vertex dedup + props ← test_team_vertex_job.py:10-32
- cumulate_datelist    ← user_cumulated_populate.sql semantics
- scd_incremental      ← incremental_scd_query.sql branch semantics
  (all five branches: unchanged/changed/new/retired/historical)
"""

from collections import namedtuple

import pytest
from pyspark.sql import functions as F

from data_engineering_bootcamp_spark.functions.datelist import (
    datelist_active_days,
    datelist_int,
)
from data_engineering_bootcamp_spark.operators.cumulate import cumulate_datelist
from data_engineering_bootcamp_spark.operators.graph import build_vertices
from data_engineering_bootcamp_spark.operators.scd import (
    scd_from_snapshots,
    scd_incremental,
)

Snapshot = namedtuple("Snapshot", "player_name season scoring_class")
TeamRow = namedtuple("TeamRow", "team_id abbreviation nickname")
History = namedtuple("History", "user_id tier start_d end_d")
Latest = namedtuple("Latest", "user_id tier")


def test_scd_streaks_collapse(spark):
    # mirrors test_player_scd: Good,Good,Bad,Bad → 3 ranges (the two
    # Good seasons merge; the gap-less Bad run merges)
    rows = [
        Snapshot("a", 2018, "Good"),
        Snapshot("a", 2019, "Good"),
        Snapshot("a", 2020, "Bad"),
        Snapshot("a", 2021, "Bad"),
        Snapshot("b", 2020, "Good"),
    ]
    df = spark.createDataFrame(rows)
    out = scd_from_snapshots(df, "player_name", "season", ["scoring_class"])
    got = {
        (r.player_name, r.scoring_class, r.start_season, r.end_season)
        for r in out.collect()
    }
    assert got == {
        ("a", "Good", 2018, 2019),
        ("a", "Bad", 2020, 2021),
        ("b", "Good", 2020, 2020),
    }


def test_scd_null_tracked_value_is_not_a_change(spark):
    # eqNullSafe: NULL → NULL must not open a new range
    rows = [
        Snapshot("a", 2018, None),
        Snapshot("a", 2019, None),
        Snapshot("a", 2020, "Good"),
    ]
    df = spark.createDataFrame(rows, "player_name string, season int, scoring_class string")
    out = scd_from_snapshots(df, "player_name", "season", ["scoring_class"])
    got = {
        (r.scoring_class, r.start_season, r.end_season) for r in out.collect()
    }
    assert got == {(None, 2018, 2019), ("Good", 2020, 2020)}


def test_scd_incremental_all_branches(spark):
    history = spark.createDataFrame(
        [
            History(1, "Gold", 1, 5),     # historical (sealed long ago)
            History(2, "Gold", 3, 9),     # current, unchanged in p10
            History(3, "Bronze", 4, 9),   # current, changes to Silver
            History(4, "Gold", 2, 9),     # current, retires (no snapshot)
        ]
    )
    latest = spark.createDataFrame(
        [
            Latest(2, "Gold"),    # unchanged
            Latest(3, "Silver"),  # changed
            Latest(5, "Iron"),    # brand new
        ]
    )
    out = scd_incremental(history, latest, "user_id", "d", ["tier"], 10)
    got = {(r.user_id, r.tier, r.start_d, r.end_d) for r in out.collect()}
    assert got == {
        (1, "Gold", 1, 5),      # historical passthrough
        (2, "Gold", 3, 10),     # unchanged: range extended
        (3, "Bronze", 4, 9),    # changed: old range sealed
        (3, "Silver", 10, 10),  # changed: new range opened
        (4, "Gold", 2, 9),      # retired: keeps sealed range
        (5, "Iron", 10, 10),    # new entity
    }


def test_scd_incremental_double_advance_raises(spark):
    # ADVICE r11: a history row with end_d >= new_period (an advance
    # accidentally re-run) must fail loudly, not pass through as a
    # sealed row overlapping the ranges this advance emits.
    history = spark.createDataFrame(
        [
            History(1, "Gold", 1, 10),   # already advanced INTO p10
            History(2, "Gold", 3, 9),    # legitimately current
        ]
    )
    latest = spark.createDataFrame([Latest(1, "Gold"), Latest(2, "Gold")])
    out = scd_incremental(history, latest, "user_id", "d", ["tier"], 10)
    with pytest.raises(Exception, match="double-advance"):
        out.collect()


def test_vertex_dedup_and_properties(spark):
    # mirrors test_team_vertex_job: duplicate team rows → one vertex with
    # map properties
    rows = [
        TeamRow(1, "GSW", "Warriors"),
        TeamRow(1, "GSW", "Warriors"),
        TeamRow(2, "BOS", "Celtics"),
    ]
    df = spark.createDataFrame(rows)
    out = build_vertices(
        df,
        "team_id",
        "team",
        {"abbreviation": F.col("abbreviation"), "nickname": F.col("nickname")},
        order_by=[F.asc("team_id")],
    )
    got = sorted(
        (r.identifier, r.type, dict(r.properties)) for r in out.collect()
    )
    assert got == [
        ("1", "team", {"abbreviation": "GSW", "nickname": "Warriors"}),
        ("2", "team", {"abbreviation": "BOS", "nickname": "Celtics"}),
    ]


def test_cumulate_datelist_three_ways(spark):
    # existing user active today (prepend), existing user absent today
    # (carry), brand-new user (fresh array)
    yesterday = spark.createDataFrame(
        [(1, ["2024-01-02", "2024-01-01"]), (2, ["2024-01-01"])],
        "user_id long, dates_active array<string>",
    ).select(
        "user_id", F.col("dates_active").cast("array<date>").alias("dates_active")
    )
    today = spark.createDataFrame(
        [(1, "2024-01-03"), (3, "2024-01-03")],
        "user_id long, date_active string",
    ).select("user_id", F.col("date_active").cast("date").alias("date_active"))
    out = cumulate_datelist(yesterday, today, "2024-01-03")
    got = {
        r.user_id: [d.isoformat() for d in r.dates_active]
        for r in out.collect()
    }
    assert got == {
        1: ["2024-01-03", "2024-01-02", "2024-01-01"],
        2: ["2024-01-01"],
        3: ["2024-01-03"],
    }
    assert all(r.date.isoformat() == "2024-01-03" for r in out.collect())


def test_datelist_int_bit_semantics(spark):
    # bit i set ⟺ active (ref_date - i); window is 32 days
    df = spark.createDataFrame(
        [(1, "2024-01-31"), (1, "2024-01-30"), (1, "2024-01-01"),
         (1, "2023-12-01"),  # outside window → ignored
         (2, "2024-01-24")],
        "user_id long, d string",
    ).select("user_id", F.col("d").cast("date").alias("d"))
    ref = F.lit("2024-01-31").cast("date")
    out = (
        df.groupBy("user_id")
        .agg(datelist_int(F.col("d"), ref).alias("mask"))
        .withColumn("n", datelist_active_days(F.col("mask")))
    )
    got = {r.user_id: (r.mask, r.n) for r in out.collect()}
    assert got[1] == ((1 << 0) | (1 << 1) | (1 << 30), 3)
    assert got[2] == (1 << 7, 1)


def test_simhash_udf_matches_expression_form(spark, sf_small):
    # the vectorized UDF must be bit-identical to the pure-Catalyst
    # reference implementation (simhash has no DuckDB oracle)
    from pyspark.sql import functions as F2

    from data_engineering_bootcamp_spark.operators.dedup import (
        _ngrams_of_toks,
        _simhash_udf,
        _tokens,
        simhash_counters,
        simhash_from_counters,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    base = docs.select(
        "doc_id", _tokens(F2.col("text")).alias("_toks")
    ).select("doc_id", _ngrams_of_toks(F2.col("_toks"), 2).alias("_grams"))
    expr_form = base.select(
        "doc_id", simhash_counters(F2.col("_grams")).alias("c")
    ).select("doc_id", simhash_from_counters(F2.col("c")).alias("sh"))
    udf_form = base.select("doc_id", _simhash_udf()(F2.col("_grams")).alias("sh"))
    a = {r.doc_id: r.sh for r in expr_form.collect()}
    b = {r.doc_id: r.sh for r in udf_form.collect()}
    assert a == b


def test_ann_variants_recall(spark, sf_dir):
    # approximate ANN paths must retrieve most of the exact top-5
    # (the driver gate checks exact oracle parity; recall vs brute
    # force — retrieval QUALITY — is pinned here)
    from data_engineering_bootcamp_spark.plans.catalog import QUERIES

    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_cosine_ivf"](spark, sf_dir).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_cosine_lsh"](spark, sf_dir).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.7
    assert len(exact & lsh) / len(exact) >= 0.6


def test_ivf_kmeans_buckets_balanced(spark, sf_dir):
    # k-means centroids (vs arbitrary seed vectors) must keep bucket
    # occupancy balanced enough that probing n_probe/n_centroids of the
    # buckets actually prunes the corpus: no bucket may absorb more
    # than 8x its fair share, and most centroids must be non-empty
    import numpy as np

    from data_engineering_bootcamp_spark.operators.similarity import (
        _ivf_assigner,
        ivf_centroids,
    )
    from data_engineering_bootcamp_spark.operators.partitioning import fan_out
    from data_engineering_bootcamp_spark.sources.readers import load_table
    from pyspark.sql import functions as F2

    emb = load_table(spark, sf_dir, "embeddings")
    C = ivf_centroids(emb, n_centroids=32, lloyd_iters=1)
    assigned = fan_out(
        emb.select(
            F2.col("vec_id").alias("vid"),
            F2.col("embedding").cast("array<double>").alias("v"),
        )
    ).mapInPandas(
        _ivf_assigner(spark, C), schema="vid bigint, bucket int, v array<double>"
    )
    counts = {r.bucket: r.n for r in assigned.groupBy("bucket").agg(
        F2.count(F2.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    mean_occ = total / 32
    assert max(counts.values()) <= 8 * mean_occ, counts
    assert len(counts) >= 16, f"only {len(counts)} non-empty buckets"


def test_salted_aggregate_matches_plain(spark, sf_small):
    from data_engineering_bootcamp_spark.operators.skew import salted_aggregate

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    plain = {
        (r.event_type, r.n, round(r.v, 6))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    salted = {
        (r.event_type, r.n, round(r.v, 6))
        for r in salted_aggregate(
            ev,
            ["event_type"],
            {"n": ("event_type", "count"), "v": ("value", "sum")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_small):
    from data_engineering_bootcamp_spark.operators.skew import salted_join

    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    cust = spark.read.parquet(f"{sf_small}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain} == {
        (r.c_mktsegment, r["count"]) for r in salted
    }


def test_winnow_shared_substring_guarantee(spark):
    # winnowing guarantee: any shared run of >= w + k - 1 = 32 normalized
    # chars yields at least one shared fingerprint; disjoint texts share
    # none (hash collisions aside, deterministic here)
    from data_engineering_bootcamp_spark.operators.fingerprint import (
        winnow_fingerprint_set,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "AAA " + shared + " xyzzy padding tail one two three"),
            (2, "prefix words here; " + shared + " entirely other ending"),
            (3, "completely different content with no overlap at all — "
                "zebras graze quietly beside the riverbank at dusk today"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprint_set(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnow_stats_match_set(spark):
    # the (n_fp, fp_xor, fp_min) summary must reduce the exploded set
    from functools import reduce

    from data_engineering_bootcamp_spark.operators.fingerprint import (
        winnow_fingerprint_set,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} " * 6 + "shared suffix content block")
         for i in range(8)],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    sets = {}
    for r in winnow_fingerprint_set(docs).collect():
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert set(stats) == set(sets)
    for d, s in sets.items():
        assert stats[d]["n_fp"] == len(s)
        assert stats[d]["fp_min"] == min(s)
        assert stats[d]["fp_xor"] == reduce(lambda a, b: a ^ b, s)


def test_connected_components_and_retention(spark):
    """Min-label propagation must resolve chains (multi-iteration
    diameter), cliques, and leave singletons as their own kept
    cluster."""
    from data_engineering_bootcamp_spark.operators.clustering import (
        connected_components,
        neardup_retention,
    )

    # chain 1-2-3-4-5 (diameter 4), clique {10,11,12}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "doc_id_a long, doc_id_b long",
    )
    comp = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                    10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 99]],
        "doc_id long",
    )
    ret = {r.doc_id: (r.cluster_id, r.keep)
           for r in neardup_retention(docs, pairs).collect()}
    assert ret[99] == (99, True)  # singleton: own cluster, kept
    assert ret[1] == (1, True) and ret[5] == (1, False)
    assert sum(1 for c, k in ret.values() if k) == 4  # one per cluster

    # non-convergence guard: a long chain with max_iter too small
    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(long_chain, max_iter=3)

    # the star algorithm handles the same long chain in O(log n)
    # rounds — no raise under the bound minlabel just failed
    star = {r.doc_id: r.cluster_id
            for r in connected_components(
                long_chain, max_iter=6, algorithm="star"
            ).collect()}
    assert star == {i: 0 for i in range(11)}

    # non-integral ids must raise, not silently drop every edge
    str_pairs = spark.createDataFrame(
        [("a", "b")], "doc_id_a string, doc_id_b string"
    )
    with pytest.raises(TypeError, match="non-integral"):
        connected_components(str_pairs)
    str_docs = spark.createDataFrame([("a",)], "doc_id string")
    with pytest.raises(TypeError, match="non-integral"):
        neardup_retention(str_docs, pairs)


def test_connected_components_star_equals_minlabel(spark):
    """Property: on seeded random graphs the star and minlabel
    algorithms produce identical (doc_id, cluster_id) maps, and both
    match a pure-python union-find ground truth."""
    import random

    from data_engineering_bootcamp_spark.operators.clustering import (
        connected_components,
    )

    rng = random.Random(20260814)
    for trial in range(4):
        n = rng.randint(8, 40)
        m = rng.randint(n // 2, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]  # includes self-loops and duplicates on purpose
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        seen = {v for e in edges for v in e}
        truth = {v: find(v) for v in sorted(seen)}
        # union-find roots are not necessarily component minima; fold
        root_min: dict[int, int] = {}
        for v, r in truth.items():
            root_min[r] = min(root_min.get(r, v), v)
        truth = {v: root_min[find(v)] for v in seen}

        pairs = spark.createDataFrame(
            edges, "doc_id_a long, doc_id_b long"
        )
        for algo in ("minlabel", "star"):
            got = {
                r.doc_id: r.cluster_id
                for r in connected_components(
                    pairs, algorithm=algo
                ).collect()
            }
            assert got == truth, f"trial={trial} algo={algo}"


def test_ivf_hash_threshold_sample_is_exact(spark, sf_small):
    """The hash-threshold pre-filter in ivf_centroids must yield the
    SAME training sample as the unfiltered smallest-md5 TakeOrdered:
    centroids from the full corpus (filter path active, n > sample)
    must equal centroids from a corpus pre-shrunk in python to the true
    smallest-md5 rows (filter path inactive, n == sample)."""
    import hashlib

    import numpy as np

    from data_engineering_bootcamp_spark.operators.similarity import (
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    assert len(ids) > 60  # filter path must actually engage
    order = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    keep = order[:60]
    c_filtered = ivf_centroids(emb, n_centroids=8, sample_size=60)
    c_exact = ivf_centroids(
        emb.where(F.col("vec_id").isin(keep)), n_centroids=8, sample_size=60
    )
    np.testing.assert_array_equal(c_filtered, c_exact)


def test_multimodal_kernel_is_injectable(spark):
    """extract_features/frame_sample must accept a caller-supplied
    decode kernel (the seam where a real PIL/pyav decoder plugs in)
    and fall back to the deterministic fake when none is given."""
    from data_engineering_bootcamp_spark.operators.multimodal import (
        deterministic_fake_decode,
        extract_features,
        frame_sample,
    )

    media = spark.createDataFrame(
        [
            (1, "image", b"abc", (10, 10, 0, "img/x")),
            (2, "video", b"defg", (10, 10, 2500, "vid/x")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,duration_ms:long,mime:string>",
    )

    # custom kernel: length-based, trivially distinguishable from md5
    def length_kernel(content):
        n = float(len(content or b""))
        return [n] * 8

    got = {
        r["media_id"]: r["features"]
        for r in extract_features(media, kernel=length_kernel).collect()
    }
    assert got[1] == [3.0] * 8 and got[2] == [4.0] * 8

    # default kernel must still equal deterministic_fake_decode
    default = {
        r["media_id"]: r["features"]
        for r in extract_features(media).collect()
    }
    assert default[1] == pytest.approx(deterministic_fake_decode(b"abc"))

    # frame_sample: kernel sees content + frame_ms bytes
    frames = frame_sample(media, every_ms=1000, kernel=length_kernel).collect()
    assert {r["frame_ms"] for r in frames} == {0, 1000, 2000}
    assert all(r["features"] == [12.0] * 8 for r in frames)  # 4 + 8 ts bytes


def test_multimodal_real_stdlib_decoder(spark):
    """A REAL decoder must run end-to-end through extract_features:
    synthesize valid PNG and WAV payloads, decode them executor-side
    via the pure-stdlib kernel (zlib inflate + PNG filter
    reconstruction; RIFF/PCM parse), and check the features against
    ground truth known from the synthesis parameters — not from the
    kernel itself."""
    from data_engineering_bootcamp_spark.operators.multimodal import (
        _PNG_SIG,
        deterministic_fake_decode,
        extract_features,
        stdlib_decode_kernel,
        synth_png,
        synth_wav,
    )

    png = synth_png(16, 8, (200, 100, 50))
    wav = synth_wav(4000, framerate=8000, amplitude=12000)
    media = spark.createDataFrame(
        [
            (1, "image", png, (16, 8, 0, "image/png")),
            (2, "audio", wav, (0, 0, 500, "audio/wav")),
            (3, "image", b"not media", (0, 0, 0, "text/plain")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,duration_ms:long,mime:string>",
    )
    got = {
        r["media_id"]: (r["n_bytes"], r["features"])
        for r in extract_features(media, kernel=stdlib_decode_kernel).collect()
    }
    # PNG: [marker, w, h, channels, meanR, meanG, meanB, 0]
    assert got[1][0] == len(png)
    assert got[1][1][:4] == [1.0, 16.0, 8.0, 3.0]
    assert got[1][1][4:7] == pytest.approx(
        [200 / 255, 100 / 255, 50 / 255], abs=1e-6
    )
    # WAV: [marker, nch, rate, frames, rms, sampwidth, 0, 0]
    assert got[2][1][:4] == [2.0, 1.0, 8000.0, 4000.0]
    assert got[2][1][4] == pytest.approx(12000 / 32768, abs=1e-6)
    # unrecognized bytes fall back to the md5 stub — mixed tables work
    assert got[3][1] == pytest.approx(deterministic_fake_decode(b"not media"))

    # filter reconstruction is real: hand-encode scanlines with Sub(1)
    # and Up(2) filters and require the same means as the filter-0 form
    import struct
    import zlib

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    w_px, rgb = 4, (30, 60, 90)
    # row 0: Sub filter — first pixel raw, rest delta-0 from left pixel
    row0 = b"\x01" + bytes(rgb) + b"\x00" * (3 * (w_px - 1))
    # row 1: Up filter — all zero deltas from row 0
    row1 = b"\x02" + b"\x00" * (3 * w_px)
    ihdr = struct.pack(">IIBBBBB", w_px, 2, 8, 2, 0, 0, 0)
    filtered_png = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    feats = stdlib_decode_kernel(filtered_png)
    assert feats == stdlib_decode_kernel(synth_png(w_px, 2, rgb))


def test_minhash_verify_broadcast_is_adaptive(spark, sf_small):
    """With broadcast_verify=None (default) the verify-stage join plan
    must follow the measured size of the signature relation vs the
    session's autoBroadcastJoinThreshold: broadcast when it fits,
    shuffled equi join when it doesn't — same pairs either way."""
    from data_engineering_bootcamp_spark.operators.dedup import (
        dedup_minhash_lsh,
        release_caches,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        # generous threshold: adaptive choice must broadcast
        spark.conf.set(key, "64MB")
        wide = dedup_minhash_lsh(docs, jaccard_threshold=0.8)
        plan = wide._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        want = {(r.doc_id_a, r.doc_id_b, r.jaccard) for r in wide.collect()}

        # tiny threshold: adaptive choice must degrade to shuffled joins
        spark.conf.set(key, "1024b")
        narrow = dedup_minhash_lsh(docs, jaccard_threshold=0.8)
        plan = narrow._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        got = {(r.doc_id_a, r.doc_id_b, r.jaccard) for r in narrow.collect()}
        assert got == want and want
    finally:
        spark.conf.set(key, old)
        release_caches()


def test_ngram_scale_paths_lossless(spark, sf_small):
    """Both lossless pair-generation strategies — length-bucket
    blocking ({k, k+1} double assignment) and prefix filtering
    (rare-first global order) — must return EXACTLY the all-pairs
    result, with equi-join plans, never a BNLJ."""
    from data_engineering_bootcamp_spark.operators.dedup import (
        dedup_ngram_jaccard,
        release_caches,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    try:
        # 0.2 is a float-dangerous threshold: 0.2 * s can exceed the
        # decimal product (0.2*35 = 7.000000000000001) so a float ceil
        # over-prunes; the exact-rational bounds must stay lossless.
        for threshold in (0.5, 0.2):
            want = {
                (r.doc_id_a, r.doc_id_b, r.jaccard)
                for r in dedup_ngram_jaccard(
                    docs, block_col=None, ngram=3, threshold=threshold
                ).collect()
            }
            assert want  # non-trivial corpus
            for kw in ({"length_blocked": True}, {"prefix_filtered": True}):
                fast = dedup_ngram_jaccard(
                    docs, block_col=None, ngram=3, threshold=threshold, **kw
                )
                plan = fast._jdf.queryExecution().executedPlan().toString()
                assert "BroadcastNestedLoop" not in plan, kw
                assert any(
                    j in plan
                    for j in ("SortMergeJoin", "ShuffledHashJoin",
                              "BroadcastHashJoin")
                ), kw
                got = {
                    (r.doc_id_a, r.doc_id_b, r.jaccard) for r in fast.collect()
                }
                assert got == want, (kw, threshold)
    finally:
        release_caches()


def test_hash_sample_split_properties(spark, sf_small):
    """Hash split must be disjoint, exhaustive, deterministic across
    repartitionings, and close to the requested fraction."""
    from data_engineering_bootcamp_spark.operators.sampling import (
        hash_sample,
        train_test_split,
    )

    ev = spark.read.parquet(f"{sf_small}/events.parquet").select("event_id")
    n = ev.count()
    train, test = train_test_split(ev, "event_id", 0.25)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == n  # exhaustive
    assert train.join(test, "event_id").count() == 0  # disjoint
    assert abs(n_test / n - 0.25) < 0.05  # near the requested fraction
    # layout-independence: same verdicts after an arbitrary repartition
    test_ids = {r.event_id for r in test.collect()}
    resampled = hash_sample(ev.repartition(7), "event_id", 0.25)
    assert {r.event_id for r in resampled.collect()} == test_ids
    # salt derives an independent split
    other = hash_sample(ev, "event_id", 0.25, salt="v2")
    other_ids = {r.event_id for r in other.collect()}
    assert other_ids != test_ids


def test_priority_sample_matches_python_replay(spark):
    """priority_sample (weighted, deterministic): the selected set must
    equal an independent Python replay of the same scheme — md5-hex
    60-bit uniform divided by the weight, k smallest — and be invariant
    to partitioning. Heavier rows must dominate the sample."""
    import hashlib

    from data_engineering_bootcamp_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, 1000 if i % 10 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w int")

    def replay(k):
        pris = []
        for i, w in rows:
            u = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:15], 16)
            pris.append((u / w, i))
        return [i for _, i in sorted(pris)[:k]]

    for n_parts in (1, 7):
        got = [
            r.id
            for r in priority_sample(
                df.repartition(n_parts), "id", F.col("w"), k=50, salt="s"
            ).collect()
        ]
        assert got == replay(50)
    # weight dominance: the 100 heavy rows (w=1000) should fill most of
    # a k=50 sample drawn over 1000 rows
    heavy = sum(1 for i in replay(50) if i % 10 == 0)
    assert heavy >= 45
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, "id", F.col("w"), k=0)


def test_chunk_docs_boundaries(spark):
    """Chunk math edge cases: doc shorter than one chunk -> one window;
    exact multiple -> no empty trailing window; stride overlap holds."""
    from data_engineering_bootcamp_spark.operators.chunking import chunk_docs

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(5))),    # < chunk: 1 window
            (2, " ".join(f"t{i}" for i in range(10))),   # == chunk: 1 window
            (3, " ".join(f"t{i}" for i in range(17))),   # 10 + stride 7 -> 2
        ],
        "doc_id long, text string",
    )
    out = chunk_docs(docs, chunk_tokens=10, stride=7)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    assert sorted(rows) == [(1, 0), (2, 0), (3, 0), (3, 1)]
    assert rows[(1, 0)].n_tokens == 5
    assert rows[(2, 0)].n_tokens == 10
    assert rows[(3, 0)].n_tokens == 10
    assert rows[(3, 1)].n_tokens == 10  # tokens 8..17
    # overlap: chunk 1 starts at token index 7 (0-based)
    assert rows[(3, 1)].chunk_text.split(" ")[0] == "t7"


def test_pack_token_stream_matches_python_replay(spark):
    """The packing must be exactly the first-token-rule cumsum split:
    a pure-Python replay over the same docs produces identical
    (shard, pack_id) → (n_docs, n_tokens) stats, and totals conserve
    the corpus token count."""
    from collections import defaultdict

    from data_engineering_bootcamp_spark.operators.chunking import (
        pack_token_stream,
    )

    sizes = {i: 3 + (i * 7) % 11 for i in range(60)}
    docs = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(n))) for i, n in sizes.items()],
        "doc_id long, text string",
    )
    got = {
        (p.shard, p.pack_id): (p.n_docs, p.n_tokens)
        for p in pack_token_stream(docs, capacity=20, n_shards=4).collect()
    }
    want: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    offsets: dict[int, int] = defaultdict(int)
    for i in sorted(sizes):
        shard = i % 4
        pack = offsets[shard] // 20
        want[(shard, pack)][0] += 1
        want[(shard, pack)][1] += sizes[i]
        offsets[shard] += sizes[i]
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(v[1] for v in got.values()) == sum(sizes.values())


def test_decontaminate_flags_leaked_docs(spark):
    """A corpus doc sharing most trigrams with any benchmark doc must
    be flagged; disjoint docs must not; ratio accounting is exact."""
    from data_engineering_bootcamp_spark.operators.dedup import (
        decontaminate,
        release_caches,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # full copy of a benchmark doc -> ratio 1.0
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # 2 of 6 trigrams shared -> ratio 1/3, flagged at 0.3
            (2, "gamma delta epsilon zeta nu xi omicron pi"),
            # disjoint vocabulary -> not flagged
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    try:
        got = {
            r.doc_id: (r.n_grams, r.n_overlap, r.overlap_ratio)
            for r in decontaminate(
                corpus, bench, ngram=3, min_overlap_ratio=0.3
            ).collect()
        }
    finally:
        release_caches()
    assert set(got) == {1, 2}
    assert got[1] == (6, 6, 1.0)
    # 'gamma delta epsilon' and 'delta epsilon zeta' are the shared pair
    assert got[2] == (6, 2, 0.333333)


def test_profile_table_exact_and_approx(spark):
    from data_engineering_bootcamp_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"v{i % 5}") for i in range(30)],
        "id long, v string",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["id"].asDict() == {
        "column": "id", "n_rows": 30, "n_nonnull": 30,
        "n_nulls": 0, "n_distinct": 30,
    }
    assert got["v"].asDict() == {
        "column": "v", "n_rows": 30, "n_nonnull": 20,
        "n_nulls": 10, "n_distinct": 5,
    }
    # the 100 TB variant: HLL sketch within its error envelope
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(df, exact_distinct=False).collect()
    }
    assert abs(approx["id"] - 30) <= 3 and abs(approx["v"] - 5) <= 2


def test_profile_approx_check_envelope(spark):
    # the self-checking twin (VERDICT r11 #6): exact counts reported,
    # approx_ok true when the HLL estimate sits in the 5-sigma band
    from data_engineering_bootcamp_spark.operators.profile import (
        profile_table_approx_check,
    )

    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"v{i % 5}") for i in range(3000)],
        "id long, v string",
    )
    got = {r["column"]: r for r in profile_table_approx_check(df).collect()}
    assert got["id"].asDict() == {
        "column": "id", "n_rows": 3000, "n_nonnull": 3000,
        "n_distinct": 3000, "approx_ok": True,
    }
    assert got["v"].asDict() == {
        "column": "v", "n_rows": 3000, "n_nonnull": 2000,
        "n_distinct": 5, "approx_ok": True,
    }
    with pytest.raises(ValueError, match="rsd"):
        profile_table_approx_check(df, rsd=1.5)


def test_pipeline_replay_31d_final_states(spark, tmp_path):
    """31-day replay (catalog_late.q_pipeline_replay_31d) must land
    every user in the correct day-31 growth state: the state machine
    (M4A/lecture-lab/growth_accounting.sql:19-34) evaluated against a
    fixture covering all five states."""
    import os

    from data_engineering_bootcamp_spark.plans.catalog_late import (
        q_pipeline_replay_31d,
    )

    # (user, active days) -> expected day-31 state
    activity = {
        1: (["2024-01-01", "2024-01-02"], "Stale"),
        2: (["2024-01-30"], "Churned"),
        3: (["2024-01-30", "2024-01-31"], "Retained"),
        4: (["2024-01-31"], "New"),
        5: (["2024-01-05", "2024-01-31"], "Resurrected"),
    }
    rows = [
        (uid * 100 + i, f"{day} 12:00:00", uid, "click", 1.0, "{}")
        for uid, (days, _) in activity.items()
        for i, day in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = tmp_path / "sf"
    os.makedirs(d)
    df.write.parquet(str(d / "events.parquet"))

    out = {
        r.user_id: r for r in q_pipeline_replay_31d(spark, str(d)).collect()
    }
    assert set(out) == set(activity)
    for uid, (days, want_state) in activity.items():
        r = out[uid]
        assert r.daily_active_state == want_state, (uid, r)
        assert r.n_days == len(days), (uid, r)
        assert r.first_active_date == min(days), (uid, r)
        assert r.last_active_date == max(days), (uid, r)
        assert r.dates_active == ",".join(sorted(days, reverse=True)), (
            uid,
            r,
        )


def test_scd_replay_composition_equals_batch_generation(spark):
    """The two-forms equivalence scd_replay_31d rests on, pinned on a
    hand fixture with the repo's OWN batch operator (no DuckDB): N
    composed scd_incremental advances over DENSE snapshots equal one
    scd_from_snapshots over the same dense stream. Includes a gap
    (densified to 'none'), a value change, a late-arriving entity, and
    an entity inactive from day 3 on."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_engineering_bootcamp_spark.operators.scd import (
        scd_from_snapshots,
        scd_incremental,
    )

    # (user, day) -> value; dense = every user present every day from
    # its first appearance, absent day = 'none'
    activity = {
        (1, 1): "A", (1, 2): "A", (1, 4): "A",      # gap on day 3
        (2, 2): "B", (2, 3): "C", (2, 4): "C",      # changes B->C
        (3, 1): "A",                                 # inactive from d2
        (4, 5): "D",                                 # appears on day 5
    }
    first = {u: min(d for (uu, d) in activity if uu == u)
             for u in {u for (u, _) in activity}}
    days = range(1, 6)
    dense = [
        (u, d, activity.get((u, d), "none"))
        for u in sorted(first)
        for d in days
        if d >= first[u]
    ]
    dense_df = spark.createDataFrame(dense, ["user_id", "d", "v"])

    batch = scd_from_snapshots(dense_df, "user_id", "d", ["v"])

    hist_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("start_d", T.LongType()),
            T.StructField("end_d", T.LongType()),
        ]
    )
    replay = spark.createDataFrame([], hist_schema)
    for day in days:
        snap = dense_df.where(F.col("d") == day).select("user_id", "v")
        replay = scd_incremental(replay, snap, "user_id", "d", ["v"], day)

    got_batch = {tuple(r) for r in batch.collect()}
    got_replay = {
        (r.user_id, r.v, r.start_d, r.end_d) for r in replay.collect()
    }
    assert got_replay == got_batch
    # spot-pin the interesting ranges so the fixture can't silently rot
    assert (1, "A", 1, 2) in got_replay and (1, "none", 3, 3) in got_replay
    assert (2, "B", 2, 2) in got_replay and (2, "C", 3, 4) in got_replay
    assert (3, "A", 1, 1) in got_replay and (3, "none", 2, 5) in got_replay
    assert (4, "D", 5, 5) in got_replay


def test_real_decode_dispatches_to_stdlib_kernel():
    """VERDICT r12 #8: `real_decode` is no longer a NotImplementedError
    stub — it must dispatch to the stdlib kernel for every payload
    class (PNG, WAV, unrecognized), ignoring the legacy `kind` tag."""
    from data_engineering_bootcamp_spark.operators.multimodal import (
        deterministic_fake_decode,
        real_decode,
        stdlib_decode_kernel,
        synth_png,
        synth_wav,
    )

    png = synth_png(4, 4, (9, 18, 27))
    wav = synth_wav(100, framerate=8000, amplitude=1000)
    assert real_decode(png) == stdlib_decode_kernel(png)
    assert real_decode(png)[0] == 1.0  # PNG marker
    assert real_decode(wav, kind="wrong-tag-ignored") == stdlib_decode_kernel(wav)
    assert real_decode(wav)[0] == 2.0  # WAV marker
    assert real_decode(b"plain bytes") == deterministic_fake_decode(b"plain bytes")


def test_priority_sample_fractional_weight_truncates_consistently(spark):
    """ADVICE r12: a fractional weight must truncate ONCE (long cast)
    and that same value must feed both the emitted `_w` and the
    priority divisor — the sample over double weights {2.9, 1.0} must
    equal the sample over integer weights {2, 1}, and `_w` must report
    the truncated value."""
    import hashlib

    from data_engineering_bootcamp_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, 2.9 if i % 2 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = priority_sample(df, "id", F.col("w"), k=30, salt="s").collect()
    assert all(r["_w"] == (2 if r.id % 2 == 0 else 1) for r in got)

    pris = []
    for i, w in rows:
        u = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:15], 16)
        pris.append((u / int(w), i))  # divisor = truncated weight
    assert [r.id for r in got] == [i for _, i in sorted(pris)[:30]]


def test_profile_table_non_identifier_columns(spark):
    """ADVICE r12: column names that are not bare SQL identifiers
    (spaces, hyphens, quotes) must profile correctly, and an empty
    column list must raise at the call site, in both variants."""
    import pytest as _pytest

    from data_engineering_bootcamp_spark.operators.profile import (
        profile_table,
        profile_table_approx_check,
    )

    df = (
        spark.range(20)
        .selectExpr(
            "id AS `user id`",
            "CAST(id % 4 AS STRING) AS `e-mail`",
            "id % 2 AS `it's`",
        )
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert set(got) == {"user id", "e-mail", "it's"}
    assert got["user id"]["n_distinct"] == 20
    assert got["e-mail"]["n_distinct"] == 4
    assert got["it's"]["n_distinct"] == 2
    gotc = {
        r["column"]: r for r in profile_table_approx_check(df).collect()
    }
    assert set(gotc) == {"user id", "e-mail", "it's"}
    assert all(r["approx_ok"] for r in gotc.values())
    with _pytest.raises(ValueError, match="non-empty"):
        profile_table(df, columns=[])
    with _pytest.raises(ValueError, match="non-empty"):
        profile_table_approx_check(df, columns=[])
