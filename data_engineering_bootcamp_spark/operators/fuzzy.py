"""Fuzzy string matching (edit-distance self-join) with lossless
segment blocking — the entity-resolution primitive the reference's
lesson material approximates with exact-key joins (M1/M2 dimensional
dedup, e.g. `bootcamp/materials/1-dimensional-data-modeling`
deduplication labs), generalized to typo-tolerant matching the way a
curation pipeline dedups author/entity names.

Algorithm: PassJoin-style partition blocking (Li, Deng, Wang, Feng,
"PASS-JOIN: A Partition-based Method for Similarity Joins", PVLDB
2011 — public paper). The pigeonhole fact: partition a string `s`
into `d+1` contiguous segments; any `t` with `lev(s, t) <= d` must
contain at least one segment VERBATIM (each edit destroys at most one
segment), and unedited text shifts by at most `d` positions. So:

  1. index side — every row emits its `d+1` segments keyed by
     (|s|, slot, segment_text);
  2. probe side — every row emits, for each candidate indexed length
     `L` in [|t|-d, |t|+d] and each slot, the substrings of `t` with
     that slot's length starting within the ±d shift window;
  3. candidates — one shuffled EQUI join on the composite key (never
     a theta/cross join), distinct per ordered pair;
  4. verify — JVM `levenshtein` (whole-stage codegen) on surviving
     pairs only.

Scale posture: probe fan-out is bounded by (2d+1)²·(d+1) keys per row
(18 at d=1), the join hash-partitions on (length, slot, text) so it
co-locates like a plain equi join at any corpus size, and the
quadratic verify runs only inside blocks sharing an exact segment.
The ±d shift window is a SUPERSET of PassJoin's multi-match-aware
window — a few extra candidates, provably zero missed pairs.

Strings shorter than `d+1` characters get zero-length segments, which
match anywhere within the (±d-bounded) length window; correct but
degenerate — such rows only block against near-empty strings, so the
blowup is bounded and tiny.

KNOWN DEGENERACY (inherent to segment blocking, measured in
`tools/scale_bench.py bench_fuzzy`): candidate volume is governed by
segment-CONTENT diversity. A corpus whose strings share a long
constant prefix ("Customer#000…") makes that segment one giant block
and the verify join quadratic within it — still correct, but the
blocking buys nothing there. Production ER pipelines normalize keys
first (strip constant prefixes/suffixes so the discriminating
characters land in every segment). For the EQUAL-WIDTH case (padded
ids, phone numbers, zip codes, fixed-length hashes — and TPC-H
c_name), `hamming_join` below sidesteps the problem entirely:
contiguity is irrelevant to the Hamming pigeonhole, so it measures
per-position cardinality in one cheap aggregate and assigns positions
to blocking buckets entropy-BALANCED — constant prefixes and
zero-padding contribute nothing and the varying positions spread
across every bucket. Measured on raw c_name at sf0.1 (15k rows, 9/18
chars constant): PassJoin-on-raw 583 s, hamming_join ~seconds, same
262,500 pairs. Since equal-length strings satisfy lev <= 1 iff
Hamming <= 1, the d=1 edit-distance gate entry runs on the Hamming
path with zero semantic change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _idiv(a: Column, b: int) -> Column:
    """Floor division of a non-negative integer Column by a positive
    Python int, in pure integer arithmetic (no double rounding)."""
    return ((a - (a % b)) / b).cast("long")


def _seg_bounds(L: Column, i: Column, k: int) -> tuple[Column, Column]:
    """(start0, length) of 0-based segment `i` when a length-`L` string
    is evenly partitioned into `k` contiguous segments — short segments
    (floor(L/k) chars) first, long ones (one extra char) last, the
    PassJoin convention. Pure integer Column arithmetic so the index
    and probe sides derive identical boundaries from `L` alone."""
    base = _idiv(L, k)
    rem = L % k
    n_short = F.lit(k) - rem  # segments 0..n_short-1 are `base` long
    seg_len = base + F.when(i >= n_short, F.lit(1)).otherwise(F.lit(0))
    start = i * base + F.greatest(i - n_short, F.lit(0))
    return start, seg_len


def fuzzy_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within `max_dist`
    Levenshtein edits, via lossless PassJoin segment blocking.

    Output: (id_a BIGINT, id_b BIGINT, dist INT), including dist 0
    (identical strings under distinct ids). NULL ids/strings are
    excluded (no defined distance). `max_dist` must be in [1, 8] —
    0 is the exact-dedup path (`dedup_exact`), and past ~8 the
    (2d+1)²(d+1) probe fan-out stops beating smarter filters.

    Blocking entropy is the CALLER's contract: the join is lossless
    for any data, but its cost is driven by segment-key selectivity —
    a segment-wide constant region (fixed prefixes like 'Customer#',
    zero-padding) makes that slot's equi join a disguised cross join.
    Normalize first (strip literal affixes, reverse zero-padded
    numerics so entropy leads — Levenshtein's reversal invariance
    makes such keys exact, not approximate), or, for equal-width
    corpora at d = 1, use `hamming_join`, whose entropy-balanced
    position bucketing needs no normalization at all.
    """
    d = int(max_dist)
    if not 1 <= d <= 8:
        raise ValueError(f"max_dist must be in [1, 8], got {max_dist}")
    k = d + 1

    base = df.select(
        F.col(id_col).cast("long").alias("fid"),
        F.col(str_col).alias("fs"),
    ).where(F.col("fid").isNotNull() & F.col("fs").isNotNull())

    # ---- index side: the d+1 segments of every string -------------
    def seg_struct(i: Column) -> Column:
        start, seg_len = _seg_bounds(F.length("fs"), i, k)
        return F.struct(
            i.cast("int").alias("slot"),
            F.substr("fs", start + 1, seg_len).alias("txt"),
        )

    segs = base.select(
        F.col("fid").alias("sid"),
        F.col("fs").alias("ss"),
        F.length("fs").alias("s_len"),
        F.explode(
            F.transform(F.sequence(F.lit(0), F.lit(d)), seg_struct)
        ).alias("g"),
    ).select(
        "sid", "ss", "s_len", F.col("g.slot").alias("slot"),
        F.col("g.txt").alias("txt"),
    )

    # ---- probe side: candidate substrings per (length, slot) ------
    m = F.length("fs")

    def probes_for_slot(L: Column, i: Column) -> Column:
        start, seg_len = _seg_bounds(L, i, k)
        lo = F.greatest(start - d, F.lit(0))
        hi = F.least(m - seg_len, start + d)
        return F.when(
            (seg_len <= m) & (hi >= lo),
            F.transform(
                F.sequence(lo, hi),
                lambda st: F.struct(
                    L.cast("long").alias("s_len"),
                    i.cast("int").alias("slot"),
                    F.substr("fs", st + 1, seg_len).alias("txt"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<s_len:bigint,slot:int,txt:string>>")
        )

    probe_gen = F.flatten(
        F.transform(
            # candidate indexed lengths; 0 kept so empty-vs-empty pairs
            # still block, negatives clamped away
            F.sequence(F.greatest(m - d, F.lit(0)), m + d),
            lambda L: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(d)),
                    lambda i: probes_for_slot(L, i),
                )
            ),
        )
    )
    probes = base.select(
        F.col("fid").alias("pid"),
        F.col("fs").alias("ps"),
        F.explode(probe_gen).alias("g"),
    ).select(
        "pid", "ps", F.col("g.s_len").alias("s_len"),
        F.col("g.slot").alias("slot"), F.col("g.txt").alias("txt"),
    )

    # ---- candidate equi join + ordered-pair dedup + verify --------
    cand = probes.join(segs, ["s_len", "slot", "txt"]).where(
        F.col("pid") != F.col("sid")
    )
    pairs = cand.select(
        F.least("pid", "sid").alias("id_a"),
        F.greatest("pid", "sid").alias("id_b"),
        F.when(F.col("pid") < F.col("sid"), F.col("ps"))
        .otherwise(F.col("ss"))
        .alias("sa"),
        F.when(F.col("pid") < F.col("sid"), F.col("ss"))
        .otherwise(F.col("ps"))
        .alias("sb"),
    ).distinct()
    return (
        pairs.withColumn("dist", F.levenshtein("sa", "sb"))
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )


def hamming_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) of EQUAL-WIDTH strings within
    `max_dist` HAMMING distance (substitutions only), via
    entropy-balanced positional blocking.

    For equal-length strings, Hamming distance d means exactly d
    differing positions, so `lev <= 1` and `hamming <= 1` coincide at
    d = 1 (one edit between equal lengths must be a substitution);
    at d >= 2 Hamming is its own, stricter metric (lev can trade an
    insert against a delete) — callers wanting edit distance beyond 1
    on equal-width data still use `fuzzy_join`.

    Blocking: partition the WIDTH positions into d+1 buckets; a pair
    within Hamming d has <= d differing positions, so some bucket is
    untouched and matches VERBATIM (pigeonhole) — any partition is
    lossless, contiguity is irrelevant. That freedom is the fix for
    the constant-affix degeneracy PassJoin suffers (module docstring):
    ONE map-side-combinable aggregate measures per-position
    approx-cardinality, and a deterministic greedy assigns positions
    to the currently-lightest bucket in descending log-cardinality
    order, so every bucket gets its share of the discriminating
    positions and constant regions (fixed prefixes, zero padding)
    dilute across buckets instead of forming corpus-wide blocks.
    Bucketing choice affects COST only, never the result set.

    Plan: one aggregate scan (position cardinalities), one self equi
    join on (slot, bucket_text) — hash-partitioned, never cross —
    pair-distinct, then a codegen positional-mismatch count as the
    verify. Raises on mixed widths (use `fuzzy_join`) and on
    width <= max_dist (every pair would match — a cross join by
    definition, not a join problem).
    """
    import math

    d = int(max_dist)
    if d < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    k = d + 1

    base = df.select(
        F.col(id_col).cast("long").alias("fid"),
        F.col(str_col).alias("fs"),
    ).where(F.col("fid").isNotNull() & F.col("fs").isNotNull())

    bounds = base.agg(
        F.min(F.length("fs")).alias("lo"),
        F.max(F.length("fs")).alias("hi"),
    ).first()
    if bounds.lo is None:
        # empty input: empty result with the contract schema
        return base.limit(0).select(
            F.col("fid").alias("id_a"),
            F.col("fid").alias("id_b"),
            F.lit(0).alias("dist"),
        )
    if bounds.lo != bounds.hi:
        raise ValueError(
            f"hamming_join needs equal-width strings, got widths "
            f"[{bounds.lo}, {bounds.hi}] — use fuzzy_join for "
            "variable-length corpora"
        )
    width = int(bounds.lo)
    if width <= d:
        raise ValueError(
            f"width {width} <= max_dist {d}: every pair matches — "
            "this is a cross join, not a similarity join"
        )

    def verify(cand: DataFrame) -> DataFrame:
        ham = F.aggregate(
            F.sequence(F.lit(1), F.lit(width)),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                F.col("sa").substr(i, F.lit(1))
                == F.col("sb").substr(i, F.lit(1)),
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        return (
            cand.withColumn("dist", ham)
            .where(F.col("dist") <= d)
            .select("id_a", "id_b", "dist")
        )

    if d == 1:
        # EXACT candidate generation via mask-one-position blocking: a
        # pair within Hamming <= 1 agrees on every position except (at
        # most) one, so the two strings share the key (p, string with
        # position p removed) for the differing p — and exact
        # duplicates share every key. Candidates therefore EQUAL the
        # result set (× key multiplicity), so group sizes stay O(1)
        # even on the degenerate low-entropy corpora the pigeonhole
        # path exists for (constant prefixes + zero padding), where
        # two 9-position buckets still admit ~1M false candidates at
        # 15k rows. Keys ship as (slot, xxhash64) — 12 B/row × width
        # rows — and strings join back only for the tiny candidate
        # set; a hash collision admits a false candidate that `verify`
        # removes, so exactness never depends on xxhash64. d >= 2
        # keeps the entropy-balanced pigeonhole below (masking every
        # d-subset would be C(width, d) keys — combinatorial).
        masks = base.select(
            "fid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("slot"),
                            F.xxhash64(
                                F.concat(
                                    F.substring("fs", 1, p),
                                    F.substring(
                                        "fs", p + 2, width - p - 1
                                    ),
                                )
                            ).alias("h"),
                        )
                        for p in range(width)
                    ]
                )
            ).alias("g"),
        ).select(
            "fid", F.col("g.slot").alias("slot"), F.col("g.h").alias("h")
        )
        right = masks.select(F.col("fid").alias("fid2"), "slot", "h")
        cand_ids = (
            masks.join(right, ["slot", "h"])
            .where(F.col("fid") < F.col("fid2"))
            .select(F.col("fid").alias("id_a"), F.col("fid2").alias("id_b"))
            .distinct()
        )
        cand = cand_ids.join(
            base.select(F.col("fid").alias("id_a"), F.col("fs").alias("sa")),
            "id_a",
        ).join(
            base.select(F.col("fid").alias("id_b"), F.col("fs").alias("sb")),
            "id_b",
        )
        return verify(cand)

    cards = base.agg(
        *[
            F.approx_count_distinct(F.substring("fs", p + 1, 1)).alias(
                f"c{p}"
            )
            for p in range(width)
        ]
    ).first()
    # deterministic greedy balance: positions in descending
    # log-cardinality (ties by index), each to the lightest bucket
    order = sorted(
        range(width), key=lambda p: (-math.log2(max(cards[p], 1)), p)
    )
    buckets: list[list[int]] = [[] for _ in range(k)]
    loads = [0.0] * k
    for p in order:
        j = min(range(k), key=lambda b: (loads[b], b))
        buckets[j].append(p)
        loads[j] += math.log2(max(cards[p], 1))

    def bucket_txt(bucket: list[int]) -> Column:
        if not bucket:
            return F.lit("")
        return F.concat(
            *[F.substring("fs", p + 1, 1) for p in sorted(bucket)]
        )

    segs = base.select(
        "fid",
        "fs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("slot"),
                        bucket_txt(buckets[i]).alias("txt"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("g"),
    ).select("fid", "fs", F.col("g.slot").alias("slot"),
             F.col("g.txt").alias("txt"))

    right = segs.select(
        F.col("fid").alias("fid2"),
        F.col("fs").alias("fs2"),
        "slot",
        "txt",
    )
    cand = (
        segs.join(right, ["slot", "txt"])
        .where(F.col("fid") < F.col("fid2"))
        .select(
            F.col("fid").alias("id_a"),
            F.col("fid2").alias("id_b"),
            F.col("fs").alias("sa"),
            F.col("fs2").alias("sb"),
        )
        .distinct()
    )
    return verify(cand)
