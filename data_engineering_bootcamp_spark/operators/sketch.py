"""Probabilistic pre-join / cardinality sketches, exactly replayable.

Two sketch operators whose SCALE value is shuffle avoidance, built on
the repo's md5 determinism contract (`dedup.md5_hash60`) so a SQL
oracle can replay every bit:

- `bloom_prune` — Bloom-filter semi-join REDUCTION: the dimension's
  key set is compressed to an m-bit bitmap (k positions per key,
  derived from ONE 60-bit hash by enhanced double hashing — hashing is
  the measured cost at 20M rows, so the hot path pays a single digest;
  md5 for oracle replay, xxhash64 for speed) and shipped as a
  constant-folded array<bigint> plan literal; the fact side is probed
  IN CODEGEN — element_at + shift/mask — with zero Python stages and
  zero shuffles touching the fact. At 100 TB this is the standard trick when the dim's raw keys
  exceed the autoBroadcast threshold but their bitmap (m/8 bytes,
  128 KiB at m=2^20) never does: only the sub-percent false-positive
  residue reaches the real join. False positives are BY DESIGN (the
  operator is a pre-reducer, not the join); false negatives are
  impossible — both sides compute identical positions.

- `linear_count` — linear-counting distinct sketch (Whang et al.): the
  sketch is the SET of occupied positions `md5(key) mod m`, mergeable
  across partitions/batches/days by bitmap OR — the mergeability that
  exact COUNT(DISTINCT)'s Expand plan lacks. Output is integer-only
  (occupied count, fill in ppm): the ln-based estimate
  `-m * ln(1 - fill)` is deliberately NOT a column — libm log is not
  cross-engine bit-stable (same division-only discipline as the
  tf-idf and bigram-LM scores); `linear_count_estimate` computes it
  driver-side and a unit test pins its error envelope.

Position determinism (replayed verbatim by the SQL oracles):
`h = CAST('0x' || substr(md5('<tag>_' || key), 1, 15) AS BIGINT)` (60
bits), `h1 = h >> 30`, `h2 = h & (2^30 - 1)`,
`pos_i = (h1 + i * (2*h2 + 1)) % m` — the odd step makes every probe
sequence a full cycle over any power-of-two m.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

# 4M bits: bounds the driver's bloom_bits fetch at <= 4M skinny rows
# and the plan's word-array literal at 65536 elements (~1.3 MB of SQL
# text) — past this, shard the dim or use a plain shuffled semi join
_MAX_M_BITS = 1 << 22
_H_LOW = (1 << 30) - 1


def _hash60(key: Column, tag: str, hash_fn: str = "md5") -> Column:
    """60-bit non-negative hash of (tag, key). `md5` is the
    cross-engine-replayable default every oracle rests on; `xxhash64`
    is the hot-path option — a JVM intrinsic over the raw value (no
    string render, no digest), measured ~14x cheaper per row — for
    callers who don't need SQL replay (same positions-derivation
    downstream, same guarantees)."""
    if hash_fn == "md5":
        return md5_hash60(F.concat(F.lit(tag + "_"), key.cast("string")))
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(tag), key), F.lit(1 << 60))
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5 | xxhash64)")


def _positions(h: Column, k: int, m_bits: int) -> list[Column]:
    """k bitmap positions from one 60-bit hash (enhanced double
    hashing: top 30 bits base, bottom 30 bits forced-odd step)."""
    h1 = F.shiftright(h, 30)
    step = h.bitwiseAND(F.lit(_H_LOW)) * F.lit(2) + F.lit(1)
    return [
        F.pmod(h1 + F.lit(i) * step, F.lit(m_bits)).alias(f"pos{i}")
        for i in range(k)
    ]


def bloom_bits(
    keys: DataFrame, key_col: str, m_bits: int, k: int, tag: str = "bloom",
    hash_fn: str = "md5",
) -> DataFrame:
    """Distinct set positions of the Bloom bitmap for `keys` — the
    distributed build half of `bloom_prune` (one shuffle, output
    bounded by m_bits rows). NULL keys contribute no bits (a NULL
    hashes to a NULL position, which would otherwise crash the
    driver-side bitmap packing — and a NULL can never equal a probe
    key anyway)."""
    h = _hash60(F.col(key_col), tag, hash_fn)
    # explode(array(h)) is a GENERATE fence: CollapseProject would
    # otherwise inline the digest expression into all 2k position
    # references (h1 + step per position) and codegen re-evaluates it
    # each time — measured 3x the md5 cost per row on the probe side.
    # A generator node pins the hash to ONE evaluation per row.
    hashed = keys.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(h)).alias("__h")
    )
    return (
        hashed.select(
            F.explode(
                F.array(*_positions(F.col("__h"), k, m_bits))
            ).alias("pos")
        )
        .distinct()
    )


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 20,
    k: int = 3,
    bits_rows: list | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Fact rows that MIGHT match the dim key set (Bloom membership).

    Build: `bloom_bits` over the dim keys (one bounded shuffle),
    fetched to the driver (≤ m_bits rows by construction, enforced by
    the m_bits cap), packed into 64-bit words. Probe: the word array
    rides the plan as a constant-folded literal and every probe is
    pure codegen — one hash per fact row, element_at + shift/mask —
    no Python stage, no Arrow transfer, no shuffle of the fact side.

    Returns the fact columns unchanged, filtered to Bloom-passing rows
    (true matches plus the false-positive residue — feed this into the
    real join). Pass `bits_rows` (a pre-collected `bloom_bits(...)
    .collect()` for the SAME dim/m_bits/k/hash_fn) to reuse an
    already-built bitmap instead of re-scanning the dim. `hash_fn`:
    'md5' (default, oracle-replayable) or 'xxhash64' (JVM intrinsic,
    far cheaper per probe — the hot-path choice when SQL replay is not
    needed; both build and probe must use the same fn, which this
    signature guarantees unless mismatched `bits_rows` are passed)."""
    if m_bits > _MAX_M_BITS:
        raise ValueError(
            f"bloom_prune: m_bits={m_bits} exceeds {_MAX_M_BITS} — the "
            "bitmap is a broadcast artifact by contract; shard the dim "
            "or use a plain shuffled semi join"
        )
    if m_bits % 64 or m_bits < 64:
        raise ValueError(
            f"bloom_prune: m_bits={m_bits} must be a positive multiple of 64 "
            "(the bitmap is packed into 64-bit words)"
        )
    bits = (
        bits_rows
        if bits_rows is not None
        else bloom_bits(
            dim, dim_key, m_bits, k, hash_fn=hash_fn
        ).collect()  # ≤ m_bits rows
    )
    words = [0] * (m_bits // 64)
    for r in bits:
        words[r.pos >> 6] |= 1 << (r.pos & 63)
    # two's-complement the top bit so every word fits a SIGNED long
    # literal; the probe uses arithmetic shiftright + `& 1`, which
    # reads the stored bit pattern correctly either way
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    # the bitmap rides the plan as a CONSTANT array<bigint> literal
    # (constant-folded once — a one-row broadcast join would copy the
    # bitmap into every joined output row, and byte extraction through
    # hex/conv costs a string round-trip per probe; both measured
    # catastrophic at 20M rows). element_at on the folded constant plus
    # shift/mask is pure numeric codegen. Built via ONE parsed SQL
    # expression: F.lit(list) issues a py4j call per element (~10 s of
    # driver time at 16K words); the parser takes the same array in one
    # round-trip.
    bm = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")

    out_cols = list(fact.columns)
    # explode(array(h)) = generate fence (see bloom_bits): without it,
    # CollapseProject inlines the digest into every one of the 2k
    # position references and the md5 runs ~3x per row — measured
    # 5.0 s -> 1.6 s for the 600k-row probe at sf0.1. A NULL fact key
    # hashes to NULL -> NULL positions -> NULL condition -> filtered,
    # same as the pre-fence behavior.
    probed = fact.select(
        "*",
        F.explode(
            F.array(_hash60(F.col(fact_key), "bloom", hash_fn))
        ).alias("__bh"),
    )
    cond = F.lit(True)
    for i, pos in enumerate(_positions(F.col("__bh"), k, m_bits)):
        probed = probed.withColumn(f"__bp{i}", pos).withColumn(
            f"__bw{i}",
            F.element_at(
                bm, F.shiftright(F.col(f"__bp{i}"), 6).cast("int") + F.lit(1)
            ),
        )
        cond = cond & F.expr(
            f"(shiftright(__bw{i}, cast(pmod(__bp{i}, 64) as int)) & 1) = 1"
        )
    return probed.where(cond).select(*out_cols)


def linear_count(
    df: DataFrame, key_col: str, m_bits: int = 4096
) -> DataFrame:
    """One-row linear-counting sketch summary for `key_col`.

    The data-touching pass is a map-side-combinable distinct over
    positions (bounded by m_bits); everything after runs on the bounded
    position table. Output (m_bits, occupied, fill_ppm) — all integer,
    engine-exact; estimate via `linear_count_estimate`."""
    if m_bits > _MAX_M_BITS:
        raise ValueError(f"linear_count: m_bits={m_bits} exceeds {_MAX_M_BITS}")
    occupied = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.pmod(_hash60(F.col(key_col), "lc"), F.lit(m_bits)).alias("pos")
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("occupied"))
    )
    return occupied.select(
        F.lit(int(m_bits)).cast("long").alias("m_bits"),
        F.col("occupied").cast("long").alias("occupied"),
        F.expr(f"(occupied * 1000000) DIV {int(m_bits)}")
        .cast("long")
        .alias("fill_ppm"),
    )


def countmin_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan) as a DataFrame:
    (row, pos, cnt) counters, `depth` independent md5 hash rows of
    `width` counters each. ONE shuffle builds it (each input row
    explodes into its `depth` (row, pos) cells, then a
    map-side-combinable groupBy); the result is bounded by
    depth x width rows regardless of input size, and two sketches
    MERGE by adding cell-wise — the property that lets a 100 TB
    frequency pass run as per-partition/per-day partials. Estimates
    only ever OVER-count (hash collisions add, never subtract), the
    guarantee `countmin_estimates` relies on."""
    if depth < 1 or width < 2:
        raise ValueError(f"countmin_table: bad depth={depth}/width={width}")
    df = df.where(F.col(key_col).isNotNull())  # SQL-aggregate NULL semantics
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(_hash60(F.col(key_col), f"cm{i}"), F.lit(width)).alias(
                    "pos"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimates(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for `probes[key_col]` from a
    `countmin_table` result: min over the `depth` counters each probe
    hashes to (missing cell = 0). Join shape: the probe side explodes
    into its (row, pos) cells and equi-joins the BOUNDED counter table
    — broadcast-sized by construction. Output (key_col, cm_estimate);
    cm_estimate >= true count always."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(_hash60(F.col(key_col), f"cm{i}"), F.lit(width)).alias(
                    "pos"
                ),
            )
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(
        F.col(key_col), F.explode(cells).alias("c")
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = probe_cells.join(F.broadcast(counters), ["row", "pos"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate")
    )


_HLL_HASH_BITS = 60  # md5-replayable hash width (dedup.md5_hash60)


def hll_registers(
    df: DataFrame, key_col: str, p: int = 10, hash_fn: str = "md5"
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) for
    `key_col`: (register INT, max_rho INT), m = 2^p registers.

    Register = top p bits of the 60-bit hash; rho = position of the
    leftmost 1-bit in the remaining W = 60-p bits (W+1 when they are
    all zero). rho is derived from the BINARY-STRING length
    (`W - length(bin(rest)) + 1`) — pure integer/string ops that
    Spark's `bin` and DuckDB's `bin` compute identically, so a SQL
    oracle replays every register exactly (no floating log2 whose
    floor could disagree at powers of two).

    ONE map-side-combinable groupBy builds it; the result is bounded
    by m rows regardless of input size, and two register tables MERGE
    by register-wise MAX — the property that lets a 100 TB cardinality
    pass run as per-partition/per-day partials (asserted in tests).
    Output is integer-only; the float estimate lives driver-side in
    `hll_estimate`, same division-of-labor as `linear_count`."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_registers: p must be in [4, 16], got {p}")
    w = _HLL_HASH_BITS - p
    # explode(array(h)) = generate fence (see bloom_bits): the digest
    # feeds register AND both rho references; without the fence
    # CollapseProject inlines it into each and codegen re-evaluates the
    # md5 per reference
    hashed = df.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(_hash60(F.col(key_col), "hll", hash_fn))
        ).alias("__h")
    )
    h = F.col("__h")
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(rest)) + F.lit(1)
    )
    return (
        hashed.select(
            F.shiftright(h, w).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_summary(registers: DataFrame, p: int = 10) -> DataFrame:
    """One-row integer sufficient statistics of an HLL register table:
    (m, n_zero, sum_rho, t_scaled) where
    `t_scaled = n_zero * 2^(W+1) + SUM(2^(W+1 - max_rho))` is the
    harmonic denominator SUM(2^-M_j) scaled by 2^(W+1) — an exact
    BIGINT (max m * 2^51 = 2^61 at p=10), so the oracle hash never
    touches a float. `hll_estimate` turns it into the cardinality."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_summary: p must be in [4, 16], got {p}")
    m = 1 << p
    rcap = _HLL_HASH_BITS - p + 1  # max_rho's own upper bound
    return registers.agg(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_zero"),
        F.sum("max_rho").cast("long").alias("sum_rho"),
        (
            (F.lit(m) - F.count(F.lit(1)))
            * F.lit(1 << rcap)
            # SQL form: the python shiftleft() only takes a literal
            # shift; the expression form shifts by a per-row amount
            + F.sum(F.expr(f"shiftleft(1L, {rcap} - max_rho)"))
        )
        .cast("long")
        .alias("t_scaled"),
    )


def hll_estimate(t_scaled: int, n_zero: int, m: int, p: int = 10) -> float:
    """Cardinality from `hll_summary` stats. Driver-side on purpose
    (libm is not cross-engine bit-stable; the columns stay integer).
    Standard HLL: alpha_m * m^2 / SUM(2^-M_j), with the small-range
    linear-counting correction when the raw estimate <= 2.5m and empty
    registers remain. Standard error ~1.04/sqrt(m) (3.25% at p=10),
    pinned in tests."""
    rcap = _HLL_HASH_BITS - p + 1
    if m != (1 << p):
        raise ValueError(f"hll_estimate: m={m} inconsistent with p={p}")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom = t_scaled / float(1 << rcap)  # SUM(2^-M_j)
    raw = alpha * m * m / denom
    if raw <= 2.5 * m and n_zero > 0:
        return float(m) * math.log(m / float(n_zero))
    return raw


def linear_count_estimate(occupied: int, m_bits: int) -> float:
    """-m * ln(1 - occupied/m), the linear-counting estimator. Driver-
    side on purpose: libm log is not cross-engine bit-stable, so the
    estimate stays out of oracle-hashed columns. A saturated sketch
    (occupied == m) has no finite estimate — raise rather than inf."""
    if occupied >= m_bits:
        raise ValueError(
            f"linear_count_estimate: sketch saturated ({occupied}/{m_bits}) "
            "— increase m_bits"
        )
    return -float(m_bits) * math.log(1.0 - occupied / float(m_bits))


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002) per
    group: the k SMALLEST 60-bit hashes of the group's distinct keys,
    as rows (group_col, h BIGINT, rn INT with rn in [1, k]).

    Why KMV next to HLL: an HLL register table estimates ONE set's
    cardinality and merges by MAX, but supports no intersections; a
    KMV sketch is a uniform bottom-k SAMPLE of the key-hash space, so
    two sketches compose — union = k smallest of the merged sketch
    rows, Jaccard = fraction of the union sketch present in both — and
    distinct-of-intersection falls out as J * |A u B|. That set
    algebra (the Theta-sketch trick) is what audience-overlap /
    contamination-overlap questions need at 100 TB, where the exact
    answer is a full distinct-intersection shuffle per pair.

    Determinism: hashes are `md5_hash60` (the repo's replay contract),
    so a SQL oracle reproduces every row bit-for-bit; no floats
    anywhere (the estimate lives driver-side in `kmv_estimate`).

    Scale: one distinct on (group, h) with map-side partial combine,
    then a rank confined to each group's DISTINCT hash set — the only
    full-width pass is the distinct every exact pipeline pays anyway.
    Output is bounded by k rows per group regardless of input size,
    and two sketches of the SAME set merge by re-ranking their row
    union (asserted in tests alongside the HLL/count-min merge laws).
    """
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    from pyspark.sql import Window

    h = _hash60(F.col(key_col), "kmv", hash_fn)
    hashes = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(group_col, "h", F.col("rn").cast("int").alias("rn"))
    )


def kmv_pair_stats(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """Set algebra over every unordered group pair of a `kmv_sketch`
    table: for each (grp_a < grp_b) —

      size_a, kth_a   : A's sketch row count and k-th (max) hash
      size_b, kth_b   : same for B
      union_size      : rows in the union sketch (k smallest distinct
                        hashes of A's rows + B's rows; < k only when
                        |A u B| < k, in which case it is exact)
      union_kth       : the union sketch's max hash
      inter_in_union  : union-sketch hashes present in BOTH A and B —
                        the Jaccard numerator (denominator union_size)

    All columns BIGINT; `kmv_estimate` converts (size, kth) to a
    cardinality and the Jaccard ratio to an intersection estimate
    driver-side. Everything here runs on sketch rows (<= k per group),
    so the pair join is over a bounded relation no matter the input —
    the shuffles are sketch-row-sized, never data-sized.
    """
    from pyspark.sql import Window

    a = sketch.select(
        F.col(group_col).alias("grp_a"),
        F.col("h").alias("h"),
    )
    b = sketch.select(
        F.col(group_col).alias("grp_b"),
        F.col("h").alias("h_b"),
    )
    # every A-row against every B-group (and vice versa): the union
    # relation per pair is A's rows + B's rows, tagged by side
    pairs = (
        a.select("grp_a").distinct()
        .join(b.select("grp_b").distinct(), F.col("grp_a") < F.col("grp_b"))
    )
    rows_a = pairs.join(a, "grp_a").select("grp_a", "grp_b", "h",
                                           F.lit(1).alias("in_a"),
                                           F.lit(0).alias("in_b"))
    rows_b = pairs.join(
        b.withColumnRenamed("h_b", "h"), "grp_b"
    ).select("grp_a", "grp_b", "h",
             F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        rows_a.unionByName(rows_b)
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    union_sk = merged.withColumn("urn", F.row_number().over(w)).where(
        F.col("urn") <= k
    )
    per_side = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("size"),
        F.max("h").alias("kth"),
    )
    stats = union_sk.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).cast("long").alias("union_size"),
        F.max("h").alias("union_kth"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias(
            "inter_in_union"
        ),
    )
    sa = per_side.select(
        F.col(group_col).alias("grp_a"),
        F.col("size").alias("size_a"),
        F.col("kth").alias("kth_a"),
    )
    sb = per_side.select(
        F.col(group_col).alias("grp_b"),
        F.col("size").alias("size_b"),
        F.col("kth").alias("kth_b"),
    )
    return (
        stats.join(F.broadcast(sa), "grp_a")
        .join(F.broadcast(sb), "grp_b")
        .select(
            "grp_a", "grp_b", "size_a", "kth_a", "size_b", "kth_b",
            "union_size", "union_kth", "inter_in_union",
        )
    )


def kmv_estimate(size: int, kth: int, k: int) -> float:
    """Distinct-count estimate from a KMV sketch's (size, kth): when
    the sketch saturated (size == k) the estimate is (k-1) * 2^60 /
    kth — the classic unbiased bottom-k estimator over the hash
    space; when size < k the sketch IS the distinct hash set and the
    count is exact. Driver-side on purpose (float division stays out
    of oracle-hashed columns); relative error ~1/sqrt(k-2), pinned in
    tests."""
    if size < k:
        return float(size)
    if kth <= 0:
        raise ValueError(f"kmv_estimate: kth must be positive, got {kth}")
    return (k - 1) * float(1 << 60) / float(kth)
