"""Deterministic content-hash sampling / dataset splitting.

A 100 TB training pipeline needs samples and train/holdout splits that
are (a) reproducible run-to-run, (b) independent of partitioning,
cluster layout, and row order, and (c) consistent across engines so an
offline oracle can audit them. `DataFrame.sample()` / `rand()` give
none of that (seeded RNG is tied to partition layout). Hashing a stable
business key does: a row is in the sample iff the md5 of its key falls
below `fraction` of the hash space.

The comparison runs on the md5 HEX STRING prefix, not a parsed integer:
fixed-length lowercase hex compares lexicographically exactly like the
value it encodes, the expression stays in whole-stage codegen, and the
identical predicate runs verbatim in DuckDB/any SQL engine — which is
what makes the split exactly auditable.

Spark-first notes: the predicate is a narrow map-side filter — no
shuffle, pushes through projections; adding `salt` derives independent
samples from the same keys (feature-holdout vs eval-holdout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of hash space: granularity 2^-32 ≈ 2.3e-10


def _threshold_hex(fraction: float) -> str:
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = round(fraction * (16 ** _HEX_DIGITS))
    if thr >= 16 ** _HEX_DIGITS:
        # fraction ~1.0: the natural threshold needs 9 hex digits,
        # which breaks the fixed-width lexicographic compare (the
        # 8-char bucket 'ffffffff' sorts BEFORE '100000000', silently
        # keeping ~1/16 of rows). 'g' sorts after every hex string in
        # any engine's binary collation, so `bucket < 'g'` keeps all.
        return "g"
    return format(thr, f"0{_HEX_DIGITS}x")


def sample_bucket(key: Column, salt: str = "") -> Column:
    """The 8-hex-char md5 prefix of (key || salt) — the sampling
    coordinate. Exposed so callers can bucket once and derive several
    splits from it."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HEX_DIGITS
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep the deterministic `fraction` of rows whose key hashes lowest.

    Same key ⇒ same verdict, always: re-runs, new cluster layouts, and
    other engines all select the identical row set.
    """
    return df.where(
        sample_bucket(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """(train, test) partition by hash threshold: exhaustive and
    disjoint by construction — every row lands in exactly one side."""
    thr = F.lit(_threshold_hex(test_fraction))
    bucket = sample_bucket(F.col(key_col), salt)
    return df.where(bucket >= thr), df.where(bucket < thr)


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic fixed-size sample PER GROUP: the `k` rows of each
    group whose keys hash lowest (md5 order, ties broken by the key).

    The distributed form of reservoir sampling with none of its
    nondeterminism: membership depends only on (group, key, salt), so
    re-runs, engines, and cluster layouts agree — and unlike
    `sampleBy` there is no fraction-guessing to hit an exact per-group
    count. One shuffle (the window partition); the rank column is
    dropped so downstream unions are schema-stable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        sample_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sample of exactly `k` rows — priority sampling
    (Duffield–Lund–Thorup; Ohlsson's "sequential Poisson sampling"):
    each row draws a uniform `u` and gets priority ``q = u / w``; the
    `k` smallest priorities are the sample, giving inclusion
    probability ≈ proportional to weight with the scheme's
    near-optimal variance guarantees. The importance sampler a
    training pipeline uses to oversample high-quality documents.

    Deterministic and ORACLE-EXACT by construction, unlike textbook
    implementations that draw `rand()`:
      - `u` is the md5_hash60 integer of (key || salt) — uniform on
        [0, 2^60), reproducible in any engine
        (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)` in DuckDB);
      - the priority is ONE IEEE-double division of that integer by
        the weight — division is a correctly-rounded IEEE 754 op, so
        every engine computes the bit-identical double (this is why
        the classic Efraimidis–Spirakis key ``u^(1/w)`` is NOT used:
        pow/ln are not correctly rounded and may differ in the last
        ulp across libm implementations);
      - ties (same rounded priority) break on the key.

    Scale shape: the priority is a narrow map-side expression; the
    top-k runs as TakeOrderedAndProject (per-partition heaps of k,
    single reduce) — no global sort, no shuffle of the full input.
    Weights must be >= 1 (integer); enforce upstream with
    ``greatest(w, 1)`` — a zero weight divides to Infinity and can
    never be sampled, which is usually not what "weight 0" means.

    The weight is long-cast ONCE and that single value feeds both the
    emitted ``_w`` column and the priority divisor (ADVICE r12: the
    earlier form divided by the RAW double weight while reporting the
    truncated long as ``_w``, so a fractional weight silently broke
    the oracle-replay contract for any caller that reports ``_w`` —
    now a fractional weight truncates consistently in both places,
    and the documented integer contract is what actually executes).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .dedup import md5_hash60

    u = md5_hash60(
        F.concat(F.col(key_col).cast("string"), F.lit(salt))
    )
    wl = weight.cast("long")
    pri = (u.cast("double") / wl.cast("double")).alias("_pri")
    return (
        df.withColumn("_w", wl)
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").asc(), F.col(key_col).asc())
        .limit(k)
    )


def weighted_mix(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    rate_pct: Column,
    salt: str = "",
) -> DataFrame:
    """Corpus-mixing sampler: keep a per-group PERCENTAGE of rows,
    with the quota computed in integer arithmetic so every engine
    agrees on the cutoff exactly.

    ``rate_pct`` is an integer-percent column/expression (0..100)
    that must be functionally determined by ``group_cols`` (e.g. a
    per-source mixing weight à la Pile/Dolma source proportions).
    quota = ceil(n_rows * rate_pct / 100) computed as
    ``(n * pct + 99) DIV 100`` — no floating point, no engine skew.
    Membership = the quota rows whose keys md5-hash lowest (same
    deterministic coordinate as `stratified_sample`, so mixes are
    reproducible across runs, engines, and cluster layouts).

    Plan shape: one window shuffle on the group key computes BOTH the
    per-group count and the rank in a single pass — no separate
    count+join, no broadcast needed, no second shuffle.
    """
    from pyspark.sql import Window

    wrank = Window.partitionBy(*group_cols).orderBy(
        sample_bucket(F.col(key_col), salt), F.col(key_col)
    )
    wall = Window.partitionBy(*group_cols)
    qnum = (
        F.count(F.lit(1)).over(wall) * rate_pct.cast("long") + 99
    ).cast("long")
    return (
        df.withColumn("_rk", F.row_number().over(wrank))
        .withColumn("_qnum", qnum)
        # TRUE integer division (SQL `div`), matching the documented
        # `(n * pct + 99) DIV 100` contract exactly at any magnitude —
        # the earlier double Divide + floor was exact only while
        # n * pct stayed far below 2^53
        .where(F.col("_rk") <= F.expr("_qnum div 100"))
        .drop("_rk", "_qnum")
    )
