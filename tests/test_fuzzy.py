"""Unit tests for the PassJoin fuzzy edit-distance self-join:
hand-built edit cases, a brute-force DP cross-check on a
pseudo-random corpus, and the degenerate short-string edges."""

import pyspark.sql.functions as F
import pytest

from data_engineering_bootcamp_spark.operators.fuzzy import fuzzy_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, d):
    return sorted(
        (ia, ib, _lev(sa, sb))
        for ia, sa in rows
        for ib, sb in rows
        if ia < ib and _lev(sa, sb) <= d
    )


def _got(spark, rows, d):
    df = spark.createDataFrame(rows, "fid long, name string")
    return sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(df, "fid", "name", d).collect()
    )


def test_fuzzy_join_edit_kinds(spark):
    # substitution, insertion, deletion — each once at start/middle/end
    rows = [
        (0, "kitten"),
        (1, "mitten"),    # sub at start, d=1
        (2, "kittex"),    # sub at end, d=1
        (3, "kitteny"),   # insert at end, d=1
        (4, "kittn"),     # delete in middle, d=1
        (5, "sitting"),   # the classic d=3
        (6, "kitten"),    # exact duplicate -> dist 0 pair
    ]
    assert _got(spark, rows, 1) == _brute(rows, 1)
    assert _got(spark, rows, 2) == _brute(rows, 2)
    assert _got(spark, rows, 3) == _brute(rows, 3)
    # the d=3 set must include the kitten/sitting pair
    assert (0, 5, 3) in _got(spark, rows, 3)
    # dist-0 duplicate pair present at every threshold
    assert (0, 6, 0) in _got(spark, rows, 1)


def test_fuzzy_join_matches_bruteforce_random(spark):
    # deterministic pseudo-random corpus over a tiny alphabet so near
    # pairs are common; lossless blocking must equal the DP ground
    # truth exactly at several thresholds
    import random

    rng = random.Random(42)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(3, 9))))
        for i in range(60)
    ]
    for d in (1, 2):
        assert _got(spark, rows, d) == _brute(rows, d), f"d={d}"


def test_fuzzy_join_short_and_empty_strings(spark):
    rows = [(0, ""), (1, "a"), (2, "b"), (3, "ab"), (4, "xyz")]
    assert _got(spark, rows, 1) == _brute(rows, 1)
    assert _got(spark, rows, 2) == _brute(rows, 2)
    # null ids and null strings are excluded, not crashed on
    df = spark.createDataFrame(
        [(0, "aa"), (1, None), (None, "ab"), (2, "ab")],
        "fid long, name string",
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_join(df, "fid", "name", 1).collect()
    )
    assert got == [(0, 2, 1)]


def test_fuzzy_join_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(0, "a")], "fid long, name string")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(df, "fid", "name", 0)
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(df, "fid", "name", 9)


def test_hll_accuracy_and_merge_law(spark):
    from data_engineering_bootcamp_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
        hll_summary,
    )

    n = 20000
    df = spark.createDataFrame([(i,) for i in range(n)], "u long")
    regs = hll_registers(df, "u", p=10)
    s = hll_summary(regs, p=10).collect()[0]
    assert s.m == 1024
    est = hll_estimate(s.t_scaled, s.n_zero, s.m, p=10)
    # standard error 1.04/sqrt(1024) = 3.25%; allow 4 sigma
    assert abs(est - n) / n < 0.13
    # duplicates do not move the sketch
    dup = df.union(df).union(df)
    s2 = hll_summary(hll_registers(dup, "u", p=10), p=10).collect()[0]
    assert (s2.t_scaled, s2.n_zero, s2.sum_rho) == (
        s.t_scaled, s.n_zero, s.sum_rho,
    )
    # merge law: register-wise MAX of two halves == whole
    lo = spark.createDataFrame([(i,) for i in range(0, n, 2)], "u long")
    hi = spark.createDataFrame([(i,) for i in range(1, n, 2)], "u long")
    merged = (
        hll_registers(lo, "u", p=10)
        .unionByName(hll_registers(hi, "u", p=10))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    sm = hll_summary(merged, p=10).collect()[0]
    assert (sm.t_scaled, sm.n_zero, sm.sum_rho) == (
        s.t_scaled, s.n_zero, s.sum_rho,
    )


def test_hll_small_range_and_validation(spark):
    from data_engineering_bootcamp_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
        hll_summary,
    )
    import pytest as _pytest

    # tiny cardinality lands in the linear-counting correction and
    # must still be within a few percent
    df = spark.createDataFrame([(i,) for i in range(100)] + [(None,)],
                               "u long")
    s = hll_summary(hll_registers(df, "u", p=10), p=10).collect()[0]
    est = hll_estimate(s.t_scaled, s.n_zero, s.m, p=10)
    assert abs(est - 100) / 100 < 0.10
    with _pytest.raises(ValueError, match="p must be"):
        hll_registers(df, "u", p=3)
    with _pytest.raises(ValueError, match="inconsistent"):
        hll_estimate(s.t_scaled, s.n_zero, 512, p=10)


def test_png_ahash_matches_closed_form():
    from data_engineering_bootcamp_spark.operators.multimodal import (
        encode_png_rgb,
        png_ahash,
    )

    # 8x16 black/white pattern: the mean-threshold bit equals pixel
    # whiteness while the white count stays in [1, 63]
    d = 123
    w, h = 8, 16
    px = bytearray()
    for y in range(h):
        for x in range(w):
            white = ((d * 31 + y * 7 + x * 13) % 97) < 48
            px.extend((255, 255, 255) if white else (0, 0, 0))
    hi, lo = png_ahash(encode_png_rgb(w, h, px), grid=8)
    want_hi = want_lo = 0
    for r in range(8):
        for c in range(8):
            if ((d * 31 + (2 * r) * 7 + c * 13) % 97) < 48:
                i = r * 8 + c
                if i < 32:
                    want_lo |= 1 << i
                else:
                    want_hi |= 1 << (i - 32)
    assert (hi, lo) == (want_hi, want_lo)
    # solid image: no pixel exceeds the mean -> zero hash
    solid = bytearray((90, 90, 90)) * (w * h)
    assert png_ahash(encode_png_rgb(w, h, bytes(solid)), grid=8) == (0, 0)


def test_ahash_pairs_pigeonhole_lossless(spark):
    from data_engineering_bootcamp_spark.operators.multimodal import (
        ahash_neardup_pairs,
    )
    import pytest as _pytest

    # pseudo-random 64-bit hashes plus planted near-dups; banded result
    # must equal all-pairs ground truth at hamming <= 3
    import random

    rng = random.Random(7)
    hashes = {i: rng.getrandbits(64) for i in range(40)}
    hashes[100] = hashes[0]                      # hamming 0
    hashes[101] = hashes[1] ^ 0b101              # hamming 2 (word 0)
    hashes[102] = hashes[2] ^ (0b111 << 40)      # hamming 3 (word 1)
    hashes[103] = hashes[3] ^ 0b1111             # hamming 4 -> excluded
    rows = [
        (i, (v >> 32) & 0xFFFFFFFF, v & 0xFFFFFFFF)
        for i, v in hashes.items()
    ]
    df = spark.createDataFrame(
        rows, "media_id long, hash_hi long, hash_lo long"
    )
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in ahash_neardup_pairs(df, 3).collect()
    )
    want = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    )
    assert got == want
    assert (0, 100, 0) in got and (1, 101, 2) in got and (2, 102, 3) in got
    assert all(p[:2] != (3, 103) for p in got)
    with _pytest.raises(ValueError, match="pigeonhole"):
        ahash_neardup_pairs(df, 4)


def test_hamming_join_matches_bruteforce(spark):
    # random equal-width corpus, d=1 and d=2, vs a brute-force O(n^2)
    # Hamming ground truth computed in Python
    import random

    from data_engineering_bootcamp_spark.operators.fuzzy import hamming_join

    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(6))) for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["id", "s"])

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    for d in (1, 2):
        truth = {
            (a_id, b_id, ham(a, b))
            for a_id, a in rows
            for b_id, b in rows
            if a_id < b_id and ham(a, b) <= d
        }
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in hamming_join(df, "id", "s", max_dist=d).collect()
        }
        assert got == truth


def test_hamming_join_constant_prefix_is_not_quadratic(spark):
    # the TPC-H shape: constant literal prefix + zero-padded dense ids.
    # Correctness here; the 37x face-off lives in scale_bench.
    from data_engineering_bootcamp_spark.operators.fuzzy import hamming_join

    rows = [(i, f"Customer#{i:09d}") for i in range(1, 400)]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r.id_a, r.id_b)
        for r in hamming_join(df, "id", "s", max_dist=1).collect()
    }
    truth = {
        (a, b)
        for a, _ in rows
        for b, _ in rows
        if a < b
        and sum(x != y for x, y in zip(f"{a:09d}", f"{b:09d}")) == 1
    }
    assert got == truth


def test_hamming_join_rejects_mixed_width_and_degenerate_width(spark):
    import pytest

    from data_engineering_bootcamp_spark.operators.fuzzy import hamming_join

    mixed = spark.createDataFrame([(1, "ab"), (2, "abc")], ["id", "s"])
    with pytest.raises(ValueError, match="equal-width"):
        hamming_join(mixed, "id", "s", max_dist=1)
    tiny = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    with pytest.raises(ValueError, match="cross join"):
        hamming_join(tiny, "id", "s", max_dist=1)


def test_hamming_join_empty_input(spark):
    from data_engineering_bootcamp_spark.operators.fuzzy import hamming_join

    df = spark.createDataFrame([], "id long, s string")
    assert hamming_join(df, "id", "s", max_dist=1).count() == 0
