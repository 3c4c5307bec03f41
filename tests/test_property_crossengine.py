"""Property tests for the cross-engine determinism invariants the exact
oracles rest on (hypothesis; no SparkSession — pure Python vs DuckDB).

The approximate-query oracles (simhash_pairs, ann_cosine_lsh,
ann_cosine_ivf) are only sound if both engines compute bit-identical
hashes/coefficients and compatible rounding; these pin each identity
over arbitrary inputs rather than the few values the catalog happens to
exercise.
"""

import hashlib
import math

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_con = duckdb.connect()


def _py_md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_md5_hash60_matches_duckdb(s):
    # surrogates can't round-trip through UTF-8; md5 operates on bytes
    try:
        s.encode()
    except UnicodeEncodeError:
        return
    got = _con.execute(
        "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [s]
    ).fetchone()[0]
    assert got == _py_md5_60(s)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 4095), st.integers(0, 255))
def test_md5_plane_coefficient_matches_duckdb(p, d):
    # similarity.md5_planes formula == the ORACLE_ANN_LSH planes CTE
    hx = int(hashlib.md5(f"lsh_{p}_{d}".encode()).hexdigest()[:8], 16)
    py = hx / 2147483648.0 - 1.0
    got = _con.execute(
        "SELECT CAST('0x' || substr(md5('lsh_' || ? || '_' || ?), 1, 8)"
        "  AS BIGINT) / 2147483648.0 - 1.0",
        [p, d],
    ).fetchone()[0]
    assert got == py  # exact double equality, not approx


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, (1 << 60) - 1),
    st.lists(st.integers(0, 59), min_size=0, max_size=3),
)
def test_simhash_pigeonhole_blocking_exact(fp, flips):
    # any pair within Hamming <= 3 of a 60-bit fingerprint shares at
    # least one of the 4 15-bit chunks — the blocked candidate set is
    # therefore EXACTLY the brute-force pair set the oracle computes
    other = fp
    for b in set(flips):
        other ^= 1 << b
    chunks = lambda x: [(x >> (i * 15)) & 0x7FFF for i in range(4)]
    assert any(a == b for a, b in zip(chunks(fp), chunks(other)))


@settings(max_examples=300, deadline=None)
@given(st.floats(-1.0, 1.0, allow_nan=False))
def test_half_away_rounding_matches_duckdb(x):
    got = _con.execute("SELECT ROUND(?::DOUBLE, 6)", [x]).fetchone()[0]
    mine = float(np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6)
    assert math.isclose(got, mine, abs_tol=1.1e-6)
    # representable-boundary cases must agree exactly away from ties
    if abs(x * 1e6 - round(x * 1e6)) > 1e-9:
        assert got == mine


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789 .,"),
        min_size=40,
        max_size=160,
    )
)
def test_winnow_pipeline_matches_duckdb(raw):
    # the whole rolling-hash fingerprint pipeline (normalize → Rabin-
    # Karp gram hash → window minima → distinct-set stats), numpy vs
    # the ORACLE SQL, over arbitrary inputs
    import pandas as pd

    from data_engineering_bootcamp_spark.operators.fingerprint import (
        B,
        K,
        M,
        W,
        winnow_oracle_sql,
    )

    import re

    s = re.sub("[^a-z0-9]", "", raw.lower())
    sql = winnow_oracle_sql().replace(
        "FROM documents", "FROM (SELECT 1 AS doc_id, ? AS text)"
    )
    got = _con.execute(sql, [raw]).fetchall()
    if len(s) < K + W - 1:
        assert got == []
        return
    pows = np.array([pow(B, K - 1 - j, M) for j in range(K)], dtype=np.int64)
    b = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
    n = len(b) - K + 1
    h = np.zeros(n, dtype=np.int64)
    for j in range(K):
        h += b[j : j + n] * pows[j]
    h %= M
    mins = pd.Series(h).rolling(W).min().to_numpy()[W - 1 :].astype(np.int64)
    fps = np.unique(mins)
    assert got == [
        (1, len(fps), int(np.bitwise_xor.reduce(fps)), int(fps[0]))
    ]


def _impl_prefix(sorted_side, num, den):
    # the implementation's prefix length, same exact integer arithmetic
    # as dedup._ngram_jaccard_prefix: s - ceil(s*num/den) + 1
    s = len(sorted_side)
    return sorted_side[: s - (s * num + den - 1) // den + 1]


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_prefix_filter_theorem(data):
    # the losslessness of dedup.py's prefix-filtered similarity join:
    # for ANY global total order and ANY pair that passes the operator's
    # final filter round(J, 6) >= t, the implementation's prefixes
    # (exact rational bound via _rational_threshold — floats here over-
    # prune at t in {0.1, 0.2, ...}) share at least one element.
    from data_engineering_bootcamp_spark.operators.dedup import (
        _rational_threshold,
    )

    t = data.draw(st.sampled_from([0.1, 0.2, 0.3, 0.5, 0.7, 0.8]))
    universe = list(range(60))
    a = data.draw(st.sets(st.sampled_from(universe), min_size=1, max_size=40))
    b = data.draw(st.sets(st.sampled_from(universe), min_size=1, max_size=40))
    jac = len(a & b) / len(a | b)
    if round(jac, 6) < t:  # the operator's final (float) filter
        return
    num, den = _rational_threshold(t)
    # random global order, modeled as a permutation
    perm = data.draw(st.permutations(universe))
    rank = {v: i for i, v in enumerate(perm)}
    sa = sorted(a, key=rank.get)
    sb = sorted(b, key=rank.get)
    pa = _impl_prefix(sa, num, den)
    pb = _impl_prefix(sb, num, den)
    assert set(pa) & set(pb), (sorted(a), sorted(b), t)


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_positional_filter_theorem(data):
    # the PPJoin positional filter keeps at least one prefix collision
    # for every qualifying pair: at the FIRST shared element's positions
    # (p_a, p_b), 1 + min(s_a - p_a, s_b - p_b) >= ceil(t' * (s_a+s_b)
    # / (1+t')) with t' = num/den, and that element is in both prefixes
    from data_engineering_bootcamp_spark.operators.dedup import (
        _rational_threshold,
    )

    t = data.draw(st.sampled_from([0.1, 0.2, 0.3, 0.5, 0.7, 0.8]))
    universe = list(range(60))
    a = data.draw(st.sets(st.sampled_from(universe), min_size=1, max_size=40))
    b = data.draw(st.sets(st.sampled_from(universe), min_size=1, max_size=40))
    if not (a & b) or round(len(a & b) / len(a | b), 6) < t:
        return
    num, den = _rational_threshold(t)
    perm = data.draw(st.permutations(universe))
    rank = {v: i for i, v in enumerate(perm)}
    sa = sorted(a, key=rank.get)
    sb = sorted(b, key=rank.get)
    first = min(a & b, key=rank.get)
    p_a, p_b = sa.index(first) + 1, sb.index(first) + 1  # 1-based like row_number
    assert first in _impl_prefix(sa, num, den)
    assert first in _impl_prefix(sb, num, den)
    s_ab = len(a) + len(b)
    alpha = (s_ab * num + num + den - 1) // (num + den)
    assert 1 + min(len(a) - p_a, len(b) - p_b) >= alpha, (
        sorted(a), sorted(b), t, first, p_a, p_b, alpha
    )


@settings(max_examples=300, deadline=None)
@given(
    st.sampled_from([0.3, 0.5, 0.8]),
    st.integers(1, 10_000),
    st.integers(1, 10_000),
)
def test_length_block_theorem(t, sa, sb):
    # the co-bucketing guarantee of the length-blocked path: any pair
    # whose sizes can reach J >= t (t <= sa/sb <= 1/t) lands in a
    # shared bucket under the {k, k+1} double assignment
    if not (t <= sa / sb <= 1 / t):
        return
    k = lambda s: math.floor(math.log(max(s, 1)) / math.log(1 / t))
    assert {k(sa), k(sa) + 1} & {k(sb), k(sb) + 1}, (t, sa, sb)


@settings(max_examples=150, deadline=None)
@given(st.integers(-(2**40), 2**40), st.integers(0, 3), st.integers(6, 22))
def test_bloom_double_hash_positions_match_duckdb(key, i, log_m):
    # sketch._positions: one md5 -> (h1 = h >> 30, step = 2*(h & mask)+1),
    # pos_i = (h1 + i*step) % m — the identity both bloom oracles replay
    m = 1 << log_m
    h = _py_md5_60(f"bloom_{key}")
    py = ((h >> 30) + i * (2 * (h & ((1 << 30) - 1)) + 1)) % m
    got = _con.execute(
        "WITH t AS (SELECT CAST('0x' || substr(md5('bloom_' || "
        "CAST(? AS VARCHAR)), 1, 15) AS BIGINT) AS h) "
        "SELECT ((h // 1073741824) + ? * (2 * (h % 1073741824) + 1)) % ? "
        "FROM t",
        [key, i, m],
    ).fetchone()[0]
    assert got == py


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60), st.integers(0, 3), st.integers(4, 14))
def test_countmin_cell_positions_match_duckdb(token, i, log_w):
    try:
        token.encode()
    except UnicodeEncodeError:
        return
    w = 1 << log_w
    py = _py_md5_60(f"cm{i}_{token}") % w
    got = _con.execute(
        "SELECT CAST('0x' || substr(md5('cm' || CAST(? AS VARCHAR) || '_' "
        "|| ?), 1, 15) AS BIGINT) % ?",
        [i, token, w],
    ).fetchone()[0]
    assert got == py


def _py_zorder(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_zorder_interleave_matches_generated_sql(x, y):
    # the generated expression in ORACLE_ZORDER_LOCALITY_STATS must
    # equal the canonical bit interleave for every 16-bit dim pair
    from data_engineering_bootcamp_spark.plans.catalog_mix import _zorder_sql

    got = _con.execute(
        f"SELECT {_zorder_sql(str(x), str(y))}"
    ).fetchone()[0]
    assert got == _py_zorder(x, y, 16)
    # bijectivity on the sampled pair: decode back
    z = got
    dx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (dx, dy) == (x, y)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(1, 400),  # k0
    st.integers(1, 200),  # rank
)
def test_rrf_integer_reciprocal_matches_duckdb(k0, rank):
    # rank_fusion.rrf_fuse's exact-integer contract: Spark's BIGINT
    # `div` and DuckDB's `//` must agree on every (k0, rank) — both
    # are floor division of positive ints, so the fused score is an
    # order-free integer sum in both engines
    py = 1_000_000_000 // (k0 + rank)
    got = _con.execute(
        "SELECT 1000000000 // (? + ?)", [k0, rank]
    ).fetchone()[0]
    assert got == py


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_utf8_hex_segmentation_matches_duckdb(s):
    # spaced_utf8_bytes' base-vocab contract (byte-level BPE): the
    # hex dump of the UTF-8 bytes, spaced per byte, must be identical
    # in Python (= what Spark's hex(encode(..)) produces, verified in
    # test_rank) and DuckDB's hex(encode(..)) + regexp spacing
    try:
        b = s.encode()
    except UnicodeEncodeError:
        return
    py = " ".join(f"{x:02X}" for x in b)
    got = _con.execute(
        r"SELECT trim(regexp_replace(hex(encode(?)), '(..)', '\1 ', 'g'))",
        [s],
    ).fetchone()[0]
    assert got == py
