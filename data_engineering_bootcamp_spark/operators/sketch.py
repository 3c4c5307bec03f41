"""Probabilistic pre-join / cardinality sketches, exactly replayable.

Two sketch operators whose SCALE value is shuffle avoidance, built on
the repo's md5 determinism contract (`dedup.md5_hash60`) so a SQL
oracle can replay every bit:

- `bloom_prune` — Bloom-filter semi-join REDUCTION: the dimension's
  key set is compressed to an m-bit bitmap (k md5-derived positions
  per key) and broadcast; the fact side is probed in place, BEFORE any
  shuffle. At 100 TB this is the standard trick when the dim's raw
  keys exceed the autoBroadcast threshold but their bitmap (m/8 bytes,
  e.g. 8 KiB at m=2^16) never does: the fact never shuffles, only the
  sub-percent false-positive residue reaches the real join. False
  positives are BY DESIGN (the operator is a pre-reducer, not the
  join); false negatives are impossible — both sides compute identical
  positions.

- `linear_count` — linear-counting distinct sketch (Whang et al.): the
  sketch is the SET of occupied positions `md5(key) mod m`, mergeable
  across partitions/batches/days by bitmap OR — the mergeability that
  exact COUNT(DISTINCT)'s Expand plan lacks. Output is integer-only
  (occupied count, fill in ppm): the ln-based estimate
  `-m * ln(1 - fill)` is deliberately NOT a column — libm log is not
  cross-engine bit-stable (same division-only discipline as the
  tf-idf and bigram-LM scores); `linear_count_estimate` computes it
  driver-side and a unit test pins its error envelope.

Position determinism: position_i(key) =
`CAST('0x' || substr(md5('<tag>_' || i || '_' || key), 1, 15) AS
BIGINT) % m` — byte-identical in Spark (conv/substring/md5) and DuckDB.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

_MAX_M_BITS = 1 << 24  # 2 MiB bitmap — keeps the driver fetch trivially bounded


def _position(key: Column, tag: str, i: int, m_bits: int) -> Column:
    return F.pmod(
        md5_hash60(F.concat(F.lit(f"{tag}_{i}_"), key.cast("string"))),
        F.lit(m_bits),
    )


def bloom_bits(
    keys: DataFrame, key_col: str, m_bits: int, k: int, tag: str = "bloom"
) -> DataFrame:
    """Distinct set positions of the Bloom bitmap for `keys` — the
    distributed build half of `bloom_prune` (one shuffle, output
    bounded by m_bits rows)."""
    pos = F.array(
        *[_position(F.col(key_col), tag, i, m_bits) for i in range(k)]
    )
    return keys.select(F.explode(pos).alias("pos")).distinct()


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Fact rows that MIGHT match the dim key set (Bloom membership).

    Build: `bloom_bits` over the dim keys (one bounded shuffle),
    fetched to the driver (≤ m_bits rows by construction, enforced),
    packed into an m-bit numpy mask, broadcast. Probe: the k probe
    positions are computed JVM-side (md5/conv inside codegen — no
    per-row Python hashing), then ONE vectorized Arrow stage does the
    pure numpy mask lookups. The fact side is never shuffled and never
    hashed in Python row-at-a-time.

    Returns the fact columns unchanged, filtered to Bloom-passing rows
    (true matches plus the false-positive residue — feed this into the
    real join)."""
    if m_bits > _MAX_M_BITS:
        raise ValueError(
            f"bloom_prune: m_bits={m_bits} exceeds {_MAX_M_BITS} — the "
            "bitmap is a broadcast driver artifact by contract; shard "
            "the dim or use a plain shuffled semi join"
        )
    import numpy as np

    bits = bloom_bits(dim, dim_key, m_bits, k).collect()  # ≤ m_bits rows
    mask = np.zeros(m_bits, dtype=bool)
    mask[np.fromiter((r.pos for r in bits), dtype=np.int64, count=len(bits))] = True
    bc = fact.sparkSession.sparkContext.broadcast(mask)

    out_cols = list(fact.columns)
    pcols = [f"__bp{i}" for i in range(k)]
    probed = fact.withColumns(
        {
            p: _position(F.col(fact_key), "bloom", i, m_bits)
            for i, p in enumerate(pcols)
        }
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as _np

        bmask = bc.value
        for pdf in batches:
            keep = _np.ones(len(pdf), dtype=bool)
            for p in pcols:
                keep &= bmask[pdf[p].to_numpy()]
            yield pdf.loc[keep, out_cols]

    return probed.mapInPandas(run, schema=fact.schema)


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
        .select(_position(F.col(key_col), "lc", 0, m_bits).alias("pos"))
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
