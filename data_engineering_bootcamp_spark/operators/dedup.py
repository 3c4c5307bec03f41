"""Deduplication operators for training-data pipelines.

Reference-derived:
  dedup_exact      — GROUP BY all columns (A14, funnel_analysis.sql:1-6)
  dedup_keep_first — ROW_NUMBER() keep rn=1 with priority ordering
                     (W3/W4, team_vertices.sql:1-16;
                     M2/homework/assignmnet_2.sql:47-67)

Scale additions (BASELINE.json north star — LLM-data pipeline):
  dedup_minhash_lsh   — char-shingle → MinHash signature → banded LSH
                        bucket join → Jaccard verify
  dedup_simhash       — 64-bit SimHash near-dup fingerprint
  dedup_ngram_jaccard — blocked pairwise n-gram Jaccard

Shingling and banding are pure Catalyst expressions (higher-order array
functions, xxhash64); the MinHash signature itself is an Arrow-batched
vectorized pandas UDF — Spark's interpreted higher-order functions cost
~100x more per element than one numpy pass, and the signature is the
per-document hot loop. The only shuffles are the LSH bucket groupBys.
At 100 TB the banded-LSH plan is the standard near-dup architecture:
candidate generation touches only bucket-colliding pairs instead of the
O(n²) cross join.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .partitioning import fan_out

# Mersenne prime 2^31-1: universal-hash modulus. Kept below 2^31 so
# (x % P) * a + b stays inside a signed 64-bit long (no overflow).
_P = (1 << 31) - 1

# Intermediates persisted by the near-dup operators (signature/shingle
# blocks feed multiple join sides, so they must be cached for the
# lifetime of the returned DataFrame). Callers own that lifetime: call
# `release_caches()` once the results are materialized, or a long-lived
# session running the catalog repeatedly accumulates storage until
# eviction pressure degrades other queries.
_CACHED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every DataFrame cached by the dedup operators; returns
    how many were released. Safe to call at any time AFTER the returned
    pair DataFrames have been materialized (collected/written)."""
    n = 0
    while _CACHED:
        _CACHED.pop().unpersist()
        n += 1
    return n


def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A14: exact dedup via GROUP BY all (cols defaults to every column)."""
    return df.dropDuplicates(cols)


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """W3/W4: keep the best row per key under a priority ordering.

    The reference's deterministic-tie-breaker requirement
    (assignment_2_feedback.md §2) is the caller's duty: make order_by a
    total order (end with a unique id).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# near-dup machinery
# ---------------------------------------------------------------------------

def _norm_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def _shingles_of_norm(norm: Column, k: int = 5) -> Column:
    """Distinct k-char shingle hashes (ARRAY<BIGINT>) of already-
    normalized text.

    `norm` MUST be a plain column reference, not a compound expression:
    it is referenced once per character position inside the transform
    lambda, and Catalyst inlines (re-evaluates) the full expression at
    every reference — passing `_norm_text(...)` directly here runs the
    regex once per shingle and is ~7x slower end-to-end. Callers
    project the normalized text into a column first.
    """
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    subs = F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    return F.array_distinct(F.transform(subs, lambda s: F.xxhash64(s)))


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-char shingle hashes of raw text (convenience form —
    inlines normalization per element; prefer projecting `_norm_text`
    to a column and calling `_shingles_of_norm` in hot paths)."""
    return _shingles_of_norm(_norm_text(text), k)


def _shingle_hash_udf(k: int = 5):
    """Arrow-batched distinct k-CHAR shingle hashes of already-
    normalized text: one vectorized rolling polynomial hash over the
    codepoint array (utf-32 decode → numpy uint64 wraparound) instead
    of ~len(text) interpreted substr+xxhash64 expression evaluations
    per document. At sf0.1 the cold run is session/codegen-dominated
    either way; the win is per-row cost at real scale, where the
    interpreted HOF is ~100x the numpy pass per element.

    Codepoints, NOT bytes: the oracle's Jaccard is over char-5-gram
    sets and the corpus is multilingual, so byte shingles would change
    set sizes on non-ASCII text. The hash FAMILY differs from the
    expression form (polynomial vs xxhash64) — irrelevant by contract:
    MinHash needs only a stable 64-bit id per distinct shingle, and
    Jaccard over ids equals Jaccard over shingles modulo ~n²/2⁻⁶⁴
    collisions, exactly as before."""
    from pyspark.sql.functions import pandas_udf

    base = 1099511628211  # FNV-64 prime as the polynomial base
    powers = np.array(
        [pow(base, k - 1 - j, 2 ** 64) for j in range(k)], dtype=np.uint64
    )

    @pandas_udf("array<bigint>")
    def sh(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            cp = np.frombuffer(
                (s or "").encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            n = len(cp) - k + 1
            if n < 1:
                # shorter than one shingle: the whole text is the
                # single shingle (substr-clamp semantics of the
                # expression form / the oracle)
                h = np.uint64(0)
                for v in cp:
                    h = h * np.uint64(base) + v
                out.append(np.array([h], dtype=np.uint64).view(np.int64))
                continue
            h = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                h += cp[j : j + n] * powers[j]
            out.append(np.unique(h).view(np.int64))
        return pd.Series(out)

    return sh


def minhash_signature(shingle_hashes: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: min over shingles of (a_i*x + b_i) mod P for
    `num_hashes` fixed universal-hash functions (ARRAY<BIGINT>)."""
    def perm(a: int, b: int):
        return lambda x: (F.pmod(x, F.lit(_P)) * a + b) % _P

    sig = []
    for i in range(num_hashes):
        # deterministic multipliers/offsets derived from the index
        a = ((2 * i + 1) * 2654435761) % _P or 1
        b = (i * 0x85EBCA6B + 0xC2B2AE35) % _P
        sig.append(F.array_min(F.transform(shingle_hashes, perm(a, b))))
    return F.array(*sig)


def _minhash_sig_udf(num_hashes: int = 64):
    """Arrow-batched MinHash signature: bit-identical to
    `minhash_signature` (same universal-hash constants; all arithmetic
    stays below 2^62 so JVM long and numpy int64 agree), but one
    vectorized numpy pass instead of 64 interpreted higher-order-function
    passes per document — the HOF version is the pipeline bottleneck
    (~8s of a 17s sf0.1 run; the UDF does the same work in <1s)."""
    from pyspark.sql.functions import pandas_udf

    A = np.array(
        [((2 * i + 1) * 2654435761) % _P or 1 for i in range(num_hashes)],
        dtype=np.int64,
    )
    B = np.array(
        [(i * 0x85EBCA6B + 0xC2B2AE35) % _P for i in range(num_hashes)],
        dtype=np.int64,
    )
    prime = _P

    @pandas_udf("array<bigint>")
    def sig(shingles: pd.Series) -> pd.Series:
        out = []
        for sh in shingles:
            x = np.asarray(sh, dtype=np.int64) % prime  # == F.pmod: nonneg
            m = ((x[None, :] * A[:, None] + B[:, None]) % prime).min(axis=1)
            out.append(m)
        return pd.Series(out)

    return sig


def _intersect_size_udf():
    """Arrow-batched |A ∩ B| for two distinct-element hash arrays.

    The exact-Jaccard verify is the MinHash pipeline's second hot loop:
    array_intersect/array_union are interpreted per element (~1.8 ms on
    a 2 KB shingle pair), while one numpy sorted-intersection pass is
    ~10x cheaper. Only the integer intersection size crosses back —
    the division and F.round stay JVM-side so the result is bit-
    identical to the expression form (and the DuckDB oracle).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def inter(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.int32)
        for i in range(len(a)):
            out[i] = np.intersect1d(
                np.asarray(a.iloc[i], dtype=np.int64),
                np.asarray(b.iloc[i], dtype=np.int64),
                assume_unique=True,
            ).size
        return pd.Series(out)

    return inter


def _parse_byte_size(v: str | int) -> int:
    """Parse a Spark size conf value ('10MB', '10485760b', 1048576, or
    '-1' meaning disabled) into bytes."""
    if isinstance(v, int):
        return v
    s = v.strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


def _signature_base(
    src: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_k: int,
) -> DataFrame:
    """(id_col, shingles, sig) — normalize → shingle → MinHash
    signature. SINGLE SOURCE OF TRUTH for the projection shared by the
    batch near-dup join and the streaming admission join: an edit to
    the normalization, shingling, or signature here changes batch and
    streaming in lockstep (they previously carried verbatim copies)."""
    return (
        src.select(F.col(id_col), _norm_text(F.col(text_col)).alias("_norm"))
        .select(
            id_col, _shingle_hash_udf(shingle_k)(F.col("_norm")).alias("shingles")
        )
        .withColumn("sig", _minhash_sig_udf(num_hashes)(F.col("shingles")))
    )


def _band_posexplode(sig_col: Column, num_hashes: int, bands: int):
    """posexplode(band → xxhash64(signature slice)) — the one banding
    expression both batch and streaming relations are built from."""
    rows_per_band = num_hashes // bands
    return F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(
                F.slice(sig_col, b * rows_per_band + 1, rows_per_band)
            ),
        )
    )


def minhash_banded(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """(id_col, shingles, band, band_hash) — the banded-LSH projection
    shared by the batch near-dup join and the STREAMING admission join
    (stream-static LSH). Pure projections + Arrow-batched pandas UDFs,
    so it works identically on batch and streaming DataFrames (fan_out
    is batch-only and skipped for streams — a stream's partitioning
    follows its source). Built from `_signature_base` +
    `_band_posexplode`, the same helpers `dedup_minhash_lsh` uses."""
    src = docs if docs.isStreaming else fan_out(docs)
    base = _signature_base(src, id_col, text_col, num_hashes, shingle_k)
    return base.select(
        id_col,
        "shingles",
        _band_posexplode(F.col("sig"), num_hashes, bands).alias(
            "band", "band_hash"
        ),
    )


def dedup_minhash_lsh(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
    broadcast_verify: bool | None = None,
    cache_signatures: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs.

    Pipeline: shingle → signature → split into `bands` bands → hash each
    band → explode → groupBy band bucket → intra-bucket pair join →
    exact-Jaccard verify on shingle sets → distinct pairs above threshold.

    Output: (doc_id_a, doc_id_b, jaccard DOUBLE), doc_id_a < doc_id_b.
    """
    # projection barriers: normalize once per doc, shingle once per doc
    # (vectorized codepoint rolling hash — see _shingle_hash_udf).
    # Same `_signature_base` the streaming admission path uses; only
    # the downstream shape differs (the id-only banded relation below
    # keeps the persisted base un-exploded — persisting minhash_banded's
    # output would store the shingle arrays `bands`× over).
    base = _signature_base(
        fan_out(docs).select(F.col(id_col).alias("doc_id"), text_col),
        "doc_id",
        text_col,
        num_hashes,
        shingle_k,
    )
    # the signature subplan feeds BOTH sides of the candidate self-join
    # plus the verify side; without a persist Spark re-evaluates it up
    # to 3x (AQE broadcasts the small join side, so no exchange reuse).
    # ~(2 KB shingles + 512 B sig)/doc: ~2.5 GB per million docs,
    # spilling to executor disk beyond memory — far cheaper than the
    # triple recompute, and it halves the wall clock here.
    if cache_signatures:
        base = _persist(base)

    # Candidate generation carries ONLY (doc_id, band, band_hash): when
    # background similarity makes bands collide broadly, the pair set is
    # quadratic in bucket size, so pair rows must stay at id width (16 B)
    # until after dropDuplicates — shuffling the shingle arrays through
    # the pair join is what kills this at scale (multi-GB per 1M pairs).
    banded = base.select(
        "doc_id",
        _band_posexplode(F.col("sig"), num_hashes, bands).alias(
            "band", "band_hash"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )

    # Exact-Jaccard verification: join the deduped id pairs back to the
    # compact (doc_id, shingles) side. Broadcasting that side keeps the
    # arrays out of the shuffle and makes the verify stage map-side, but
    # its size scales with the CORPUS (not the candidate volume), so the
    # choice must be size-based, not a flag: with the default
    # broadcast_verify=None we measure the persisted signature relation
    # (one aggregate over the cache) and broadcast only when the
    # estimate fits the session's autoBroadcastJoinThreshold; past it —
    # or when the threshold is -1 — the verify stage is a shuffled equi
    # join on doc_id. Pass True/False to force either plan.
    sh = base.select("doc_id", "shingles")
    if broadcast_verify is None and not cache_signatures:
        # without the cache the measurement pass would recompute every
        # signature; default to the scale-safe shuffled join instead
        broadcast_verify = False
    if broadcast_verify is None:
        est = base.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.size("shingles")), F.lit(0)).alias("tot"),
        ).first()
        # 8 B per shingle hash + ~64 B per-row overhead
        est_bytes = int(est["tot"]) * 8 + int(est["n"]) * 64
        thr = _parse_byte_size(
            docs.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        )
        broadcast_verify = 0 <= est_bytes <= thr
    sh = F.broadcast(sh) if broadcast_verify else sh
    verified = (
        cand.join(
            sh.select(
                F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a")
            ),
            "doc_id_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b")
            ),
            "doc_id_b",
        )
    )
    # |A∪B| = |A| + |B| - |A∩B|: one vectorized intersection pass, the
    # union size derived JVM-side — no interpreted array_union walk
    inter = _intersect_size_udf()(F.col("sh_a"), F.col("sh_b")).cast("double")
    verified = verified.withColumn("_inter", inter)
    union = (
        F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - F.col("_inter")
    ).cast("double")
    return (
        verified.withColumn("jaccard", F.round(F.col("_inter") / union, 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def _bit_mask(i: int) -> int:
    """Literal mask for bit i of a signed 64-bit long (i=63 → sign bit)."""
    return -(1 << 63) if i == 63 else (1 << i)


def md5_hash60(col: Column) -> Column:
    """60-bit non-negative hash from the first 15 hex chars of md5.

    Cross-engine reproducible: DuckDB computes the identical value as
    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT), so operators built on
    it (SimHash fingerprints) can be verified exactly by a SQL oracle.
    xxhash64 stays the default elsewhere (faster, full 64 bits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _tokens(text: Column) -> Column:
    """Non-empty whitespace tokens of normalized text."""
    return F.filter(F.split(_norm_text(text), " "), lambda t: t != F.lit(""))


def _ngrams_of_toks(toks: Column, ngram: int = 2, hasher=F.xxhash64) -> Column:
    """Hashed word n-grams from an already-projected token column
    (same inlining hazard as _shingles_of_norm: `toks` is referenced
    per n-gram position, so it must be a plain column reference).
    `hasher` defaults to xxhash64; pass `md5_hash60` for oracle-
    reproducible fingerprints."""
    return F.when(
        F.size(toks) >= ngram,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (ngram - 1)),
            lambda i: hasher(F.concat_ws(" ", F.slice(toks, i, ngram))),
        ),
    ).otherwise(F.array(hasher(F.concat_ws(" ", toks))))


def word_ngrams(text: Column, ngram: int = 2) -> Column:
    """xxhash64'd word n-grams of raw text (convenience form; hot paths
    project `_tokens` to a column and call `_ngrams_of_toks`)."""
    return _ngrams_of_toks(_tokens(text), ngram)


def simhash_counters(grams: Column) -> Column:
    """Fold an n-gram-hash array column into 64 signed bit-counters (one
    aggregate pass over the array — no shuffle). Bit tests use literal
    masks because PySpark's shiftleft/shiftright take only literal bit
    counts. `grams` should be a projected column (see _ngrams_of_toks).
    """
    return F.aggregate(
        grams,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(h.bitwiseAND(F.lit(_bit_mask(i))) != 0, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long")
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )


def simhash_from_counters(counters: Column) -> Column:
    """Reassemble the 64 counter signs into one BIGINT fingerprint.

    Call on a materialized column (separate select from
    `simhash_counters`) so the aggregate expression isn't duplicated 64×
    in the plan.
    """
    out = F.lit(0).cast("long")
    for i in range(64):
        out = out.bitwiseOR(
            F.when(
                F.element_at(counters, i + 1) > 0, F.lit(_bit_mask(i)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    return out


def _simhash_udf(nbits: int = 64):
    """Arrow-batched SimHash: numpy port of simhash_counters +
    simhash_from_counters (bit-exact: two's-complement int64↔uint64
    views, same majority-vote bit assembly). The expression form runs
    `nbits` interpreted bit tests per n-gram per document; this is one
    vectorized pass."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def sh(grams: pd.Series) -> pd.Series:
        shifts = np.arange(nbits, dtype=np.uint64)
        out = np.empty(len(grams), dtype=np.int64)
        for j, g in enumerate(grams):
            h = np.asarray(g, dtype=np.int64).astype(np.uint64)
            bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
            counters = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            fp = ((counters > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64
            )
            out[j] = fp.astype(np.int64)
        return pd.Series(out)

    return sh


def dedup_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance `max_hamming`.

    Blocking: split the fingerprint into 4 equal chunks — any pair
    within Hamming ≤ 3 shares at least one exact chunk (pigeonhole),
    so candidate generation is 4 equi-join buckets, never O(n²).

    `hash_fn` picks the n-gram hash: "md5" (default) derives a 60-bit
    fingerprint from md5 so a SQL oracle (DuckDB) can recompute it
    EXACTLY — the driver's correctness gate demands falsifiable output;
    "xxhash64" is the marginally faster 64-bit variant. Same pipeline
    shape either way.

    Fingerprints come from the vectorized `_simhash_udf`; the
    expression-form `simhash_counters`/`simhash_from_counters` pair
    remains exported as the pure-Catalyst reference implementation
    (bit-identical, used to cross-check the UDF in tests).
    """
    if max_hamming > 3:
        raise ValueError(
            f"dedup_simhash: max_hamming={max_hamming} exceeds the "
            "4-chunk pigeonhole guarantee (a pair differing in 4+ bits "
            "can place one flip per chunk and never share a block) — "
            "recall would silently degrade; split into more chunks or "
            "use MinHash for looser thresholds"
        )
    if hash_fn == "md5":
        hasher, nbits, chunk_bits = md5_hash60, 60, 15
    else:
        hasher, nbits, chunk_bits = F.xxhash64, 64, 16
    chunk_mask = (1 << chunk_bits) - 1
    base = (
        fan_out(docs).select(
            F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("_toks")
        )
        .select(
            "doc_id",
            _ngrams_of_toks(F.col("_toks"), 2, hasher=hasher).alias("_grams"),
        )
        .select("doc_id", _simhash_udf(nbits)(F.col("_grams")).alias("sh"))
    )
    # (doc_id, sh) is 16 B/row; persisting halves the pipeline cost
    # because both sides of the chunk self-join consume it
    base = _persist(base)
    # fingerprints are single longs, so unlike the MinHash path the
    # pair join can carry them inline — rows stay 32 B wide
    chunked = base.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), i * chunk_bits).bitwiseAND(
                        F.lit(chunk_mask)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = a.join(
        b,
        (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.col("a.sh").alias("sh_a"),
        F.col("b.sh").alias("sh_b"),
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        # filter on hamming BEFORE the pair dedup: the predicate is a
        # cheap map-side bit op and shrinks the distinct's shuffle to
        # just the near-dup pairs instead of every chunk collision
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        .select("doc_id_a", "doc_id_b", "hamming")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    min_overlap_ratio: float = 0.5,
    broadcast_pool: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose n-gram
    sets overlap a benchmark/eval set — the standard guard against
    test-set leakage into training data (the n-gram-overlap rule used
    by GPT-3/PaLM-style dataset curation).

    A corpus doc is contaminated when >= ``min_overlap_ratio`` of its
    distinct ``ngram``-grams appear ANYWHERE in the benchmark side
    (pooled across benchmark docs — the conservative reading: any eval
    shard can leak).

    Scale shape: the benchmark gram POOL is a distinct projection of
    single hashes — eval sets are tiny relative to the corpus by
    definition, so the pool is BROADCAST by default and the overlap
    count is a map-side semi-join over the corpus's exploded grams
    followed by a per-doc count: the 100 TB corpus never shuffles on
    the gram key, only on doc_id for the final count (map-side partial
    aggregation keeps that small). Pass ``broadcast_pool=False`` for a
    benchmark too large to broadcast (falls back to a shuffled equi
    join). No pairwise comparison, no driver collect either way.

    Output: (doc_id, n_grams, n_overlap, overlap_ratio) for
    contaminated docs only.
    """
    def gram_sets(df: DataFrame) -> DataFrame:
        return fan_out(df).select(
            F.col(id_col).alias("doc_id"),
            _tokens(F.col(text_col)).alias("_toks"),
        ).select(
            "doc_id",
            F.array_distinct(_ngrams_of_toks(F.col("_toks"), ngram)).alias(
                "grams"
            ),
        )

    # Persist both gram relations BEFORE exploding: without the
    # materialization barrier Catalyst collapses the projections and
    # the gram-building transform (the per-doc hot loop) re-evaluates
    # per EXPLODED row — measured ~10x slower on the corpus side.
    # Small: one row per doc with an array of longs. Caller releases
    # via release_caches() like the other dedup operators.
    pool = (
        _persist(gram_sets(benchmark))
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    if broadcast_pool:
        pool = F.broadcast(pool)
    corpus_grams = _persist(
        gram_sets(corpus).withColumn("n_grams", F.size("grams"))
    )
    exploded = corpus_grams.select(
        "doc_id", "n_grams", F.explode("grams").alias("gram")
    )
    overlap = (
        exploded.join(pool, "gram")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.withColumn(
            "overlap_ratio",
            F.round(F.col("n_overlap") / F.col("n_grams"), 6),
        )
        .where(F.col("overlap_ratio") >= min_overlap_ratio)
        .select("doc_id", "n_grams", "n_overlap", "overlap_ratio")
    )


def _rational_threshold(threshold: float) -> tuple[int, int]:
    """Conservative rational lower bound (num/den) for a float Jaccard
    threshold, used so every pruning bound is computed in EXACT integer
    arithmetic.

    Two float hazards make the naive ``s * threshold`` bounds lossy:
      * double repr error: ``0.1 * 30 == 3.0000000000000004`` so
        ``ceil`` over-counts and the prefix loses its last (required)
        gram — silently dropping pairs with J exactly t;
      * the final filter compares ``round(J, 6) >= t``, which admits
        pairs whose TRUE Jaccard is as low as ``t - 5e-7``; pruning
        computed at exactly t would discard their candidates.

    ``num/den = (int(t * 1e6) - 1) / 1e6`` is strictly below
    ``t - 5e-7`` (proof: int(x) <= x + eps for the float product, so
    num <= t*1e6 - 0.5), and products ``s * num`` stay below 2^53, so
    long arithmetic is exact. The looser bound only lengthens prefixes
    marginally; correctness filters still apply the caller's t.
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError("prefix/length pruning requires 0 < threshold < 1")
    den = 10**6
    num = max(1, int(threshold * den) - 1)
    return num, den


def _ngram_jaccard_prefix(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int,
    threshold: float,
) -> DataFrame:
    """Prefix-filtered exact n-gram Jaccard join with the PPJoin
    positional filter (see dedup_ngram_jaccard docstring for the
    theorem and citation; positional filter: Xiao et al., "Efficient
    Similarity Joins for Near Duplicate Detection", WWW 2008).

    Stages, all linear except the candidate join itself:
      1. gram sets per doc (+ set size s)
      2. corpus gram frequencies: a COUNT window over gram partitions
         (r17, guide §2.4 — one Exchange on the exploded relation
         attaches df to every row; the previous groupBy + join-back
         shuffled the same exploded rows by gram AND planned a second
         Exchange + sort-merge join for the frequency relation)
      3. per-doc rare-first order: window by (freq, gram); keep the
         first s - ceil(t*s) + 1 grams as the PREFIX, remembering each
         gram's position p in the sorted order
      4. candidates: equi self-join of prefixes on gram with two
         map-side pruning conditions applied inside the join:
           * size ratio — J >= t forces t <= s_a/s_b <= 1/t
           * positional (PPJoin) — a collision at positions (p_a, p_b)
             bounds the overlap by 1 + min(s_a - p_a, s_b - p_b), which
             must reach ceil(t/(1+t) * (s_a + s_b)). Lossless: for a
             qualifying pair, its FIRST shared gram in the global order
             sits in both prefixes and all other shared grams follow
             it, so that collision satisfies the bound.
      5. exact verify: join candidate id-pairs back to the compact
         (doc_id, grams) side, JVM array_intersect Jaccard, threshold.
         Shuffled equi joins on doc_id — candidate volume tracks true-
         pair volume, and the grams side scales with the corpus, so a
         broadcast here would OOM at scale (AQE may still choose one
         when the runtime sizes are small). A pair that shares K
         prefix grams is verified K times and deduplicated AFTER the
         threshold filter (r17, guide §2.3): the survivor set is
         true-pair-sized, so deduplicating it costs a shuffle of
         ~nothing, where deduplicating the raw candidate set shuffled
         the whole candidate volume to remove the few multi-collision
         repeats (measured sf0.1: 98k candidate rows -> 93k — a 5%
         reduction bought with a full-width Exchange).

    All pruning bounds use exact integer arithmetic via
    ``_rational_threshold`` — see its docstring for why floats here
    silently drop boundary pairs.
    """
    num, den = _rational_threshold(threshold)
    base = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        _tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.array_distinct(_ngrams_of_toks(F.col("_toks"), ngram)).alias("grams"),
    ).withColumn("s", F.size("grams"))
    base = _persist(base)  # feeds frequency pass, prefixes, and verify

    exploded = base.select("doc_id", "s", F.explode("grams").alias("gram"))
    # df per gram via a partition-only window: numerically identical to
    # the groupBy count (each exploded row carries its gram's corpus
    # document frequency; grams are distinct within a doc), one fewer
    # Exchange and no join — see docstring stage 2
    wg = Window.partitionBy("gram")
    w = Window.partitionBy("doc_id").orderBy("df", "gram")
    # ceil(s * num / den) in exact long arithmetic
    ceil_ts = F.expr(f"(s * {num}L + {den - 1}L) div {den}L")
    prefix = _persist(
        exploded.withColumn("df", F.count(F.lit(1)).over(wg))
        .withColumn("p", F.row_number().over(w))
        .where(F.col("p") <= F.col("s") - ceil_ts + 1)
        .select("doc_id", "s", "gram", "p")
    )
    # both sides of the candidate self-join consume `prefix`; without
    # the persist the two-window chain above is planned (and run) once
    # PER SIDE, and with it the materialization must be EAGER or the
    # two stages of one join job race to populate the cache and each
    # recompute the chain anyway (the r16 pagerank cache-race finding)
    try:
        prefix.count()
    except Exception:
        prefix.unpersist()
        raise
    # overlap lower bound: J >= t  <=>  inter >= t/(1+t) * (s_a + s_b)
    alpha = F.expr(
        f"((a.s + b.s) * {num}L + {num + den - 1}L) div {num + den}L"
    )
    overlap_ubound = F.lit(1) + F.least(
        F.col("a.s") - F.col("a.p"), F.col("b.s") - F.col("b.p")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio pruning: J >= t forces t <= s_a/s_b <= 1/t
            & (F.col("a.s") * num <= F.col("b.s") * den)
            & (F.col("b.s") * num <= F.col("a.s") * den)
            # PPJoin positional pruning
            & (overlap_ubound >= alpha),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    sh = base.select("doc_id", "grams")
    verified = cand.join(
        sh.select(F.col("doc_id").alias("doc_id_a"),
                  F.col("grams").alias("g_a")),
        "doc_id_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_id_b"),
                  F.col("grams").alias("g_b")),
        "doc_id_b",
    )
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = (F.size("g_a") + F.size("g_b") - inter).cast("double")
    return (
        verified.select(
            "doc_id_a",
            "doc_id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        # multi-collision candidates deduplicate HERE, on the
        # true-pair-sized survivor set (docstring stage 5); jaccard is
        # deterministic per pair, so repeats are identical rows
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )


def dedup_ngram_jaccard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "source",
    ngram: int = 3,
    threshold: float = 0.5,
    length_blocked: bool = False,
    prefix_filtered: bool = False,
) -> DataFrame:
    """Exact pairwise word-n-gram Jaccard similarity (lossless scale
    paths + baselines).

    Pair-generation strategies, most to least scalable:

    - ``prefix_filtered=True`` — PRIMARY 100 TB path: prefix filtering
      under a global rare-first token order (the AllPairs/PPJoin
      family, Bayardo et al. 2007). Under ANY global total order of
      grams, a pair with J(A,B) >= t must share at least one gram
      within the first ``|X| - ceil(t*|X|) + 1`` grams of each side's
      sorted set (if all shared grams sat in both suffixes, the
      intersection would be too small to reach t). Ordering grams by
      ascending corpus frequency puts RARE grams in the prefix, so
      unrelated documents almost never collide — candidate volume
      tracks true-pair volume instead of n². Lossless for any corpus
      shape, including uniform-length corpora where length blocking
      degenerates to all-pairs. Plan: linear explode + frequency agg +
      per-doc window + equi join on gram + exact verify.
    - ``length_blocked=True`` — lossless length-bucket blocking: sizes
      of a qualifying pair are within 1/t, so {k, k+1} double
      assignment on floor(log_{1/t}(size)) buckets guarantees
      co-bucketing. Cheap (no frequency pass) but only prunes when the
      length distribution is wide.
    - ``block_col`` — pairs only within caller-chosen groups (source,
      language, …). Cheap but changes results unless the caller knows
      no qualifying pair crosses groups.
    - neither — exact all-pairs broadcast-nested-loop baseline
      (oracle/verification use only; O(n²)).

    The strategies are mutually exclusive: the lossless filters are
    corpus-wide by construction, so combining them with ``block_col``
    would either silently drop the caller's restriction or silently
    change which pairs qualify — pass ``block_col=None`` with
    ``length_blocked``/``prefix_filtered`` (raises otherwise).

    Output (doc_id_a, doc_id_b, jaccard).
    """
    if block_col and (length_blocked or prefix_filtered):
        raise ValueError(
            "dedup_ngram_jaccard: block_col cannot combine with "
            "length_blocked/prefix_filtered — the lossless filters are "
            "corpus-wide; pass block_col=None (pre-filter the corpus "
            "if you need per-group pairs)"
        )
    if prefix_filtered:
        return _ngram_jaccard_prefix(
            docs, id_col, text_col, ngram, threshold
        )
    base = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        (F.col(block_col) if block_col and not length_blocked else F.lit(1)).alias(
            "block"
        ),
        _tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        "block",
        F.array_distinct(_ngrams_of_toks(F.col("_toks"), ngram)).alias("grams"),
    )
    if length_blocked:
        if not (0.0 < threshold < 1.0):
            raise ValueError("length_blocked requires 0 < threshold < 1")
        # k = floor(log_{1/t} |grams|); explode to {k, k+1}
        k = F.floor(
            F.log(F.greatest(F.size("grams"), F.lit(1)).cast("double"))
            / F.lit(math.log(1.0 / threshold))
        )
        base = base.withColumn("block", F.explode(F.array(k, k + 1)))
    base = _persist(base)  # consumed by both sides of the pair join
    a, b = base.alias("a"), base.alias("b")
    if length_blocked or block_col:
        cand = a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    else:
        # no equi key: joining on the constant block would hash every row
        # to ONE reducer. Broadcast-nested-loop instead — parallelism
        # follows the (fanned-out) left side.
        cand = a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast(
        "double"
    )
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
    out = cand.select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
        F.round(inter / union, 6).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
    if length_blocked:
        # the {k, k+1} double assignment can score a pair twice
        out = out.dropDuplicates(["doc_id_a", "doc_id_b"])
    return out


def _span_windows(
    docs: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, h) for every k-token window: the shared projection
    under `dup_spans` and `dup_span_removal` — a generator explode
    (one output row per corpus token), xxhash64 over the
    space-rejoined window, positions 1-based."""
    toks = docs.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("tk")
    ).where(F.size("tk") >= k)
    return toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (k - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(F.concat_ws(" ", F.slice("tk", i, k))).alias(
                        "h"
                    ),
                ),
            )
        ).alias("w"),
    ).select(id_col, F.col("w.pos").cast("long").alias("pos"), "w.h")


def dup_spans(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    detect: str = "window",
) -> DataFrame:
    """Exact cross-document duplicate-SPAN extraction — the
    suffix-array substring-dedup capability (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better")
    re-expressed as a distributed query: every k-token window shared
    verbatim by >= 2 DISTINCT documents, with adjacent duplicated
    windows merged into maximal spans per document (gaps-and-islands).
    Output: (id_col, span_start, span_tokens), span_start 1-based in
    token positions. "Maximal" means maximal runs of CONSECUTIVE
    duplicated window START positions: two spans of one document can
    overlap in TOKEN range when their islands sit less than k
    positions apart (e.g. duplicated windows at pos 1 and 3 with pos 2
    clean yield spans covering tokens 1-8 and 3-10). Consumers
    computing duplicated-token fractions must therefore UNION the
    token ranges, not sum span_tokens — `dup_span_removal` does
    exactly that (its positional filters union coverage), so the
    removal path is unaffected. Distinct from the whole-doc similarity
    family (MinHash/Jaccard) and from within-doc repetition stats:
    this localizes the duplicated REGION, the input a span-removal
    pass needs.

    Scale shape: window enumeration is a generator explode (one row
    per corpus token, no shuffle); cross-doc detection is ONE shuffle
    on the window hash using min!=max over a hash-partition window —
    no join-back, the position rides along; span merge is one shuffle
    on the document id. Windows are xxhash64'd (group membership is
    hash-invariant modulo ~n^2/2^64 collisions — the same contract as
    the hashed n-gram Jaccard paths). Within-one-doc repeats of a
    window that appears nowhere else are intentionally NOT flagged
    (min==max over the hash partition): cross-corpus leakage, not
    in-doc style, is what span removal targets.

    ``detect`` picks the cross-doc detection strategy: ``"window"``
    (default, the scale path — one shuffle of the token-scale wins
    relation) or ``"joinback"`` (the naive twin scale_bench races it
    against: groupBy the hash then equi-join the keys back, i.e. TWO
    full shuffles of the wins relation when the dup-key set is too
    big to broadcast). Both return identical spans.
    """
    from pyspark.sql import Window

    wins = _span_windows(docs, k, text_col, id_col)
    if detect == "window":
        byh = Window.partitionBy("h")
        hits = (
            wins.withColumn(
                "xdoc", F.min(id_col).over(byh) != F.max(id_col).over(byh)
            )
            .where("xdoc")
            .drop("xdoc")
        )
    elif detect == "joinback":
        dup_keys = (
            wins.groupBy("h")
            .agg(
                (F.min(id_col) != F.max(id_col)).alias("xdoc")
            )
            .where("xdoc")
            .select("h")
        )
        hits = wins.join(dup_keys, "h")
    else:
        raise ValueError(f"unknown detect strategy {detect!r}")
    bydoc = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(bydoc))
    return (
        isl.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(k))
            .cast("long")
            .alias("span_tokens"),
        )
        .select(id_col, "span_start", "span_tokens")
    )


def dup_span_removal(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Close the extraction -> removal loop: rebuild a cleaned corpus
    with every cross-document duplicated span cut EXCEPT in its
    canonical holder (what Lee et al. 2021 actually do after finding
    duplicated substrings — keep one occurrence, delete the rest).

    Canonical-holder rule — PER WINDOW, with keep-wins token
    arithmetic (round-6 semantics; the earlier per-island-first-window
    rule could delete a duplicated span from EVERY document when its
    holder's occurrence was absorbed into a larger island held
    elsewhere — corpus-wide content loss beyond the stated contract):

    - every occurrence of a cross-document duplicated k-token window
      is REMOVED except in the MINIMUM doc id among its holders,
      where it is PROTECTED;
    - a token is cut iff it is covered by some removed occurrence's
      range [pos, pos+k-1] AND not covered by any protected range in
      the same document (protection wins).

    The protection clause is what makes the survival guarantee hold:
    every duplicated window's k tokens survive, contiguously, in its
    min-id holder — overlapping removed windows (the adjacent
    near-boundary windows a shared span always drags along) cannot
    eat into it. The converse cost is the standard substring-dedup
    boundary effect: up to k-1 tokens adjacent to a kept window may
    also survive in a non-holder document when its protected and
    removed ranges overlap — removal never splits a protected range.

    The min-holder verdict rides the same hash-partition window pass
    that detects duplication — still no join-back on the token-scale
    relation; removed and protected ranges are compacted with ONE
    gaps-and-islands pass partitioned by (doc, verdict); the only
    join is docs LEFT JOIN the per-doc interval lists (doc-count
    sized, equi on the id).

    Output, one row per INPUT document (untouched docs included):
    (id_col, n_tokens, n_removed, clean_md5) where clean_md5 is the
    md5 of the space-rejoined surviving tokens — the strongest
    cheap cross-engine witness that the rebuilt text is identical.
    """
    from pyspark.sql import Window

    wins = _span_windows(docs, k, text_col, id_col)
    byh = Window.partitionBy("h")
    marked = wins.select(
        id_col,
        "pos",
        F.min(id_col).over(byh).alias("mn"),
        F.max(id_col).over(byh).alias("mx"),
    )
    dup = marked.where(F.col("mn") != F.col("mx")).withColumn(
        "kept", F.col(id_col) == F.col("mn")
    )
    # one island pass for both verdicts: partition by (doc, verdict)
    bydoc = Window.partitionBy(id_col, "kept").orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(bydoc))
    islands = isl.groupBy(id_col, "kept", "grp").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(k - 1)).alias("e"),
    )
    iv = F.struct("s", "e")
    ivs = islands.groupBy(id_col).agg(
        F.collect_list(F.when(~F.col("kept"), iv)).alias("rivs"),
        F.collect_list(F.when(F.col("kept"), iv)).alias("kivs"),
    )
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("tk"))
    empty_ivs = F.array().cast("array<struct<s:bigint,e:bigint>>")
    joined = (
        toks.join(ivs, id_col, "left")
        .withColumn("rivs", F.coalesce("rivs", empty_ivs))
        .withColumn("kivs", F.coalesce("kivs", empty_ivs))
    )

    def _covers(col: str, i):
        return F.exists(
            col, lambda v: (i + 1 >= v["s"]) & (i + 1 <= v["e"])
        )

    cleaned = F.filter(
        "tk", lambda x, i: ~_covers("rivs", i) | _covers("kivs", i)
    )
    return joined.select(
        id_col,
        F.size("tk").cast("long").alias("n_tokens"),
        (F.size("tk") - F.size(cleaned)).cast("long").alias("n_removed"),
        F.md5(F.concat_ws(" ", cleaned)).alias("clean_md5"),
    )
