"""Similarity search over embedding columns (BASELINE.json north star).

`cosine_topk_bruteforce` — exact top-k neighbors for a (small) query set
against the full corpus: broadcast the queries, compute the dot product
with zip_with/aggregate (JVM-side, no Python), window top-k. This is the
correctness baseline.

`cosine_topk_lsh` — the scale path: random-hyperplane LSH. Each vector
gets a `nbits`-bit signature from deterministic pseudo-random hyperplanes
(coefficients derived from xxhash64(bit, dim) — reproducible, no stored
model). Candidates = signature-prefix buckets; exact cosine re-rank
inside buckets. At 100 TB the bucket join replaces the O(corpus × query)
scan; recall tunes with nbits/prefix length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine DOUBLE, rank INT); self-pairs
    excluded. The queries side is broadcast (bounded dim table posture,
    J13) so the corpus never shuffles.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity(
                F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def neardup_embedding_cosine(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    every pair with cosine >= threshold.

    With `block_col` the pair join is restricted to equal blocks (label,
    cluster id, LSH bucket) — the 100 TB posture, where an unblocked
    self-join is quadratic. Without it this is the exact baseline: the
    norm is precomputed once per row so the pair stage does a single
    fused dot product per candidate.
    """
    base = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        (F.col(block_col) if block_col else F.lit(1)).alias("block"),
    ).withColumn("n", _norm(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("id_a"),
        F.col("b.vid").alias("id_b"),
        F.round(
            _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
        ).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)


def lsh_signature(vec: Column, dim: int, nbits: int = 16) -> Column:
    """Random-hyperplane signature as an INT bucket id.

    Hyperplane coefficients are deterministic pseudo-randoms in [-1, 1):
    xxhash64 of (bit_index * 10007 + dim_index) scaled — reproducible
    across runs and languages, no fitted model to persist.
    """
    def plane(b: int):
        return lambda d: (
            F.pmod(F.xxhash64(d * 10007 + F.lit(b)), F.lit(2000001)) - 1000000
        ).cast("double") / 1000000.0

    bits = []
    for b in range(nbits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), plane(b)),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj > 0, F.shiftleft(F.lit(1), b)).otherwise(F.lit(0))
        )
    out = bits[0]
    for bc in bits[1:]:
        out = out.bitwiseOR(bc)
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, exact cosine
    re-rank within. Same output schema as the brute-force baseline."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", lsh_signature(F.col("cv"), dim, nbits))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", lsh_signature(F.col("qv"), dim, nbits))
    c2 = c.withColumnRenamed("bucket", "cbucket")
    q2 = q.withColumnRenamed("bucket", "qbucket")
    scored = c2.join(
        F.broadcast(q2),
        (F.col("cbucket") == F.col("qbucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
