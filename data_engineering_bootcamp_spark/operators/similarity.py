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

from .partitioning import fan_out


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With `dim` known the sum is unrolled into a plain
    arithmetic expression — Spark's higher-order functions (aggregate/
    zip_with) are interpreted per element, outside whole-stage codegen,
    and cost ~100x more per pair in hot self-joins."""
    if dim is not None:
        out = F.element_at(a, 1) * F.element_at(b, 1)
        for i in range(2, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        out = F.element_at(a, 1) * F.element_at(a, 1)
        for i in range(2, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(a, i)
        return F.sqrt(out)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine DOUBLE, rank INT); self-pairs
    excluded. The queries side is bounded by contract (J13 dim-table
    posture): it is collected once, normalized, and broadcast as a numpy
    matrix; each corpus partition scores its Arrow batch with one BLAS
    matmul and never shuffles. Per-query top-k is a JVM window over the
    (|corpus| × |queries|) scored rows. `dim` is kept for the signature
    of the JVM expression path (`cosine_similarity`)."""
    import numpy as np

    rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    q_ids = np.array([r.qid for r in rows], dtype=np.int64)
    Q = np.array([r.qv for r in rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    bc = queries.sparkSession.sparkContext.broadcast((q_ids, Q))

    def run(batches):
        # self-contained closure (executors may lack this package)
        import numpy as _np
        import pandas as _pd

        bq_ids, bQ = bc.value
        nq = len(bq_ids)
        for pdf in batches:
            c_ids = pdf["nid"].to_numpy()
            C = _np.array(list(pdf["cv"]), dtype=_np.float64)
            C /= _np.linalg.norm(C, axis=1, keepdims=True)
            S = C @ bQ.T  # (batch, nq)
            S = _np.floor(S * 1e6 + 0.5) / 1e6  # HALF_UP like F.round
            rep_c = _np.repeat(c_ids, nq)
            rep_q = _np.tile(bq_ids, len(c_ids))
            flat = S.ravel()
            keep = rep_c != rep_q
            yield _pd.DataFrame(
                {
                    "query_id": rep_q[keep],
                    "neighbor_id": rep_c[keep],
                    "cosine": flat[keep],
                }
            )

    src = fan_out(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("cv"))
    )
    scored = src.mapInPandas(
        run, schema="query_id bigint, neighbor_id bigint, cosine double"
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    every pair with cosine >= threshold.

    With `block_col` the pair join is restricted to equal blocks (label,
    cluster id, LSH bucket) — the 100 TB posture, where an unblocked
    self-join is quadratic; the join stays a JVM hash join on the block
    key with the dot product unrolled into codegen.

    Without `block_col` this is the exact all-pairs baseline, computed
    as Arrow-batched numpy: the corpus matrix is row-normalized once,
    broadcast, and each partition's batch does one BLAS matmul against
    it. A DataFrame pair self-join materializes O(n²) joined rows each
    carrying two vectors — the matmul form does the same FLOPs with no
    row explosion (3-10x faster even at 2k vectors). The corpus must fit
    in executor memory (it's the *baseline*; beyond that, block or use
    `cosine_topk_lsh`).
    """
    if block_col:
        base = fan_out(vectors).select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.col(block_col).alias("block"),
        ).withColumn("n", _norm(F.col("v"), dim))
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        pairs = joined.select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(
                _dot(F.col("a.v"), F.col("b.v"), dim)
                / (F.col("a.n") * F.col("b.n")),
                6,
            ).alias("cosine"),
        )
        return pairs.where(F.col("cosine") >= threshold)

    import numpy as np

    rows = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).collect()
    ids = np.array([r.vid for r in rows], dtype=np.int64)
    mat = np.array([r.v for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    bc = vectors.sparkSession.sparkContext.broadcast((ids, mat))
    thr = float(threshold)

    def run(batches):
        # self-contained closure (executors may lack this package)
        import numpy as _np
        import pandas as _pd

        bids, bmat = bc.value
        for pdf in batches:
            a_ids = pdf["vid"].to_numpy()
            A = _np.array(list(pdf["v"]), dtype=_np.float64)
            A /= _np.linalg.norm(A, axis=1, keepdims=True)
            S = A @ bmat.T
            # HALF_UP rounding to 6dp — matches Spark F.round / DuckDB
            S = _np.floor(S * 1e6 + 0.5) / 1e6
            out_a: list[int] = []
            out_b: list[int] = []
            out_c: list[float] = []
            for i in range(len(a_ids)):
                mask = (bids > a_ids[i]) & (S[i] >= thr)
                k = int(mask.sum())
                if k:
                    out_a.extend([int(a_ids[i])] * k)
                    out_b.extend(bids[mask].tolist())
                    out_c.extend(S[i][mask].tolist())
            yield _pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    src = fan_out(
        vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    )
    return src.mapInPandas(
        run, schema="id_a bigint, id_b bigint, cosine double"
    )


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
        F.round(cosine_similarity(F.col("qv"), F.col("cv"), dim), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
