"""Rank fusion for hybrid retrieval.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009): given
N ranked lists, each document scores SUM over lists of 1/(k0 + rank).
Curation/eval pipelines rank with a fusion of a lexical ranker (BM25)
and a semantic ranker (ANN cosine); RRF is the standard scoreless
combiner — it needs only the ranks, so heterogeneous score scales
(integer micro-BM25 vs rounded cosine) never have to be calibrated.

Exactness contract (the integer-ppm discipline): the reciprocal is
computed in integer NANO units by INTEGER DIVISION —
``1000000000 div (k0 + rank)`` — so every contribution is an exact
BIGINT in both engines (floor division of positive ints), the fused
score is an exact integer SUM (associative, order-free), and the
DuckDB oracle replays it with ``1000000000 // (k0 + rank)`` bit for
bit. No float reciprocals, no summation-order noise.

Scale shape: ranker outputs are top-N lists (bounded by contract —
rankers already cut to their N), so the fusion input is |lists| x N
rows: one hash aggregate on the id, and the final rank is a window
over <= |lists| x N rows. At 100 TB the expensive work lives in the
rankers; fusion is free by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_NANO = 1_000_000_000


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k0: int = 60,
    top_k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse named ranked lists by reciprocal-rank fusion.

    Each input DataFrame must carry (`id_col`, ``rank``) with rank
    starting at 1. Returns one row per fused document:
    (`id_col`, rank_<name> per input — NULL where that ranker did not
    retrieve the document, ``rrf_nano`` = the exact integer RRF score,
    ``rank`` = the fused position), top_k rows by
    (rrf_nano DESC, id ASC).
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    if k0 < 1 or top_k < 1:
        raise ValueError(f"rrf_fuse: k0/top_k must be >= 1, got {k0}/{top_k}")
    # Fail fast on non-integral ids (ADVICE r14): a silent cast to
    # long would NULL every string doc id and collapse all documents
    # into one fused NULL group instead of erroring.
    integral = ("tinyint", "smallint", "int", "bigint")
    for name, df in rankings.items():
        dt = df.schema[id_col].dataType.simpleString()
        if dt not in integral:
            raise TypeError(
                f"rrf_fuse: ranker {name!r} has non-integral "
                f"{id_col!r} ({dt}); map document ids to BIGINT "
                "before fusing"
            )
    parts = [
        df.select(
            F.col(id_col).cast("long").alias(id_col),
            F.lit(name).alias("__ranker"),
            F.col("rank").cast("long").alias("__rank"),
        )
        for name, df in rankings.items()
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    contrib = F.expr(f"{RRF_NANO} div ({int(k0)} + __rank)")
    fused = u.groupBy(id_col).agg(
        F.sum(contrib).alias("rrf_nano"),
        *[
            F.max(
                F.when(F.col("__ranker") == name, F.col("__rank"))
            ).alias(f"rank_{name}")
            for name in rankings
        ],
    )
    # global window: bounded by contract (|rankings| x top-N fused
    # candidates), same class as the rankers' own final cut
    w = Window.orderBy(F.desc("rrf_nano"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select(
            id_col,
            *[f"rank_{name}" for name in rankings],
            "rrf_nano",
            "rank",
        )
    )
