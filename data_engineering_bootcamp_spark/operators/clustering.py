"""Near-duplicate cluster resolution: connected components over a pair
list, and cluster-based retention (keep one document per component).

Large-scale dedup pipelines don't drop pairs — they drop documents:
pairwise near-dup output (minhash_lsh / ngram-jaccard / simhash) is
resolved into connected components and one representative per component
is retained. This operator closes that loop.

Algorithm: iterative min-label propagation (the Pregel-style baseline
of the large-star/small-star family, Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014). Each vertex starts
labeled with its own id; every iteration each vertex takes the min of
its label and its neighbors' labels; convergence is reached when no
label changes. Iterations are bounded by the component diameter — for
near-dup clusters (cliques and short chains) that is typically 2-4 —
and each iteration is one shuffle (groupBy vertex) over the EDGE list,
never the corpus. The driver loop's only job is the convergence check
(a count of changed labels, one scalar per iteration).

Determinism: labels are ids, min is total, result is independent of
execution order — a DuckDB recursive-CTE oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns (doc_id, cluster_id) for every vertex that appears in at
    least one pair, where cluster_id is the MINIMUM vertex id of the
    component. Raises if max_iter passes without convergence (a
    diameter larger than max_iter — raise the bound for pathological
    chain graphs; near-dup graphs converge in a handful).
    """
    edges = (
        pairs.select(
            F.col(src_col).cast("long").alias("a"),
            F.col(dst_col).cast("long").alias("b"),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # undirected: keep both directions so one groupBy sees all neighbors
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist()
    # Lineage discipline (the textbook iterative-Spark requirement):
    # every iteration's result is eagerly localCheckpoint'ed, which
    # materializes it AND truncates lineage — otherwise plan depth (and
    # planning time) grows per iteration and any downstream action
    # would replay the whole iteration chain. The convergence check
    # then reads the checkpointed blocks, one scalar per iteration.
    prev = (
        sym.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            # candidate label per vertex: min over self and neighbors
            neighbor_min = (
                sym.join(
                    prev.withColumnRenamed("doc_id", "b").withColumnRenamed(
                        "cluster_id", "nb_label"
                    ),
                    "b",
                )
                .groupBy(F.col("a").alias("doc_id"))
                .agg(F.min("nb_label").alias("nb_label"))
            )
            updated = (
                prev.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("cluster_id"),
                        F.coalesce(F.col("nb_label"), F.col("cluster_id")),
                    ).alias("cluster_id"),
                    (
                        F.coalesce(F.col("nb_label"), F.col("cluster_id"))
                        < F.col("cluster_id")
                    ).alias("_changed"),
                )
                .localCheckpoint(eager=True)
            )
            changed = updated.where(F.col("_changed")).count()
            prev = updated
            if changed == 0:
                return updated.drop("_changed")
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    finally:
        sym.unpersist()


def neardup_retention(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
) -> DataFrame:
    """Cluster-based dedup retention: every document with its component
    and keep-flag. Docs in no pair are their own singleton cluster and
    kept; in a multi-doc component only the minimum id survives.

    Output: (doc_id, cluster_id, keep).
    """
    comp = connected_components(pairs, src_col, dst_col)
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return (
        ids.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )
