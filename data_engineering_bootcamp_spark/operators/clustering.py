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
never the corpus. The driver loop's only job is the convergence check:
labels are per-vertex monotone non-increasing, so one decimal label-sum
scalar per iteration detects the fixpoint exactly.

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
    # Materialize the (possibly expensive) pair computation EXACTLY
    # once: union branches do NOT share subexpressions, so without this
    # checkpoint each derived branch below (swap, self-loops, vertex
    # set, label init) would re-execute the caller's pair join.
    edges = (
        pairs.select(
            F.col(src_col).cast("long").alias("a"),
            F.col(dst_col).cast("long").alias("b"),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    # undirected + self-loops: both edge directions plus (v, v), so ONE
    # join+groupBy per iteration computes min(self label, neighbor
    # labels) — no separate self-preserving left join needed
    verts = (
        edges.select("a").union(edges.select(F.col("b").alias("a"))).distinct()
    )
    sym = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .union(verts.select("a", F.col("a").alias("b")))
        .persist()
    )
    # Lineage discipline (the textbook iterative-Spark requirement):
    # every iteration's labels are eagerly localCheckpoint'ed, which
    # materializes them AND truncates lineage — otherwise plan depth
    # (and planning time) grows per iteration and any downstream action
    # replays the whole iteration chain.
    #
    # Convergence: labels are per-vertex MONOTONE NON-INCREASING, so
    # the label total strictly decreases until the fixpoint — one
    # decimal-sum scalar per iteration (decimal: an id sum over a
    # 100 TB corpus overflows int64), no diff join, no change counter.
    labels = (
        verts.select(F.col("a").alias("doc_id"), F.col("a").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    prev_total = None
    try:
        for _ in range(max_iter):
            labels = (
                sym.join(
                    labels.select(
                        F.col("doc_id").alias("b"),
                        F.col("cluster_id").alias("nb_label"),
                    ),
                    "b",
                )
                .groupBy(F.col("a").alias("doc_id"))
                .agg(F.min("nb_label").alias("cluster_id"))
                .localCheckpoint(eager=True)
            )
            total = labels.agg(
                F.sum(F.col("cluster_id").cast("decimal(38,0)"))
            ).first()[0]
            if total == prev_total:
                return labels
            prev_total = total
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
