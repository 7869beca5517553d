"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate detection emits PAIRS (minhash/simhash/embedding candidates,
``operators/similarity.py``); deduplication needs CLUSTERS — keep one
document per connected component of the pair graph. This is the step between
LSH and the actual delete list in every production dedup pipeline.

Spark has no recursive SQL, so components are computed by iterative
min-label propagation: every node starts labeled with itself; each round a
node takes the min of its own and its neighbors' labels; converged when no
label changes. Rounds = graph diameter (near-dup clusters are shallow — a
handful of rounds). Each round is one join + one aggregate;
``localCheckpoint`` truncates the lineage so the plan doesn't grow with the
iteration count (the classic iterative-algorithm trap on Spark).

At billion-edge scale the same loop holds (it is the GraphX/GraphFrames
propagation pattern); the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond") halves round counts on
high-diameter graphs but is unnecessary for shallow dedup clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_keep_list"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node of the undirected pair graph, where
    ``component`` is the minimum node id reachable from ``id`` — a canonical,
    deterministic cluster key.

    Converges in O(diameter) rounds; raises if ``max_iter`` rounds don't
    converge (a dedup pair graph that deep signals a degenerate bucket
    upstream — fix max_bucket there, don't spin here).
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' current labels
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "degenerate pair graph (raise max_bucket guards upstream)"
    )


def dedup_keep_list(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """From near-dup pairs to the keep/drop decision: one row per clustered
    node with its component and ``keep`` = (id == component) — the smallest
    id in each cluster survives, everything else is the delete list.
    Documents with no pair at all never appear (they are trivially kept)."""
    cc = connected_components(edges, src, dst)
    return cc.select(
        "id", "component", (F.col("id") == F.col("component")).alias("keep")
    )
