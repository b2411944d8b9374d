"""Connected components by iterative min-label propagation — the
cluster step of near-duplicate detection (pair lists → dup clusters,
each labeled by its minimum member id).

Each iteration is one join + one aggregation; convergence is checked
with a count per round (a driver action, but O(iterations) of them and
each reads only the label frame). Label frames are cached per round
and the previous round unpersisted, so lineage stays bounded. For
graphs with huge diameters use hash-to-min doubling or GraphFrames;
dup graphs are dense cliques with tiny diameters, where plain
propagation converges in 2-3 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Raises if not converged within
    ``max_iterations`` (dup graphs converge in a handful)."""
    sym = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    for _ in range(max_iterations):
        candidates = sym.join(
            labels, sym.src == labels.node
        ).select(F.col("dst").alias("node"), "component")
        new_labels = (
            labels.select("node", "component")
            .union(candidates)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iterations} iterations")
