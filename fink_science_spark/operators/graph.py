"""Connected components — near-dup clustering over a pair graph.

Dedup pipelines end with clustering: MinHash/SimHash emit near-dup PAIRS;
keeping one canonical document per duplicate CLUSTER requires the
connected components of that pair graph. This is the engine's one
genuinely iterative algorithm (not SQL-expressible in one pass).

Implementation: min-label propagation on DataFrames — every node starts
labeled with itself; each round joins labels across edges (both
directions) and takes the elementwise min; converges when no label
changes. Rounds are O(graph diameter); near-dup graphs are
small-diameter by construction (clusters are quasi-cliques: band
collisions connect most members directly), so a handful of rounds
suffices at any scale. Each round is one shuffle join + one aggregate;
``localCheckpoint`` cuts the growing lineage so round N's plan does not
re-execute rounds 1..N-1 (the standard iterative-DataFrame pattern,
GraphX-style large-star/small-star being the asymptotic upgrade for
adversarial diameters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    is the minimum node id in the node's connected component.

    Deterministic, exact for graphs whose diameter ≤ max_iter (asserted:
    raises if propagation has not converged — silent wrong answers are
    worse than failures).

    ``shuffle_partitions`` scopes the per-round shuffle width to the pair
    graph's size for the duration of the loop: near-dup graphs are orders
    of magnitude smaller than the corpus, and a batch-sized shuffle width
    pays fixed per-partition overhead every round."""
    from fink_science_spark.streaming.shell import scoped_shuffle_partitions

    if shuffle_partitions is not None:
        spark = edges.sparkSession
        with scoped_shuffle_partitions(spark, shuffle_partitions):
            return connected_components(edges, src, dst, max_iter, None)

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # candidate labels flowing along edges: neighbor's current label
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )
