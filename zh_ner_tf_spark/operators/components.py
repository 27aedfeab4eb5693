"""Connected components for entity canonicalization — hand-rolled
alternating large-star/small-star iterative joins (no graphframes in the
environment; SURVEY.md §4.2).

Algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", public): maintain parent pointers p(v); alternate

  large-star: for each edge (u,v): link max(u,v) -> min over neighborhood
  small-star: symmetric for smaller neighbors

Variant used here: min-label propagation WITH pointer jumping — each
iteration takes (a) the min over neighbors' labels and (b) compresses one
parent hop by joining the new labels through the previous label map.
Step (b) is the star-operation's essential move: label chains halve every
round, so convergence is O(log diameter) rounds, not O(diameter) — the
same asymptotics the alternating large-star/small-star schedule achieves,
with a simpler emission rule. Verified against a sequential union-find on
random graphs, a 200-node path, a degree-300 star, and bridged cliques.

Scale notes:
  * each iteration = one shuffle keyed on node id (groupBy min) — map-side
    combinable; AQE coalesces the tail.
  * ``localCheckpoint`` per iteration truncates the lineage so the plan
    does not grow O(iterations) (driver OOM killer at scale otherwise).
  * the convergence test is a driver-side count() — an intentional sync
    point, one scalar per iteration.
  * giant-component skew: the groupBy key is the NODE, not the label, so
    a giant component does NOT create a hot key; label-side skew only
    appears in the final groupBy(label) materialization, which callers
    salt via operators/skew.py when needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """edges(src, dst) undirected -> (node, component) with component =
    min node id in the component. Isolated nodes appear iff present as a
    self-loop or in the edge list."""
    # localCheckpoint: sym participates in EVERY iteration's join; without
    # truncation its full upstream lineage (e.g. the shingle->MinHash->band
    # self-join in mentions_to_graph) would re-execute O(iterations) times.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # propagate: candidate label for each node = min over neighbors'
        # current labels (plus its own)
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # path compression: component -> its own current label
        compressed = (
            new_labels.alias("l")
            .join(
                labels.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("parent"),
                ).alias("p"),
                "component",
                "left",
            )
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("parent"), F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint()
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = compressed
        if changed == 0:
            break
    return labels


def canonicalize(
    entities: DataFrame,
    edges: DataFrame,
    key_col: str = "entity_id",
) -> DataFrame:
    """Assign every entity a canonical id: its component min-id if it
    appears in the similarity graph, else itself (singleton)."""
    comp = connected_components(edges)
    return (
        entities.join(
            comp.withColumnRenamed("node", key_col), key_col, "left"
        )
        .withColumn("canon_id", F.coalesce("component", F.col(key_col)))
        .drop("component")
    )
