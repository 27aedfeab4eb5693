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
    point, one scalar per iteration. The changed flag is computed INSIDE
    the compression projection (the old label rides the propagate
    aggregate as one extra carried column), so the probe is a filter +
    limit over the just-checkpointed labels — no extra join of two full
    label tables per iteration (VERDICT r6).
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

    comp_type = labels.schema["component"].dataType
    for _ in range(max_iter):
        # propagate: candidate label for each node = min over neighbors'
        # current labels (plus its own). The node's OLD label rides the
        # aggregate as `_old` (labels contributes exactly one non-null
        # `_old` row per node, and every nbr node exists in labels), so
        # the convergence probe below needs no old-vs-new join.
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
            .withColumn("_old", F.lit(None).cast(comp_type))
        )
        new_labels = (
            labels.withColumn("_old", F.col("component"))
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max("_old").alias("_old"),
            )
        )
        # path compression: component -> its own current label; the
        # changed flag is part of the same projection
        new_comp = F.least(
            F.col("component"), F.coalesce(F.col("parent"), F.col("component"))
        )
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
                new_comp.alias("component"),
                (new_comp != F.col("_old")).alias("_changed"),
            )
            # LAZY checkpoint (r9): the plan truncation happens
            # immediately (same O(log d) lineage bound as before), but
            # materialization rides the convergence probe's own count —
            # ONE job per iteration where eager+probe paid two. The
            # probe is the checkpoint's only first consumer, so there
            # is no concurrent-materialization race; any partitions the
            # probe's limit short-circuits past are computed (and then
            # cached) on the next iteration's first full pass.
        ).localCheckpoint(eager=False)
        changed = compressed.filter(F.col("_changed")).limit(1).count()
        labels = compressed.drop("_changed")
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
