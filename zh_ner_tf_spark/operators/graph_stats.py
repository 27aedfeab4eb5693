"""Graph analytics over constructed graphs — co-occurrence edge
construction, degree tables, triangle counting, integer-lattice
PageRank, and k-hop neighborhood extraction.

The KG-construction pipeline materializes two graph families this
module analyzes: the MinHash-LSH near-dup candidate graph over
documents (operators/blocking.py) and the mention co-occurrence graph
over extracted entities (nodes = typed mentions, edges weighted by the
number of documents in which both appear). Degree and triangle
statistics are the standard first-line structure probes on both — hub
detection on the co-occurrence graph, cluster-density sanity on the
dedup graph.

Scale shapes (the part that matters at 10^12 docs):

- ``cooccurrence_edges`` fans out per GROUP (document), so its cost is
  bounded by (mentions per doc)^2 — a per-row constant — never by
  corpus-wide node frequency; the aggregation that follows is a plain
  hash shuffle on the pair key with map-side combine.
- ``triangle_counts`` uses the degree-ordered orientation (each
  undirected edge directed from its lower-(degree, id) endpoint):
  every wedge is generated at its lowest-ranked vertex, which bounds
  the self-join fan-out per vertex by O(sqrt(m)) on any graph — the
  classic compact-forward bound — instead of letting a single hub
  vertex generate degree^2 wedge candidates. The triangle SET is
  orientation-invariant, which is what makes the operator exactly
  oracle-checkable against a plain ordered three-way SQL join.
- ``pagerank_integer`` is the standard join/aggregate PageRank (one
  hash shuffle on the destination key per iteration, map-side
  combinable sums) but carried on an INTEGER lattice: scores are
  BIGINT multiples of 1/scale and every step is integer `div`, so the
  result is bit-exact at any parallelism and on any engine — no
  float-summation-order nondeterminism to tolerance away. Iterations
  are unrolled (a handful suffices for the ranking use downstream),
  and the symmetrized edge list + degree table are localCheckpointed
  once and reused by every iteration.
- ``khop_neighborhood`` expands a seed frontier one hop at a time
  with the standard BFS discipline: the frontier is DEDUPLICATED (a
  hub reached by 10^6 paths enters the next expansion once, not 10^6
  times) and already-visited nodes are ANTI-JOINED out (earlier
  layers never re-expand). min-hop labels come from a final groupBy
  over the per-hop frontier unions.

All arithmetic is integer/string comparisons in JVM expressions — no
UDFs, no floats — so every output here is exact across engines.

Reference: the reference repo has no graph analytics; this is graft
extension infrastructure (BASELINE.json north_rule: canonicalization +
graph materialize imply a graph worth inspecting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    group_col: str = "doc_id",
    node_col: str = "node",
) -> DataFrame:
    """(group, node) membership rows -> weighted undirected co-occurrence
    edges ``(node_a, node_b, n_groups)`` with ``node_a < node_b`` and
    ``n_groups`` = number of distinct groups containing both nodes.

    Membership is deduplicated per group first, so a node mentioned
    five times in one document still contributes one membership — edge
    weights count GROUPS, not mention multiplicity. The within-group
    self-join keys on ``group_col`` (co-partitioned by construction:
    one shuffle produces both sides), and the ``node_a < node_b``
    predicate keeps each unordered pair once."""
    nodes = df.select(group_col, node_col).distinct()
    a = nodes.select(
        F.col(group_col).alias("_g"), F.col(node_col).alias("node_a")
    )
    b = nodes.select(
        F.col(group_col).alias("_g"), F.col(node_col).alias("node_b")
    )
    return (
        a.join(b, "_g")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


def degree_table(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Undirected degree per node from an edge-pair DataFrame ->
    ``(node, degree)``. Edges are symmetrized and deduplicated first,
    so a pair listed in both orders (or repeated) still counts one
    neighbor. With ``nodes`` (a one-column DataFrame named ``node``),
    the output covers that node universe with degree 0 for isolated
    nodes — the stable-row-set form a downstream join wants."""
    deg = (
        _sym_edges(pairs, src, dst)
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    if nodes is None:
        return deg
    return (
        nodes.join(deg, "node", "left")
        .select("node", F.coalesce("degree", F.lit(0)).alias("degree"))
    )


def triangle_counts(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts -> ``(node,
    n_triangles)`` over every node incident to at least one edge
    (isolated nodes have no triangles by definition and are omitted —
    pass the output through a left join for a fixed node universe).

    Algorithm (compact-forward): canonicalize the undirected edge set,
    orient each edge from its lower (degree, node) endpoint to the
    higher, enumerate wedges at the lowest-ranked vertex of each
    triangle only (self-join of the oriented edges on their source,
    second endpoints rank-ordered), and close each wedge against the
    oriented edge set. Each triangle is found exactly once, and the
    per-vertex wedge fan-out is bounded by the oriented out-degree,
    which the degree ordering caps at O(sqrt(m)) — a hub of degree d
    generates O(sqrt(m)) wedge candidates here versus O(d^2) for a
    naive enumeration. Both joins are hash equi-joins on node keys;
    no broadcast is required (edges join edges) and no step is
    quadratic in a hot node's degree."""
    # localCheckpoint: the canonical edge set is referenced by the
    # degree computation, both orientation joins, the wedge self-join
    # sides and the closing join — without materialization the caller's
    # whole upstream (e.g. span extraction + co-occurrence aggregation)
    # re-executes once per reference (~6x; the blocking.py precedent)
    e = (
        pairs.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = degree_table(e, "u", "v")
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("_dv"))
    ranked = e.join(du, "u").join(dv, "v")
    # rank = (degree, node): total order, so exactly one direction per edge
    lo_first = F.struct(F.col("_du"), F.col("u")) < F.struct(
        F.col("_dv"), F.col("v")
    )
    def rank(deg_col: str, node_col: str) -> F.Column:
        # uniform field names so the two CASE branches type-match
        return F.struct(
            F.col(deg_col).alias("d"), F.col(node_col).alias("n")
        )

    # oriented is referenced three times (both wedge sides + closing
    # join): materialize the m-row edge list once instead of re-running
    # the degree joins per reference
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, rank("_dv", "v"))
        .otherwise(rank("_du", "u"))
        .alias("_rank_b"),
    ).localCheckpoint()
    e1 = oriented.select("a", F.col("b").alias("b1"), F.col("_rank_b").alias("_r1"))
    e2 = oriented.select("a", F.col("b").alias("b2"), F.col("_rank_b").alias("_r2"))
    wedges = e1.join(e2, "a").filter(F.col("_r1") < F.col("_r2"))
    # the closing edge (b1, b2) is oriented b1 -> b2 because rank(b1) <
    # rank(b2): one equi-join closes every wedge
    closing = oriented.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedges.join(closing, ["b1", "b2"]).select("a", "b1", "b2")
    contrib = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b1").alias("node")))
        .union(tri.select(F.col("b2").alias("node")))
    )
    counts = contrib.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # deg already holds exactly the incident-node universe (one row per
    # node touching an edge) — no need to re-scan e for it
    all_nodes = deg.select("node")
    return (
        all_nodes.join(counts, "node", "left")
        .select(
            "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
        )
    )


def _sym_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical symmetrized neighbor list ``(node, nb)`` — each
    undirected edge once in each direction, self-loops and duplicate
    listings dropped."""
    return (
        pairs.select(F.col(src).alias("node"), F.col(dst).alias("nb"))
        .union(pairs.select(F.col(dst).alias("node"), F.col(src).alias("nb")))
        .filter(F.col("node") != F.col("nb"))
        .distinct()
    )


def pagerank_integer(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank over an undirected edge-pair DataFrame on an integer
    lattice -> ``(node, degree, pr_scaled)`` where ``pr_scaled`` is the
    score in units of 1/``scale`` after ``iterations`` unrolled power
    steps with damping ``damping_num/damping_den``.

    Exactness by design: scores start at ``scale div n`` and every
    update is ``base + (damping_num * inflow) div damping_den`` with
    ``inflow = sum(pr div degree)`` over neighbors — BIGINT sums and
    truncating integer division only, so the result is identical at
    any partition count and reproducible verbatim in ANSI SQL
    (``//``). Quantization error vs real-valued PageRank: each
    neighbor contribution truncates up to one lattice unit, so one
    step can lose ~``damping * deg(v) / scale`` at node v and the
    total drift is O(iterations * max_degree / scale) — at scale=1e12
    that is < 1e-5 even for a 10^6-degree hub, irrelevant for the
    entity-importance ranking this feeds and worth buying bit-exact
    determinism.

    Scale shape: each iteration is one hash equi-join of the neighbor
    list against the C(=node-count)-row score table plus one
    map-side-combinable sum shuffle on the destination key — the same
    per-iteration cost as connected components, with the iteration
    count FIXED (not data-dependent). The symmetrized edge list and
    degree table are localCheckpointed once: every iteration reuses
    the materialized m-row list instead of re-running the caller's
    upstream (span extraction + co-occurrence aggregation) per step.
    Nodes here always have degree >= 1 (edge-incident universe), so
    there is no dangling-mass term.
    """
    sym = _sym_edges(pairs, src, dst).localCheckpoint()
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    # 1-row scalar aggregate, broadcast-joined — never a driver collect
    n = deg.agg(F.count(F.lit(1)).alias("_n"))
    state = (
        deg.crossJoin(F.broadcast(n))
        .select(
            "node",
            "degree",
            F.expr(f"CAST({scale} AS BIGINT) div _n").alias("pr"),
            F.col("_n"),
        )
        .localCheckpoint()
    )
    base_expr = (
        f"(CAST({damping_den - damping_num} AS BIGINT) * {scale}) "
        f"div (CAST({damping_den} AS BIGINT) * _n)"
    )
    for _ in range(iterations):
        contrib = state.select(
            F.col("node").alias("nb"), F.expr("pr div degree").alias("_c")
        )
        inflow = (
            sym.join(contrib, "nb")
            .groupBy("node")
            .agg(F.sum("_c").alias("_inflow"))
        )
        state = (
            state.join(inflow, "node", "left")
            .select(
                "node",
                "degree",
                F.expr(
                    f"({base_expr}) + (CAST({damping_num} AS BIGINT) * "
                    f"coalesce(_inflow, CAST(0 AS BIGINT))) div "
                    f"CAST({damping_den} AS BIGINT)"
                ).alias("pr"),
                "_n",
            )
            # each iteration references the previous state twice (the
            # contrib projection + the join); materialize per step so
            # the lineage stays one-iteration deep instead of
            # re-executing the whole unrolled chain per reference
            .localCheckpoint()
        )
    return state.select(
        "node", "degree", F.col("pr").alias("pr_scaled")
    )


def khop_neighborhood(
    pairs: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Minimum-hop BFS labels from a seed set over an undirected
    edge-pair DataFrame -> ``(node, hop)`` for every node within ``k``
    hops of any seed (seeds themselves at hop 0).

    ``seeds`` is a one-column DataFrame named ``node``. The frontier
    follows the standard BFS discipline: DEDUPLICATED between hops (a
    hub reachable by many paths is expanded once per hop, never once
    per path) AND already-visited nodes are anti-joined out before the
    next expansion — without that, every hop re-expands the nodes
    labeled at earlier hops (each seed re-enters via back-edges) and
    the join volume grows ~k-fold on dense graphs. Per-hop cost is one
    equi-join + one distinct + one anti-join, bounded by the NEW
    frontier, not by path multiplicity or the accumulated reach.
    min-hop labels fall out directly: a node enters exactly one layer,
    the first hop that reaches it (the final groupBy is a union-dedup
    formality).

    This is the subgraph-extraction primitive KG consumers use to cut
    an entity's context neighborhood out of the full graph before
    expensive per-subgraph work (embedding, summarization)."""
    sym = _sym_edges(pairs, src, dst).localCheckpoint()
    frontier = seeds.select("node").distinct().localCheckpoint()
    visited = frontier
    layers = [frontier.withColumn("hop", F.lit(0).cast("bigint"))]
    for hop in range(1, k + 1):
        frontier = (
            sym.join(frontier, "node")
            .select(F.col("nb").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()  # next hop + union + visited all reference it
        )
        visited = visited.union(frontier)
        layers.append(frontier.withColumn("hop", F.lit(hop).cast("bigint")))
    out = layers[0]
    for layer in layers[1:]:
        out = out.union(layer)
    return out.groupBy("node").agg(F.min("hop").alias("hop"))
