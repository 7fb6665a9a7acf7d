"""Graph operators for dedup clustering.

Near-duplicate detection (dedup.py, similarity.py, fuzzy.py) emits
PAIRS; turning pairs into keep/drop decisions needs the transitive
closure — if A~B and B~C, all three are one duplicate cluster even when
A~C was never emitted. ``connected_components`` computes that closure
distributed, so a 100 TB dedup run can pick one canonical document per
cluster (the min-id member) instead of greedily dropping pair-by-pair
(which over- or under-deletes depending on pair order).

Algorithm: min-label flooding. Every node starts labeled with itself;
each round every node takes the min label over itself and its
neighbors; converged when no label changes. Each round is one
equi-join + one map-side-combined groupBy — both on hash-uniform id
keys — and ``localCheckpoint`` truncates the lineage so the plan
doesn't grow with iterations. Rounds needed = graph diameter, which
for dedup clusters (quasi-cliques produced by similarity thresholds)
is small and bounded; for long-chain graphs at extreme scale the
alternating large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond") drops rounds to
O(log n) at the cost of two joins per round — the flooding loop here
is the right trade for dedup-shaped graphs.

Convergence is detected with a single scalar aggregate per round
(sum of labels strictly decreases until fixpoint) — no driver-side
data collection beyond one number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    ``edges`` is undirected (symmetrized internally, self-loops
    harmless). ``nodes`` optionally supplies the full vertex set so
    isolated nodes appear as singleton components; defaults to the
    nodes present in ``edges``.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)  # reused every round: cut the source plan

    # Flood ONLY over nodes that appear in some edge. In a dedup run the
    # matched nodes are a small fraction of the corpus — iterating over
    # every document would pay |corpus| per round for rows that can
    # never change label. Isolated nodes are appended as singleton
    # components afterwards with one anti-join.
    labels = sym.select(F.col("a").alias("node")).distinct()
    labels = labels.withColumn("label", F.col("node"))

    prev_sum = None
    for _ in range(max_iter):
        neighbor = sym.join(
            labels, sym["a"] == labels["node"]
        ).select(F.col("b").alias("node"), "label")
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = labels.select("node", F.col("label").alias("component"))
    if nodes is not None:
        all_nodes = nodes.select(F.col(node_col).alias("node")).distinct()
        singletons = all_nodes.join(out, "node", "left_anti").select(
            "node", F.col("node").alias("component")
        )
        out = out.unionByName(singletons)
    return out


def component_sizes(components: DataFrame) -> DataFrame:
    """(component_size, n_components) histogram over a components frame."""
    return (
        components.groupBy("component")
        .agg(F.count(F.lit(1)).alias("component_size"))
        .groupBy("component_size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    start_mass: int = 1_000_000,
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    """Iterative PageRank in EXACT integer arithmetic — the mass-passing
    formulation that makes an iterative float algorithm byte-identical
    across engines (and therefore oracle-checkable, where classic
    double-precision PageRank would hash-mismatch on summation order):

    every node starts with ``start_mass`` integer units; per iteration
    each node sends ``(mass * 17) div (20 * out_degree)`` units down
    each out-edge (damping 17/20 = 0.85), keeps nothing, and the
    undistributed remainder — the 15% teleport share, floor-division
    residues, and ALL mass of dangling (no-out-edge) nodes — pools and
    redistributes equally as ``pool div N`` to every node. Division
    residue of the pool itself (< N units per iteration) evaporates;
    with 1e6 start units the total drift over a handful of iterations
    is parts-per-thousand — ranking-irrelevant, and determinism is
    what buys the exact cross-engine check.

    Scale shape per iteration: one broadcast-out-degree join, one
    map-side-combined groupBy(dst) — both on hash-uniform node keys —
    and a 1-row pool aggregate crossJoined back (never collected);
    ``localCheckpoint`` cuts lineage each round like
    ``connected_components``. Returns (node, mass) — rank order =
    mass desc.
    """
    # Materialize the edge list ONCE — every iteration joins it, and
    # without the cut each round would recompute the (possibly
    # expensive) edge derivation from scratch. Same lineage discipline
    # as the ranks checkpoint below.
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    n_nodes = nodes.count()  # scalar, config-cardinality driver value
    ranks = nodes.withColumn("mass", F.lit(start_mass).cast("long"))
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, "node", "left")
        # per-edge integer give; dangling nodes (null degree) give 0
        give = with_deg.select(
            F.col("node"),
            F.col("mass"),
            F.coalesce(F.col("_deg"), F.lit(0)).alias("_deg"),
            F.when(
                F.col("_deg").isNotNull(),
                F.expr(
                    f"(mass * {damping_num}) div ({damping_den} * _deg)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_give"),
        )
        contrib = (
            e.join(give.select(F.col("node").alias("_s"), "_give"), "_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("_give").alias("_in"))
        )
        pool = give.agg(
            F.sum(F.col("mass") - F.col("_give") * F.col("_deg")).alias("_pool")
        )
        share = F.expr(f"_pool div {n_nodes}")
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(pool))
            .select(
                "node",
                (F.coalesce(F.col("_in"), F.lit(0)) + share)
                .cast("long")
                .alias("mass"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
