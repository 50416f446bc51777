"""Connected components over an edge list — the clustering step that
turns pairwise near-dup *pairs* into dedup *groups* (the one-pass
"drop id_b" policy under-merges transitive chains; grouping by
component picks one canonical doc per cluster).

The reference has no graph operators; this is a beyond-reference
extension alongside the dedup/similarity family.

Algorithm: iterative min-label propagation — every node starts with
label = its own id; each round takes the min of its label and its
neighbors' labels; the component converges to the min id reachable,
in O(diameter) rounds. Near-dup clusters have tiny diameters, so this
terminates in 2-4 rounds in practice.

Scale design:
- each round is ONE join (edges ⋈ labels, shuffled on the node id) +
  ONE groupBy min — both map-side combinable; the edge list never
  explodes beyond 2|E|;
- `localCheckpoint` after every round cuts the lineage so the plan
  doesn't grow with iterations (iterative DataFrame algorithms
  otherwise recompute the whole history every round);
- convergence is detected with a count of changed labels (a cheap
  aggregate on |V| rows); for high-diameter graphs,
  `connected_components_star` implements large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  which converges in O(log²) rounds instead of O(diameter) — same
  join/groupBy primitives, so the same scale properties per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in `edges`, where
    `component` is the smallest node id in the node's connected
    component. Deterministic — independent of partitioning and of the
    number of rounds run past convergence."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iters):
        nbr_min = (
            sym.join(
                labels.select(F.col("id").alias("b"), F.col("label").alias("nl")), "b"
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_min"))
            .select(F.col("a").alias("id"), "nbr_min")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.select("id", F.col("label").alias("nl"))
            .join(labels, "id")
            .filter(F.col("nl") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) via alternating large-star / small-star rounds
    (Kiveris et al. 2014) — the high-diameter scale path: O(log²)
    rounds regardless of component diameter, vs the propagation
    version's O(diameter). Same output contract as
    `connected_components` (component = min reachable id).

    Each round is one groupBy-min plus one join per star operation,
    both shuffled on the center node; localCheckpoint cuts lineage per
    round exactly as in the propagation version.

    - large-star: every node connects its strictly-larger neighbors to
      the minimum of its closed neighborhood — splits tall chains in
      half without growing the edge count;
    - small-star: every node re-points its smaller-or-equal neighbors
      (and itself) at that minimum — flattens local stars.

    Convergence: the canonical (min, max) edge set is unchanged by a
    full round; the check is one exceptAll count, bounded by |E|."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    # canonical undirected edges, self-loops dropped
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )

    def _canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least(F.col("a"), F.col("b")).alias("a"),
                F.greatest(F.col("a"), F.col("b")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    for _ in range(max_iters):
        # --- large-star: center u over symmetric adjacency ---
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = sym.groupBy("a").agg(F.min("b").alias("_nb")).select(
            "a", F.least(F.col("_nb"), F.col("a")).alias("m")
        )
        ls = _canon(
            sym.filter(F.col("b") > F.col("a"))
            .join(m, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        # --- small-star: center u = larger endpoint ---
        d = ls.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        mv = d.groupBy("u").agg(F.min("v").alias("m"))
        ss = _canon(
            d.join(mv, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(mv.select(F.col("u").alias("a"), F.col("m").alias("b")))
        ).localCheckpoint()
        changed = ss.exceptAll(e).limit(1).count() + e.exceptAll(ss).limit(1).count()
        e = ss
        if changed == 0:
            break
    # converged edge set is a star forest: every edge is (component, node);
    # the min-agg guards the not-fully-converged (max_iters hit) case
    comp = e.groupBy(F.col("b").alias("id")).agg(F.min("a").alias("component"))
    return (
        nodes.join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )
