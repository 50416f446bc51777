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
  aggregate on |V| rows); at 100 TB scale, swap the propagation for
  the large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond") — same join primitive, fewer
  rounds on high-diameter graphs.
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
