"""Connected components over a pair graph — the iterative-algorithm
class (exact cluster-level dedup: near-dup PAIRS only say A~B and B~C;
grouping a whole near-dup cluster needs the transitive closure).

Min-label propagation: every node starts labeled with its own id; each
round every node takes the minimum label among itself and its
neighbors; convergence in O(graph diameter) rounds. Per round: one
join + one aggregate (both shuffles on node id), a localCheckpoint to
truncate the growing lineage (without it the plan doubles every round
— the classic iterative-Spark failure), and one driver-side count for
the convergence test (inherent to iterative algorithms; GraphX's
Pregel loop does the same). Near-dup graphs have tiny diameters, so
rounds stay in single digits at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id1",
    dst_col: str = "id2",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) with component = min node id reachable from id.

    ``nodes``: one row per node id (isolated nodes keep their own id as
    component). ``edges``: undirected pairs (each given once)."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("_nbr"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("_nbr", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("_nbr", F.col("component")) < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
