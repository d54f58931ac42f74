"""Connected components over a pair graph — the iterative-algorithm
class (exact cluster-level dedup: near-dup PAIRS only say A~B and B~C;
grouping a whole near-dup cluster needs the transitive closure).

Algorithm: alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
standard scale-out formulation. Each round rewires the edge set toward
stars centered at component minima:

- large-star: every node connects its LARGER neighbors to the minimum
  of its neighborhood (including itself);
- small-star: every node connects its smaller-or-equal neighbors to
  that minimum.

Both preserve connectivity; the fixpoint is a forest of stars whose
centers are the component minima. Convergence is O(log n) ROUNDS
INDEPENDENT OF GRAPH DIAMETER — a path graph (the worst case for the
round-4 min-label propagation, which needed diameter rounds) halves
every round. Per round: two groupBy-join passes over the edge set
(shuffles on node id), a localCheckpoint to truncate lineage (without
it the plan doubles every round — the classic iterative-Spark
failure), and ONE driver-side aggregate for the fixpoint test
(inherent to iterative algorithms; GraphX's Pregel loop does the
same). At 100 TB the edge set also SHRINKS every round (toward one
edge per non-center node), so late rounds are cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame, dedupe: bool = True) -> DataFrame:
    """Undirected edge set in canonical (lo, hi) form, self-loops
    dropped. ``dedupe=False`` skips the distinct SHUFFLE — used for the
    large-star output, which feeds straight into small-star whose own
    groupBy/distinct absorbs duplicates anyway (one shuffle saved per
    round)."""
    e = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    return e.distinct() if dedupe else e


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every node's strictly-larger neighbors to the minimum of
    its closed neighborhood."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("_mn")).select(
        "src", F.least("src", "_mn").alias("m")
    )
    return _canon(
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst")),
        dedupe=False,
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every node's smaller neighbors (and itself) to the
    minimum of its smaller neighborhood."""
    d = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        d.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    centers = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return _canon(rewired.unionByName(centers))


def _fingerprint(edges: DataFrame) -> tuple:
    """Cheap fixpoint probe: (count, two independent hash XORs). One
    aggregate job, no join. XOR (not SUM) because the edge set is
    distinct (duplicates that would cancel cannot occur) and XOR cannot
    overflow under ANSI arithmetic. A collision would need two
    DIFFERENT edge sets agreeing on count and both 64-bit folds —
    negligible next to hardware error rates."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("h1"),
        F.expr("bit_xor(xxhash64(dst, src, 7))").alias("h2"),
    ).first()
    return (row.n, row.h1, row.h2)


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
    component). ``edges``: undirected pairs (each given once).

    ``max_iterations`` bounds ROUNDS of large-star+small-star; because
    convergence is O(log n) rounds regardless of diameter, the default
    25 covers any graph that fits in a cluster (2^25 nodes per chain)."""
    e = _canon(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).localCheckpoint()

    fp = _fingerprint(e)
    for _ in range(max_iterations):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        fp2 = _fingerprint(e2)
        e = e2
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )

    # Fixpoint is a star forest centered at component minima: every
    # node's component is the min of its closed neighborhood.
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nbr_min = sym.groupBy(F.col("src").alias("id")).agg(
        F.min("dst").alias("_nbr")
    )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(nbr_min, "id", "left")
        .select(
            "id",
            F.least(F.col("id"), F.coalesce("_nbr", F.col("id"))).alias("component"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    edges: DataFrame,
    id_col: str,
    quality_col: str,
    src_col: str = "id1",
    dst_col: str = "id2",
    components: DataFrame | None = None,
) -> DataFrame:
    """Cluster-canonical dedup: ONE survivor per near-dup cluster —
    the highest ``quality_col`` (ties -> smallest id) — instead of the
    keep-smallest-id rule the curation funnel uses. The choice real
    pipelines make when a quality score exists: keep-first keeps
    whichever near-duplicate happened to crawl first; keep-best keeps
    the cleanest copy.

    Plan: clusters from large-star/small-star (O(log n) rounds), one
    broadcast-or-shuffle join to attach components, one per-component
    row_number window — and a rank<=1 filter Spark executes with a
    PARTIAL per-partition WindowGroupLimit, so shuffle bytes per
    component are one row per input partition, not the cluster's row
    set. Isolated docs (no edge) are their own cluster and always
    survive. Returns ``df``'s columns, survivors only.

    Pass ``components`` (an (id, component) frame, e.g. already
    computed for cluster accounting) to skip re-running the iterative
    labeling — the O(log n)-round phase dominates the operator."""
    from pyspark.sql import Window

    comp = (
        components.select(F.col("id"), "component")
        if components is not None
        else connected_components(
            df.select(F.col(id_col).alias("id")), edges, "id", src_col, dst_col
        )
    )
    # drop comp's join key by reference — id_col may itself be "id"
    j = df.join(comp, df[id_col] == comp["id"], "inner").drop(comp["id"])
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*df.columns)
    )
