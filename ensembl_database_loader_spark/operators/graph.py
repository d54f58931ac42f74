"""Link-analysis ranking over an edge table — fixed-point PageRank and
HITS, the second iterative-algorithm class beside the
connected-components closure (``operators/components.py``). In a
training-data pipeline this is the crawl-frontier / source-authority
score (rank domains by who links to them, weight crawl budget toward
authoritative sources); in analytics it ranks entities by reference
structure.

Why FIXED-POINT integer arithmetic: the usual double-typed PageRank
sums float contributions in shuffle-partition order, so two runs (or
two engines) disagree in the last ulps and the result is only
approximately reproducible. Scaling ranks to BIGINT "nano-rank" units
makes every iteration a pure integer computation — ``DIV`` and ``+``
only — so the result is BIT-IDENTICAL across runs, layouts, cluster
sizes, and engines (the DuckDB oracle replays the same integer ops and
must hash-match exactly). The truncation error per iteration is
< 1 unit per edge — at scale=1e12 that is ~1e-12 of total mass,
irrelevant next to the damping fixpoint itself.

Semantics (standard simplified PageRank): ranks start uniform
(``scale DIV n``); each iteration every node keeps
``(100-damping_pct)%`` of the uniform base and receives
``damping_pct%`` of the integer-split ranks of its in-neighbors
(``rank DIV out_degree``). Dangling-node mass (no out-edges) drops out
of circulation rather than being redistributed — the common
map-reduce simplification, stated here because the oracle mirrors it.

Spark shape per iteration: ONE shuffle join (current ranks onto the
static degree-annotated edge table, ``shuffle_hash`` — both sides are
graph-sized) and one partial-aggregated groupBy(dst). The edge table
is joined-with-degrees ONCE before the loop and localCheckpointed;
ranks are localCheckpointed every other round to truncate lineage (the
components.py idiom — without it the plan doubles per round). At 100 TB
pre-partition the edge table by ``src`` so the per-iteration join
reuses the partitioning; the rank frame is nodes-sized (much smaller
than edges) and follows the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """(node, deg) — out-degree of every node with at least one
    out-edge. One partial-aggregated shuffle."""
    return (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of integer fixed-point
    PageRank; ``rank`` is in ``scale`` units (sum over nodes <= scale,
    shrinking by the dangling mass each round). Deterministic and
    engine-exact: every operation is BIGINT ``+`` / ``DIV``."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (1, 99), got {damping_pct}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # static across iterations: every edge annotated with its source's
    # out-degree; checkpoint so the loop never recomputes the scan
    ed = (
        e.join(
            out_degrees(e).withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src",
        )
        .localCheckpoint()
    )
    nodes = nodes.localCheckpoint()
    n = nodes.count()
    base = int(scale) // n  # uniform start AND the per-round teleport mass
    keep = 100 - damping_pct
    ranks = nodes.withColumn("rank", F.lit(base).cast("bigint"))
    for i in range(iterations):
        sums = (
            ed.join(
                ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
                "src",
            )
            .select("dst", F.expr("rank DIV deg").alias("_c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_c").cast("bigint").alias("_m"))
        )
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                F.expr(
                    f"({keep} * {base}L + {damping_pct} * coalesce(_m, 0L)) DIV 100"
                ).alias("rank"),
            )
        )
        if i % 2 == 1 and i < iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> str:
    """The DuckDB twin of ``pagerank_fixed`` — the same integer
    recurrence unrolled into CTEs (``//`` on non-negative BIGINTs ==
    Spark's ``DIV``), parameterized by the SQL producing the
    (src, dst) edge set. Built programmatically so probe SQL can't
    drift from the engine's iteration count."""
    keep = 100 - damping_pct
    parts = [
        f"WITH ed AS (SELECT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed))",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"rk0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS rank "
        "FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"rk{i} AS (SELECT nodes.node, CAST(({keep} * ({scale} // n) "
            f"+ {damping_pct} * COALESCE(s.m, 0)) // 100 AS BIGINT) AS rank "
            "FROM nodes CROSS JOIN nn LEFT JOIN "
            "(SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m "
            f"FROM ed e JOIN rk{i - 1} r ON e.src = r.node "
            "JOIN deg d ON e.src = d.src GROUP BY e.dst) s "
            "ON nodes.node = s.node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, rank FROM rk{iterations}"
    )


def hits_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**9,
) -> DataFrame:
    """(node, hub, authority) after ``iterations`` rounds of integer
    fixed-point HITS (Kleinberg): authority = normalized sum of
    in-neighbor hub scores, hub = normalized sum of out-neighbor
    authority scores. The same bit-exact discipline as
    ``pagerank_fixed``: every operation is BIGINT ``+``/``DIV``, so two
    engines replaying the recurrence agree exactly.

    Normalization divides by ``greatest(total DIV scale, 1)`` — one
    shared divisor per side per round, so the ORDERING of scores equals
    the raw-sum ordering exactly; the divisor's truncation costs at
    most ~1/E relative magnitude error (E = edge count), never a rank
    flip. Overflow bound: raw sums stay <= E * scale, so keep
    E * scale < 2^63 (the default 1e9 scale is safe to ~9e9 edges;
    shrink scale for more).

    Per round: two shuffle_hash joins (scores onto the checkpointed
    edge table) + two partial-aggregated groupBys + two one-row total
    aggregates (crossJoin broadcast — never a driver collect)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = e.localCheckpoint()

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        # materialize the raw sums: they are referenced twice (total +
        # join) and feed the NEXT round's join — without the cut the
        # mutual recurrence's plan doubles per reference and the DAG
        # grows exponentially in iterations (measured 14.5s -> 2s at
        # sf0.01 for 3 rounds)
        raw = raw.localCheckpoint()
        tot = raw.agg(F.sum("_raw").cast("bigint").alias("_tot"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(tot)
            .select(
                "node",
                F.expr(
                    "coalesce(_raw, 0L) DIV greatest(_tot DIV "
                    f"{int(scale)}L, 1L)"
                ).alias(col),
            )
        )

    h = nodes.withColumn("h", F.lit(int(scale)).cast("bigint"))
    a = None
    for i in range(iterations):
        a_raw = (
            e.join(
                h.withColumnRenamed("node", "src").hint("shuffle_hash"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").cast("bigint").alias("_raw"))
        )
        a = _norm(a_raw, "a")
        h_raw = (
            e.join(
                a.withColumnRenamed("node", "dst").hint("shuffle_hash"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").cast("bigint").alias("_raw"))
        )
        h = _norm(h_raw, "h")
    assert a is not None
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub"),
            F.coalesce("a", F.lit(0)).cast("bigint").alias("authority"),
        )
    )


def hits_oracle_sql(
    edges_sql: str, iterations: int = 3, scale: int = 10**9
) -> str:
    """The DuckDB twin of ``hits_fixed`` — the identical integer
    recurrence unrolled into CTEs, generated from the same parameters
    so probe SQL cannot drift from the engine."""
    # AS MATERIALIZED throughout: DuckDB inlines CTEs by default, and
    # the mutual recurrence references each level several times — the
    # inlined tree grows exponentially in iterations (measured 52s ->
    # sub-second at sf0.01)
    parts = [
        f"WITH ed AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed))",
        f"h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"a{i}_raw AS MATERIALIZED (SELECT e.dst AS node, "
            f"CAST(SUM(s.h) AS BIGINT) AS raw "
            f"FROM ed e JOIN h{i - 1} s ON e.src = s.node GROUP BY e.dst)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT n.node, CAST(COALESCE(r.raw, 0) // "
            f"GREATEST(CAST((SELECT SUM(raw) FROM a{i}_raw) AS BIGINT) "
            f"// {scale}, 1) AS BIGINT) AS a "
            f"FROM nodes n LEFT JOIN a{i}_raw r ON n.node = r.node)"
        )
        parts.append(
            f"h{i}_raw AS MATERIALIZED (SELECT e.src AS node, "
            f"CAST(SUM(s.a) AS BIGINT) AS raw "
            f"FROM ed e JOIN a{i} s ON e.dst = s.node GROUP BY e.src)"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT n.node, CAST(COALESCE(r.raw, 0) // "
            f"GREATEST(CAST((SELECT SUM(raw) FROM h{i}_raw) AS BIGINT) "
            f"// {scale}, 1) AS BIGINT) AS h "
            f"FROM nodes n LEFT JOIN h{i}_raw r ON n.node = r.node)"
        )
    n = iterations
    return (
        ", ".join(parts)
        + f" SELECT nodes.node, COALESCE(h{n}.h, 0) AS hub, "
        f"COALESCE(a{n}.a, 0) AS authority FROM nodes "
        f"LEFT JOIN h{n} ON nodes.node = h{n}.node "
        f"LEFT JOIN a{n} ON nodes.node = a{n}.node"
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------


def undirected_canonical(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected edge set ``(a, b)`` with ``a < b``:
    self-loops dropped, both directions and duplicates collapsed. One
    partial-aggregated distinct."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One row ``(n_nodes, n_edges, triangles)`` — exact undirected
    triangle count (all BIGINT, engine-exact).

    Why DEGREE-ORDERED orientation (the compact-forward idiom): a
    naive wedge join keyed on raw node ids explodes on hubs — a node
    of degree d contributes d^2/2 wedges, and web/co-occurrence
    graphs are power-law, so the biggest key dominates the whole
    shuffle. Orienting every edge from the (degree, id)-SMALLER
    endpoint to the larger caps every node's OUT-degree at O(sqrt(m)):
    wedge count drops from sum(d^2) to at most m^1.5 — the best
    possible for exact counting — and, because the cap is per-node,
    the wedge join cannot have a skewed key. Each triangle is counted
    exactly once (its three vertices have a unique orientation order).

    Spark shape: one distinct (canonicalize), one degree groupBy, two
    shuffle_hash joins to annotate endpoint ranks, then the wedge
    self-join on the oriented source and ONE closure join of wedges
    against the oriented edge set on the composite (lo, hi) key. At
    100 TB pre-partition the oriented edges by ``u``; the closure join
    reuses the wedge shuffle's partitioning under AQE.
    """
    und = undirected_canonical(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    # annotate both endpoints with (deg, id) rank, orient small -> big
    ann = (
        und.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("da")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("db")).hint(
                "shuffle_hash"
            ),
            "b",
        )
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ann.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint()  # referenced three times below; cut the lineage
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # wedges from a shared oriented source, ordered by the SAME
    # (deg, id) rank so the closing edge is oriented v1 -> v2
    v1_first = (F.col("e1.dv") < F.col("e2.dv")) | (
        (F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v"))
    )
    wedges = (
        e1.join(e2.hint("shuffle_hash"), F.col("e1.u") == F.col("e2.u"))
        .where(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.when(v1_first, F.col("e1.v")).otherwise(F.col("e2.v")).alias("u"),
            F.when(v1_first, F.col("e2.v")).otherwise(F.col("e1.v")).alias("v"),
        )
    )
    tri = wedges.join(
        oriented.select("u", "v").hint("shuffle_hash"), ["u", "v"]
    ).agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    counts = und.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    ).crossJoin(deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")))
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "triangles")


def triangle_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of ``triangle_count``: the orientation scheme is an
    engine-side performance device, so the oracle counts each triangle
    once via the simpler id-ordered triple join (a < b < c) — same
    exact result, auditable SQL."""
    return (
        f"WITH raw AS (SELECT src, dst FROM ({edges_sql})), "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM raw WHERE src <> dst), "
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT a AS node FROM und UNION ALL SELECT b FROM und)) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM und e1 "
        "JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b "
        "JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b) AS triangles"
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (seed-restart)
# ---------------------------------------------------------------------------


def personalized_pagerank_fixed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of integer fixed-point
    PERSONALIZED PageRank: identical recurrence to ``pagerank_fixed``
    except the teleport mass lands only on the seed set (uniformly,
    ``scale DIV n_seeds`` each) instead of on every node — the
    random-walk-with-restart relevance score ("rank domains by
    proximity to these trusted sources", the TrustRank shape a crawl
    pipeline uses to weight frontier budget toward a vetted seed list).

    Same bit-exact BIGINT discipline and the same documented
    dangling-mass simplification as ``pagerank_fixed``; seeds that
    never appear in the edge set still hold their teleport mass (they
    are unioned into the node set). Spark shape per round is unchanged:
    ONE shuffle_hash join + one partial-aggregated groupBy; the seed
    base column rides the checkpointed node frame, adding nothing to
    the per-round cost."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (1, 99), got {damping_pct}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(sd)
        .distinct()
    )
    ed = (
        e.join(
            out_degrees(e).withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src",
        )
        .localCheckpoint()
    )
    n_seeds = sd.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank_fixed: empty seed set")
    seed_base = int(scale) // n_seeds
    nodes = (
        nodes.join(sd.withColumn("_is_seed", F.lit(True)), "node", "left")
        .select(
            "node",
            F.when(F.col("_is_seed"), F.lit(seed_base))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("base"),
        )
        .localCheckpoint()
    )
    keep = 100 - damping_pct
    ranks = nodes.select("node", F.col("base").alias("rank"))
    for i in range(iterations):
        sums = (
            ed.join(
                ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
                "src",
            )
            .select("dst", F.expr("rank DIV deg").alias("_c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_c").cast("bigint").alias("_m"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            F.expr(
                f"({keep} * base + {damping_pct} * coalesce(_m, 0L)) DIV 100"
            ).alias("rank"),
        )
        if i % 2 == 1 and i < iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def personalized_pagerank_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin of ``personalized_pagerank_fixed``: the same
    integer recurrence unrolled, generated from the same parameters
    (the pagerank_oracle_sql auditability contract)."""
    keep = 100 - damping_pct
    parts = [
        f"WITH ed AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}))",
        f"sd AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_sql}))",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed "
        "UNION ALL SELECT node FROM sd))",
        "deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM ed GROUP BY src)",
        f"base AS MATERIALIZED (SELECT n.node, CAST(CASE WHEN s.node IS NOT "
        f"NULL THEN {scale} // (SELECT COUNT(*) FROM sd) ELSE 0 END "
        "AS BIGINT) AS base FROM nodes n LEFT JOIN sd s ON n.node = s.node)",
        "rk0 AS MATERIALIZED (SELECT node, base AS rank FROM base)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"rk{i} AS MATERIALIZED (SELECT b.node, "
            f"CAST(({keep} * b.base + {damping_pct} * COALESCE(s.m, 0)) "
            "// 100 AS BIGINT) AS rank FROM base b LEFT JOIN "
            "(SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m "
            f"FROM ed e JOIN rk{i - 1} r ON e.src = r.node "
            "JOIN deg d ON e.src = d.src GROUP BY e.dst) s "
            "ON b.node = s.node)"
        )
    return ", ".join(parts) + f" SELECT node, rank FROM rk{iterations}"


# ---------------------------------------------------------------------------
# Label propagation (deterministic synchronous majority vote)
# ---------------------------------------------------------------------------


def label_propagation_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """(node, label) after ``iterations`` SYNCHRONOUS rounds of
    majority label propagation over the undirected graph — community
    detection for domain clustering / near-dup corpus grouping (which
    sources form a tightly-linked cluster?).

    Classic LPA is order-dependent (asynchronous updates + random tie
    break); this variant is the deterministic twin: all nodes update
    simultaneously from the PREVIOUS round's labels, and ties break to
    the SMALLEST label — so the result is engine-exact, replayable in
    SQL, and independent of partitioning (pinned by tests). Labels
    start as node ids; an isolated node would keep its own id (cannot
    occur here: the node set is induced by the edge set).

    Spark shape per round: ONE shuffle_hash join (labels onto the
    symmetric checkpointed edge table) + a (node, label) partial-
    aggregated count + an argmax groupBy — no window, no sort; the
    argmax is max(struct(cnt, -label)). Fixed iteration count, not
    convergence polling: each round is a full materialization barrier
    anyway, and bounded rounds are the 100 TB posture (LPA oscillates
    under synchronous updates; bounded replay keeps it auditable)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    und = undirected_canonical(edges, src, dst)
    sym = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    nodes = sym.select(F.col("u").alias("node")).distinct().localCheckpoint()
    labels = nodes.withColumn("label", F.col("node").cast("bigint"))
    for i in range(iterations):
        votes = (
            sym.join(
                labels.withColumnRenamed("node", "u").hint("shuffle_hash"), "u"
            )
            .groupBy(F.col("v").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        labels = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).cast("bigint").alias("label"))
        )
        if i % 2 == 1 and i < iterations - 1:
            labels = labels.localCheckpoint()
    return labels


def label_propagation_oracle_sql(edges_sql: str, iterations: int = 3) -> str:
    """DuckDB twin of ``label_propagation_fixed``: the same synchronous
    min-tie majority vote unrolled round by round (ROW_NUMBER ordered
    by cnt DESC, label ASC replays the argmax exactly)."""
    parts = [
        f"WITH raw AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}))",
        "und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM raw WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "lb0 AS MATERIALIZED (SELECT DISTINCT u AS node, "
        "CAST(u AS BIGINT) AS label FROM sym)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"lb{i} AS MATERIALIZED (SELECT node, label FROM ("
            "SELECT s.v AS node, l.label, "
            "ROW_NUMBER() OVER (PARTITION BY s.v "
            "ORDER BY COUNT(*) DESC, l.label ASC) AS rn "
            f"FROM sym s JOIN lb{i - 1} l ON s.u = l.node "
            "GROUP BY s.v, l.label) WHERE rn = 1)"
        )
    return ", ".join(parts) + f" SELECT node, label FROM lb{iterations}"


# ---------------------------------------------------------------------------
# Bounded BFS (k-hop reachability / min-distance)
# ---------------------------------------------------------------------------


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """(node, dist) — minimum hop distance from the seed set along
    DIRECTED edges, bounded at ``max_hops`` (nodes further away are
    absent). The k-hop neighborhood primitive: crawl-frontier expansion
    from a seed list, blast-radius queries over a dependency graph, and
    the standard Spark workaround for the recursive CTE SQL lacks —
    bounded unrolling is also the 100 TB posture (each hop is a full
    shuffle round; unbounded fixpoints on a high-diameter graph are a
    scheduling hazard, and components.py's doubling closure covers the
    unbounded-connectivity case).

    Per hop: ONE shuffle_hash join (frontier onto the checkpointed edge
    table) + a distinct + a LEFT ANTI join against the visited set —
    only the FRONTIER (newly discovered nodes) joins the next round, so
    per-hop cost tracks frontier size, not graph size. Visited/frontier
    localCheckpoint each hop (the iterative-lineage idiom)."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint()
    frontier = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    visited = frontier
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(
                frontier.select(F.col("node").alias("src")).hint("shuffle_hash"),
                "src",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("bigint"))
        )
        frontier = nxt.localCheckpoint()
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier).localCheckpoint()
    return visited


def bfs_oracle_sql(edges_sql: str, seeds_sql: str, max_hops: int = 3) -> str:
    """DuckDB twin of ``bfs_distances``: the same hop-bounded expansion
    unrolled — each level is (neighbors of the previous frontier) minus
    everything already visited."""
    parts = [
        f"WITH ed AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}))",
        f"v0 AS MATERIALIZED (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist "
        f"FROM ({seeds_sql}))",
    ]
    prev_all = "v0"
    for h in range(1, max_hops + 1):
        parts.append(
            f"f{h} AS MATERIALIZED (SELECT DISTINCT e.dst AS node, "
            f"CAST({h} AS BIGINT) AS dist FROM ed e "
            f"JOIN {prev_all} p ON e.src = p.node AND p.dist = {h - 1} "
            f"WHERE e.dst NOT IN (SELECT node FROM {prev_all}))"
        )
        parts.append(
            f"v{h} AS MATERIALIZED (SELECT * FROM {prev_all} "
            f"UNION ALL SELECT * FROM f{h})"
        )
        prev_all = f"v{h}"
    return ", ".join(parts) + f" SELECT node, dist FROM {prev_all}"
