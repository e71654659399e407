"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

The reference's graph layer is the FK DAG walk (`CopyTreeUtils.groovy`:
topo sort, subgraph selection); this module adds the iterative-algorithm
shape those walks never needed — a rank fixpoint loop — expressed the
Spark-idiomatic way: a driver-side Python loop over DataFrame joins, one
shuffle per iteration, with ``localCheckpoint`` lineage cuts so the plan
does not grow with the iteration count (the same pattern as
``dedup.connected_components``).

Integer-exact arithmetic
------------------------
Floating-point PageRank is engine-nondeterministic (summation order), so
ranks are carried in integer micro-units (BIGINT):

- every node starts with ``unit`` (default 10^12) micro-units;
- a node with out-degree d sends ``rank DIV d`` to each successor
  (integer floor division — remainder mass is dropped, deterministically);
- damping 0.85 is ``(15 * unit) DIV 100 + (85 * inflow) DIV 100``.

Every operation is exact BIGINT arithmetic, so Spark and any SQL oracle
agree bit-for-bit — no rounding tolerance needed. Overflow bound:
``sum(rank) <= n_nodes * unit``, so with unit=10^12 the totals stay under
int64 for graphs up to ~9M nodes; shrink ``unit`` for larger graphs (the
precision loss is the dropped division remainders, < d per node per
iteration).

Dangling nodes (no out-edges) keep receiving the damping base but their
rank mass is not redistributed — the standard simplification; documented
rather than hidden because the SQL twin must mirror it.

Scale: each iteration is one groupBy shuffle on dst plus a broadcast-able
join against the (node, outdeg) table; rank state is 2 longs per node.
At 1000 executors the node frame is hash-partitioned once and AQE keeps
the per-iteration shuffle sized to the live graph, not the input corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    unit: int = UNIT,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Returns (node, rank) with rank in micro-units of ``unit``. The result
    is a pure function of the edge multiset — no floats anywhere — so a
    SQL twin unrolling the same iterations matches exactly.
    """
    src = F.col(src_col).alias("node")
    dst = F.col(dst_col).alias("node")
    # materialize the loop-invariant frames once: without this every
    # iteration's plan re-derives nodes/outdeg/edges from the source scan
    # (audited: 4 redundant scans for 3 iterations) — at 100 TB that is
    # iterations x extra passes over the source. localCheckpoint keeps
    # them in executor storage (memory spilling to disk), already
    # projected to the 2 columns the loop touches.
    edges = edges.select(src_col, dst_col).localCheckpoint()
    nodes = (
        edges.select(src).union(edges.select(dst)).distinct().localCheckpoint()
    )
    outdeg = (
        edges.groupBy(F.col(src_col).alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint()
    )
    base = (15 * unit) // 100
    rank = nodes.select("node", F.lit(unit).cast("long").alias("rank"))
    for i in range(iterations):
        r = rank.select(F.col("node").alias("__rn"), "rank")
        d = outdeg.select(F.col("node").alias("__dn"), "outdeg")
        contrib = (
            edges.join(r, edges[src_col] == r["__rn"])
            .join(d, r["__rn"] == d["__dn"])
            # per-edge share: exact BIGINT floor division (Spark `DIV`)
            .select(
                edges[dst_col].alias("node"),
                F.expr("rank DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr("(85 * COALESCE(inflow, 0L)) DIV 100")
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            rank = rank.localCheckpoint(eager=True)
    return rank


def pagerank_sql(
    edges_cte: str,
    *,
    iterations: int = 5,
    unit: int = UNIT,
) -> str:
    """ANSI-SQL twin of :func:`pagerank`: the same iterations unrolled as
    chained CTEs (``r0 .. rN``) over an ``edges(src, dst)`` CTE supplied
    by the caller. Uses ``//`` — DuckDB's integer floor division — against
    BIGINT operands, mirroring Spark's ``DIV``."""
    base = (15 * unit) // 100
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({unit} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
        SELECT n.node,
               CAST({base} + (85 * COALESCE(s.inflow, 0)) // 100 AS BIGINT) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS inflow
            FROM edges e
            JOIN r{i - 1} r ON r.node = e.src
            JOIN outdeg d ON d.node = e.src
            GROUP BY e.dst) s ON s.node = n.node)"""
        )
    return "WITH " + ",\n    ".join(parts)


def bfs_hops(
    edges: DataFrame,
    source,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """(node, hops) for every node reachable from ``source`` within
    ``max_hops`` — breadth-first traversal as a driver loop: each level is
    one semi-join of the edge list against the frontier plus an anti-join
    against the visited set, localCheckpointed so lineage stays flat.
    Levels are exact (a node's hop count is the FIRST level that reaches
    it), so the unrolled-CTE SQL twin matches exactly. The frontier/
    visited frames are (node, hop) pairs — never the edge payload."""
    spark = edges.sparkSession
    F_ = F
    visited = spark.createDataFrame([(source, 0)], ["node", "hops"]).localCheckpoint()
    frontier = visited.select("node")
    ed = edges.select(F_.col(src_col).alias("__s"), F_.col(dst_col).alias("__d"))
    for hop in range(1, max_hops + 1):
        nxt = (
            ed.join(frontier, ed["__s"] == frontier["node"], "left_semi")
            .select(F_.col("__d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F_.lit(hop).alias("hops"))
        ).localCheckpoint()
        frontier = nxt
    return visited.select("node", F_.col("hops").cast("long").alias("hops"))


def bfs_hops_sql(edges_cte: str, source_literal: str, *, max_hops: int = 4) -> str:
    """Unrolled-CTE twin of :func:`bfs_hops` over an ``edges(src, dst)``
    CTE; ``source_literal`` is a quoted SQL literal for the start node."""
    parts = [
        f"edges AS ({edges_cte})",
        f"h0 AS (SELECT {source_literal} AS node)",
        "v0 AS (SELECT node FROM h0)",
    ]
    for k in range(1, max_hops + 1):
        parts.append(
            f"""h{k} AS (
        SELECT DISTINCT e.dst AS node
        FROM edges e JOIN h{k - 1} f ON e.src = f.node
        WHERE e.dst NOT IN (SELECT node FROM v{k - 1}))"""
        )
        parts.append(
            f"v{k} AS (SELECT node FROM v{k - 1} UNION ALL SELECT node FROM h{k})"
        )
    levels = " UNION ALL ".join(
        f"SELECT node, CAST({k} AS BIGINT) AS hops FROM h{k}"
        for k in range(0, max_hops + 1)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    SELECT * FROM ({levels})"


def triangle_counts(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation — the
    classic communication-optimal topology (Suri & Vassilvitskii's MR
    node-iterator++): orient every undirected edge from its lower
    (degree, id) endpoint to the higher, enumerate wedges only at the LOW
    endpoint, and close each wedge with a hash join back to the oriented
    edge list. Orientation bounds every node's out-degree by O(sqrt(m)),
    so wedge fan-out — the term that kills naive triangle join plans on
    hub nodes — stays O(m^1.5) worst-case with NO cap knob needed; the
    plan is two equi-joins and one explode, vectors/payloads never move.

    Input edges may be directed/duplicated; they are canonicalized to
    distinct undirected (a < b) pairs first. Returns (node, n_triangles)
    for nodes in at least one triangle; counts are exact integers so the
    SQL twin (:func:`triangle_counts_sql`) matches bit-for-bit.

    ``max_degree``: when set, counts triangles on the degree-capped
    INDUCED subgraph — vertices whose canonical-undirected degree exceeds
    the cap are dropped (with every incident edge) before orientation.
    This is the scale-subset gate shape (the full-graph oracle is
    infeasible for external verifiers at very large m: DuckDB's wedge
    join spilled >80 GB at sf1); the Spark full-graph path needs no cap —
    orientation alone bounds the wedge fan-out. The cap MUST be mirrored
    in the SQL twin (pass the same value to :func:`triangle_counts_sql`).
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if max_degree is not None:
        kept = _undirected_degrees(und).where(
            F.col("deg") <= max_degree
        ).select("node")
        und = (
            und.join(kept.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(kept.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
        )
    deg = _undirected_degrees(und)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ed = und.join(da, "a").join(db, "b")
    lo_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lo_first, F.col("degb")).otherwise(F.col("dega")).alias("hideg"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("lo"), F.col("hi").alias("v"), F.col("hideg").alias("dv")
    )
    e2 = oriented.select(
        F.col("lo"), F.col("hi").alias("w"), F.col("hideg").alias("dw")
    )
    wedges = e1.join(e2, "lo").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi").select("lo", "v", "w")
    return (
        tri.select(F.explode(F.array("lo", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def _undirected_degrees(und: DataFrame) -> DataFrame:
    """(node, deg) over a canonical undirected (a < b) edge list."""
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def triangle_counts_sql(edges_cte: str, *, max_degree: int | None = None) -> str:
    """ANSI-SQL twin of :func:`triangle_counts` over an ``edges(src, dst)``
    CTE: identical canonicalization, (degree, id) orientation, wedge
    enumeration at the low endpoint and closing semi-join, so the exact
    integer counts agree with Spark bit-for-bit. ``max_degree`` mirrors
    the Spark-side induced-subgraph cap (same deg0-on-canonical-edges
    definition), and MATERIALIZED hints keep DuckDB from re-inlining the
    capped edge list into all three of its downstream references."""
    cap = ""
    und_src = "raw_und"
    if max_degree is not None:
        cap = f"""
    deg0 AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM raw_und UNION ALL SELECT b FROM raw_und)
        GROUP BY node),
    kept AS (SELECT node FROM deg0 WHERE deg <= {max_degree}),
    capped AS MATERIALIZED (
        SELECT u.a, u.b FROM raw_und u
        JOIN kept ka ON ka.node = u.a
        JOIN kept kb ON kb.node = u.b),"""
        und_src = "capped"
    return f"""WITH raw AS ({edges_cte}),
    raw_und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM raw WHERE src <> dst),{cap}
    und AS (SELECT a, b FROM {und_src}),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY node),
    oriented AS (
        SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS lo,
               CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS hi,
               CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN db.deg ELSE da.deg END AS hideg
        FROM und u
        JOIN deg da ON da.node = u.a
        JOIN deg db ON db.node = u.b),
    tri AS (
        SELECT e1.lo, e1.hi AS v, e2.hi AS w
        FROM oriented e1
        JOIN oriented e2 ON e1.lo = e2.lo
         AND (e1.hideg, e1.hi) < (e2.hideg, e2.hi)
        WHERE EXISTS (SELECT 1 FROM oriented c
                      WHERE c.lo = e1.hi AND c.hi = e2.hi)),
    pernode AS (
        SELECT lo AS node FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM pernode GROUP BY node"""


def k_core_peel(
    edges: DataFrame,
    *,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``rounds`` iterations of k-core peeling with per-node peel labels:
    repeatedly drop vertices whose degree in the current induced subgraph
    is below ``k`` (with every incident edge) — the standard coreness-
    decomposition step. A FIXED round count, not a fixpoint loop, so an
    unrolled-CTE SQL twin reproduces the result exactly; when the peel
    converges within ``rounds`` (probed for the gated fixtures) the
    survivors ARE the k-core, and extra rounds are no-ops by
    construction. Returns one row per original node:
    (node, peel_round, core_deg) — peel_round is the 1-based round the
    node was removed (NULL for k-core survivors; removal is monotone, so
    the label is well-defined), core_deg its degree in the final
    subgraph (0 when peeled). Emitting the full decomposition rather
    than survivors alone keeps the oracle gate non-degenerate at every
    scale — at small SFs the whole graph collapses (every node gets a
    label), at larger SFs a dense core survives.

    Scale: each round is one degree aggregation plus two semi-joins on
    the shrinking edge list, with a localCheckpoint lineage cut — the
    connected-components / kmeans driver-loop shape; the edge list only
    ever shrinks, so round cost is monotonically decreasing, and the
    labels union is assembled lazily (no per-round action)."""
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes0 = _undirected_degrees(und).select("node").localCheckpoint(eager=False)
    alive = nodes0
    peeled: DataFrame | None = None
    for r in range(1, rounds + 1):
        kept = (
            _undirected_degrees(und).where(F.col("deg") >= k).select("node")
        )
        # Peeled this round = still alive but below-k OR newly isolated
        # (isolated nodes have no edges, hence no degree row at all).
        peeled_r = alive.join(kept, "node", "left_anti").select(
            "node", F.lit(r).cast("int").alias("peel_round")
        )
        peeled = peeled_r if peeled is None else peeled.unionAll(peeled_r)
        alive = kept.localCheckpoint(eager=False)
        und = (
            und.join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    final_deg = _undirected_degrees(und)
    return (
        nodes0.join(peeled, "node", "left")
        .join(final_deg, "node", "left")
        .select(
            "node",
            F.col("peel_round").cast("long").alias("peel_round"),
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("core_deg"),
        )
    )


def k_core_peel_sql(edges_cte: str, *, k: int, rounds: int) -> str:
    """ANSI-SQL twin of :func:`k_core_peel`: identical canonicalization
    and per-round degree-filter/induce steps, unrolled to ``rounds`` CTE
    pairs. peel_round is reconstructed as the first round whose kept-set
    the node is missing from — equivalent to the Spark loop's alive-
    minus-kept labels because kept-sets shrink monotonically (a node in
    ``k{r}`` has an edge in ``u{r-1}``, which requires membership in
    ``k{r-1}``)."""
    ctes = [
        f"raw AS ({edges_cte})",
        """u0 AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM raw WHERE src <> dst)""",
        """n0 AS (SELECT DISTINCT node FROM (
        SELECT a AS node FROM u0 UNION ALL SELECT b FROM u0))""",
    ]
    for r in range(1, rounds + 1):
        prev = f"u{r - 1}"
        ctes.append(
            f"""k{r} AS MATERIALIZED (
        SELECT node FROM (
            SELECT node, count(*) AS deg FROM (
                SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
            GROUP BY node) WHERE deg >= {k})"""
        )
        ctes.append(
            f"""u{r} AS MATERIALIZED (
        SELECT u.a, u.b FROM {prev} u
        JOIN k{r} ka ON ka.node = u.a
        JOIN k{r} kb ON kb.node = u.b)"""
        )
    case_arms = "\n        ".join(
        f"WHEN kj{r}.node IS NULL THEN {r}" for r in range(1, rounds + 1)
    )
    kept_joins = "\n    ".join(
        f"LEFT JOIN k{r} kj{r} ON kj{r}.node = n.node"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    fdeg AS (
        SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM u{rounds} UNION ALL SELECT b FROM u{rounds})
        GROUP BY node)
    SELECT n.node,
           CAST(CASE {case_arms} ELSE NULL END AS BIGINT) AS peel_round,
           CAST(coalesce(fdeg.deg, 0) AS BIGINT) AS core_deg
    FROM n0 n
    {kept_joins}
    LEFT JOIN fdeg ON fdeg.node = n.node"""
    )
