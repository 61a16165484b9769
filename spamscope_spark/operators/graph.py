"""Link-graph analytics: PageRank over an edge table.

A web-scale corpus pipeline ranks hosts/domains by link structure and
feeds the rank back as a quality prior (the reference's network bolt
enriches per-sender reputation via external services,
src/bolts/network.py — this is the in-corpus analog: reputation
computed FROM the data instead of fetched per row).

Scale shape (the 100 TB story):
- the edge table is the big side (O(edges) rows, stays partitioned);
  the rank table is |V| rows, re-derived each iteration;
- one iteration = edges ⋈ ranks on src (equi-join, AQE-planned) →
  groupBy dst (map-side partial sums) → left join back onto the node
  set. No collect, no driver-held vectors — this is the standard
  distributed PageRank, O(iterations) shuffles;
- lineage is truncated with localCheckpoint every few rounds, exactly
  like connected components (operators/corpus.py::dup_clusters) —
  without it the plan doubles per iteration;
- dangling mass (nodes with no out-edges) is dropped, documented — the
  usual "random jump only" treatment; ranks still sum < SCALE.

Determinism (why this hashes bit-exact cross-engine): every quantity
is an INTEGER. Ranks live at a fixed point scale (SCALE = 10^12);
per-edge contributions are integer floor-divisions rank//outdeg; the
damping step is (NUM * sum)//DEN + base. Integer sums are exact and
aggregation-order-independent, so Spark and DuckDB agree on every bit
— no rounding epsilon, no float summation-order hazard. (A float
PageRank would differ in the last ulp between engines; the fixed-point
form is also what you'd ship at 10^12 edges to make checkpoint
restarts byte-reproducible.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["pagerank", "sql_pagerank"]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-point PageRank. ``edges`` must be distinct (src, dst)
    pairs (multi-edges would double-count; callers dedup first).
    Returns (node, rank) with rank at SCALE fixed point.

    rank_0(v)   = SCALE // N
    base        = ((den-num) * SCALE) // (den * N)
    rank_i+1(v) = base + (num * Σ_{u→v} rank_i(u) // outdeg(u)) // den
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # |V| as a broadcast 1-row aggregate — never a driver action
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    # Integer division MUST be SQL `div` (exact on longs). A `/`-then-
    # cast detour goes through IEEE double, whose round-to-nearest can
    # land on the wrong side of an integer boundary for quotients just
    # below an integer — a one-bit divergence the value hash would
    # catch on exactly the wrong day.
    ranks = nodes.crossJoin(n_row).select(
        "node",
        F.expr(f"CAST({SCALE} AS BIGINT) div n_nodes").alias("rank"),
    )
    base_expr = (
        f"CAST({(damp_den - damp_num) * SCALE} AS BIGINT) div ({damp_den} * n_nodes)"
    )

    for i in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.crossJoin(n_row)
            .join(summed, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{base_expr} + ({damp_num} * COALESCE(s, CAST(0 AS BIGINT)))"
                    f" div {damp_den}"
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")


def sql_pagerank(
    edges_sql: str,
    iterations: int = 5,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """DuckDB twin: the same fixed-point recurrence, unrolled one CTE
    per iteration (DuckDB's recursive CTEs disallow aggregation in the
    recursive term, and unrolling keeps the twin trivially auditable).
    ``//`` (DuckDB) and long-cast division on non-negative integers
    (Spark) both floor, so every intermediate matches bit-for-bit."""
    parts = [
        f"WITH e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "params AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src)",
        f"pr0 AS (SELECT node, {SCALE} // n_nodes AS rank FROM nodes, params)",
    ]
    for i in range(iterations):
        parts.append(
            f"""pr{i + 1} AS (
        SELECT nodes.node,
            ({damp_den - damp_num} * {SCALE}::BIGINT) // ({damp_den} * params.n_nodes)
            + ({damp_num} * COALESCE(s.s, 0)) // {damp_den} AS rank
        FROM nodes CROSS JOIN params
        LEFT JOIN (
            SELECT e.dst AS node,
                CAST(SUM(pr{i}.rank // outdeg.outdeg) AS BIGINT) AS s
            FROM e
            JOIN pr{i} ON pr{i}.node = e.src
            JOIN outdeg ON outdeg.src = e.src
            GROUP BY e.dst
        ) s ON s.node = nodes.node
    )"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, rank FROM pr{iterations}"
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented wedge join)
# ---------------------------------------------------------------------------


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact global triangle count over an undirected edge list, via
    DEGREE ORIENTATION — the algorithm that survives power-law graphs
    at 10^12 edges where the naive three-way self-join dies.

    Why orientation matters: the wedge join's cost is sum(out_deg^2).
    Orienting every edge from its lower-degree endpoint to its
    higher-degree endpoint (ties by node id) bounds out-degree by
    O(sqrt(edges)) on any graph (arboricity bound) — a celebrity node
    with 10^8 followers contributes ZERO wedges because all its edges
    point INTO it. Each triangle is then counted exactly once, at its
    minimum-degree vertex.

    Pipeline: dedup/canonicalize edges (one groupBy), degree table
    (one groupBy, |V| rows), orient (two broadcast-or-shuffle joins
    onto the small degree table), wedge join oriented edges with
    themselves on the source (the only potentially-wide join, bounded
    by orientation), close wedges against the oriented edge set
    (equi-join on both endpoints). No collect, no iteration.

    Output: one row (n_nodes, n_edges, n_triangles)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    # orient low-degree -> high-degree (tie: lower id first)
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("o")
        )
        .select(F.col("o.s").alias("s"), F.col("o.t").alias("t"))
    )
    l = oriented.select(F.col("s"), F.col("t").alias("v1"))
    r = oriented.select(F.col("s"), F.col("t").alias("v2"))
    wedges = l.join(r, "s").where(F.col("v1") < F.col("v2"))
    # the wedge pair is id-ordered, so the closing edge appears in the
    # canonical (a<b) edge set exactly once — close against e directly
    closed = wedges.join(
        e.select(F.col("a").alias("v1"), F.col("b").alias("v2")),
        ["v1", "v2"],
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n")).select("n")
    n_edges = e.agg(F.count(F.lit(1)).alias("n")).select("n")
    n_tri = closed.agg(F.count(F.lit(1)).alias("n")).select("n")
    return (
        n_nodes.crossJoin(n_edges.withColumnRenamed("n", "ne"))
        .crossJoin(n_tri.withColumnRenamed("n", "nt"))
        .select(
            F.col("n").cast("long").alias("n_nodes"),
            F.col("ne").cast("long").alias("n_edges"),
            F.col("nt").cast("long").alias("n_triangles"),
        )
    )


def sql_triangle_count(edges_rel: str, src: str = "src", dst: str = "dst") -> str:
    """DuckDB twin: canonical a<b<c triple join — exact, independent of
    the Spark side's orientation strategy."""
    return f"""
    WITH e AS (
        SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
        FROM {edges_rel}
        WHERE {src} <> {dst}
    ), nodes AS (
        SELECT a AS v FROM e UNION SELECT b AS v FROM e
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """
