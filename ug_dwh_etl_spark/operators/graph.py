"""Link-graph metrics over edge tables (SURVEY.md §1: the reference's
link graph is an edge table `(Source, Destination, ...)` from
`sf_inlink_bulk_data.py:66-92`, and its PageRank/CheiRank columns are
INGESTED from the Audisto API (`Audisto/audisto.py:140-159`) — the
engine computes them itself).

PageRank as iterative DataFrame joins — no GraphX, no RDDs:

    rank_{i+1}(v) = (1-d) + d * Σ_{u→v} rank_i(u) / outdeg(u)

Each iteration is one join (ranks ⋈ edges on src) + one groupBy(dst):
two shuffles over the edge relation, the textbook Spark shape. At
100 TB-scale graphs you would pre-partition edges and ranks on the same
key so the join is co-located (see ``operators/bucketing``), checkpoint
every ~5 iterations to cut lineage, and let AQE handle hub-node skew
(or salt, ``operators/skew``).

A fixed iteration count keeps the computation exactly expressible as an
unrolled SQL oracle (graph.sql_pagerank) — both engines run the same
dataflow, so values match to float precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

DAMPING = 0.85


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = DAMPING,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous updates.

    Node universe = src ∪ dst; dangling nodes (no out-edges) contribute
    nothing (the simple variant — matches the unrolled oracle exactly).
    Ranks start at 1.0; rank_{i+1} = (1-d) + d·Σ_in rank_i/outdeg.
    """
    # edges may be an expensive derivation (e.g. a distinct over a fact
    # table): persist it — it is scanned 4x building the invariants below
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        # loop invariant: re-read every iteration for the dangling-node
        # left join, and again for the initial ranks
        .persist()
    )
    deg = out_degrees(edges, src)
    # contribution edge list: (src, dst, 1/outdeg) — computed once,
    # reused every iteration (cache: it is the loop invariant)
    contrib_edges = (
        edges.join(deg, src)
        .select(F.col(src).alias("c_src"), F.col(dst).alias("c_dst"), (F.lit(1.0) / F.col("outdeg")).alias("w"))
        # persist hash-partitioned on the join key: every iteration's
        # join reuses this distribution, so only the (small) ranks side
        # shuffles per iteration — the edge relation moves ONCE total
        .repartition("c_src")
        .persist()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        inflow = (
            contrib_edges.join(ranks, contrib_edges.c_src == ranks.node)
            .select(F.col("c_dst").alias("node"), (F.col("rank") * F.col("w")).alias("flow"))
            .groupBy("node")
            .agg(F.sum("flow").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks


def sql_pagerank(
    edges_sql: str,
    iterations: int = 3,
    damping: float = DAMPING,
) -> str:
    """The same fixed-iteration PageRank as unrolled ANSI SQL (DuckDB
    oracle). ``edges_sql`` must select columns (src, dst)."""
    d = damping
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "ce AS (SELECT e.src AS c_src, e.dst AS c_dst, 1.0 / deg.outdeg AS w FROM edges e JOIN deg ON e.src = deg.src)",
        "r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f"""i{i + 1} AS (
              SELECT ce.c_dst AS node, SUM(r{i}.rank * ce.w) AS inflow
              FROM ce JOIN r{i} ON ce.c_src = r{i}.node GROUP BY ce.c_dst)"""
        )
        parts.append(
            f"""r{i + 1} AS (
              SELECT n.node, {1.0 - d!r} + {d!r} * COALESCE(i{i + 1}.inflow, 0.0) AS rank
              FROM nodes n LEFT JOIN i{i + 1} ON n.node = i{i + 1}.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, ROUND(rank, 6) AS rank FROM r{iterations}"
    )
