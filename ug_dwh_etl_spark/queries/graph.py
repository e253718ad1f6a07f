"""Link-graph queries: PageRank over a deterministic edge table.

Edge stand-in (FIXTURES.md §B2 — the inlinks edge CSV): the distinct
supplier→part bipartite relation from lineitem. Both engines derive the
identical edge set, and the fixed-iteration dataflow is unrolled into
the oracle SQL, so ranks match to float precision."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ug_dwh_etl_spark.operators.graph import pagerank, sql_connected_components, sql_pagerank
from ug_dwh_etl_spark.queries.registry import register, table

# supplier s<k> links to part p<k>; prefixes keep the two node
# namespaces disjoint so the graph is a real bipartite link graph
_EDGES_SQL = """
    SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src,
                    'p' || l_partkey::VARCHAR AS dst
    FROM lineitem
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()


@register("graph_pagerank", sql_pagerank(_EDGES_SQL, iterations=3))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(_edges(spark, sf_dir), iterations=3, loop_partitions=16)
    return ranks.select("node", F.round("rank", 4).alias("rank"))


@register(
    "graph_degree_stats",
    """
    WITH edges AS (
      SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src,
                      'p' || l_partkey::VARCHAR AS dst
      FROM lineitem)
    SELECT 'out' AS side, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(d) AS BIGINT) AS max_degree, ROUND(AVG(d), 6) AS avg_degree
    FROM (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
    UNION ALL
    SELECT 'in' AS side, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(d) AS BIGINT) AS max_degree, ROUND(AVG(d), 6) AS avg_degree
    FROM (SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst)
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)

    def side(col: str, label: str) -> DataFrame:
        return (
            edges.groupBy(col)
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(
                F.lit(label).alias("side"),
                F.count(F.lit(1)).alias("n_nodes"),
                F.max("d").alias("max_degree"),
                F.round(F.avg("d"), 6).alias("avg_degree"),
            )
        )

    return side("src", "out").unionByName(side("dst", "in"))


@register(
    "graph_cheirank",
    sql_pagerank(
        """
        SELECT DISTINCT 'p' || l_partkey::VARCHAR AS src,
                        's' || l_suppkey::VARCHAR AS dst
        FROM lineitem
        """,
        iterations=3,
    ),
)
def graph_cheirank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CheiRank — the second rank column the reference ingests per URL
    (`Audisto/audisto.py:147-148`): PageRank over the REVERSED edge set
    (communicativity instead of popularity). Same operator, edges
    flipped."""
    edges = _edges(spark, sf_dir).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    ranks = pagerank(edges, iterations=3, loop_partitions=16)
    return ranks.select("node", F.round("rank", 4).alias("rank"))



# disjoint-by-construction community subgraph for the components query:
# supplier s<k> links part p<j> only when k % 10 == j % 10
_COMMUNITY_EDGES_SQL = """
    SELECT DISTINCT 's' || l_suppkey::VARCHAR AS src,
                    'p' || l_partkey::VARCHAR AS dst
    FROM lineitem WHERE l_suppkey % 10 = l_partkey % 10
"""


def _community_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") % 10 == F.col("l_partkey") % 10
    )
    return li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()


@register(
    "graph_components",
    sql_connected_components(_COMMUNITY_EDGES_SQL, iterations=3)
    + """
    SELECT label AS component, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l3 GROUP BY label HAVING COUNT(*) > 1
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (bounded min-label propagation, 3 rounds)
    aggregated to (component, n_nodes) for non-singleton groups — the
    'site cluster' report over an inlinks edge table, same machinery as
    the near-dup clusterer. Runs on the residue-class community
    subgraph (supplier links part only when suppkey%10 == partkey%10),
    which has genuinely disjoint components — the full bipartite graph
    collapses to one giant component and checks nothing. 3 rounds do
    not fully converge these diameters; the oracle runs the identical
    bounded dataflow, so the comparison is exact either way."""
    from ug_dwh_etl_spark.operators.graph import connected_components

    comp = connected_components(
        _community_edges(spark, sf_dir), iterations=3, loop_partitions=16
    )
    return (
        comp.groupBy(F.col("component"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .filter(F.col("n_nodes") > 1)
    )
