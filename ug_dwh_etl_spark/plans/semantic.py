"""Semantic layer: compile a declarative metric spec to a DataFrame
AND its oracle SQL from ONE definition.

The reference's warehouse exists to be queried by dashboards (its
BigQuery tables are the semantic layer's physical side); this module
is the governed-metrics surface on top: a spec names METRICS and
DIMENSIONS, and the compiler resolves which star-schema joins are
needed, builds the DataFrame plan (broadcast dimension joins, one
grouped aggregate), and emits the equivalent SQL. Because the Spark
plan and the oracle SQL are generated from the same metric/dimension
definitions, parity holds BY CONSTRUCTION — define a metric once, and
every query that uses it agrees with the warehouse's SQL consumers.

Scale notes: the fact table is the only big relation; every dimension
joins via `F.broadcast` along the star edges (customer -> nation ->
region), and only the joins a spec actually references are planned —
a revenue-by-segment query never touches part or supplier. Metrics
follow the decimal-sum parity rule (money sums as DECIMAL(18,2),
double only at the edge).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

# --- star schema over the TPC-H-ish fixture ---------------------------------
# fact 'orders'; dimension edges are (table, fact_key, dim_key, [via])
_DIM_EDGES = {
    "customer": ("o_custkey", "c_custkey", None),
    "nation": ("c_nationkey", "n_nationkey", "customer"),
    "region": ("n_regionkey", "r_regionkey", "nation"),
}

# dimension name -> (owning table, column)
DIMENSIONS = {
    "region_name": ("region", "r_name"),
    "nation_name": ("nation", "n_name"),
    "mktsegment": ("customer", "c_mktsegment"),
    "order_year": ("orders", None),  # derived, see _dim_col/_dim_sql
    "order_priority": ("orders", "o_orderpriority"),
    "order_status": ("orders", "o_orderstatus"),
}

# metric name -> (DataFrame agg builder, SQL aggregate string)
METRICS = {
    "revenue": (
        lambda: F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double"),
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)",
    ),
    "n_orders": (
        lambda: F.count(F.lit(1)).cast("long"),
        "CAST(COUNT(*) AS BIGINT)",
    ),
    "n_customers": (
        lambda: F.count_distinct(F.col("o_custkey")).cast("long"),
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT)",
    ),
    "avg_order_value": (
        lambda: F.round(F.avg("o_totalprice"), 4),
        "ROUND(AVG(o_totalprice), 4)",
    ),
}


@dataclass(frozen=True)
class MetricSpec:
    """A governed-metrics query: which metrics, sliced by which
    dimensions, under which fact-side filters (SQL boolean exprs over
    fact columns — kept as strings so the same text runs through
    F.expr and the oracle)."""

    metrics: tuple[str, ...]
    dimensions: tuple[str, ...] = ()
    filters: tuple[str, ...] = field(default=())

    def validate(self) -> None:
        unknown = [m for m in self.metrics if m not in METRICS]
        unknown += [d for d in self.dimensions if d not in DIMENSIONS]
        if unknown:
            raise ValueError(f"unknown metric/dimension: {unknown}")
        if not self.metrics:
            raise ValueError("spec needs at least one metric")


def _tables_needed(spec: MetricSpec) -> list[str]:
    """Dimension tables the spec references, closed over star edges
    (region needs nation needs customer)."""
    needed: set[str] = set()
    for d in spec.dimensions:
        t = DIMENSIONS[d][0]
        while t is not None and t != "orders":
            needed.add(t)
            t = _DIM_EDGES[t][2]
    # deterministic join order: along the star chain
    order = [t for t in ("customer", "nation", "region") if t in needed]
    return order


def _dim_col(name: str) -> Column:
    if name == "order_year":
        return F.year(F.to_date("o_orderdate"))
    table, col = DIMENSIONS[name]
    return F.col(col)


def _dim_sql(name: str) -> str:
    if name == "order_year":
        return "CAST(year(CAST(o_orderdate AS DATE)) AS INT)"
    return DIMENSIONS[name][1]


def compile_spec(spec: MetricSpec, spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec -> DataFrame: fact scan, pushed filters, only the needed
    broadcast dimension joins, one grouped aggregate."""
    from ug_dwh_etl_spark.queries.registry import table

    spec.validate()
    df = table(spark, sf_dir, "orders")
    for flt in spec.filters:
        df = df.filter(F.expr(flt))
    for t in _tables_needed(spec):
        fact_key, dim_key, _via = _DIM_EDGES[t]
        dim = table(spark, sf_dir, t)
        df = df.join(F.broadcast(dim), F.col(fact_key) == F.col(dim_key))
    dims = [
        (_dim_col(d).cast("int") if d == "order_year" else _dim_col(d)).alias(d)
        for d in spec.dimensions
    ]
    aggs = [METRICS[m][0]().alias(m) for m in spec.metrics]
    if dims:
        return df.groupBy(*dims).agg(*aggs)
    return df.agg(*aggs)


def oracle_for_spec(spec: MetricSpec) -> str:
    """Spec -> the DuckDB SQL a warehouse consumer would write — same
    metric definitions, same aliases, so the result hash-matches the
    compiled DataFrame."""
    spec.validate()
    joins = ""
    for t in _tables_needed(spec):
        fact_key, dim_key, _via = _DIM_EDGES[t]
        joins += f" JOIN {t} ON {fact_key} = {dim_key}"
    where = (" WHERE " + " AND ".join(spec.filters)) if spec.filters else ""
    dim_cols = [f"{_dim_sql(d)} AS {d}" for d in spec.dimensions]
    met_cols = [f"{METRICS[m][1]} AS {m}" for m in spec.metrics]
    select = ",\n           ".join(dim_cols + met_cols)
    group = (
        " GROUP BY " + ", ".join(str(i + 1) for i in range(len(dim_cols)))
        if dim_cols
        else ""
    )
    return f"SELECT {select}\n    FROM orders{joins}{where}{group}"
