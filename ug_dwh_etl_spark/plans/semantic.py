"""Semantic layer: compile a declarative metric spec to a DataFrame
AND its oracle SQL from ONE definition.

The reference's warehouse exists to be queried by dashboards (its
BigQuery tables are the semantic layer's physical side); this module
is the governed-metrics surface on top: a spec names a FACT, METRICS
and DIMENSIONS, and the compiler resolves which star-schema joins are
needed, builds the DataFrame plan (broadcast dimension joins, one
grouped aggregate), and emits the equivalent SQL. Because the Spark
plan and the oracle SQL are generated from the same metric/dimension
definitions, parity holds BY CONSTRUCTION — define a metric once, and
every query that uses it agrees with the warehouse's SQL consumers.

Scale notes: the fact table is the only big relation; every dimension
joins via ``F.broadcast`` along its star edges (e.g. customer ->
nation -> region), and only the joins a spec actually references are
planned — a revenue-by-segment query never touches part or supplier.
Metrics follow the decimal-sum parity rule (money sums as
DECIMAL(18,2), double only at the edge). ``materialize_rollup`` +
``compile_spec(..., rollup=...)`` add the aggregate-navigator step:
additive metrics re-aggregate from a coarser materialized rollup
instead of rescanning the fact (the OLAP cube-routing contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

# --- star schema over the TPC-H-ish fixture ---------------------------------
# per fact: dimension-table edges (fact/chain key -> dim key, via), the
# dimension name registry, and the governed metric definitions.
# A metric is (DataFrame agg builder, SQL aggregate string, additive?).
# Additive metrics (SUM/COUNT shapes) may be re-aggregated from a
# rollup; non-additive ones (AVG, COUNT DISTINCT) must hit the fact.

_DECIMAL_REV = (
    lambda col: F.round(F.sum(F.col(col).cast("decimal(18,2)")), 2).cast("double")
)

# re-aggregation builders for the navigator: how an ADDITIVE metric's
# rollup partials fold at a coarser grain (money re-applies the 2dp
# round over cent-exact partials; counts fold with a plain SUM). Kept
# IN the metric definition so a new metric cannot forget its rule.
_REAGG_MONEY = lambda m: F.round(F.sum(F.col(m).cast("decimal(18,2)")), 2).cast("double")  # noqa: E731
_REAGG_DECIMAL = lambda m: F.sum(F.col(m).cast("decimal(18,2)")).cast("double")  # noqa: E731
_REAGG_COUNT = lambda m: F.sum(m).cast("long")  # noqa: E731

FACTS = {
    "orders": {
        "edges": {
            "customer": ("o_custkey", "c_custkey", None),
            "nation": ("c_nationkey", "n_nationkey", "customer"),
            "region": ("n_regionkey", "r_regionkey", "nation"),
        },
        "dimensions": {
            "region_name": ("region", "r_name"),
            "nation_name": ("nation", "n_name"),
            "mktsegment": ("customer", "c_mktsegment"),
            "order_year": ("orders", None),  # derived — see _dim_col/_dim_sql
            "order_priority": ("orders", "o_orderpriority"),
            "order_status": ("orders", "o_orderstatus"),
        },
        "metrics": {
            "revenue": (
                lambda: _DECIMAL_REV("o_totalprice"),
                "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)",
                True,
                _REAGG_MONEY,
            ),
            "n_orders": (
                lambda: F.count(F.lit(1)).cast("long"),
                "CAST(COUNT(*) AS BIGINT)",
                True,
                _REAGG_COUNT,
            ),
            "n_customers": (
                lambda: F.count_distinct(F.col("o_custkey")).cast("long"),
                "CAST(COUNT(DISTINCT o_custkey) AS BIGINT)",
                False,
                None,
            ),
            # decimal-sum / count, NOT AVG(DOUBLE): double partial-agg
            # fold order differs across engines (and again in the
            # streaming twin), so AVG over doubles is a latent
            # .00005-boundary mismatch; the cent-exact sum is
            # order-independent and only ONE double division remains
            "avg_order_value": (
                lambda: F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    4,
                ),
                "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
                " / COUNT(*), 4)",
                False,
                None,
            ),
        },
    },
    "lineitem": {
        "edges": {
            "part": ("l_partkey", "p_partkey", None),
            "supplier": ("l_suppkey", "s_suppkey", None),
            "nation": ("s_nationkey", "n_nationkey", "supplier"),
            "region": ("n_regionkey", "r_regionkey", "nation"),
        },
        "dimensions": {
            "brand": ("part", "p_brand"),
            "part_type": ("part", "p_type"),
            "supplier_nation": ("nation", "n_name"),
            "supplier_region": ("region", "r_name"),
            "return_flag": ("lineitem", "l_returnflag"),
            "line_status": ("lineitem", "l_linestatus"),
        },
        "metrics": {
            # gross = sum(extendedprice); net = sum(extendedprice*(1-disc))
            # — the TPC-H revenue definition; products of 2dp decimals are
            # exact 4dp decimals, so the sums stay order-independent
            "gross_revenue": (
                lambda: _DECIMAL_REV("l_extendedprice"),
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)"
                " AS DOUBLE)",
                True,
                _REAGG_MONEY,
            ),
            "net_revenue": (
                lambda: F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,2)")
                        * (
                            F.lit(1).cast("decimal(18,2)")
                            - F.col("l_discount").cast("decimal(18,2)")
                        )
                    ),
                    2,
                ).cast("double"),
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
                " * (CAST(1 AS DECIMAL(18,2))"
                " - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)",
                True,
                _REAGG_MONEY,
            ),
            "discount_cost": (
                lambda: F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,2)")
                        * F.col("l_discount").cast("decimal(18,2)")
                    ),
                    2,
                ).cast("double"),
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
                " * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)",
                True,
                _REAGG_MONEY,
            ),
            "n_lines": (
                lambda: F.count(F.lit(1)).cast("long"),
                "CAST(COUNT(*) AS BIGINT)",
                True,
                _REAGG_COUNT,
            ),
            "total_qty": (
                lambda: F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double"),
                "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)",
                True,
                _REAGG_DECIMAL,
            ),
        },
    },
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
    fact: str = "orders"

    def validate(self) -> None:
        if self.fact not in FACTS:
            raise ValueError(f"unknown fact: {self.fact}")
        model = FACTS[self.fact]
        unknown = [m for m in self.metrics if m not in model["metrics"]]
        unknown += [d for d in self.dimensions if d not in model["dimensions"]]
        if unknown:
            raise ValueError(f"unknown metric/dimension: {unknown}")
        if not self.metrics:
            raise ValueError("spec needs at least one metric")

    @property
    def additive(self) -> bool:
        return all(FACTS[self.fact]["metrics"][m][2] for m in self.metrics)


def _tables_needed(spec: MetricSpec) -> list[str]:
    """Dimension tables the spec references, closed over star edges."""
    model = FACTS[spec.fact]
    needed: set[str] = set()
    for d in spec.dimensions:
        t = model["dimensions"][d][0]
        while t is not None and t != spec.fact:
            needed.add(t)
            t = model["edges"][t][2]
    order = [t for t in model["edges"] if t in needed]
    return order


def _dim_col(spec: MetricSpec, name: str) -> Column:
    if name == "order_year":
        return F.year(F.to_date("o_orderdate")).cast("int")
    return F.col(FACTS[spec.fact]["dimensions"][name][1])


def _dim_sql(spec: MetricSpec, name: str) -> str:
    if name == "order_year":
        return "CAST(year(CAST(o_orderdate AS DATE)) AS INT)"
    return FACTS[spec.fact]["dimensions"][name][1]


def compile_spec(
    spec: MetricSpec,
    spark: SparkSession,
    sf_dir: str,
    rollup: str | None = None,
) -> DataFrame:
    """Spec -> DataFrame: fact scan, pushed filters, only the needed
    broadcast dimension joins, one grouped aggregate.

    ``rollup``: path of a table written by ``materialize_rollup`` for a
    SUPERSET of this spec's dimensions. When given (and every metric is
    additive, the filters are empty — filters reference fact columns
    the rollup no longer has), the aggregate-navigator path answers by
    RE-AGGREGATING the rollup: SUM of sums, SUM of counts. The fact
    table is never scanned — the plan a BI layer wants for cube-routed
    dashboards."""
    from ug_dwh_etl_spark.queries.registry import table

    spec.validate()
    model = FACTS[spec.fact]
    if rollup is not None:
        if not spec.additive:
            raise ValueError("rollup routing needs all-additive metrics")
        if spec.filters:
            raise ValueError("rollup routing does not support fact filters")
        base = spark.read.parquet(rollup)
        missing = [
            c for c in (*spec.dimensions, *spec.metrics) if c not in base.columns
        ]
        if missing:
            raise ValueError(f"rollup lacks columns: {missing}")
        aggs = [
            model["metrics"][m][3](m).alias(m) for m in spec.metrics
        ]
        if spec.dimensions:
            return base.groupBy(*spec.dimensions).agg(*aggs)
        return base.agg(*aggs)

    df = table(spark, sf_dir, spec.fact)
    for flt in spec.filters:
        df = df.filter(F.expr(flt))
    for t in _tables_needed(spec):
        fact_key, dim_key, _via = model["edges"][t]
        dim = table(spark, sf_dir, t)
        df = df.join(F.broadcast(dim), F.col(fact_key) == F.col(dim_key))
    dims = [_dim_col(spec, d).alias(d) for d in spec.dimensions]
    aggs = [model["metrics"][m][0]().alias(m) for m in spec.metrics]
    if dims:
        return df.groupBy(*dims).agg(*aggs)
    return df.agg(*aggs)


def materialize_rollup(
    spec: MetricSpec, spark: SparkSession, sf_dir: str, out: str
) -> str:
    """Materialize a spec as a parquet rollup table for the navigator:
    all metrics must be additive (else coarser re-aggregation would be
    wrong — the classic cube-routing precondition, enforced here)."""
    if not spec.additive:
        raise ValueError("only all-additive specs can be materialized for routing")
    if spec.filters:
        # a filtered rollup would later be routed to as if it held the
        # UNFILTERED totals — the silent-wrong-results case the routed
        # side's no-filters guard exists to prevent; close it here too
        raise ValueError("only unfiltered specs can be materialized for routing")
    compile_spec(spec, spark, sf_dir).write.mode("overwrite").parquet(out)
    return out


def oracle_for_spec(spec: MetricSpec) -> str:
    """Spec -> the DuckDB SQL a warehouse consumer would write — same
    metric definitions, same aliases, so the result hash-matches the
    compiled DataFrame."""
    spec.validate()
    model = FACTS[spec.fact]
    joins = ""
    for t in _tables_needed(spec):
        fact_key, dim_key, _via = model["edges"][t]
        joins += f" JOIN {t} ON {fact_key} = {dim_key}"
    where = (" WHERE " + " AND ".join(spec.filters)) if spec.filters else ""
    dim_cols = [f"{_dim_sql(spec, d)} AS {d}" for d in spec.dimensions]
    met_cols = [f"{model['metrics'][m][1]} AS {m}" for m in spec.metrics]
    select = ",\n           ".join(dim_cols + met_cols)
    group = (
        " GROUP BY " + ", ".join(str(i + 1) for i in range(len(dim_cols)))
        if dim_cols
        else ""
    )
    return f"SELECT {select}\n    FROM {spec.fact}{joins}{where}{group}"
