"""Semantic-layer queries: each is a DECLARATIVE MetricSpec compiled to
both the Spark plan and the DuckDB oracle by plans/semantic.py — the
governed-metrics contract where parity holds by construction (one
metric definition, every consumer agrees).

Reference anchor: the reference's BigQuery tables exist to feed
dashboards (README.md's daily-append model); this is the metrics
layer those dashboards would define on top."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ug_dwh_etl_spark.plans.semantic import (
    MetricSpec,
    compile_spec,
    oracle_for_spec,
)
from ug_dwh_etl_spark.queries.registry import register

_REV_BY_REGION = MetricSpec(
    metrics=("revenue", "n_orders", "avg_order_value"),
    dimensions=("region_name", "mktsegment"),
    filters=("o_orderdate >= '1995-01-01'",),
)

_BY_YEAR_STATUS = MetricSpec(
    metrics=("n_orders", "n_customers"),
    dimensions=("order_year", "order_status"),
)

_GLOBAL_KPIS = MetricSpec(
    metrics=("revenue", "n_orders", "n_customers", "avg_order_value"),
    filters=("o_orderpriority = '1-URGENT'",),
)


@register("semantic_revenue_by_region_segment", oracle_for_spec(_REV_BY_REGION))
def semantic_revenue_by_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue / order-count / AOV by region x market segment since
    1995 — compiled from a MetricSpec: the layer resolves that this
    slice needs the customer->nation->region chain (each a broadcast
    join), pushes the date filter to the fact scan, and reuses the
    governed 'revenue' definition (decimal-summed). The oracle SQL is
    generated from the SAME spec."""
    return compile_spec(_REV_BY_REGION, spark, sf_dir)


@register("semantic_orders_by_year_status", oracle_for_spec(_BY_YEAR_STATUS))
def semantic_orders_by_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order and distinct-customer counts by order year x status — a
    fact-only spec: the compiler plans ZERO dimension joins (tested),
    proving the layer joins only what a slice references."""
    return compile_spec(_BY_YEAR_STATUS, spark, sf_dir)


@register("semantic_global_kpis", oracle_for_spec(_GLOBAL_KPIS))
def semantic_global_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row KPI header (urgent-priority slice): all four
    governed metrics with no dimensions — the spec compiles to a
    filtered scan + single partial-aggregated global agg."""
    return compile_spec(_GLOBAL_KPIS, spark, sf_dir)
