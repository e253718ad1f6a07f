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
            "order_date": ("orders", None),  # derived day grain (string)
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
    if name == "order_date":
        return F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd")
    return F.col(FACTS[spec.fact]["dimensions"][name][1])


def _dim_sql(spec: MetricSpec, name: str) -> str:
    if name == "order_year":
        return "CAST(year(CAST(o_orderdate AS DATE)) AS INT)"
    if name == "order_date":
        return "strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')"
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


# --- aggregate navigator, windowed-metric class ------------------------------
# Trailing-N-day metrics are NOT additive across days, but they are
# DECOMPOSABLE: trailing_N(day) folds the last N daily partials of an
# additive metric. So a dashboard's "7-day revenue" routes to the daily
# rollup exactly like a plain additive slice — the fact is never
# rescanned; the window runs over a days x dims relation whose size is
# bounded by the calendar, not the data. The fold per metric class
# reuses the re-agg discipline (money re-sums cent-exact decimals).

_TRAILING_EPOCH = "1990-01-01"


def _trailing_fold(reagg, m: str, w) -> Column:
    if reagg is _REAGG_MONEY:
        return F.round(
            F.sum(F.col(m).cast("decimal(18,2)")).over(w), 2
        ).cast("double")
    if reagg is _REAGG_DECIMAL:
        return F.sum(F.col(m).cast("decimal(18,2)")).over(w).cast("double")
    if reagg is _REAGG_COUNT:
        return F.sum(F.col(m)).over(w).cast("long")
    raise ValueError(f"metric {m} has no trailing-window fold rule")


def _trailing_fold_sql(reagg, m: str) -> str:
    if reagg is _REAGG_MONEY:
        return f"CAST(ROUND(SUM(CAST({m} AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE)"
    if reagg is _REAGG_DECIMAL:
        return f"CAST(SUM(CAST({m} AS DECIMAL(18,2))) OVER w AS DOUBLE)"
    if reagg is _REAGG_COUNT:
        return f"CAST(SUM({m}) OVER w AS BIGINT)"
    raise ValueError(f"metric {m} has no trailing-window fold rule")


def _validate_trailing(spec: MetricSpec, date_dim: str, window_days: int) -> None:
    spec.validate()
    if date_dim not in spec.dimensions:
        raise ValueError(f"spec must slice by the date grain {date_dim!r}")
    if not spec.additive:
        raise ValueError("trailing-window routing needs all-additive metrics")
    if spec.filters:
        raise ValueError("trailing-window routing does not support fact filters")
    if window_days < 1:
        raise ValueError("window_days must be >= 1")


def compile_trailing_window(
    spec: MetricSpec,
    spark: SparkSession,
    sf_dir: str,
    rollup: str,
    date_dim: str = "order_date",
    window_days: int = 7,
) -> DataFrame:
    """Route a trailing-N-day metric query to a DAY-GRAIN rollup: read
    the materialized daily partials, and fold each metric over a
    calendar RANGE frame ([day - N + 1, day], so gap days count as
    zero) partitioned by the non-date dimensions. The fact table is
    never scanned; the window's input is |days| x |dims| rows —
    calendar-bounded regardless of fact size, so the per-partition sort
    inside the window is a few thousand rows even at 100 TB."""
    from pyspark.sql import Window

    _validate_trailing(spec, date_dim, window_days)
    base = spark.read.parquet(rollup)
    missing = [
        c for c in (*spec.dimensions, *spec.metrics) if c not in base.columns
    ]
    if missing:
        raise ValueError(f"rollup lacks columns: {missing}")
    other = [d for d in spec.dimensions if d != date_dim]
    day_num = F.datediff(F.to_date(date_dim), F.lit(_TRAILING_EPOCH))
    w = (
        Window.partitionBy(*other)
        .orderBy(day_num)
        .rangeBetween(-(window_days - 1), 0)
    )
    model = FACTS[spec.fact]
    cols = [F.col(d) for d in spec.dimensions] + [
        _trailing_fold(model["metrics"][m][3], m, w).alias(
            f"{m}_{window_days}d"
        )
        for m in spec.metrics
    ]
    return base.select(*cols)


def trailing_oracle_for_spec(
    spec: MetricSpec, date_dim: str = "order_date", window_days: int = 7
) -> str:
    """The trailing-window route's oracle: the SAME daily partials
    (generated by oracle_for_spec) folded over the SAME calendar range
    frame — one definition, both engines."""
    _validate_trailing(spec, date_dim, window_days)
    model = FACTS[spec.fact]
    other = [d for d in spec.dimensions if d != date_dim]
    part = ("PARTITION BY " + ", ".join(other) + " ") if other else ""
    folds = ",\n           ".join(
        f"{_trailing_fold_sql(model['metrics'][m][3], m)} AS {m}_{window_days}d"
        for m in spec.metrics
    )
    dims = ", ".join(spec.dimensions)
    return f"""
    WITH daily AS ({oracle_for_spec(spec)})
    SELECT {dims},
           {folds}
    FROM daily
    WINDOW w AS ({part}ORDER BY date_diff('day', DATE '{_TRAILING_EPOCH}',
                                          CAST({date_dim} AS DATE))
                 RANGE BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)
    """


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
