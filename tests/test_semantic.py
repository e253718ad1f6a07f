"""Semantic layer (plans/semantic.py): join pruning, spec validation,
and the by-construction parity between compiled plan and generated SQL."""

from __future__ import annotations

import duckdb
import pytest

from ug_dwh_etl_spark.plans.semantic import (
    MetricSpec,
    compile_spec,
    oracle_for_spec,
)

SF = "/root/testdata/sf0.001"


def test_fact_only_spec_plans_zero_joins(spark):
    spec = MetricSpec(metrics=("n_orders",), dimensions=("order_status",))
    plan = compile_spec(spec, spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no dimension table touched


def test_region_spec_joins_exactly_the_star_chain(spark):
    spec = MetricSpec(metrics=("revenue",), dimensions=("region_name",))
    plan = (
        compile_spec(spec, spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # customer -> nation -> region are all needed; part/supplier never
    assert plan.count("BroadcastHashJoin") == 3
    for absent in ("part.parquet", "supplier.parquet", "lineitem.parquet"):
        assert absent not in plan


def test_unknown_names_rejected():
    with pytest.raises(ValueError, match="unknown"):
        MetricSpec(metrics=("revenu",)).validate()
    with pytest.raises(ValueError, match="unknown"):
        MetricSpec(metrics=("revenue",), dimensions=("region",)).validate()
    with pytest.raises(ValueError, match="at least one"):
        MetricSpec(metrics=()).validate()


def test_compiled_plan_matches_generated_sql(spark):
    """The whole point: one spec, two backends, identical answers —
    checked here on a spec no registered query uses."""
    spec = MetricSpec(
        metrics=("n_orders", "revenue"),
        dimensions=("nation_name", "order_year"),
        filters=("o_orderstatus = 'F'",),
    )
    got = {
        (r["nation_name"], r["order_year"]): (r["n_orders"], r["revenue"])
        for r in compile_spec(spec, spark, SF).collect()
    }
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    exp = {
        (n, y): (c, rev)
        for n, y, c, rev in con.execute(oracle_for_spec(spec)).fetchall()
    }
    assert got == exp


def test_rollup_routing_guards_and_plan(spark, tmp_path):
    from ug_dwh_etl_spark.plans.semantic import materialize_rollup

    base = MetricSpec(
        metrics=("gross_revenue", "n_lines"),
        dimensions=("brand", "return_flag"),
        fact="lineitem",
    )
    path = str(tmp_path / "rollup")
    materialize_rollup(base, spark, SF, path)

    routed = MetricSpec(metrics=("n_lines",), dimensions=("brand",), fact="lineitem")
    df = compile_spec(routed, spark, SF, rollup=path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "lineitem.parquet" not in plan  # fact never rescanned
    # routed == direct
    direct = compile_spec(routed, spark, SF)
    assert df.exceptAll(direct).count() == 0 and direct.exceptAll(df).count() == 0

    # guards: non-additive metrics and fact filters must refuse routing
    with pytest.raises(ValueError, match="additive"):
        compile_spec(
            MetricSpec(metrics=("avg_order_value",)), spark, SF, rollup=path
        )
    with pytest.raises(ValueError, match="filters"):
        compile_spec(
            MetricSpec(
                metrics=("n_lines",), fact="lineitem",
                filters=("l_linestatus = 'F'",),
            ),
            spark, SF, rollup=path,
        )
    with pytest.raises(ValueError, match="lacks columns"):
        compile_spec(
            MetricSpec(
                metrics=("n_lines",), dimensions=("part_type",), fact="lineitem"
            ),
            spark, SF, rollup=path,
        )
    with pytest.raises(ValueError, match="lacks columns"):
        # metric not present in the rollup (built from lineitem metrics)
        compile_spec(MetricSpec(metrics=("revenue",)), spark, SF, rollup=path)
    with pytest.raises(ValueError, match="additive"):
        materialize_rollup(
            MetricSpec(metrics=("n_customers",)), spark, SF, str(tmp_path / "x")
        )
    with pytest.raises(ValueError, match="unfiltered"):
        # a filtered rollup would later masquerade as unfiltered totals
        materialize_rollup(
            MetricSpec(
                metrics=("n_lines",), dimensions=("brand",), fact="lineitem",
                filters=("l_linestatus = 'F'",),
            ),
            spark, SF, str(tmp_path / "y"),
        )


def test_lineitem_fact_star_chain(spark):
    spec = MetricSpec(
        metrics=("net_revenue",), dimensions=("supplier_region",), fact="lineitem"
    )
    plan = (
        compile_spec(spec, spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    # supplier -> nation -> region, and NOT part/customer
    assert plan.count("BroadcastHashJoin") == 3
    for absent in ("part.parquet", "customer.parquet", "orders.parquet"):
        assert absent not in plan


def test_trailing_window_routing_plan_and_guards(spark, tmp_path):
    from ug_dwh_etl_spark.plans.semantic import (
        compile_trailing_window,
        materialize_rollup,
    )

    base = MetricSpec(
        metrics=("revenue", "n_orders"),
        dimensions=("order_date", "order_status"),
    )
    path = str(tmp_path / "daily")
    materialize_rollup(base, spark, SF, path)

    df = compile_trailing_window(
        base, spark, SF, rollup=path, date_dim="order_date", window_days=7
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "orders.parquet" not in plan  # fact never rescanned
    # answers from the rollup — asserted on inputFiles(), not the plan
    # string: the scan's Location metadata is display-truncated at 100
    # chars, so a long-enough tmp_path silently drops the dir name
    infiles = df.inputFiles()
    assert infiles and all("/daily" in f for f in infiles)

    # spot-check the fold: a day's 7d revenue == sum of that status's
    # daily partials over the trailing 7 CALENDAR days
    rows = df.collect()
    daily = {
        (r.order_date, r.order_status): (r.revenue, r.n_orders)
        for r in spark.read.parquet(path).collect()
    }
    import datetime as dt

    probe = rows[len(rows) // 2]
    d0 = dt.date.fromisoformat(probe.order_date)
    exp_n = sum(
        daily.get(((d0 - dt.timedelta(days=k)).isoformat(), probe.order_status),
                  (0.0, 0))[1]
        for k in range(7)
    )
    assert probe.n_orders_7d == exp_n

    with pytest.raises(ValueError, match="date grain"):
        compile_trailing_window(
            MetricSpec(metrics=("revenue",), dimensions=("order_status",)),
            spark, SF, rollup=path,
        )
    with pytest.raises(ValueError, match="additive"):
        compile_trailing_window(
            MetricSpec(
                metrics=("n_customers",), dimensions=("order_date",)
            ),
            spark, SF, rollup=path,
        )
    with pytest.raises(ValueError, match="filters"):
        compile_trailing_window(
            MetricSpec(
                metrics=("revenue",), dimensions=("order_date",),
                filters=("o_orderstatus = 'F'",),
            ),
            spark, SF, rollup=path,
        )
