"""Scale-technique tests: salting preserves results; bucketed joins
eliminate the Exchange."""

from __future__ import annotations

import pyspark.sql.functions as F

from ug_dwh_etl_spark.operators.bucketing import bucketed_join, write_bucketed
from ug_dwh_etl_spark.operators.skew import salted_agg, salted_broadcast_left

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain(spark):
    from ug_dwh_etl_spark.queries.registry import table

    ev = table(spark, SF_DIR, "events")  # handles the nanos-timestamp read
    plain = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    salted = salted_agg(
        ev,
        key="event_type",
        aggs={"n": ("event_id", "count"), "s": ("value", "sum")},
        salt_from=["event_id"],
        n_salt=8,
    ).collect()
    norm = lambda rows: sorted((r.event_type, r.n, round(r.s, 6)) for r in rows)
    assert norm(plain) == norm(salted)


def test_salted_join_equals_plain(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_broadcast_left(
        orders, cust, "o_custkey", salt_from=["o_orderkey"], n_salt=8
    ).count()
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    write_bucketed(li, "t_li_bucketed", "k", 8)
    write_bucketed(orders, "t_ord_bucketed", "k", 8)
    # tiny tables would broadcast (rightly); force the join path big-big
    # tables take so the bucketed layout's shuffle elimination is visible
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_ord_bucketed", "t_li_bucketed", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
        plain = orders.join(li, "k").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
