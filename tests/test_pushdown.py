"""Plan-shape tests: filters and projections must reach the parquet
scan (SURVEY.md §4 — "what Catalyst gives for free" has to actually
show up in the physical plan, or a 100 TB scan reads 100 TB).

Checks the *executed/optimized* plan text for:
- PushedFilters: the predicate at the scan node (row-group pruning);
- ReadSchema: only the referenced columns in the scan schema;
- WholeStageCodegen: the expression pipeline is JVM-compiled.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushed_to_parquet_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") < 24).select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    assert "PushedFilters" in plan, plan
    assert "LessThan(l_quantity,24" in plan.replace(" ", ""), plan


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # 2-column projection over an 11-column table: the scan schema must
    # contain only the 2 referenced columns
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _formatted(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    schema_line = read_schema[0]
    assert "l_returnflag" in schema_line and "l_quantity" in schema_line
    assert "l_extendedprice" not in schema_line, schema_line
    assert "l_shipdate" not in schema_line, schema_line


def test_query_layer_pushes_date_filter(spark):
    # the registered q6 plan: shipdate range + discount + quantity all
    # reach the scan as parquet pushed filters
    from ug_dwh_etl_spark.queries.registry import QUERIES

    df = QUERIES["q6_forecast_revenue"].fn(spark, SF_DIR)
    plan = _formatted(df)
    compact = plan.replace(" ", "")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in compact, plan
    assert "LessThan(l_quantity,24" in compact, plan


def test_whole_stage_codegen_spans_expressions(spark):
    # reference-shaped derive chain (url levels + regex case) must stay
    # inside WholeStageCodegen — no Python UDF boundary (BatchEvalPython)
    from ug_dwh_etl_spark.functions.urls import url_levels
    from ug_dwh_etl_spark.functions.text import regex_case

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = docs.select(
        *[c.alias(n) for n, c in url_levels(F.col("source")).items()],
        regex_case(
            F.col("source"),
            [("(?i)internal", "Internal"), ("(?i)partner", "Whitelabel")],
            "External",
        ).alias("website_type"),
    )
    plan = _executed_plan(df)
    # "*(1)" prefix = the operator runs inside WholeStageCodegen stage 1
    assert "*(1) Project" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_partition_pruning_on_history_table(spark, tmp_path):
    # the crawl_date append model exists so dashboards prune partitions:
    # a one-day query over a multi-day history must scan one partition
    from ug_dwh_etl_spark.sinks.writers import append_history

    hist = str(tmp_path / "hist")
    for day in ("2026-01-01", "2026-01-02", "2026-01-03"):
        append_history(
            spark.range(10).select(
                F.col("id"), F.lit(day).alias("crawl_date")
            ),
            hist,
        )
    df = spark.read.parquet(hist).filter(F.col("crawl_date") == "2026-01-02")
    plan = _executed_plan(df)
    assert "PartitionFilters" in plan and "crawl_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert df.count() == 10


def test_append_schema_evolution_merges(spark, tmp_path):
    # day-2 adds a column (the reference's inferred CSVs drift);
    # mergeSchema reconciles, old rows read NULL for the new column
    from ug_dwh_etl_spark.sinks.writers import append_history

    hist = str(tmp_path / "hist")
    append_history(
        spark.range(5).select(F.col("id"), F.lit("2026-01-01").alias("crawl_date")),
        hist,
    )
    append_history(
        spark.range(5).select(
            F.col("id"),
            F.lit(1.5).alias("new_metric"),
            F.lit("2026-01-02").alias("crawl_date"),
        ),
        hist,
    )
    df = spark.read.option("mergeSchema", True).parquet(hist)
    assert set(df.columns) == {"id", "new_metric", "crawl_date"}
    old = df.filter(F.col("crawl_date") == "2026-01-01")
    assert old.filter(F.col("new_metric").isNull()).count() == 5


def test_dynamic_partition_pruning_via_dim_join(spark, tmp_path):
    """DPP: when the partition filter is only knowable through a joined
    dimension (the star-schema dashboard shape), Spark must inject a
    runtime subquery filter on the partition column instead of scanning
    every crawl_date partition. At 100 TB this is the difference between
    reading one day and reading years."""
    from ug_dwh_etl_spark.sinks.writers import append_history

    hist = str(tmp_path / "hist")
    for day in ("2026-01-01", "2026-01-02", "2026-01-03"):
        append_history(
            spark.range(200).select(
                F.col("id"), F.lit(day).alias("crawl_date")
            ),
            hist,
        )
    dim = spark.createDataFrame(
        [("2026-01-02", "latest")], "crawl_date string, tag string"
    )
    fact = spark.read.parquet(hist)
    joined = fact.join(dim.filter(F.col("tag") == "latest"), "crawl_date")
    plan = _executed_plan(joined)
    assert "dynamicpruning" in plan.lower() or "SubqueryBroadcast" in plan, plan[:2000]
    assert joined.count() == 200


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level filtering: a selective filter on the dim side of
    a shuffle join must inject a bloom filter on the fact side (Spark's
    runtime.bloomFilter rewrite) — at 100 TB this skips most of the fact
    scan's shuffle write for free. Broadcast is disabled to force the
    shuffle-join shape where the bloom matters."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = "/root/testdata/sf0.01"
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "bloomfilter" in plan or "bloom_filter" in plan
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_bloom_pruned_query_injects_runtime_filter(spark):
    # the registered query's own conf scope must produce the injected
    # might_contain on the lineitem side, and restore every conf after
    from ug_dwh_etl_spark.queries.relational_ext import (
        _BLOOM_CONFS,
        bloom_pruned_join_frame,
    )

    before = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    saved = dict(before)
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = bloom_pruned_join_frame(spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    from ug_dwh_etl_spark.queries import QUERIES

    QUERIES["join_bloom_pruned"].fn(spark, "/root/testdata/sf0.001").collect()
    after = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    assert after == before


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic Partition Pruning: a hive-partitioned fact joined to a
    selectively-filtered dim must get a runtime `dynamicpruning`
    subquery on its partition column — at 100 TB this is the difference
    between scanning one day and scanning the table when the pruning
    value is only known at run time (dim filter, not a literal). The
    partition-level sibling of the runtime bloom-filter row test."""
    fact_path = str(tmp_path / "fact")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fact = orders.withColumn(
        "od", F.date_format("o_orderdate", "yyyy-MM").cast("string")
    )
    fact.write.partitionBy("od").parquet(fact_path)
    # the pruning predicate must be RUNTIME-only (a dim attribute, not a
    # literal on the join key — a literal constraint-propagates into a
    # STATIC partition filter, which is stronger but a different feature)
    dim = fact.select("od").distinct().withColumn("flag", F.col("od").endswith("-01"))
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)

    f = spark.read.parquet(fact_path)
    # the static range predicate keeps the optimizer's benefit estimate
    # above the DPP threshold on this small fixture; `flag` stays the
    # runtime-only part the subquery must deliver
    d = (
        spark.read.parquet(dim_path)
        .filter(F.col("flag") & (F.col("od") > "1997"))
        .select("od")
    )
    j = f.join(d, "od").groupBy().count()
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan
    # correctness: the DPP'd join equals the statically-filtered count
    expect = f.filter(F.col("od").endswith("-01") & (F.col("od") > "1997")).count()
    assert j.collect()[0]["count"] == expect
