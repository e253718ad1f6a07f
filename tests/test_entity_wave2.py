"""Round additions: MATCH_RECOGNIZE-lite spans and quality-aware
survivorship primitives on crafted inputs."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import Window


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_match_spans_islands_semantics(spark):
    """view view purchase -> one span of 2 views; a view run followed by
    click must NOT match; purchase without preceding view must not
    match; two separate runs both match."""
    rows = [
        (1, 1, _t(0), "view"),
        (1, 2, _t(1), "view"),
        (1, 3, _t(2), "purchase"),   # span: 2 views
        (1, 4, _t(3), "view"),
        (1, 5, _t(4), "click"),      # broken pattern
        (1, 6, _t(5), "purchase"),   # no views directly before -> no match
        (2, 7, _t(0), "view"),
        (2, 8, _t(1), "purchase"),   # span: 1 view
    ]
    ev = _ev(spark, rows)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w_all))
    w_v = Window.partitionBy("user_id").orderBy("rn")
    v = r.filter(F.col("event_type") == "view").withColumn(
        "grp", F.col("rn") - F.row_number().over(w_v)
    )
    runs = v.groupBy("user_id", "grp").agg(
        F.min("ts").alias("start_ts"),
        F.count(F.lit(1)).alias("n_views"),
        (F.max("rn") + F.lit(1)).alias("next_rn"),
    )
    purch = r.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("rn").alias("next_rn"), F.col("ts").alias("end_ts")
    )
    got = {
        (x.user_id, x.start_ts, x.end_ts): x.n_views
        for x in runs.join(purch, ["user_id", "next_rn"]).collect()
    }
    assert got == {
        (1, _t(0), _t(2)): 2,
        (2, _t(0), _t(1)): 1,
    }


def test_quality_survivor_argmax_rounds_before_pick(spark):
    """Survivor = max alpha_ratio (6dp), ties to smaller id: two docs
    whose alpha ratios agree at 6dp must resolve by id."""
    from ug_dwh_etl_spark.operators.textstats import quality_scores

    docs = spark.createDataFrame(
        [
            (1, "abc def!!"),       # alpha 6/9
            (2, "abcd efgh!!!!!!"), # alpha 8/15 lower
            (3, "fed cba!!"),       # alpha 6/9 == doc 1 -> tie, id wins
        ],
        "doc_id long, text string",
    )
    qual = quality_scores(docs, "doc_id", "text").select("doc_id", "alpha_ratio")
    mem = qual.withColumn("cluster_id", F.lit(1))
    pick = F.min_by(
        F.struct(F.col("doc_id"), F.col("alpha_ratio")),
        F.struct((-F.col("alpha_ratio")).alias("neg"), F.col("doc_id")),
    )
    row = (
        mem.groupBy("cluster_id")
        .agg(pick["doc_id"].alias("survivor_id"))
        .collect()[0]
    )
    assert row.survivor_id == 1


def test_node2vec_bias_classes(spark):
    """Candidate weights: return=1, distance-1=2, distance-2=4 on a
    triangle-with-tail graph (walker at 3, prev=2)."""
    import pyspark.sql.functions as F

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    und = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    cur = spark.createDataFrame([(3, 3, 2)], "walk_id long, node long, prev long")
    t_adj = und.select(F.col("src").alias("ts"), F.col("dst").alias("td"))
    w = (
        F.when(F.col("dst") == F.col("prev"), F.lit(1))
        .when(F.col("td").isNotNull(), F.lit(2))
        .otherwise(F.lit(4))
    )
    got = {
        r.dst: r.w
        for r in cur.join(und, und["src"] == cur["node"])
        .join(t_adj, (F.col("ts") == F.col("prev")) & (F.col("td") == F.col("dst")), "left")
        .select("dst", w.alias("w"))
        .collect()
    }
    assert got == {2: 1, 1: 2, 4: 4}  # return / shares edge with prev / far
