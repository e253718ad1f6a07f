"""Entity-resolution wave: multi-pass blocking recall, transitive
clustering, and golden-record survivorship rules on tiny synthetic
dimensions (the sf0.01 oracle gate proves the same queries end-to-end)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _part(spark, rows):
    return spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    )


def test_multipass_recovers_pair_missed_by_first_pass(spark):
    """Rows 1/2 agree on (brand, size) but DISAGREE on type — only the
    second blocking pass can surface them; rows 1/3 agree on both keys
    and show n_passes=2 provenance."""
    from ug_dwh_etl_spark.queries.entity import candidate_pairs_from

    part = _part(
        spark,
        [
            (1, "red widget", "B1", "alpha", 5, 10.0),
            (2, "red widgey", "B1", "beta", 5, 11.0),  # type typo'd
            (3, "red widgex", "B1", "alpha", 5, 12.0),
            (4, "unrelated name", "B2", "gamma", 9, 1.0),
        ],
    )
    got = {
        (r.id_a, r.id_b): (r.dist, r.n_passes)
        for r in candidate_pairs_from(part).collect()
    }
    assert (1, 2) in got and got[(1, 2)][1] == 1  # brand+size pass only
    assert (1, 3) in got and got[(1, 3)][1] == 2  # both passes
    assert (2, 3) in got  # brand+size pass
    assert all(a != 4 and b != 4 for (a, b) in got)


def test_clusters_close_transitively_and_golden_rules(spark):
    """A~B and B~C but A!~C directly (distance 4) must still land in
    ONE entity; golden record picks min-key name, most-frequent type
    (tie -> lexicographically smaller), max price."""
    from ug_dwh_etl_spark.operators.graph import connected_components_converged
    from ug_dwh_etl_spark.queries.entity import candidate_pairs_from

    part = _part(
        spark,
        [
            (1, "aaaa", "B1", "t_a", 5, 10.0),
            (2, "aaabb", "B1", "t_b", 5, 30.0),  # lev(aaaa,aaabb)=2
            (3, "aabbbb", "B1", "t_a", 5, 20.0),  # lev(aaabb,aabbbb)=2, lev to 1 = 4
        ],
    )
    pairs = candidate_pairs_from(part)
    d = {(r.id_a, r.id_b): r.dist for r in pairs.collect()}
    assert (1, 2) in d and (2, 3) in d and (1, 3) not in d
    comp = connected_components_converged(
        pairs.select("id_a", "id_b"), src="id_a", dst="id_b"
    )
    assert {r.component for r in comp.collect()} == {1}
    # survivorship (mirrors er_golden_record's aggregate rules)
    mem = comp.join(part, comp["node"] == part["p_partkey"]).select(
        F.col("component").alias("cluster_id"), "p_partkey", "p_name",
        "p_type", "p_retailprice",
    )
    mode = (
        mem.groupBy("cluster_id", "p_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("cluster_id")
        .agg(
            F.min_by(
                "p_type", F.struct((-F.col("cnt")).alias("neg"), F.col("p_type"))
            ).alias("mode_type")
        )
    )
    row = (
        mem.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(
                F.when(F.col("p_partkey") == F.col("cluster_id"), F.col("p_name"))
            ).alias("canonical_name"),
            F.max("p_retailprice").alias("max_price"),
        )
        .join(mode, "cluster_id")
        .collect()[0]
    )
    assert row.n_members == 3
    assert row.canonical_name == "aaaa"
    assert row.mode_type == "t_a"  # 2 votes beats 1
    assert row.max_price == 30.0
