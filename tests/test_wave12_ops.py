"""Invariant tests for the round-5 wave-12 operators, on top of the
oracle gate (which proves cross-engine value equality but not the
semantic bounds asserted here)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from ug_dwh_etl_spark.queries.registry import QUERIES

    return QUERIES[name].fn(spark, SF)


def test_hits_sides_average_to_one(spark):
    rows = _run(spark, "graph_hits").collect()
    by_side = {}
    for r in rows:
        by_side.setdefault(r.side, []).append(r.score)
    assert set(by_side) == {"hub", "auth"}
    for side, scores in by_side.items():
        assert all(s >= 0 for s in scores), side
        assert abs(sum(scores) / len(scores) - 1.0) < 1e-3, side


def test_hits_scores_track_degree_direction(spark):
    # the top hub must out-score the bottom hub (HITS is degree-seeded;
    # a flat score vector would mean the iteration did nothing)
    rows = [r for r in _run(spark, "graph_hits").collect() if r.side == "hub"]
    scores = sorted(r.score for r in rows)
    assert scores[-1] > scores[0]


def test_bfs_seeds_at_zero_and_neighbors_adjacent(spark):
    dist = {r.node: r.dist for r in _run(spark, "graph_bfs_distance").collect()}
    from ug_dwh_etl_spark.queries.registry import table

    expected_seeds = {
        f"s{r.s_suppkey}"
        for r in table(spark, SF, "supplier").filter(F.col("s_suppkey") <= 3).collect()
    }
    seeds = {n for n, d in dist.items() if d == 0}
    assert seeds == expected_seeds
    assert all(0 <= d <= 4 for d in dist.values())
    # bipartite graph: suppliers sit at even distance, parts at odd
    for node, d in dist.items():
        assert d % 2 == (0 if node.startswith("s") else 1), node


def test_t_closeness_tvd_is_a_distance(spark):
    rows = _run(spark, "privacy_t_closeness").collect()
    for r in rows:
        assert 0.0 <= r.tvd <= 1.0
        assert r.t_violation == (r.tvd > 0.2)


def test_ljung_box_stat_nonnegative(spark):
    row = _run(spark, "events_ljung_box").collect()[0]
    assert row.q_stat >= 0.0
    assert row.n_lags == 6
    assert row.reject_white_noise == (row.q_stat > 12.5916)


def test_readability_bands_partition_scores(spark):
    rows = _run(spark, "text_readability").collect()
    assert rows
    for r in rows:
        assert r.n_syllables >= r.n_words  # >= 1 syllable per word
        if r.band == "easy":
            assert r.flesch >= 60
        elif r.band == "difficult":
            assert 30 <= r.flesch < 60
        else:
            assert r.flesch < 30


def test_global_shuffle_positions_are_dense_and_deterministic(spark):
    df = _run(spark, "corpus_global_shuffle")
    rows = df.collect()
    n_docs = len({r.doc_id for r in rows})
    assert len(rows) == n_docs  # one row per doc
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # determinism: a second run yields the identical assignment
    again = {(r.doc_id, r.shard, r.pos) for r in _run(spark, "corpus_global_shuffle").collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_aspect_buckets_cover_all_images(spark):
    rows = _run(spark, "multimodal_aspect_buckets").collect()
    total = sum(r.n_images for r in rows)
    from ug_dwh_etl_spark.queries.registry import table

    n_images = table(spark, SF, "documents").filter(F.col("doc_id") % 3 == 0).count()
    assert total == n_images
    for r in rows:
        assert r.n_batches == -(-r.n_images // 32)
        assert 0 <= r.n_padding < 32


def test_containment_dominates_jaccard(spark):
    rows = _run(spark, "dedup_containment_pairs").collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 < r.jaccard <= 1.0
        assert r.containment >= r.jaccard  # min(|A|,|B|) <= |A∪B|
        assert r.containment >= 0.8
