"""Invariant tests for the round-5 wave-6/7/8/9 operators, on top of the
oracle gate (which proves cross-engine value equality but not the
semantic bounds asserted here)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from ug_dwh_etl_spark.queries.registry import QUERIES

    return QUERIES[name].fn(spark, SF)


def test_kcore_peeling_is_monotone(spark):
    rows = {r["round"]: r for r in _run(spark, "graph_kcore").collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    for r in range(1, 4):
        assert rows[r].n_nodes <= rows[r - 1].n_nodes
        assert rows[r].n_edges <= rows[r - 1].n_edges
    # round 0 is the raw (deduped) bipartite edge set
    assert rows[0].n_edges > 0 and rows[0].n_nodes > 0


def test_benford_shares_form_a_distribution(spark):
    rows = _run(spark, "dq_benford_totalprice").collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4
    # Benford expectation is monotone decreasing in the digit
    bshare = {r.digit: r.benford_share for r in rows}
    assert all(bshare[d] > bshare[d + 1] for d in range(1, 9))


def test_zipf_slope_is_negative_fit(spark):
    row = _run(spark, "text_zipf_slope").collect()[0]
    assert row.n_types <= 1000
    assert row.zipf_slope < 0
    assert 0.0 <= row.r2 <= 1.0


def test_k_anonymity_rates_are_consistent(spark):
    row = _run(spark, "privacy_k_anonymity").collect()[0]
    assert 0 <= row.risky_groups <= row.n_groups
    assert 0.0 <= row.suppression_rate <= 1.0
    assert (row.risky_groups == 0) == (row.suppression_rate == 0.0)


def test_zonemap_clustered_layout_skips_more(spark):
    rows = {r.layout: r for r in _run(spark, "storage_zonemap_skipping").collect()}
    assert set(rows) == {"clustered", "roworder"}
    assert rows["clustered"].skip_rate >= rows["roworder"].skip_rate
    for r in rows.values():
        assert 0 <= r.files_scanned <= r.n_files


def test_phash_pairs_are_canonical_and_bounded(spark):
    rows = _run(spark, "multimodal_phash_neardup").collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 8


def test_sorted_neighborhood_pairs_respect_threshold(spark):
    rows = _run(spark, "dedup_sorted_neighborhood").collect()
    assert rows
    for r in rows:
        assert r.key_a != r.key_b
        assert 0 <= r.lev <= 3


def test_holt_forecast_extends_level_by_trend(spark):
    rows = _run(spark, "history_holt_forecast").collect()
    assert rows
    for r in rows:
        assert r.n_months >= 1
        assert abs(r.forecast_1 - (r.level + r.trend)) < 1e-3
        assert abs(r.forecast_3 - (r.level + 3 * r.trend)) < 1e-3


def test_backtest_evaluates_more_naive_than_snaive(spark):
    rows = {r.model: r for r in _run(spark, "history_backtest_snaive").collect()}
    assert set(rows) == {"naive", "snaive"}
    # lag-1 has 11 more evaluable months than lag-12
    assert rows["naive"].n_evaluated == rows["snaive"].n_evaluated + 11
    for r in rows.values():
        assert r.mae_cents >= 0 and r.mape_pct >= 0


def test_mutual_information_bounds(spark):
    row = _run(spark, "customer_mi_segment_nation").collect()[0]
    assert row.mi_nats >= -1e-9
    assert row.mi_nats <= min(row.h_nation_nats, row.h_segment_nats) + 1e-9
    assert -1e-9 <= row.nmi <= 1.0


def test_rake_keywords_are_stopword_free_runs(spark):
    from ug_dwh_etl_spark.queries.textstats import _RAKE_STOP

    rows = _run(spark, "text_rake_keywords").collect()
    assert rows
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.n_words
        assert not set(words) & set(_RAKE_STOP)
        assert r.score > 0 and r.n_inst >= 1


def test_acf_values_are_correlations(spark):
    rows = _run(spark, "events_autocorrelation").collect()
    assert sorted(r.lag for r in rows) == [1, 2, 3, 6, 12, 24]
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0


def test_centroid_drift_cosine_bounds(spark):
    row = _run(spark, "embed_centroid_drift").collect()[0]
    assert row.n_dims == 64
    assert -1.0 <= row.centroid_cosine <= 1.0
    assert 0.0 <= row.mean_abs_shift <= row.max_abs_shift


def test_postings_delta_never_beats_raw_backwards(spark):
    rows = _run(spark, "text_postings_compression").collect()
    assert rows
    for r in rows:
        assert r.delta_bytes <= r.raw_bytes
        assert r.compression_ratio >= 1.0


def test_rrf_scores_bounded_and_ranked(spark):
    rows = _run(spark, "sim_hybrid_rrf").collect()
    assert rows
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r.rrf_score <= 2.0 / 61.0 + 1e-9
        assert r.bm25_rank is not None or r.cosine_rank is not None


def test_association_rules_probability_bounds(spark):
    rows = _run(spark, "copurchase_rules").collect()
    for r in rows:
        assert 0 < r.confidence <= 1.0
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0


def test_weighted_median_lies_within_group_range(spark):
    med = _run(spark, "agg_weighted_median")
    li = med.sparkSession.read.parquet(f"{SF}/lineitem.parquet")
    rng = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    bad = (
        med.join(rng, "suppkey")
        .filter(
            (F.col("wmedian_price") < F.col("lo"))
            | (F.col("wmedian_price") > F.col("hi"))
        )
        .count()
    )
    assert bad == 0
