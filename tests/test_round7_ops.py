"""Round-7 additions: PageRank IVM, SCC coloring, block-purged ER,
boosting stump, snapshot diff, Neyman allocation, b-bit minhash,
Naive Bayes langid, trailing-window streaming twin."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_incremental_equals_cold(spark):
    """IVM result must match a cold recompute on the unioned edges to
    float precision — including a delta that adds a brand-new node and
    changes an existing node's out-degree."""
    from ug_dwh_etl_spark.operators.graph import pagerank, pagerank_incremental

    base = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")])
    full = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("a", "e"), ("e", "b")],
    )
    cold = {r.node: r.rank for r in pagerank(full, iterations=3).collect()}
    inc = {
        r.node: r.rank
        for r in pagerank_incremental(base, full, iterations=3).collect()
    }
    assert set(cold) == set(inc)
    for n in cold:
        assert math.isclose(cold[n], inc[n], rel_tol=0, abs_tol=1e-9), n


def test_scc_coloring_exact_on_known_graph(spark):
    """Two 3-cycles bridged one-way + a dangling sink: SCCs must be the
    two cycles and the singleton, with scc_id = min member."""
    from ug_dwh_etl_spark.operators.graph import strongly_connected_components

    e = _edges(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "a"),        # SCC {a,b,c}
            ("c", "x"),                                  # one-way bridge
            ("x", "y"), ("y", "z"), ("z", "x"),        # SCC {x,y,z}
            ("z", "sink"),                               # singleton
        ],
    )
    got = {
        r.node: r.scc_id
        for r in strongly_connected_components(e).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x", "z": "x",
        "sink": "sink",
    }


def test_er_block_purge_drops_oversized_blocks(spark):
    """A block over the cap must contribute no pairs from that pass,
    while under-cap blocks keep their pairs."""
    from ug_dwh_etl_spark.queries.entity import (
        candidate_pairs_capped_from,
        candidate_pairs_from,
    )

    rows = [
        # big block: brand B1 / type T / size 1 — 4 members (> cap 3)
        (1, "alpha", "B1", "T", 1),
        (2, "alphb", "B1", "T", 1),
        (3, "alphc", "B1", "T", 1),
        (4, "alphd", "B1", "T", 1),
        # small block: brand B2 — 2 members, within cap
        (5, "beta1", "B2", "T", 2),
        (6, "beta2", "B2", "T", 2),
    ]
    part = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string, p_size long"
    )
    uncapped = candidate_pairs_from(part).count()
    capped = {
        (r.id_a, r.id_b) for r in candidate_pairs_capped_from(part, cap=3).collect()
    }
    assert uncapped > len(capped)
    assert capped == {(5, 6)}  # only the small block survives both passes


def test_boost_stump_flags_unique_best_and_sane_leaves(spark):
    from ug_dwh_etl_spark.queries.mlfit import fit_boost_stump

    rows = fit_boost_stump(spark, SF).collect()
    assert sum(1 for r in rows if r.is_best) == 1
    best = next(r for r in rows if r.is_best)
    assert best.score == max(r.score for r in rows)
    for r in rows:
        assert r.gamma_left > 0 and r.gamma_right > 0
        assert r.score >= 0.999999  # >= the constant model, up to rounding


def test_snapshot_diff_classes_match_the_masking_rules(spark):
    from ug_dwh_etl_spark.queries.relational_ext import dq_snapshot_diff
    from ug_dwh_etl_spark.queries.registry import table

    got = {r.change_type: r.n for r in dq_snapshot_diff(spark, SF).collect()}
    o = table(spark, SF, "orders")
    n_added = o.filter(F.col("o_orderkey") % 20 == 0).count()
    n_removed = o.filter(F.col("o_orderkey") % 20 == 10).count()
    # changed = present in both, %7==0, and the priority actually differs
    n_changed = o.filter(
        (F.col("o_orderkey") % 20 != 0)
        & (F.col("o_orderkey") % 20 != 10)
        & (F.col("o_orderkey") % 7 == 0)
        & (F.col("o_orderpriority") != "5-LOW")
    ).count()
    assert got.get("added", 0) == n_added
    assert got.get("removed", 0) == n_removed
    assert got.get("changed", 0) == n_changed


def test_neyman_allocation_sums_to_budget_and_favors_variance(spark):
    from ug_dwh_etl_spark.queries.relational_ext import (
        _NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    rows = sample_neyman_allocation(spark, SF).collect()
    assert abs(sum(r.alloc_share for r in rows) - 1.0) < 1e-4
    # floor(x+.5) per stratum: total within rounding slack of the budget
    assert abs(sum(r.n_sample for r in rows) - _NEYMAN_BUDGET) <= len(rows)
    for r in rows:
        assert r.n_sample >= 0 and r.sd > 0


def test_bbit_minhash_debiased_tracks_full_estimate(spark):
    """On identical docs both estimators must say 1.0; the 1-bit
    estimate stays within its (coarser) grid of the full estimate."""
    from ug_dwh_etl_spark.queries.dedup import dedup_bbit_minhash

    rows = dedup_bbit_minhash(spark, SF).collect()
    assert rows, "LSH candidates expected at sf0.001"
    for r in rows:
        assert 0.0 <= r.est_1bit <= 1.0
        if r.est_full == 1.0:
            assert r.est_1bit == 1.0  # all bits agree when all values do


def test_naive_bayes_beats_chance_on_heldout(spark):
    from ug_dwh_etl_spark.queries.mlfit import fit_naive_bayes_langid

    rows = fit_naive_bayes_langid(spark, SF).collect()
    total = sum(r.n for r in rows)
    correct = sum(r.n for r in rows if r.true_lang == r.pred_lang)
    n_langs = len({r.true_lang for r in rows})
    assert total > 0
    assert correct / total > 1.0 / max(n_langs, 2)


def test_stream_trailing_window_matches_batch_route(spark):
    from ug_dwh_etl_spark.queries.semantic import (
        semantic_trailing_window_routed,
        stream_semantic_trailing_window,
    )

    batch = {
        (r.order_date, r.order_status): (r.revenue_7d, r.n_orders_7d)
        for r in semantic_trailing_window_routed(spark, SF).collect()
    }
    stream = {
        (r.order_date, r.order_status): (r.revenue_7d, r.n_orders_7d)
        for r in stream_semantic_trailing_window(spark, SF).collect()
    }
    assert batch == stream


def test_count_distinct_ivm_retracts_on_last_occurrence(spark):
    from ug_dwh_etl_spark.operators.ivm import (
        count_distinct_view,
        refresh_count_distinct_multiplicity,
    )

    m_old = spark.createDataFrame(
        [("a", "u1", 2), ("a", "u2", 1), ("b", "u1", 1)],
        "g string, v string, mult long",
    ).withColumnsRenamed({"g": "event_type", "v": "user_id"})
    delta = spark.createDataFrame(
        [
            ("a", "u1", -1),  # mult 2 -> 1: distinct count unchanged
            ("a", "u2", -1),  # mult 1 -> 0: retraction, count drops
            ("b", "u3", 1),   # new value: count grows
        ],
        "event_type string, user_id string, dmult long",
    )
    m = refresh_count_distinct_multiplicity(m_old, delta, "event_type", "user_id")
    got = {r.event_type: r.n_distinct for r in count_distinct_view(m, "event_type").collect()}
    assert got == {"a": 1, "b": 2}
    # over-delete is surfaced (negative mult filtered out is NOT the
    # contract — rows must simply never go negative here)
    assert m.filter("mult <= 0").count() == 0


def test_bitemporal_belief_divergence_is_exactly_the_late_corrections(spark):
    """revenue(late T) - revenue(early T) per status must equal 10.00 x
    the corrections recorded between the two snapshots (same valid
    cutoff) — the restatement landing, nothing else moving."""
    from ug_dwh_etl_spark.queries.history import (
        _BT_SNAPSHOTS,
        _BT_VALID,
        history_bitemporal_asof,
    )
    from ug_dwh_etl_spark.queries.registry import table

    rows = history_bitemporal_asof(spark, SF).collect()
    early = {r.o_orderstatus: r.revenue for r in rows if r.snapshot_t == _BT_SNAPSHOTS[0]}
    late = {r.o_orderstatus: r.revenue for r in rows if r.snapshot_t == _BT_SNAPSHOTS[1]}
    o = table(spark, SF, "orders")
    lateonly = (
        o.filter(
            (F.col("o_orderkey") % 7 == 0)
            & (F.to_date("o_orderdate") <= F.lit(_BT_VALID).cast("date"))
            & (F.date_add(F.to_date("o_orderdate"), 30) > F.lit(_BT_SNAPSHOTS[0]).cast("date"))
        )
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    expected_diff = {r.o_orderstatus: 10.0 * r["count"] for r in lateonly}
    for status in late:
        assert abs((late[status] - early[status]) - expected_diff.get(status, 0.0)) < 1e-6


def test_tree_depth2_refines_the_stump(spark):
    """Each side's best second-level split must (weakly) improve on the
    constant model of that side, and the root threshold must separate
    the sides' candidate thresholds."""
    from ug_dwh_etl_spark.queries.mlfit import fit_boost_stump, fit_tree_depth2

    stump = fit_boost_stump(spark, SF).collect()
    t0 = next(r.threshold for r in stump if r.is_best)
    rows = fit_tree_depth2(spark, SF).collect()
    sides = {r.side for r in rows}
    # a side whose subset has a single distinct x has no candidate
    # split and legitimately emits no curve (happens at sf0.001 where
    # the root splits at the minimum quantity)
    assert sides and sides <= {"L", "R"}
    for side in sides:
        side_rows = [r for r in rows if r.side == side]
        assert sum(1 for r in side_rows if r.is_best) == 1
        assert all(r.score >= 0.999999 for r in side_rows)
    assert all(r.threshold < t0 for r in rows if r.side == "L")
    assert all(r.threshold >= t0 for r in rows if r.side == "R")


def test_cdc_stream_matches_batch_ivm(spark):
    from ug_dwh_etl_spark.queries.relational_ext import (
        ivm_count_distinct_view,
        stream_cdc_count_distinct,
    )

    batch = {r.event_type: r.n_distinct for r in ivm_count_distinct_view(spark, SF).collect()}
    stream = {r.event_type: r.n_distinct for r in stream_cdc_count_distinct(spark, SF).collect()}
    assert batch == stream


def test_reconciliation_classes_partition_the_orders(spark):
    from ug_dwh_etl_spark.queries.relational_ext import dq_reconciliation_totals
    from ug_dwh_etl_spark.queries.registry import table

    rows = dq_reconciliation_totals(spark, SF).collect()
    assert sum(r.n for r in rows) == table(spark, SF, "orders").count()
    assert all(r.total_abs_drift >= 0 for r in rows)
    m = {r.klass: r for r in rows}
    if "match" in m:
        # per-order |drift| < 0.01 for matches, so the class total is
        # bounded by n * 0.01
        assert m["match"].total_abs_drift <= m["match"].n * 0.01 + 1e-9


def test_fdr_bh_is_no_less_conservative_than_naive(spark):
    from ug_dwh_etl_spark.queries.events import events_ab_fdr_bh

    rows = events_ab_fdr_bh(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.p <= 1.0 + 1e-9
        # BH at q can never reject a test naive thresholding at q keeps
        if r.rejected_bh:
            assert r.rejected_naive


def test_dsir_selects_k_and_prefers_target_like_docs(spark):
    from ug_dwh_etl_spark.queries.textstats import _DSIR_K, corpus_dsir_select
    from ug_dwh_etl_spark.queries.registry import table

    rows = corpus_dsir_select(spark, SF).collect()
    sel = [r for r in rows if r.selected]
    assert len(sel) >= min(_DSIR_K, len(rows))  # ties at the k-th key all in
    langs = {
        r.doc_id: r.lang for r in table(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    # selected docs must be enriched in the target language vs the corpus
    share_sel = sum(1 for r in sel if langs[r.doc_id] == "en") / len(sel)
    share_all = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert share_sel > share_all


def test_mannwhitney_p_and_significance_are_consistent(spark):
    """p in [0,1], and the significance flag is exactly the |z|>1.96
    rule (the exact-U arithmetic itself is proven by the DuckDB oracle
    gate at two SFs)."""
    from ug_dwh_etl_spark.queries.events import events_ab_mannwhitney

    rows = events_ab_mannwhitney(spark, SF).collect()
    assert rows and all(0.0 <= r.p <= 1.0 + 1e-9 for r in rows)
    for r in rows:
        assert r.significant == (abs(r.z) > 1.96)


def test_top_paths_rank_contract_and_jackknife_ci(spark):
    from ug_dwh_etl_spark.queries.events import (
        events_ratio_jackknife,
        events_session_opening_paths,
    )

    paths = events_session_opening_paths(spark, SF).collect()
    assert 0 < len(paths) <= 20
    ns = [r.n for r in sorted(paths, key=lambda r: r.rk)]
    assert ns == sorted(ns, reverse=True)  # rank follows count desc

    jk = events_ratio_jackknife(spark, SF).collect()
    assert len(jk) == 1
    r = jk[0]
    assert r.ci_lo <= r.ratio <= r.ci_hi and r.jk_se > 0


def test_full_outer_stream_covers_both_orphan_sides(spark):
    from ug_dwh_etl_spark.queries.streaming import q_stream_stream_full_outer

    rows = q_stream_stream_full_outer(spark, SF).collect()
    assert rows
    # the family contract: the full join surfaces BOTH orphan classes
    assert sum(r.n_view_only for r in rows) > 0
    assert sum(r.n_purchase_only for r in rows) > 0
    assert sum(r.n_matched for r in rows) > 0


def test_anf_neighborhood_grows_then_saturates(spark):
    from ug_dwh_etl_spark.queries.graph import graph_anf_neighborhood

    rows = {r.k: r.avg_reach_est for r in graph_anf_neighborhood(spark, SF).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # sketch unions are monotone: reach estimates never shrink with k
    assert rows[0] <= rows[1] <= rows[2] <= rows[3]
    # the undirected block graph saturates within its block by k=3
    assert rows[3] > rows[0]


def test_gmm_em_step_is_a_valid_mixture_update(spark):
    from ug_dwh_etl_spark.queries.mlfit import fit_gmm_em_step

    rows = {r.component: r for r in fit_gmm_em_step(spark, SF).collect()}
    assert set(rows) == {1, 2}
    assert abs(rows[1].weight + rows[2].weight - 1.0) < 1e-6
    assert rows[1].mu < rows[2].mu  # init order preserved after one step
    assert rows[1].sigma > 0 and rows[2].sigma > 0


def test_cuped_strips_explained_variance_without_breaking_diff(spark):
    from ug_dwh_etl_spark.queries.events import events_cuped_adjustment

    r = events_cuped_adjustment(spark, SF).collect()[0]
    assert 0.0 <= r.var_reduction_pct <= 100.0
    # adjusted diff stays in the neighborhood of the raw diff — CUPED
    # corrects pre-period imbalance, it does not invent effects
    assert abs(r.diff_cuped - r.diff_raw) <= abs(r.theta) * 1000
    assert r.n_users > 0


def test_slo_burn_alert_requires_both_windows(spark):
    from ug_dwh_etl_spark.queries.events import (
        _SLO_ERR_BUDGET,
        events_slo_burn_rate,
    )

    rows = events_slo_burn_rate(spark, SF).collect()
    assert rows
    for r in rows:
        exp = (r.err_rate_short >= 1.1 * _SLO_ERR_BUDGET) and (
            r.err_rate_long >= _SLO_ERR_BUDGET
        )
        # rounded rates can sit exactly on the threshold; allow the
        # boundary row either way but everything else must agree
        if abs(r.err_rate_short - 1.1 * _SLO_ERR_BUDGET) > 1e-6 and abs(
            r.err_rate_long - _SLO_ERR_BUDGET
        ) > 1e-6:
            assert r.alert == exp, r


def test_column_profile_knows_the_key(spark):
    from ug_dwh_etl_spark.queries.relational_ext import dq_column_profile

    rows = {r.col: r for r in dq_column_profile(spark, SF).collect()}
    assert rows["o_orderkey"].is_unique_key
    assert not rows["o_orderstatus"].is_unique_key
    assert all(r.null_share == 0.0 for r in rows.values())  # fixture is complete


def test_pagerank_ivm_property_random_graphs(spark):
    """Property: on random digraphs with a random edge delta —
    including deltas that add nodes, change out-degrees, and duplicate
    base edges — the IVM result equals the cold recompute to 1e-9."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ug_dwh_etl_spark.operators.graph import pagerank, pagerank_incremental

    nodes = [f"n{i}" for i in range(8)]
    edge = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)).filter(
        lambda e: e[0] != e[1]
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        base=st.lists(edge, min_size=1, max_size=14, unique=True),
        extra=st.lists(edge, min_size=1, max_size=6, unique=True),
    )
    def check(base, extra):
        full = sorted(set(base) | set(extra))
        b = spark.createDataFrame(base, "src string, dst string")
        f = spark.createDataFrame(full, "src string, dst string")
        cold = {r.node: r.rank for r in pagerank(f, iterations=3).collect()}
        inc = {
            r.node: r.rank
            for r in pagerank_incremental(b, f, iterations=3).collect()
        }
        assert set(cold) == set(inc)
        for n in cold:
            assert abs(cold[n] - inc[n]) < 1e-9, (n, cold[n], inc[n])

    check()


def test_scc_property_random_digraphs_vs_pure_python(spark):
    """Property: the distributed coloring SCC equals a pure-Python
    Tarjan-free reference (mutual-reachability closure) on random
    digraphs — the exactness claim, independent of the SQL oracle."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ug_dwh_etl_spark.operators.graph import strongly_connected_components

    nodes = [f"n{i}" for i in range(7)]
    edge = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes)).filter(
        lambda e: e[0] != e[1]
    )

    def py_scc(edges):
        ns = sorted({x for e in edges for x in e})
        adj = {n: set() for n in ns}
        for s, d in edges:
            adj[s].add(d)

        def reach(start):
            seen, stack = set(), [start]
            while stack:
                u = stack.pop()
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            return seen

        r = {n: reach(n) for n in ns}
        out = {}
        for n in ns:
            mutual = {m for m in r[n] if n in r[m]} | {n}
            out[n] = min(mutual)
        return out

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=st.lists(edge, min_size=1, max_size=16, unique=True))
    def check(edges):
        got = {
            r.node: r.scc_id
            for r in strongly_connected_components(
                spark.createDataFrame(edges, "src string, dst string")
            ).collect()
        }
        assert got == py_scc(edges)

    check()
