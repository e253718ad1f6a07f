"""Physical-plan audit over the registered query surface.

For every query (or the named subset) prints one line of plan-quality
signals and flags the anti-patterns that matter at 100 TB:

- ``cartesian``   — CartesianProduct/BroadcastNestedLoopJoin where not
                    expected (intentional: tiny scalar cross-joins);
- ``python!``     — a row-at-a-time Python eval (BatchEvalPython) —
                    banned everywhere; Arrow paths show ArrowEvalPython /
                    MapInPandas / FlatMapGroupsInPandas instead;
- ``nofilter``    — a parquet scan whose query has a filter but shows
                    no PushedFilters (pushdown broken);
- ``unpruned``    — a file scan reads a column that no operator outside
                    the scan references (column-pruning regression: the
                    scan pays I/O for bytes nothing consumes);
- ``globalwindow``— a WindowExec with an EMPTY partition spec: Spark
                    moves the window's whole input through ONE task
                    (``Exchange SinglePartition`` → single-threaded
                    Sort + running aggregate) — the serialization
                    killer at 100 TB unless the input is a provably
                    tiny post-aggregation relation (day/hour series,
                    top-k lists), which is what
                    ``EXPECTED_GLOBAL_WINDOW`` allow-lists, each with
                    its justification;
- exchange count  — shuffles in the plan (compare against the shape's
                    expected minimum, e.g. scan→agg = 1).

Streaming queries (stream_*) are audited too: running one materializes
it (AvailableNow → memory sink), after which
``streaming.jobs.LAST_BATCH_PLAN`` holds the last micro-batch's
EXECUTED physical plan — the same flags are applied to that text, plus
a ``state=`` column with the stateful-operator row counts from the
final StreamingQueryProgress.

Usage:
    python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# cross-joins of sub-8-row frames (scalar thresholds, centroid lists)
# are deliberate plan shapes, not bugs
EXPECTED_NESTED_LOOP = {
    "scalar_subquery_above_avg",
    "q22_idle_customers",
    "sim_ivf_topk",
    # same 1-row query-distance frame cross-joined onto the 8 centroids
    "sim_ivfpq_topk",
    "sim_cosine_topk",
    "sim_cosine_topk_pandas",
    "sim_ann_topk",
    # broadcast block-nested-loop IS the brute-force kNN-join algorithm
    "sim_knn_join",
    # same kNN join run twice (exact + dequantized) for the recall audit
    "sim_quantize_recall",
    # same kNN join run twice (full-dim + prefix) for the Matryoshka audit
    "sim_matryoshka_recall",
    # scalar-threshold broadcast cross-join (one-row agg)
    "q11_important_parts",
    # 1-row minmax bounds onto the scan + 1-row AUC onto the 10-bin table
    "fit_auc_roc",
    # same 1-row bounds scalar, plus the 1-row totals onto tie blocks
    "fit_pr_auc",
    # same 1-row bounds scalar, plus 1-row ECE onto the 1-row moments
    "fit_calibration_report",
    # 5-row key dim × date spine grid
    "history_gap_fill",
    # same 5-row-keys × date-spine grid, interpolation variant
    "history_interpolate",
    # three 1-row stage counts cross-joined into the funnel summary row
    "events_funnel",
    # four 1-row stage counts cross-joined into the corpus funnel row
    "corpus_pipeline_funnel",
    # 1-row corpus-size agg broadcast onto the per-term stats
    "text_tfidf_terms",
    # 1-row corpus-total agg broadcast onto the vocab top-100
    "text_vocab_coverage",
    # 1-row average broadcast onto the per-key counts
    "diag_custkey_skew",
    # 1-row unigram-total agg broadcast onto the top-50 bigrams
    "text_pmi_bigrams",
    # two 1-row scalars (corpus total, normalizer) on the 5-row lang table
    "corpus_mixture_weights",
    # 1-row budget scalar cross-joined onto the 5-row lang capacity table
    "corpus_unimax_budget",
    # 1-row est/exact scalar frames cross-joined into the audit rows;
    # 64-row register spine left-broadcast-joined (HLL fold)
    "sketch_hll_cardinality",
    "sketch_hll_daily_merge",
    # seven 1-row audit folds (counts, modularity terms) cross-joined
    # into the sweep's single result row
    "graph_louvain_move",
    # same 1-row audit folds, once per level (m, moved, a_in, b-sum,
    # community count) composed into the two per-level result rows
    "graph_louvain",
    # same scalar chain feeding the 5-row broadcast rate table
    "corpus_weighted_sample",
    # 9-quantile 1-row cutpoint frame broadcast onto per-customer RFM
    "customer_rfm_segments",
    # three 1-row counts (edges, nodes, triangles) cross-joined to one row
    "graph_triangle_count",
    # 1-row 7-percentile cutpoint frame broadcast onto the scan
    "agg_equidepth_histogram",
    # trailing-week range join against the broadcast ~30-row day spine
    "events_dau_wau",
    # same broadcast day-spine range join, tile + exact-audit sides
    "sketch_kmv_trailing_window",
    # 1-row N/avgdl stats frame broadcast onto the probe-term postings
    "text_bm25_topdocs",
    # 8-row updated-centroid frame broadcast for the Lloyd reassign pass
    "sim_kmeans_step",
    # 1-row corpus-total agg broadcast onto the per-user counts
    "events_heavy_hitters",
    # 1-row min/max grid-normalization stats broadcast onto the scan
    "storage_zorder_stats",
    # 1-row OLS fit broadcast onto the daily series
    "history_seasonal_decompose",
    # 1-row iterate/norm/Rayleigh frames broadcast per power step
    "sim_pca_power_iteration",
    # 1-row margins/totals broadcast onto the contingency table
    "customer_nation_segment_chi2",
    # broadcast query-set kNN joins, one per curve point (exact + 3 IVF)
    "sim_ivf_recall_curve",
    # 1-row time boundary + totals broadcast onto the scan
    "events_drift_psi",
    # five 1-row estimate/count frames cross-joined into the audit row
    "sketch_kmv_overlap",
    # pairwise-slope join over the bounded DAY series (the designed
    # O(days^2) Theil-Sen shape, never corpus-sized)
    "history_theil_sen",
    # 1-row mean + peak broadcasts onto the day series
    "events_cusum_changepoint",
    # 1-row horizon / n_total broadcasts onto the risk table
    "events_survival_km",
    # 1-row winning-pair broadcast onto the vocab recode
    "text_bpe_apply_merge",
    # same 1-row winner broadcast, once per merge round
    "text_bpe_train_rounds",
    # 1-row BM25 stats + ≤10-row DCG/IDCG frames cross-joined into the
    # single eval row
    "text_ndcg_bm25",
    # 1-row median x exact-F2 frames joined into the audit row
    "sketch_ams_f2",
    # three 1-row stage counts cross-joined into the ordered-funnel row
    "events_funnel_ordered",
    # 1-row digit-total broadcast onto the 9-row first-digit table
    "dq_benford_totalprice",
    # three 1-row entropy/total frames joined into the one-row MI report
    "customer_mi_segment_nation",
    # 1-row distinct-order count broadcast onto the rule table
    "copurchase_rules",
    # per-round (1-row nodes x 1-row edges) stat frames, 4 rounds
    "graph_kcore",
    # 1-row custkey-max/bounds frames broadcast onto the zone maps
    "storage_zonemap_skipping",
    # 1-row BM25 N/avgdl stats frame (inherited from text_bm25_topdocs)
    "sim_hybrid_rrf",
    # 3-row neighbor-offset spine broadcast onto the blocked sort
    "dedup_sorted_neighborhood",
    # 1-row n/mean + denominator frames broadcast onto the hourly series
    "events_ljung_box",
    # 1-row timeline-midpoint frame broadcast onto the scan (drift_psi shape)
    "events_uplift_did",
    # 1-row AMS estimate/exact frames cross-joined into the audit row
    "sketch_ams_join_size",
    # bounded negative-pool frame broadcast onto the anchor set
    "corpus_negative_samples",
    # 1-row vocab/normalizer frames broadcast onto the scoring scan
    "text_lm_quality_score",
    # 1-row sample-count frame broadcast onto the distinct-value ECDF
    "dq_ks_doclength",
    # 1-row grand-total frame broadcast onto the |S|x|S| transition table
    "events_entropy_rate",
    # 1-row newest-centroid frames broadcast per farthest-first round
    "sim_farthest_first_centroids",
    # 1-row total/normalizer scalars on the 5-row language table
    # (corpus_mixture_weights shape)
    "corpus_epochs_for_budget",
    # 24-row month spine broadcast onto the per-customer grid
    # (history_gap_fill shape)
    "customer_ltv_curve",
    # 1-row bit/member-count frames cross-joined into the audit row
    "sketch_bloom_fpr",
    # 1-row warehouse-max anchor broadcast onto the 3-row marks table
    "dq_freshness_audit",
    # 1-row as-of anchor broadcast onto the filtered scan
    "orders_backlog_aging",
    # 1-row peak/session-count frames on the endpoint sweep relation
    "events_peak_concurrency",
    # 1-row corpus-total frame broadcast onto the 2x2 cell table
    "corpus_quality_dup_matrix",
    # 5-row threshold frame broadcast-crossed onto the candidate pairs
    "dedup_threshold_curve",
    # per-edge (1-row total x 1-row orphan-count) frames, 7 edges
    "dq_foreign_key_audit",
    # 1-row exact-percentile cutpoint frame broadcast onto the scan
    # (customer_rfm_segments shape)
    "corpus_curriculum_plan",
    # 1-row per-half token-total frame broadcast onto the vocab relation
    "text_js_divergence",
    # 1-row hourly-mean frame broadcast onto the series, then the 1-row
    # r1..r4 autocorrelation frame through the Durbin-Levinson selects
    "events_pacf",
    # 1-row pick / pick-embedding frames broadcast per greedy round onto
    # the checkpointed universe (farthest-first shape)
    "sim_facility_location",
    # 1-row grand-total revenue frame broadcast onto the parts rollup
    "orders_abc_classification",
    # 1-row train-vocab-size frame broadcast onto the scored test bigrams
    "text_bigram_perplexity",
    # 1-row distinct-hour-count frame broadcast onto the 5-row type stats
    "events_fano_burstiness",
    # 1-row exact-pair-count frames joined into the recall audit row
    "sim_quantize_binary_recall",
    # 1-row fold-total sufficient-statistics frame broadcast onto the
    # 5-row per-fold complements
    "fit_kfold_cv_ols",
    # 1-row COUNT(DISTINCT state) frame broadcast for the uniform start
    "events_markov_stationary",
    # 1-row 9-percentile cutpoint frame broadcast onto the fact scan
    "fit_woe_binning",
    # 1-row totals + 1-row best-threshold frames on the <=50-row curve
    "fit_boost_stump",
    # 1-row vocab-size frame + |classes|-row prior/total grids (4 rows)
    "fit_naive_bayes_langid",
    # 1-row class-total frame broadcast onto the 4-row diff summary
    "dq_snapshot_diff",
    # 1-row allocation-normalizer frame broadcast onto the 5 strata
    "sample_neyman_allocation",
    # 1-row totals/root-threshold frames on the <=50-row per-side curves
    "fit_tree_depth2",
    # 2-row transaction-snapshot spine theta-joined (broadcast) onto the
    # version relation
    "history_bitemporal_asof",
    # 1-row BH-threshold frame broadcast onto the ~120-row test family
    "events_ab_fdr_bh",
    # 1-row LM-totals + top-K-threshold frames broadcast onto the scan
    "corpus_dsir_select",
    # 1-row bucket-totals frame broadcast onto the 20 jackknife buckets
    "events_ratio_jackknife",
    # 1-row quartile-init frame broadcast onto the E-step scan
    "fit_gmm_em_step",
    # 1-row midpoint + moment/arm frames folded into the single report row
    "events_cuped_adjustment",
}
STREAM = re.compile(r"^stream_")

# Global (empty-partition-spec) windows over provably SMALL relations —
# post-aggregation series (days/hours/classes), bounded top-k pools, or
# the prior-partition-offsets relation of a distributed prefix sum —
# where one task holding the whole input is the point, not a bottleneck.
# Everything else must partition its windows (events_peak_concurrency's
# day-sharded prefix sum and operators/ranking.py are the patterns).
# Value = why the window's input is bounded.
EXPECTED_GLOBAL_WINDOW: dict[str, str] = {
    # --- distributed prefix-sum offset relations (rows = partitions/blocks/days)
    "events_peak_concurrency": "prior-day offsets over the day-aggregated endpoint totals",
    "multimodal_shard_manifest": "running block bases over the block-totals relation (1 row/block)",
    "window_ntile_quartiles": "ranking.py offsets over per-partition counts (<= shuffle partitions rows)",
    "window_percent_rank_top": "ranking.py offsets over per-partition counts",
    "customer_gini": "ranking.py offsets over per-partition counts",
    "orders_abc_classification": "ranking.py subtotal offsets over per-partition sums",
    "agg_exact_deciles_orders": "ranking.py offsets over per-partition counts",
    "agg_exact_group_percentiles": "ranking.py offsets (plan references the rank twice: group bases + target join)",
    "parts_abc_analysis": "ranking.py subtotal offsets over per-partition sums",
    # --- calendar-bounded series (days / hours / 5-min buckets)
    "events_new_vs_returning": "cumulative users over the per-day aggregate (~365 rows/yr)",
    "events_cusum_changepoint": "CUSUM over the day series",
    "events_survival_km": "KM risk table is day-cardinality-sized",
    "events_autocorrelation": "lag windows over the hourly series",
    "events_ljung_box": "lag windows over the hourly series",
    "events_pacf": "hourly series + 1-row Durbin-Levinson state",
    "events_slo_burn_rate": "trailing RANGE windows over the 5-min bucket relation (288/day)",
    "history_backtest_snaive": "seasonal-naive backtest over the day series",
    "fit_pr_auc": "TP/FP cumulate over the distinct-DAY tie blocks, never over orders",
    # --- bounded top-k / curve / domain relations
    "events_top_paths": "rank over the already-limited top-10 paths",
    "events_session_opening_paths": "path relation bounded by |types|^4 (625)",
    "events_ab_fdr_bh": "BH rank over the ~120-row test family",
    "sim_hybrid_rrf": "rank fusion over two top-k candidate lists",
    "text_vocab_coverage": "rank+cumsum over the top-100 head (limit BEFORE window)",
    "text_zipf_slope": "rank over the top-1000 head (limit BEFORE window)",
    "text_encode_ids": "vocab-id rank over the top-K head (limit BEFORE window)",
    "text_bm25_topdocs": "rank over the 20 TakeOrdered survivors",
    "text_bpe_merges": "rank over the character-pair relation (<= |alphabet|^2)",
    "text_bpe_apply_merge": "winner rank over the character-pair relation",
    "corpus_unimax_budget": "waterfill rank/prefix/level over the lang-cardinality capacity table",
    "text_ndcg_bm25": "DCG/IDCG position windows over <=10-row frames",
    "fit_auc_roc": "ROC cumulates over the 10-bin table",
    "fit_boost_stump": "threshold scan over the <=50-row candidate curve",
    "fit_tree_depth2": "threshold scans over <=50-row per-side curves",
    "dq_ks_doclength": "ECDF over the distinct-value relation (value-domain-sized)",
    "skyline_orders": "suffix-max over months; cummax over the frontier-sized survivors",
}


def _count_global_windows(plan: str) -> int:
    """Window physical nodes whose partition spec is EMPTY. The node
    prints as ``Window [exprs], [partitionSpec], [orderSpec]`` when
    partitioned and ``Window [exprs], [orderSpec]`` when global, so a
    2-group node whose second group carries sort directions (ASC/DESC)
    is a global ordered window. (A partition-only window also prints 2
    groups, but its second group is bare attributes — no directions.)"""
    n = 0
    for line in plan.split("\n"):
        m = re.search(r"\bWindow(?:InPandas)? (?=\[)", line)
        if not m:
            continue
        groups, depth, start = [], 0, None
        for i in range(m.end(), len(line)):
            c = line[i]
            if c == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif c == "]":
                depth -= 1
                if depth == 0:
                    groups.append(line[start : i + 1])
                    if len(groups) == 3:
                        break
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            n += 1
        elif len(groups) == 3 and groups[1] == "[]":
            n += 1
    return n


_FILE_SCAN = re.compile(r"Scan (parquet|orc|csv|json|text|binaryFile)")


def _unpruned_columns(formatted: str, result_cols: set[str]) -> list[str]:
    """FILE-scan attributes (``name#id``) that appear ONLY inside their
    scan's own section — read from disk but referenced by no expression,
    projection, filter or join anywhere else in the plan. Structural
    lists (Input, ReadSchema, Location) are not usage; everything else
    (Project/Aggregate outputs, conditions, arguments, pushed filters)
    is, as are the query's own result columns (a collapsed single-scan
    plan returns the scan output directly). Only file sources count:
    ReadSchema is real I/O there, while an ExistingRDD/checkpoint scan
    holds already-materialized rows where 'pruning' saves nothing.
    Catalyst's ColumnPruning makes this set empty for healthy plans; a
    non-empty set means a barrier (or a careless select) is forcing
    dead column I/O — the regression this guard exists to catch."""
    scan_attrs: dict[str, str] = {}
    usage: list[str] = []
    for sec in re.split(r"\n(?=\(\d+\) )", formatted):
        header = sec.split("\n", 1)[0]
        is_scan = "Scan " in header
        is_file_scan = bool(_FILE_SCAN.search(header))
        for line in sec.split("\n"):
            ls = line.strip()
            if is_scan:
                # nothing inside the scan's own section is usage — its
                # Arguments/ReadSchema lines self-reference every output
                if is_file_scan and ls.startswith("Output"):
                    for m in re.finditer(r"(\w+)#(\d+)", ls):
                        scan_attrs[m.group(0)] = m.group(1)
                continue
            if ls.startswith(("Input", "ReadSchema", "Location")):
                continue
            usage.append(ls)
    used_text = "\n".join(usage)
    # id-boundary match: plain substring containment would mask doc_id#12
    # as used whenever any doc_id#12N exists elsewhere in the plan
    def _used(tok: str) -> bool:
        return re.search(re.escape(tok) + r"(?![0-9])", used_text) is not None

    return sorted(
        {
            col
            for tok, col in scan_attrs.items()
            if not _used(tok) and col not in result_cols
        }
    )


def _flags_for(name: str, plan: str) -> tuple[str, list[str]]:
    n_exchange = plan.count("Exchange ")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    flags = []
    if "BatchEvalPython" in plan:
        flags.append("python!")
    if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) and (
        name not in EXPECTED_NESTED_LOOP
    ):
        flags.append("cartesian")
    n_gw = _count_global_windows(plan)
    if n_gw and name not in EXPECTED_GLOBAL_WINDOW:
        flags.append(f"globalwindow:{n_gw}")
    arrow = sum(plan.count(t) for t in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))
    summary = (
        f"exch={n_exchange:<2} bhj={n_bhj:<2} smj={n_smj:<2}"
        + (f" arrow={arrow}" if arrow else "")
    )
    return summary, flags


def audit(name: str, df) -> tuple[str, list[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    summary, flags = _flags_for(name, plan)
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    dead = _unpruned_columns(formatted, set(df.columns))
    if dead:
        flags.append(f"unpruned:{','.join(dead)}")
    return summary, flags


def audit_stream(name: str, fn, spark, sf_dir: str) -> tuple[str, list[str]]:
    """Materialize the streaming query, then audit the micro-batch
    physical plan it actually executed (not the batch wrapper around
    the memory sink)."""
    from ug_dwh_etl_spark.streaming import jobs

    jobs.LAST_BATCH_PLAN = None
    jobs.LAST_PROGRESS = None
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # force the wrapper too
    plan = jobs.LAST_BATCH_PLAN
    if plan is None:
        return "no micro-batch plan captured", ["noplan"]
    # explainInternal(extended) prints logical plans first; flag only on
    # the physical section so logical-plan node names can't false-match
    phys = plan.split("== Physical Plan ==")[-1]
    summary, flags = _flags_for(name, phys)
    state = (jobs.LAST_PROGRESS or {}).get("stateOperators") or []
    rows = sum(op.get("numRowsTotal", 0) for op in state)
    if state:
        summary += f" state={rows}"
    return summary, flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from ug_dwh_etl_spark.queries.registry import QUERIES
    from ug_dwh_etl_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for name, entry in QUERIES.items():
        if only and name not in only:
            continue
        try:
            if STREAM.match(name):
                summary, flags = audit_stream(name, entry.fn, spark, sf_dir)
            else:
                summary, flags = audit(name, entry.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        mark = " ".join(flags)
        if flags:
            bad += 1
        print(f"{'FLAG' if flags else 'ok  '}  {name:<38} {summary} {mark}")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
