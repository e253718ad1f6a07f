"""In-warehouse model-fit / selection / imputation queries
(queries/mlfit.py): closed-form solves checked against numpy lstsq,
MMR checked against a pure-Python greedy reference, the Markov power
iteration for probability-simplex invariants, and imputation for the
no-second-pass mean identity."""

from __future__ import annotations

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_ols_matches_numpy_lstsq(spark):
    from ug_dwh_etl_spark.queries.mlfit import fit_ols_normal_equations

    got = _rows(fit_ols_normal_equations(spark, SF))[0]

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    pdf = li.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"].to_numpy(), pdf["l_discount"].to_numpy()]
    )
    y = pdf["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got["n"] == len(pdf)
    assert got["b0"] == pytest.approx(beta[0], abs=2e-4)
    assert got["b1"] == pytest.approx(beta[1], abs=2e-4)
    assert got["b2"] == pytest.approx(beta[2], abs=2e-4)
    # R^2 in [0, 1] and matches the numpy residual definition
    pred = X @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert got["r2"] == pytest.approx(r2, abs=1e-5)


def test_ridge_shrinks_toward_zero_slopes(spark):
    from ug_dwh_etl_spark.queries.mlfit import (
        fit_ols_normal_equations,
        fit_ridge_closed_form,
    )

    ols = _rows(fit_ols_normal_equations(spark, SF))[0]
    ridge = _rows(fit_ridge_closed_form(spark, SF))[0]
    # lambda > 0 must not grow the coefficient norm (centered-ridge
    # shrinkage; equality only if lambda were 0)
    assert ridge["b1"] ** 2 + ridge["b2"] ** 2 < ols["b1"] ** 2 + ols["b2"] ** 2
    assert ridge["lambda"] == pytest.approx(0.5)


def test_logreg_step_is_ols_of_pseudo_target(spark):
    from ug_dwh_etl_spark.queries.mlfit import fit_logreg_newton_step

    got = _rows(fit_logreg_newton_step(spark, SF))[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    X = np.column_stack(
        [np.ones(len(li)), li["l_quantity"].to_numpy(), li["l_discount"].to_numpy()]
    )
    z = np.where(li["l_returnflag"].to_numpy() == "R", 2.0, -2.0)
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    assert got["b0"] == pytest.approx(beta[0], abs=1e-5)
    assert got["b1"] == pytest.approx(beta[1], abs=1e-5)
    assert got["b2"] == pytest.approx(beta[2], abs=1e-5)
    eta = got["b0"] + 10.0 * got["b1"] + 0.05 * got["b2"]
    assert got["p_qty10_disc005"] == pytest.approx(1.0 / (1.0 + math.exp(-eta)), abs=1e-6)
    assert 0.0 < got["p_qty10_disc005"] < 1.0


def test_mmr_matches_pure_python_greedy(spark):
    from ug_dwh_etl_spark.queries.mlfit import (
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_POOL,
        _MMR_QUERY_ID,
        sim_mmr_selection,
    )

    got = _rows(sim_mmr_selection(spark, SF).orderBy("step"))
    assert [g["step"] for g in got] == list(range(1, _MMR_K + 1))
    picked_ids = [g["vec_id"] for g in got]
    assert len(set(picked_ids)) == _MMR_K  # all distinct

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    q = vecs[_MMR_QUERY_ID]

    def dot(a, b):
        # sequential left-to-right fold — same accumulation order as the
        # engine's aggregate(zip_with(...)) and DuckDB's list_dot_product
        # (numpy's pairwise @ differs at the last ulp, which flips round()
        # at 6dp boundaries)
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def r6(x):
        # Spark's F.round / DuckDB's ROUND do HALF_UP on the shortest
        # decimal rendering (BigDecimal.valueOf semantics); Python's
        # round() is banker's on the binary double — they disagree on
        # exact .xxxxx5 boundaries, which MMR's subtraction produces
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def cos(a, b):
        return r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

    rel = {i: cos(v, q) for i, v in vecs.items() if i != _MMR_QUERY_ID}
    # pool: top-N by raw cosine, min-id tie-break (raw == rounded order here)
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_POOL]
    sel = [min(pool, key=lambda i: (-rel[i], i))]
    scores = [rel[sel[0]]]
    remaining = [i for i in pool if i != sel[0]]
    msim = {i: cos(vecs[i], vecs[sel[0]]) for i in remaining}
    for _ in range(_MMR_K - 1):
        score = {
            i: r6(_MMR_LAMBDA * rel[i] - round(1 - _MMR_LAMBDA, 6) * msim[i])
            for i in remaining
        }
        pick = min(remaining, key=lambda i: (-score[i], i))
        sel.append(pick)
        scores.append(score[pick])
        remaining = [i for i in remaining if i != pick]
        for i in remaining:
            msim[i] = max(msim[i], cos(vecs[i], vecs[pick]))
    assert picked_ids == sel
    assert [g["mmr_score"] for g in got] == pytest.approx(scores, abs=1e-6)


def test_markov_stationary_is_a_distribution(spark):
    from ug_dwh_etl_spark.queries.mlfit import events_markov_stationary

    got = _rows(events_markov_stationary(spark, SF))
    assert len(got) == 5
    total = sum(g["pi"] for g in got)
    # 8 rounds of 6dp-rounded updates: mass conserved to rounding error
    assert total == pytest.approx(1.0, abs=1e-4)
    assert all(g["pi"] > 0 for g in got)


def test_impute_mean_identity_and_mask_rate(spark):
    from ug_dwh_etl_spark.queries.mlfit import dq_impute_group_median

    got = _rows(dq_impute_group_median(spark, SF))
    assert got
    for g in got:
        assert 0 < g["n_missing"] < g["n_total"]
        # mask rule hits ~1/20 of rows
        assert g["n_missing"] / g["n_total"] == pytest.approx(0.05, abs=0.03)
        assert 0.0 <= g["imputed_value"] <= 0.1  # discount domain
        assert 0.0 <= g["mean_after_impute"] <= 0.1


def test_aqp_estimate_within_ci_of_truth(spark):
    import pyspark.sql.functions as F

    from ug_dwh_etl_spark.queries.mlfit import aqp_sampled_revenue

    got = {g["o_orderpriority"]: g for g in _rows(aqp_sampled_revenue(spark, SF))}
    truth = {
        r["o_orderpriority"]: r
        for r in _rows(
            spark.read.parquet(f"{SF}/orders.parquet")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("rev"))
        )
    }
    assert set(got) == set(truth)
    for prio, g in got.items():
        t = truth[prio]
        # HT estimate of the total within 4 standard errors of truth
        # (deterministic sample, so this is a fixed fact, not flaky)
        assert abs(g["est_revenue"] - t["rev"]) <= 4 * g["se_revenue"]
        assert g["n_sample"] < t["n"]
        assert 0 < g["rel_ci95"] < 1


def test_pacf_matches_python_durbin_levinson(spark):
    from ug_dwh_etl_spark.queries.mlfit import _PACF_LAGS, events_pacf

    got = {g["lag"]: g["pacf"] for g in _rows(events_pacf(spark, SF))}
    assert set(got) == set(range(1, _PACF_LAGS + 1))

    import pyspark.sql.functions as F
    from ug_dwh_etl_spark.queries.registry import read_events

    hourly = (
        read_events(spark, SF)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .orderBy("h")
        .toPandas()["x"]
        .to_numpy()
    )
    c = hourly - hourly.mean()
    denom = float((c * c).sum())
    r = {k: round(float((c[k:] * c[:-k]).sum()) / denom, 6) for k in range(1, 5)}
    # Durbin-Levinson reference
    phi = {(1, 1): r[1]}
    for k in range(2, 5):
        num = r[k] - sum(phi[(k - 1, j)] * r[k - j] for j in range(1, k))
        den = 1 - sum(phi[(k - 1, j)] * r[j] for j in range(1, k))
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    for k in range(1, 5):
        assert got[k] == pytest.approx(phi[(k, k)], abs=2e-6)
    # PACF lag 1 equals ACF lag 1 by construction
    assert got[1] == pytest.approx(r[1], abs=1e-6)


def test_theil_matches_numpy_and_decomposition_bounds(spark):
    from ug_dwh_etl_spark.queries.mlfit import agg_theil_index

    got = {g["o_orderpriority"]: g for g in _rows(agg_theil_index(spark, SF))}
    pdf = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    for prio, grp in pdf.groupby("o_orderpriority"):
        x = grp["o_totalprice"].to_numpy()
        mu = x.mean()
        t = float(((x / mu) * np.log(x / mu)).mean())
        l = float(np.log(mu / x).mean())
        assert got[prio]["theil_t"] == pytest.approx(t, abs=1e-4)
        assert got[prio]["theil_l"] == pytest.approx(l, abs=1e-4)
        assert got[prio]["theil_t"] >= 0 and got[prio]["theil_l"] >= 0


def test_ohlc_invariants_and_counts(spark):
    import pyspark.sql.functions as F

    from ug_dwh_etl_spark.queries.mlfit import events_ohlc_hourly
    from ug_dwh_etl_spark.queries.registry import read_events

    got = _rows(events_ohlc_hourly(spark, SF))
    assert got
    for g in got:
        assert g["low"] <= g["open"] <= g["high"]
        assert g["low"] <= g["close"] <= g["high"]
        assert g["volume"] >= 1
    n_events = read_events(spark, SF).count()
    assert sum(g["volume"] for g in got) == n_events
    # single-event hours must have open == close == high == low
    singles = [g for g in got if g["volume"] == 1]
    assert singles and all(
        g["open"] == g["close"] == g["high"] == g["low"] for g in singles
    )


def test_randomized_response_debias_recovers_truth(spark):
    from ug_dwh_etl_spark.queries.mlfit import privacy_randomized_response

    got = _rows(privacy_randomized_response(spark, SF))
    assert len(got) == 24
    for g in got:
        # debiased estimate within binomial noise of the true rate:
        # se of reported ~ sqrt(.25/n), scaled by 1/(2p-1) = 2
        se = 2 * (0.25 / g["n"]) ** 0.5
        assert abs(g["debiased_rate"] - g["true_rate"]) <= 4 * se
        # reported rate is pulled toward the flip floor (1-p = 0.25)
        assert abs(g["reported_rate"] - 0.5) <= abs(g["true_rate"] - 0.5) + 1e-9


def test_median_bisection_brackets_exact_median(spark):
    import pyspark.sql.functions as F

    from ug_dwh_etl_spark.queries.mlfit import _BISECT_ROUNDS, agg_median_bisection

    got = _rows(agg_median_bisection(spark, SF))[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    exact = orders.agg(F.expr("percentile(o_totalprice, 0.5)").alias("m")).collect()[0][
        "m"
    ]
    rng = orders.agg(
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("r")
    ).collect()[0]["r"]
    # bracket halves every round from the full range
    assert got["bracket_width"] <= rng / 2 ** (_BISECT_ROUNDS - 1)
    # estimate within half a bracket of the exact median
    assert abs(got["est_median"] - exact) <= got["bracket_width"] / 2 + 1e-6
    assert got["n"] == orders.count()


def test_stream_ohlc_equals_batch_twin(spark):
    import pyspark.sql.functions as F

    from ug_dwh_etl_spark.queries.mlfit import events_ohlc_hourly
    from ug_dwh_etl_spark.streaming.jobs import stream_ohlc_hourly

    streamed = stream_ohlc_hourly(spark, SF)
    # both twins sum total_value as DECIMAL(18,2), so ALL columns —
    # including the money one — must be row-identical
    batch = events_ohlc_hourly(spark, SF).select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        "total_value",
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_median_bisection_property_vs_sorted():
    """Pure-Python model of the bisection loop vs the true median on
    adversarial inputs — duplicates, negatives, constant columns."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=50,
        )
    )
    def check(xs):
        lo, hi, n = min(xs), max(xs), len(xs)
        for _ in range(40):
            mid = (lo + hi) / 2
            below = sum(1 for x in xs if x <= mid)
            if below * 2 >= n:
                hi = mid
            else:
                lo = mid
        s = sorted(xs)
        true_med = s[(n - 1) // 2]  # lower median: the bracket's target
        # the bracket must contain the lower median (count(<=) >= n/2)
        assert lo - 1e-9 <= true_med <= hi + 1e-9

    check()


def test_facility_location_gains_monotone_and_python_match(spark):
    from ug_dwh_etl_spark.queries.mlfit import (
        _FL_CAND_MOD,
        _FL_K,
        sim_facility_location,
    )

    got = _rows(sim_facility_location(spark, SF).orderBy("step"))
    assert [g["step"] for g in got] == list(range(1, _FL_K + 1))
    # submodularity: marginal gains never increase
    gains = [g["coverage_gain"] for g in got]
    assert all(gains[i] >= gains[i + 1] - 1e-9 for i in range(len(gains) - 1))
    assert len({g["vec_id"] for g in got}) == _FL_K
    assert all(g["vec_id"] % _FL_CAND_MOD == 0 for g in got)

    # pure-Python greedy reference (same fold order + HALF_UP rounding)
    import math
    from decimal import ROUND_HALF_UP, Decimal

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def sim(a, b):
        return max(r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))), 0.0)

    cands = sorted(i for i in vecs if i % _FL_CAND_MOD == 0)
    cover = {u: 0.0 for u in vecs}
    picks = []
    for _ in range(_FL_K):
        best = None
        for c in cands:
            # engines round the gain SUM to 6dp before the argmax; mirror
            # that so near-tied candidates break ties identically
            g = r6(
                sum(max(sim(vecs[u], vecs[c]) - cover[u], 0.0) for u in sorted(vecs))
            )
            if best is None or g > best[1] or (g == best[1] and c < best[0]):
                best = (c, g)
        picks.append(best[0])
        for u in vecs:
            cover[u] = max(cover[u], sim(vecs[u], vecs[best[0]]))
    assert [g["vec_id"] for g in got] == picks


def test_abc_classes_partition_revenue(spark):
    from ug_dwh_etl_spark.queries.mlfit import orders_abc_classification

    got = {g["abc"]: g for g in _rows(orders_abc_classification(spark, SF))}
    assert set(got) == {"A", "B", "C"}
    assert sum(g["revenue_share"] for g in got.values()) == pytest.approx(1.0, abs=1e-4)
    # cut semantics: A ends at the first part crossing 50% of revenue,
    # A+B at 80% (uniform TPC-H revenue means parts split roughly in
    # proportion to revenue here — the skew that concentrates A into
    # few parts is a property of real data, not this fixture)
    assert got["A"]["revenue_share"] >= 0.45
    assert got["A"]["revenue_share"] + got["B"]["revenue_share"] >= 0.75
    assert got["C"]["revenue_share"] <= 0.25


def test_stream_aqp_equals_batch_estimator(spark):
    from ug_dwh_etl_spark.queries.mlfit import aqp_sampled_revenue
    from ug_dwh_etl_spark.streaming.jobs import stream_aqp_sampled_revenue

    streamed = stream_aqp_sampled_revenue(spark, SF)
    batch = aqp_sampled_revenue(spark, SF)
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_pit_features_no_leakage(spark):
    """The defining feature-store property: no same-day or future data
    in any feature value. Re-derive each row's features in pandas from
    the raw tables and compare."""
    import pandas as pd

    from ug_dwh_etl_spark.queries.mlfit import join_pit_features

    got = _rows(join_pit_features(spark, SF))
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    orders["od"] = pd.to_datetime(orders["o_orderdate"]).dt.normalize()
    li = li.merge(orders[["o_orderkey", "o_custkey"]],
                  left_on="l_orderkey", right_on="o_orderkey")
    li["sd"] = pd.to_datetime(li["l_shipdate"]).dt.normalize()
    by_key = {r["o_orderkey"]: r for r in got}
    spine = orders[orders["o_custkey"] % 50 == 0]
    assert len(by_key) == len(spine)
    for _, o in spine.iterrows():
        cutoff = o["od"] - pd.Timedelta(days=1)
        hist = orders[(orders["o_custkey"] == o["o_custkey"]) & (orders["od"] <= cutoff)]
        exp_spend = round(float(hist["o_totalprice"].sum()), 2) if len(hist) else None
        rets = li[(li["o_custkey"] == o["o_custkey"]) & (li["l_returnflag"] == "R")
                  & (li["sd"] <= cutoff)]
        g = by_key[o["o_orderkey"]]
        if exp_spend is None:
            assert g["spend_before"] is None
        else:
            assert g["spend_before"] == pytest.approx(exp_spend, abs=0.02)
        assert g["returns_before"] == len(rets)


def test_bigram_perplexity_sane(spark):
    from ug_dwh_etl_spark.queries.textstats import text_bigram_perplexity

    got = _rows(text_bigram_perplexity(spark, SF))
    assert got
    for g in got:
        # held-out ppl of an add-1 bigram model: > 1 always, and far
        # below the uniform-over-vocab worst case only if the model
        # learned anything — just pin the hard bounds
        assert g["avg_perplexity"] > 1.0
        assert g["n_docs"] > 0


def test_ivf_incremental_update_consistency(spark):
    import pyspark.sql.functions as F

    from ug_dwh_etl_spark.operators.similarity import ivf_assign
    from ug_dwh_etl_spark.queries.similarity import sim_ivf_incremental_update

    got = _rows(sim_ivf_incremental_update(spark, SF))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # totals conserve: every vector lands in exactly one cluster
    assert sum(g["n_total"] for g in got) == emb.count()
    for g in got:
        assert g["n_total"] == g["n_corpus"] + g["n_batch"]
        assert g["centroid_shift"] >= 0.0
    # clusters match the canonical assignment operator
    canon = {
        r["cluster"]: r["n"]
        for r in ivf_assign(emb).groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert {g["cluster"]: g["n_total"] for g in got} == canon
    # a cluster that received no new vectors cannot drift
    for g in got:
        if g["n_batch"] == 0:
            assert g["centroid_shift"] == 0.0


def test_shared_quantile_bisection_brackets_exact(spark):
    import pyspark.sql.functions as F

    from ug_dwh_etl_spark.queries.mlfit import agg_quantiles_bisection_shared

    got = {g["pct"]: g for g in _rows(agg_quantiles_bisection_shared(spark, SF))}
    assert set(got) == {25, 50, 75}
    assert got[25]["est_value"] <= got[50]["est_value"] <= got[75]["est_value"]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    for pct, g in got.items():
        exact = orders.agg(
            F.expr(f"percentile(o_totalprice, {pct / 100})").alias("m")
        ).collect()[0]["m"]
        assert abs(g["est_value"] - exact) <= g["bracket_width"] / 2 + 1e-6


def test_fano_burstiness_poisson_reference(spark):
    from ug_dwh_etl_spark.queries.mlfit import events_fano_burstiness

    got = _rows(events_fano_burstiness(spark, SF))
    assert len(got) == 5
    for g in got:
        assert g["mean_per_hour"] > 0
        # the fixture's arrivals are near-Poisson: Fano within a broad
        # band around 1 (the metric's calibration point), never negative
        assert 0.2 < g["fano"] < 5.0


def test_random_walks_follow_real_edges(spark):
    from ug_dwh_etl_spark.queries.graph import _WALK_STEPS, _edges, graph_random_walks

    rows = _rows(graph_random_walks(spark, SF))
    e = _edges(spark, SF)
    edges = {(r["src"], r["dst"]) for r in e.collect()}
    und = edges | {(b, a) for a, b in edges}
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert walks
    for wid, steps in walks.items():
        assert steps[0] == wid  # starts at the seed
        assert set(steps) == set(range(_WALK_STEPS + 1))  # no dead ends here
        for k in range(1, _WALK_STEPS + 1):
            assert (steps[k - 1], steps[k]) in und  # every hop is a real edge
        # bipartite graph: walk alternates supplier/part namespaces
        for k in range(_WALK_STEPS + 1):
            assert steps[k][0] == ("s" if k % 2 == 0 else "p")


def test_skipgram_pairs_symmetric_and_windowed(spark):
    from ug_dwh_etl_spark.queries.graph import (
        _SG_WINDOW,
        _WALK_STEPS,
        graph_random_walks,
        graph_walk_skipgram_pairs,
    )

    pairs = {(r["center"], r["context"]): r["n"] for r in
             _rows(graph_walk_skipgram_pairs(spark, SF))}
    assert pairs
    # skip-gram pair multiset is symmetric: n(a,b) == n(b,a)
    for (a, b), n in pairs.items():
        assert pairs.get((b, a)) == n
    # total pair count matches the window arithmetic over the walks
    walks = {}
    for r in _rows(graph_random_walks(spark, SF)):
        walks.setdefault(r["walk_id"], []).append(r["step"])
    expected = 0
    for steps in walks.values():
        L = len(steps)
        expected += sum(
            1 for i in range(L) for j in range(L)
            if i != j and abs(i - j) <= _SG_WINDOW
        )
    assert sum(pairs.values()) == expected
