"""Closed-form model fitting, diverse selection, and imputation queries.

The in-warehouse ML shapes a training-data platform runs before (or
instead of) shipping data to a dedicated trainer: multivariate OLS and
ridge by normal equations (single-pass mergeable moments — the same
shuffle shape as a SUM at any scale), one logistic Newton step (the
IRLS building block, reduced to weighted least squares), MMR diverse
top-k selection over embeddings, the stationary distribution of the
event-transition Markov chain by unrolled power iteration, and
group-median imputation of masked values.

Reference anchor: the public reference fits nothing in-engine (its
pandas scripts hand everything to BigQuery / downstream notebooks,
e.g. sf_html_data.py's plain aggregation before export), so these are
extensions in the SURVEY.md LLM-pipeline direction, built on the same
moment aggregates the relational layer already proves
(`agg_regression_price_qty`, `fit_price_trend_pandas`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ug_dwh_etl_spark.queries.registry import register, table

# ---------------------------------------------------------------------------
# multivariate OLS via normal equations (centered 2x2 Cramer solve)
# ---------------------------------------------------------------------------
# Shared aggregate plan: one pass computing population (co)variances —
# all mergeable moments, so the physical plan is partial-aggregate +
# one shuffle regardless of input size. The 2x2 solve happens on the
# single aggregated row.

_OLS_SQL = """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             AVG(l_quantity)       AS mx1,
             AVG(l_discount)       AS mx2,
             AVG(l_extendedprice)  AS my,
             var_pop(l_quantity)   AS s11,
             var_pop(l_discount)   AS s22,
             covar_pop(l_quantity, l_discount)      AS s12,
             covar_pop(l_quantity, l_extendedprice) AS s1y,
             covar_pop(l_discount, l_extendedprice) AS s2y,
             var_pop(l_extendedprice) AS syy
      FROM lineitem),
    b AS (
      SELECT n, mx1, mx2, my, s1y, s2y, syy,
             (s1y * s22 - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
             (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
      FROM m)
    SELECT n,
           ROUND(my - b1 * mx1 - b2 * mx2, 4) AS b0,
           ROUND(b1, 4) AS b1,
           ROUND(b2, 4) AS b2,
           ROUND((b1 * s1y + b2 * s2y) / syy, 6) AS r2
    FROM b
"""


def _ols_moments(li: DataFrame) -> DataFrame:
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(q).alias("mx1"),
        F.avg(d).alias("mx2"),
        F.avg(y).alias("my"),
        F.var_pop(q).alias("s11"),
        F.var_pop(d).alias("s22"),
        F.covar_pop(q, d).alias("s12"),
        F.covar_pop(q, y).alias("s1y"),
        F.covar_pop(d, y).alias("s2y"),
        F.var_pop(y).alias("syy"),
    )


@register("fit_ols_normal_equations", _OLS_SQL)
def fit_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS (extendedprice ~ quantity + discount) by NORMAL
    EQUATIONS: one pass of mergeable moments (var_pop / covar_pop,
    Welford-style partials map-side), then a 2x2 Cramer solve on the
    centered scatter matrix and intercept recovery from the means.
    This is the 100 TB regression recipe — the data is touched once,
    the shuffle carries ten doubles per partition, and the solve is
    O(d^3) on one row. R^2 falls out of the same moments
    ((b'S_xy)/S_yy). Oracle computes the identical closed form in
    DuckDB, so coefficients match to the rounded digit."""
    m = _ols_moments(table(spark, sf_dir, "lineitem"))
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    b = m.select("n", "mx1", "mx2", "my", "s1y", "s2y", "syy", b1.alias("b1"), b2.alias("b2"))
    return b.select(
        "n",
        F.round(F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2"), 4).alias("b0"),
        F.round("b1", 4).alias("b1"),
        F.round("b2", 4).alias("b2"),
        F.round((F.col("b1") * F.col("s1y") + F.col("b2") * F.col("s2y")) / F.col("syy"), 6).alias("r2"),
    )


_RIDGE_LAMBDA = 0.5

_RIDGE_SQL = f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             AVG(l_quantity)       AS mx1,
             AVG(l_discount)       AS mx2,
             AVG(l_extendedprice)  AS my,
             var_pop(l_quantity)   AS s11,
             var_pop(l_discount)   AS s22,
             covar_pop(l_quantity, l_discount)      AS s12,
             covar_pop(l_quantity, l_extendedprice) AS s1y,
             covar_pop(l_discount, l_extendedprice) AS s2y
      FROM lineitem),
    b AS (
      SELECT n, mx1, mx2, my,
             (s1y * (s22 + {_RIDGE_LAMBDA}) - s12 * s2y)
               / ((s11 + {_RIDGE_LAMBDA}) * (s22 + {_RIDGE_LAMBDA}) - s12 * s12) AS b1,
             ((s11 + {_RIDGE_LAMBDA}) * s2y - s12 * s1y)
               / ((s11 + {_RIDGE_LAMBDA}) * (s22 + {_RIDGE_LAMBDA}) - s12 * s12) AS b2
      FROM m)
    SELECT n,
           {_RIDGE_LAMBDA} AS lambda,
           ROUND(my - b1 * mx1 - b2 * mx2, 4) AS b0,
           ROUND(b1, 4) AS b1,
           ROUND(b2, 4) AS b2
    FROM b
"""


@register("fit_ridge_closed_form", _RIDGE_SQL)
def fit_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression in closed form: the same single-pass moments as
    `fit_ols_normal_equations`, with lambda added to the diagonal of
    the population covariance matrix before the 2x2 solve (intercept
    unpenalized, recovered from the means — the standard centered-ridge
    convention). Shrinks the near-collinear discount coefficient
    visibly vs the OLS twin while touching the data exactly once."""
    lam = F.lit(_RIDGE_LAMBDA)
    m = _ols_moments(table(spark, sf_dir, "lineitem"))
    det = (F.col("s11") + lam) * (F.col("s22") + lam) - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * (F.col("s22") + lam) - F.col("s12") * F.col("s2y")) / det
    b2 = ((F.col("s11") + lam) * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    b = m.select("n", "mx1", "mx2", "my", b1.alias("b1"), b2.alias("b2"))
    return b.select(
        "n",
        lam.alias("lambda"),
        F.round(F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2"), 4).alias("b0"),
        F.round("b1", 4).alias("b1"),
        F.round("b2", 4).alias("b2"),
    )


# ---------------------------------------------------------------------------
# one logistic-regression Newton step (IRLS reduced to least squares)
# ---------------------------------------------------------------------------
_LOGREG_SQL = """
    WITH src AS (
      SELECT l_quantity AS x1, l_discount AS x2,
             CASE WHEN l_returnflag = 'R' THEN 2.0 ELSE -2.0 END AS z
      FROM lineitem),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             AVG(x1) AS mx1, AVG(x2) AS mx2, AVG(z) AS mz,
             var_pop(x1) AS s11, var_pop(x2) AS s22,
             covar_pop(x1, x2) AS s12,
             covar_pop(x1, z) AS s1z, covar_pop(x2, z) AS s2z
      FROM src),
    b AS (
      SELECT n, mx1, mx2, mz,
             (s1z * s22 - s12 * s2z) / (s11 * s22 - s12 * s12) AS b1,
             (s11 * s2z - s12 * s1z) / (s11 * s22 - s12 * s12) AS b2
      FROM m),
    c AS (
      SELECT n,
             ROUND(mz - b1 * mx1 - b2 * mx2, 6) AS b0,
             ROUND(b1, 6) AS b1,
             ROUND(b2, 6) AS b2
      FROM b)
    SELECT n, b0, b1, b2,
           ROUND(1.0 / (1.0 + exp(-(b0 + 10.0 * b1 + 0.05 * b2))), 6)
             AS p_qty10_disc005
    FROM c
"""


@register("fit_logreg_newton_step", _LOGREG_SQL)
def fit_logreg_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Newton/IRLS step of logistic regression
    (P(returnflag='R') ~ quantity + discount) from beta = 0. At the
    zero start the Hessian is X'X/4 and the gradient X'(y - 1/2), so
    the step equals an ORDINARY least-squares fit of the pseudo-target
    z = 4(y - 1/2) in {-2, +2} — the same single-pass moments + 2x2
    Cramer solve as `fit_ols_normal_equations`, which is exactly how a
    distributed IRLS iteration runs at 100 TB (each step = one moment
    pass + tiny solve; full IRLS is this query looped with reweighted
    moments). Reports the step's coefficients and the predicted
    probability at a fixed probe point (qty=10, discount=0.05),
    computed from the ROUNDED coefficients so both engines feed exp()
    bit-identical inputs."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.when(F.col("l_returnflag") == "R", F.lit(2.0)).otherwise(F.lit(-2.0)).alias("z"),
    )
    x1, x2, z = F.col("x1"), F.col("x2"), F.col("z")
    m = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x1).alias("mx1"),
        F.avg(x2).alias("mx2"),
        F.avg(z).alias("mz"),
        F.var_pop(x1).alias("s11"),
        F.var_pop(x2).alias("s22"),
        F.covar_pop(x1, x2).alias("s12"),
        F.covar_pop(x1, z).alias("s1z"),
        F.covar_pop(x2, z).alias("s2z"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1z") * F.col("s22") - F.col("s12") * F.col("s2z")) / det
    b2 = (F.col("s11") * F.col("s2z") - F.col("s12") * F.col("s1z")) / det
    c = m.select(
        "n",
        F.round(F.col("mz") - b1 * F.col("mx1") - b2 * F.col("mx2"), 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
    )
    eta = F.col("b0") + F.lit(10.0) * F.col("b1") + F.lit(0.05) * F.col("b2")
    return c.select(
        "n", "b0", "b1", "b2",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)), 6).alias("p_qty10_disc005"),
    )


# ---------------------------------------------------------------------------
# MMR (maximal marginal relevance) diverse top-k selection
# ---------------------------------------------------------------------------
_MMR_QUERY_ID = 0
_MMR_POOL = 12
_MMR_K = 5
_MMR_LAMBDA = 0.7


def _duck_cos(a: str, b: str) -> str:
    d = "list_dot_product"
    return (
        f"ROUND({d}({a}, {b}) / (sqrt({d}({a}, {a})) * sqrt({d}({b}, {b}))), 6)"
    )


def _mmr_sql() -> str:
    lam, mu = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 6)
    parts = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"q AS (SELECT e AS qe FROM base WHERE vec_id = {_MMR_QUERY_ID})",
        f"""cand AS (
      SELECT b.vec_id, b.e, {_duck_cos('b.e', 'q.qe')} AS rel
      FROM base b, q WHERE b.vec_id <> {_MMR_QUERY_ID}
      ORDER BY list_dot_product(b.e, q.qe)
               / (sqrt(list_dot_product(b.e, b.e)) * sqrt(list_dot_product(q.qe, q.qe)))
               DESC, b.vec_id
      LIMIT {_MMR_POOL})""",
        "s1 AS (SELECT vec_id, e, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1)",
        f"""m1 AS (
      SELECT c.vec_id, c.e, c.rel, {_duck_cos('c.e', 's1.e')} AS msim
      FROM cand c, s1 WHERE c.vec_id <> s1.vec_id)""",
    ]
    for k in range(2, _MMR_K + 1):
        parts.append(
            f"""s{k} AS (
      SELECT vec_id, e, rel, ROUND({lam} * rel - {mu} * msim, 6) AS score
      FROM m{k - 1} ORDER BY score DESC, vec_id LIMIT 1)"""
        )
        if k < _MMR_K:
            parts.append(
                f"""m{k} AS (
      SELECT m.vec_id, m.e, m.rel,
             GREATEST(m.msim, {_duck_cos('m.e', f's{k}.e')}) AS msim
      FROM m{k - 1} m, s{k} WHERE m.vec_id <> s{k}.vec_id)"""
            )
    selects = [
        "SELECT 1 AS step, (SELECT vec_id FROM s1) AS vec_id,"
        " (SELECT rel FROM s1) AS mmr_score"
    ]
    for k in range(2, _MMR_K + 1):
        selects.append(
            f"SELECT {k}, (SELECT vec_id FROM s{k}), (SELECT score FROM s{k})"
        )
    return "WITH " + ",\n    ".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@register("sim_mmr_selection", _mmr_sql())
def sim_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (maximal marginal relevance) diverse top-k: from the
    {pool}-candidate relevance pool around query vector {qid}, greedily
    pick {k} items maximizing lambda*relevance - (1-lambda)*max-
    similarity-to-already-picked — the canonical redundancy-free
    retrieval / training-example selection step (dedup-aware RAG
    context packing, diverse eval-set sampling).

    Scale shape mirrors `sim_farthest_first_centroids`: the relevance
    pool is a distributed brute-force (or IVF) top-N — the only part
    that touches the corpus — and each greedy round is ONE scan of the
    surviving pool updating max-sim against the newest pick (a
    broadcast 1-row frame) plus a 1-row min-struct argmax. O(K*pool)
    after the top-N, never K x corpus. Relevance and similarity are
    rounded to 6dp before scoring so both engines tie-break
    identically; ties fall to min vec_id. The oracle unrolls the same
    greedy recursion as chained CTEs."""
    from ug_dwh_etl_spark.operators.similarity import cosine

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("e")
    )
    q = base.filter(F.col("vec_id") == _MMR_QUERY_ID).select(F.col("e").alias("qe"))
    cand = (
        base.filter(F.col("vec_id") != _MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "e", cosine("e", "qe").alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .select("vec_id", "e", F.round("cos_raw", 6).alias("rel"))
        # the ONLY corpus-sized job: materialize the 12-row pool once so
        # the K greedy rounds below never re-derive the top-N scan (same
        # lineage-cut discipline as operators.graph's loops)
        .localCheckpoint()
    )
    # greedy pick 1: pure relevance, min-id tie-break (min of struct on
    # (-rel, vec_id) — floats negate exactly)
    s1 = (
        cand.agg(F.min(F.struct((-F.col("rel")).alias("nr"), F.col("vec_id"))).alias("m"))
        .select(F.col("m.vec_id").alias("pick_id"))
    )
    picked = cand.join(F.broadcast(s1), cand.vec_id == F.col("pick_id")).select(
        F.col("vec_id").alias("p_id"), F.col("e").alias("pe")
    )
    out_rows = [
        cand.join(F.broadcast(s1), cand.vec_id == F.col("pick_id"))
        .select(F.lit(1).alias("step"), "vec_id", F.col("rel").alias("mmr_score"))
    ]
    pool = (
        cand.crossJoin(F.broadcast(picked))
        .filter(F.col("vec_id") != F.col("p_id"))
        .select("vec_id", "e", "rel", F.round(cosine("e", "pe"), 6).alias("msim"))
    )
    lam, mu = F.lit(_MMR_LAMBDA), F.lit(round(1.0 - _MMR_LAMBDA, 6))
    for k in range(2, _MMR_K + 1):
        # per-round lineage cut on the <=12-row pool: the argmax agg, the
        # emitted row, AND next round's pool update all branch from this
        # relation, and Spark shares no subplans across union branches —
        # without the cut each branch re-executes every earlier round
        # (measured 12.4s -> ~3s for K=5)
        scored = pool.withColumn(
            "score", F.round(lam * F.col("rel") - mu * F.col("msim"), 6)
        ).localCheckpoint()
        sk = (
            scored.agg(
                F.min(F.struct((-F.col("score")).alias("ns"), F.col("vec_id"))).alias("m")
            )
            .select(F.col("m.vec_id").alias("pick_id"))
        )
        out_rows.append(
            scored.join(F.broadcast(sk), scored.vec_id == F.col("pick_id")).select(
                F.lit(k).alias("step"), "vec_id", F.col("score").alias("mmr_score")
            )
        )
        if k < _MMR_K:
            picked = scored.join(
                F.broadcast(sk), scored.vec_id == F.col("pick_id")
            ).select(F.col("vec_id").alias("p_id"), F.col("e").alias("pe"))
            pool = (
                scored.drop("score")
                .crossJoin(F.broadcast(picked))
                .filter(F.col("vec_id") != F.col("p_id"))
                .select(
                    "vec_id", "e", "rel",
                    F.greatest(F.col("msim"), F.round(cosine("e", "pe"), 6)).alias("msim"),
                )
            )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


# docstring placeholders
sim_mmr_selection.__doc__ = sim_mmr_selection.__doc__.replace(
    "{pool}", str(_MMR_POOL)
).replace("{qid}", str(_MMR_QUERY_ID)).replace("{k}", str(_MMR_K))


# ---------------------------------------------------------------------------
# Markov stationary distribution by unrolled power iteration
# ---------------------------------------------------------------------------
_MARKOV_ITERS = 8
_N_EVENT_TYPES = 5  # click / signup / error / view / purchase


def _markov_sql() -> str:
    parts = [
        """seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events)""",
        "cnt AS (SELECT cur, nxt, COUNT(*) AS c FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt)",
        """p AS (
      SELECT cur, nxt, ROUND(c * 1.0 / SUM(c) OVER (PARTITION BY cur), 6) AS prob
      FROM cnt)""",
        f"pi0 AS (SELECT DISTINCT cur AS et, 1.0 / {_N_EVENT_TYPES} AS pi FROM cnt)",
    ]
    for i in range(1, _MARKOV_ITERS + 1):
        parts.append(
            f"""pi{i} AS (
      SELECT p.nxt AS et, ROUND(SUM(pi{i - 1}.pi * p.prob), 6) AS pi
      FROM pi{i - 1} JOIN p ON p.cur = pi{i - 1}.et
      GROUP BY p.nxt)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT et AS event_type, pi FROM pi{_MARKOV_ITERS}"
    )


@register("events_markov_stationary", _markov_sql())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain: the
    row-normalized event-type transition matrix (the
    `events_transition_matrix` relation) power-iterated from the
    uniform distribution for a fixed 8 rounds — the long-run share of
    attention each event type captures, the 5-state cousin of PageRank.

    Scale split: estimating P is the only corpus-sized work (one
    sessionized window + one groupBy over the full event log); the
    iteration then runs on a |types| x |types| relation — 25 rows here,
    thousands at worst — so each round is a broadcast join + tiny
    aggregate, nothing iterates over the log. Probabilities and each
    pi update are rounded to 6dp on both engines so the fixed-point
    arithmetic matches; the oracle unrolls the same 8 steps as chained
    CTEs."""
    from ug_dwh_etl_spark.queries.registry import read_events

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("cur")
    # materialize the |types|^2 transition relation once — the 8 rounds
    # below must iterate over 25 rows, not re-derive the event-log scan
    p = cnt.select(
        "cur", "nxt", F.round(F.col("c") / F.sum("c").over(wp), 6).alias("prob")
    ).localCheckpoint()
    pi = (
        p.select("cur").distinct()
        .select(F.col("cur").alias("et"), (F.lit(1.0) / _N_EVENT_TYPES).alias("pi"))
    )
    for _ in range(_MARKOV_ITERS):
        pi = (
            p.join(F.broadcast(pi), p.cur == pi.et)
            .groupBy(F.col("nxt").alias("_et"))
            .agg(F.round(F.sum(F.col("pi") * F.col("prob")), 6).alias("pi"))
            .select(F.col("_et").alias("et"), "pi")
        )
    return pi.select(F.col("et").alias("event_type"), "pi")


# ---------------------------------------------------------------------------
# group-median imputation of masked values
# ---------------------------------------------------------------------------
# Deterministic masking rule standing in for real missingness (the
# fixture tables ship complete): a lineitem's discount is "missing"
# when (7*orderkey + linenumber) % 20 == 0 — ~5% of rows, spread across
# every group. The OPERATOR under test — per-group exact-median
# imputation and its effect on the group mean — is the production
# data-cleaning step; only the mask is synthetic, and both engines
# apply the identical rule.
_IMPUTE_SQL = """
    WITH src AS (
      SELECT l_returnflag, l_linestatus,
             CASE WHEN (7 * l_orderkey + l_linenumber) % 20 = 0
                  THEN NULL ELSE l_discount END AS disc
      FROM lineitem),
    med AS (
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) - COUNT(disc) AS BIGINT) AS n_missing,
             quantile_cont(disc, 0.5) AS imputed_value,
             SUM(disc) AS sum_obs
      FROM src GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus, n_total, n_missing,
           ROUND(imputed_value, 4) AS imputed_value,
           ROUND((sum_obs + n_missing * imputed_value) / n_total, 6)
             AS mean_after_impute
    FROM med
"""


@register("dq_impute_group_median", _IMPUTE_SQL)
def dq_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation: fill missing discounts with their
    (returnflag, linestatus) group's exact interpolated median and
    report the group mean after imputation — the standard numeric-
    cleaning step before model training. Exact `percentile(x, 0.5)`
    is a sort-based aggregate within each group (mergeable partials;
    at 100 TB you'd swap in approx_percentile with a documented error
    bound, same plan shape) and the imputed mean needs NO second pass:
    mean = (sum_observed + n_missing * median) / n_total, all from the
    one aggregate row. The missingness mask is a deterministic rule on
    the key (see module comment); the operator is real."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        "l_returnflag",
        "l_linestatus",
        F.when(
            (F.lit(7) * F.col("l_orderkey") + F.col("l_linenumber")) % 20 == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(F.col("l_discount"))
        .alias("disc"),
    )
    med = src.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_total"),
        (F.count(F.lit(1)) - F.count("disc")).alias("n_missing"),
        F.expr("percentile(disc, 0.5)").alias("imp"),
        F.sum("disc").alias("sum_obs"),
    )
    return med.select(
        "l_returnflag",
        "l_linestatus",
        "n_total",
        "n_missing",
        F.round("imp", 4).alias("imputed_value"),
        F.round(
            (F.col("sum_obs") + F.col("n_missing") * F.col("imp")) / F.col("n_total"), 6
        ).alias("mean_after_impute"),
    )
