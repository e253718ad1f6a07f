"""Join extensions (SURVEY.md §2.5).

The reference's joins live downstream in BigQuery SQL ("combi mit
bq_inlinks", `sf_html_data.py:20`); the engine supplies the standard join
surface via DataFrame ``join`` plus the two patterns the history tables
need: broadcast dimension joins and as-of / latest-snapshot selection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def broadcast_dim(fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner") -> DataFrame:
    """Broadcast-hash join against a small dimension. At 100 TB the fact
    side never shuffles for dims like region/nation; AQE would usually
    pick this, the hint makes it deterministic."""
    return fact.join(F.broadcast(dim), on, how)


def asof_latest(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    as_of: Column | str | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key with ``time_col`` ≤ ``as_of`` (as-of join /
    latest-snapshot over the crawl-history tables, SURVEY.md §2.5).

    Window row_number + filter: a single hash-partitioned shuffle on the
    keys; no join. ``tiebreak`` columns make the pick deterministic when
    timestamps tie (essential for oracle parity and for reproducible
    pipelines at scale).
    """
    if as_of is not None:
        bound = F.lit(as_of) if isinstance(as_of, str) else as_of
        df = df.filter(F.col(time_col) <= bound)
    order = [F.col(time_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_vals: Sequence[str],
    right_vals: Sequence[str],
    tolerance_days: int | None = None,
) -> DataFrame:
    """Per-row as-of join (pandas ``merge_asof`` semantics): each left
    row picks the latest right row with ``right_time <= left_time`` on
    the same key, optionally only counting matches within
    ``tolerance_days``. Returns (key, left_time as _t, left_vals...,
    asof_<right_vals>..., asof_t).

    Implemented as the UNION-TAG window form, not a range join: tag both
    inputs, sort each key\'s rows by (time, tag) with right rows first on
    ties, and carry the last non-null right values forward in one window
    pass. One shuffle on the key, zero join blow-up — a range join would
    explode every left row against its whole lookback window; this shape
    touches each row exactly once regardless of tolerance. Ties among
    right rows resolve to the one sorting last (deterministic via the
    trailing right_vals ordering)."""
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_vals],
        *[F.col(c) for c in right_vals],
    )
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left_vals],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_vals],
    )
    u = tagged_r.unionByName(tagged_l.select(tagged_r.columns))
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag", *right_vals)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct of (t, right_vals) keyed on the tag so every
    # asof_ column comes from the SAME matched right row — carrying each
    # column independently would mix rows whenever a right-side value is
    # NULL on the latest eligible row (pandas merge_asof is row-level).
    match = F.last(
        F.when(
            F.col("_tag") == 0,
            F.struct(
                F.col("_t").alias("__t"),
                *[F.col(c).alias(c) for c in right_vals],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    out = (
        u.select("_k", "_t", "_tag", *left_vals, match.alias("_m"))
        .filter(F.col("_tag") == 1)
        .select(
            "_k",
            "_t",
            "_tag",
            *left_vals,
            *[F.col("_m")[c].alias(f"asof_{c}") for c in right_vals],
            F.col("_m")["__t"].alias("asof_t"),
        )
    )
    if tolerance_days is not None:
        within = F.datediff(F.to_date("_t"), F.to_date("asof_t")) <= tolerance_days
        out = out.select(
            "_k",
            "_t",
            *left_vals,
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in right_vals
            ],
            F.when(within, F.col("asof_t")).alias("asof_t"),
        )
    else:
        out = out.drop("_tag")
    return out


def merge_asof_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_vals: Sequence[str],
    right_vals: Sequence[str],
    tolerance_days: int | None = None,
) -> DataFrame:
    """Per-row FORWARD as-of join (pandas ``merge_asof``
    direction='forward'): each left row picks the EARLIEST right row
    with ``right_time >= left_time`` on the same key, optionally only
    within ``tolerance_days``. The mirror of ``merge_asof``: same
    union-tag single-window shape — one shuffle on the key, each row
    touched once, no lookahead-window row explosion — but the carry
    runs over the FOLLOWING frame (first non-null from the current row
    forward), with right rows sorting after left rows on time ties so
    an equal-timestamp right row is eligible (>= semantics). Ties among
    right rows resolve to the one sorting first (deterministic via the
    trailing right_vals ordering)."""
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_vals],
        *[F.col(c) for c in right_vals],
    )
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in left_vals],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_vals],
    )
    u = tagged_r.unionByName(tagged_l.select(tagged_r.columns))
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag", *right_vals)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # Single-struct carry keyed on the tag — same row-level guarantee as
    # merge_asof above: all asof_ columns come from the one earliest
    # eligible right row even when some of its value columns are NULL.
    match = F.first(
        F.when(
            F.col("_tag") == 1,
            F.struct(
                F.col("_t").alias("__t"),
                *[F.col(c).alias(c) for c in right_vals],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    out = (
        u.select("_k", "_t", "_tag", *left_vals, match.alias("_m"))
        .filter(F.col("_tag") == 0)
        .select(
            "_k",
            "_t",
            "_tag",
            *left_vals,
            *[F.col("_m")[c].alias(f"asof_{c}") for c in right_vals],
            F.col("_m")["__t"].alias("asof_t"),
        )
    )
    if tolerance_days is not None:
        within = F.datediff(F.to_date("asof_t"), F.to_date("_t")) <= tolerance_days
        out = out.select(
            "_k",
            "_t",
            *left_vals,
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in right_vals
            ],
            F.when(within, F.col("asof_t")).alias("asof_t"),
        )
    else:
        out = out.drop("_tag")
    return out


def merge_asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    left_vals: Sequence[str],
    right_vals: Sequence[str],
    tolerance_days: int | None = None,
) -> DataFrame:
    """Per-row NEAREST as-of join (pandas ``merge_asof``
    direction='nearest'): each left row picks whichever of its backward
    match (latest right ≤ t) and forward match (earliest right ≥ t) is
    closer in absolute time, ties going BACKWARD (pandas' bisect picks
    the left neighbor on equal distance). ``tolerance_days`` restricts
    each direction's candidacy BEFORE the choice, so a stale backward
    match never beats an in-tolerance forward one.

    Composition of the two union-tag window passes plus one equi-join of
    their (key-partitioned) outputs — still zero range-join explosion;
    the join back is co-partitioned on the same key both window passes
    shuffled on. ``left_vals`` must uniquely identify left rows (they
    are the join-back key together with (key, time))."""
    b = merge_asof(
        left, right, key, left_time, right_time, left_vals, right_vals,
        tolerance_days,
    ).select(
        "_k",
        "_t",
        *left_vals,
        *[F.col(f"asof_{c}").alias(f"_b_{c}") for c in right_vals],
        F.col("asof_t").alias("_b_t"),
    )
    f = merge_asof_forward(
        left, right, key, left_time, right_time, left_vals, right_vals,
        tolerance_days,
    ).select(
        "_k",
        "_t",
        *left_vals,
        *[F.col(f"asof_{c}").alias(f"_f_{c}") for c in right_vals],
        F.col("asof_t").alias("_f_t"),
    )
    j = b.join(f, ["_k", "_t", *left_vals])
    back_d = F.unix_micros("_t") - F.unix_micros("_b_t")
    fwd_d = F.unix_micros("_f_t") - F.unix_micros("_t")
    use_back = F.col("_b_t").isNotNull() & (
        F.col("_f_t").isNull() | (back_d <= fwd_d)
    )
    return j.select(
        "_k",
        "_t",
        *left_vals,
        *[
            F.when(use_back, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"asof_{c}")
            for c in right_vals
        ],
        F.when(use_back, F.col("_b_t")).otherwise(F.col("_f_t")).alias("asof_t"),
    )
