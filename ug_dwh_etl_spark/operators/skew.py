"""Skew mitigation (SURVEY.md §4 / the 100 TB checklist).

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in ``session.get_spark``);
these are the MANUAL patterns for when a single group/join key is hot
enough that even one post-split partition won't fit an executor:

- ``salted_agg``: two-phase aggregation. Phase 1 groups on
  (key, salt) — the hot key fans out over ``n_salt`` reducers — phase 2
  merges the partials per key. Works for any decomposable aggregate
  (count/sum/min/max); result is EXACTLY the plain groupBy.
- ``salted_broadcast_left``: replicate-the-small-side join. The skewed
  big side gets a deterministic salt in [0, n); the small side is
  exploded n times so every (key, salt) pair still matches. Join output
  is row-identical to the unsalted join.

Salts are derived from a hash of stable columns (never ``rand()``) so
task retries and the DuckDB oracle are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def salt_col(cols: Sequence[str], n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt) from stable columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt_from: Sequence[str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (input column, fn) with fn in
    {count,sum,min,max}. Phase-1 partials per (key, salt), phase-2 merge
    per key: count→sum of partial counts, sum→sum, min→min, max→max.
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("_salt", salt_col(salt_from, n_salt))
    phase1 = salted.groupBy(key, "_salt").agg(
        *[
            getattr(F, fn)(F.lit(1) if fn == "count" else col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(key).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: Sequence[str],
    n_salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    n_salt times, join on (key, salt). Use when one key dominates and
    the small side is broadcastable anyway — the explode is cheap and
    the hot key's rows spread over n_salt tasks."""
    big_s = big.withColumn("_salt", salt_col(salt_from, n_salt))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big_s.join(F.broadcast(small_s), [key, "_salt"]).drop("_salt")
