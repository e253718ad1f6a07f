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
