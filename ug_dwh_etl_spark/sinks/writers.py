"""Sink operators (SURVEY.md §2.2 K1-K3).

The reference lands every table in BigQuery with ``if_exists='append'``
(history facts) or ``'replace'`` (snapshot dims). Here:

- history append → date-partitioned parquet append. Partitioning on the
  snapshot date is the 100 TB story: dashboard queries filter on
  ``crawl_date`` so partition pruning skips all but the queried days.
- snapshot replace → ``mode('overwrite')``.
- multi-sink fan-out (one upstream, ≥2 tables, `sf_html_data.py:176-185`)
  → persist the upstream once so the transform chain isn't recomputed
  per sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def append_history(df: DataFrame, path: str, partition_col: str = "crawl_date") -> None:
    """K1 — the reference's if_exists='append' history tables
    (`sf_html_data.py:178,181`, `Audisto/audisto.py:167`)."""
    (
        df.write.mode("append")
        .partitionBy(partition_col)
        .parquet(path)
    )


def overwrite_snapshot(df: DataFrame, path: str) -> None:
    """K2 — if_exists='replace' snapshot tables
    (`sf_html_data.py:185`, `sf_inlink_bulk_data.py:104`)."""
    df.write.mode("overwrite").parquet(path)


def fan_out(df: DataFrame, sinks: list[Callable[[DataFrame], None]]) -> None:
    """K3 — one computed DataFrame into N sinks with a single upstream
    computation (`sf_html_data.py:176-185` writes the same frame to the
    history AND current tables)."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for sink in sinks:
            sink(df)
    finally:
        df.unpersist()
