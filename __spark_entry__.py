"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (smoke), ``queries``/``oracle_sql``
expose the full operator surface from SURVEY.md §2 — each PySpark query
paired with an equivalent DuckDB oracle (or rows-only where SQL can't
express it). Implementations live in ``ug_dwh_etl_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ug_dwh_etl_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary: scan → pushed filter → partial+final
    hash aggregate (SURVEY.md §7 step 1).
    """
    from ug_dwh_etl_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: entry.fn for name, entry in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; keys omitted here get the driver's
    weaker rows-only check."""
    return {name: e.oracle for name, e in QUERIES.items() if e.oracle is not None}
