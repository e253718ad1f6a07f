"""Data-quality gate (SURVEY.md §2.13 Q1-Q2).

Reference shape: "root URL must be status 200 else Teams alert + abort"
(`sf_html_data.py:95-105`). The check is an existence aggregate —
``limit(1)`` keeps it cheap: Spark stops scanning at the first violating
row instead of counting all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from ug_dwh_etl_spark.sinks.alerts import AlertSink


def expect(
    df: DataFrame,
    violation: Column,
    title: str,
    message: str,
    alert: AlertSink | None = None,
    fail: bool = False,
) -> bool:
    """True if the gate PASSES (no row matches ``violation``)."""
    violated = df.filter(violation).limit(1).count() > 0
    if violated:
        if alert is not None:
            alert.send(title, message)
        if fail:
            raise AssertionError(f"DQ gate failed: {title}: {message}")
    return not violated
