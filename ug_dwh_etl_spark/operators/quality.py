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


def observed(df: DataFrame, name: str, *metrics: Column):
    """Attach zero-extra-pass DQ metrics to a DataFrame: the returned
    ``Observation``'s ``.get`` yields the aggregates computed DURING the
    next action on the frame — no second scan, unlike ``expect`` (which
    pays a targeted existence probe). Use for always-on pipeline
    telemetry (row counts, null counts, domain violations) where the
    reference printed eyeball checkpoints (`sf_html_data.py:92,...`).

    Returns (df_with_observation, observation).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
