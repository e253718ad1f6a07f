"""Declarative batch pipeline (SURVEY.md §3 — the engine's entry point
shape (a), ``Pipeline.run()``).

A reference script (E1-E3) is an eager top-to-bottom pandas program; here
the same pipeline is data: a source loader, a lazy transform, DQ gates,
and sinks. ``run`` composes them so that

- the transform chain stays ONE lazy plan (Catalyst sees scan→sink whole
  and pushes filters/prunes columns into the source scan),
- DQ gates run as cheap ``limit(1)`` existence aggregates BEFORE any sink
  work starts (§4: gate short-circuit),
- multi-sink fan-out persists the computed frame once (§2.2 K3), not
  re-running the transform per sink.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession

from ug_dwh_etl_spark.operators.quality import expect
from ug_dwh_etl_spark.sinks.alerts import AlertSink
from ug_dwh_etl_spark.sinks.writers import fan_out


@dataclass
class Gate:
    """DQ assertion (§2.13 Q1): rows matching ``violation`` trigger an
    alert; ``blocking`` aborts the run (the reference's root-URL-not-200
    check alerts but continues, `sf_html_data.py:95-105`)."""

    violation: Column
    title: str
    message: str
    blocking: bool = False


@dataclass
class Pipeline:
    name: str
    load: Callable[[SparkSession], DataFrame]
    transform: Callable[[DataFrame], DataFrame]
    gates: Sequence[Gate] = field(default_factory=tuple)
    sinks: Sequence[Callable[[DataFrame], None]] = field(default_factory=tuple)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        """The pipeline as one lazy plan (no action)."""
        return self.transform(self.load(spark))

    def run(self, spark: SparkSession, alert: AlertSink | None = None) -> bool:
        """Gates → sinks. Returns True when every gate passed."""
        df = self.dataframe(spark)
        ok = True
        for gate in self.gates:
            passed = expect(
                df,
                gate.violation,
                gate.title,
                gate.message,
                alert=alert,
                fail=gate.blocking,
            )
            ok = ok and passed
        if self.sinks:
            fan_out(df, list(self.sinks))
        return ok
