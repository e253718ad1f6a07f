"""Custom stateful streaming operator (SURVEY.md §2.11 →
``applyInPandasWithState``).

The built-in streaming aggregates cover windows/dedup; this is the
escape hatch for operator state Spark doesn't ship — per-key running
totals here as the canonical shape (the same skeleton carries fraud
scoring, CDC merge, per-entity ML feature state, ...).

State model: one (count, total) pair per user_id in the state store,
updated per micro-batch from Arrow-batched pandas frames; emits the
cumulative row per active user per batch. Downstream takes max(cum) per
user, which is batch-split-invariant — so the AvailableNow run equals
the batch groupBy no matter how the file source chops micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ug_dwh_etl_spark.streaming.jobs import read_events_stream, run_stream_to_memory

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_cum", LongType()),
        StructField("total_value_cum", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for batch in batches:
        n += len(batch)
        total += float(batch["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events_cum": [n], "total_value_cum": [total]}
    )


def stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (count, sum) per user via the custom state op; the final
    max-per-user equals the batch aggregate exactly."""
    ev = read_events_stream(spark, sf_dir).select("user_id", "value")
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_stream_to_memory(updated, "update")
    return out.groupBy("user_id").agg(
        F.max("n_events_cum").alias("n_events"),
        F.round(F.max("total_value_cum"), 2).alias("total_value"),
    )
