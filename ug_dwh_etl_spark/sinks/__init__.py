from ug_dwh_etl_spark.sinks.writers import append_history, overwrite_snapshot, fan_out
from ug_dwh_etl_spark.sinks.alerts import AlertSink, LoggingAlertSink

__all__ = [
    "append_history",
    "overwrite_snapshot",
    "fan_out",
    "AlertSink",
    "LoggingAlertSink",
]
