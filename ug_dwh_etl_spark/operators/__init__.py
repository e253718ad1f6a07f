from ug_dwh_etl_spark.operators.joins import asof_latest, broadcast_dim
from ug_dwh_etl_spark.operators.quality import expect

__all__ = ["asof_latest", "broadcast_dim", "expect"]
