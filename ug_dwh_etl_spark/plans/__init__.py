from ug_dwh_etl_spark.plans.pipeline import Gate, Pipeline

__all__ = ["Gate", "Pipeline"]
