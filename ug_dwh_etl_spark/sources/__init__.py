from ug_dwh_etl_spark.sources.readers import read_csv, read_parquet, read_json, load_tables
from ug_dwh_etl_spark.sources.staging import Source, LocalPathSource, StagedFileSource

__all__ = [
    "read_csv",
    "read_parquet",
    "read_json",
    "load_tables",
    "Source",
    "LocalPathSource",
    "StagedFileSource",
]
