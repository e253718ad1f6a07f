"""Bucketed (co-located) joins — the shuffle-elimination story for
repeated big-big joins (SURVEY.md §4; the content ⋈ inlinks join the
reference runs daily in BigQuery, `sf_html_data.py:20`).

Writing both tables bucketed+sorted on the join key means every
subsequent join between them is an Exchange-free sort-merge: each task
zips bucket i of A with bucket i of B. At 100 TB this converts the
daily dashboard joins from full shuffles into local merges — you pay
one clustered write at ingest, then never shuffle that key again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed managed table (hive-style layout in
    spark.sql.warehouse.dir). Idempotent: drops any prior table AND its
    on-disk location (a location can outlive its metastore entry when a
    previous session died mid-write)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{warehouse.removeprefix('file:')}/{name}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The physical
    plan has NO Exchange on either side (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
