"""Round-12 optimization-round additions: scale-adaptive loop
partition derivation for the iterative graph operators."""

import pyspark.sql.functions as F


def test_derive_loop_partitions_local_default_binds(spark, tmp_path):
    """A small file-backed relation (1-8 files, the local fixture
    shape) keeps the measured local posture: local_default wins."""
    from ug_dwh_etl_spark.operators.graph import derive_loop_partitions

    p = str(tmp_path / "edges")
    spark.range(100).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).coalesce(2).write.parquet(p)
    e = spark.read.parquet(p)
    assert len(e.inputFiles()) <= 8
    assert derive_loop_partitions(e, 16) == 16


def test_derive_loop_partitions_scales_with_files(spark, tmp_path):
    """A many-file relation (warehouse shape) drives the count above
    the local default — the derivation, not the constant, binds."""
    from ug_dwh_etl_spark.operators.graph import derive_loop_partitions

    p = str(tmp_path / "edges")
    spark.range(128).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).repartition(32).write.parquet(p)
    e = spark.read.parquet(p)
    n_files = len(e.inputFiles())
    assert n_files > 16
    assert derive_loop_partitions(e, 16) == min(n_files, 4096)
    # the cap bounds a pathological million-file table
    assert derive_loop_partitions(e, 16, cap=20) == 20


def test_derive_loop_partitions_in_memory_falls_back(spark):
    """No file-backed scan (in-memory test frames): the local default
    is returned, so operator unit tests are unaffected."""
    from ug_dwh_etl_spark.operators.graph import derive_loop_partitions

    e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert derive_loop_partitions(e, 8) == 8
