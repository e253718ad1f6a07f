"""Round-11 additions: partition-value typing without directory-name
inference, shared graph edge artifact, multi-level Louvain, manifest
scale probe plumbing."""

import pyspark.sql.functions as F
import pytest


def test_partition_values_never_inferred(spark, tmp_path):
    """A STRING partition value that parses numerically ('0123', '1e5')
    must round-trip verbatim: the spec read supplies an explicit schema
    with partition columns as string, so Spark's directory-name type
    inference never runs and '0123' cannot become int 123 -> '123'."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    def mk(lo, hi, region):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.lit(region).alias("region"),
            (F.col("id") * 10).alias("v"),
        )

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(
        mk(0, 10, "0123"), stats_cols=("k",), partition_by=("region",)
    )
    t.commit_append(
        mk(10, 20, "1e5"), stats_cols=("k",), partition_by=("region",)
    )
    df = t.read_as_of(spark)
    assert dict(df.dtypes)["region"] == "string"
    got = {r.k: r.region for r in df.collect()}
    assert got[5] == "0123", f"leading zero lost: {got[5]!r}"
    assert got[15] == "1e5", f"scientific notation inferred: {got[15]!r}"


def test_partition_values_typed_by_table_schema(spark, tmp_path):
    """An INT partition column still reads back as int — the cast from
    the directory string to the tracked type is the one typing step."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("bucket"),
    )
    t.commit_overwrite(df, stats_cols=("k",), partition_by=("bucket",))
    out = t.read_as_of(spark)
    assert dict(out.dtypes)["bucket"] == "int"
    assert sorted({r.bucket for r in out.collect()}) == [0, 1, 2]
