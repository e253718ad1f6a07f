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


def _orders_like(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("1994-01-01").cast("date"), (F.col("id") % 730).cast("int")).alias("d"),
        (F.col("id") * 3).alias("v"),
    )


def test_manifest_df_scan_prunes_and_matches_driver_planner(spark, tmp_path):
    """scan_pruned_df (pruning as a Spark plan over the parquet
    manifest side-table) must read the same rows as the driver-side
    scan_pruned for the same bounds, actually skip files on a
    range-clustered layout, and agree on the files_read/files_total
    metrics."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(
        _orders_like(spark).repartitionByRange(8, "d"), stats_cols=("d",)
    )
    lo, hi = "1994-03-01", "1994-04-30 23:59:59"
    df_d, read_d, total_d = t.scan_pruned(spark, "d", lo, hi)
    df_m, read_m, total_m = t.scan_pruned_df(spark, "d", lo, hi)
    assert (read_m, total_m) == (read_d, total_d)
    assert 0 < read_m < total_m  # real pruning happened
    rows_d = sorted(tuple(r) for r in df_d.collect())
    rows_m = sorted(tuple(r) for r in df_m.collect())
    assert rows_m == rows_d and len(rows_m) > 0


def test_manifest_df_scan_keeps_statsless_commits(spark, tmp_path):
    """Conservatism: a later commit made WITHOUT stats_cols must be
    read wholesale by scan_pruned_df (never silently dropped), exactly
    like the driver-side planner."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(
        _orders_like(spark, 500).repartitionByRange(4, "d"), stats_cols=("d",)
    )
    extra = spark.range(500, 520).select(
        F.col("id").alias("k"),
        F.lit("1999-12-31").cast("date").alias("d"),
        (F.col("id") * 3).alias("v"),
    )
    t.commit_append(extra)  # no stats
    lo, hi = "1994-01-01", "1994-01-31 23:59:59"
    df_m, read_m, total_m = t.scan_pruned_df(spark, "d", lo, hi)
    got = df_m.filter(F.col("d") >= "1999-01-01").count()
    assert got == 20  # the stats-less commit's rows all survive
    df_d, read_d, total_d = t.scan_pruned(spark, "d", lo, hi)
    assert (read_m, total_m) == (read_d, total_d)


def test_manifest_df_is_persisted_once(spark, tmp_path):
    """manifest_df writes the side-table once per snapshot and reuses
    the parquet on later calls (the _SUCCESS-marker contract every
    materialized artifact in the repo follows)."""
    import os

    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(
        _orders_like(spark, 200).repartitionByRange(2, "d"), stats_cols=("d",)
    )
    sid = t.latest_snapshot_id()
    p = os.path.join(str(tmp_path / "t"), "_manifests_pq", f"v{sid}")
    assert not os.path.exists(p)
    n1 = t.manifest_df(spark).count()
    mtime = os.path.getmtime(os.path.join(p, "_SUCCESS"))
    n2 = t.manifest_df(spark).count()
    assert n1 == n2 > 0
    assert os.path.getmtime(os.path.join(p, "_SUCCESS")) == mtime
