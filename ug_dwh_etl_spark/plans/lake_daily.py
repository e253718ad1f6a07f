"""Daily lakehouse maintenance over the snapshot table.

The reference's cron model is one append/replace per day per table
(``/root/reference/README.md:12``, ``sf_html_data.py:178-185``); this is
that cadence on the manifest layer (operators/snapshot_table.py), plus
the two maintenance chores a snapshot table needs at 100 TB and BigQuery
did implicitly for the reference:

- **compaction** — daily appends accrete small files; when the live
  snapshot's file count passes a threshold, rewrite it as one
  range-clustered overwrite commit (readers stay on the old snapshot
  until the single pointer swing, so maintenance never blocks reads);
- **retention** — expire manifests older than the keep horizon and
  delete data dirs no surviving snapshot references;
- **delete-file compaction** (round 9) — a MERGE-ON-READ upsert cadence
  (``key_cols`` passed) accumulates equality-delete files instead of
  rewriting data; when the outstanding count passes its threshold the
  tick folds them in with ``compact_deletes``, bounding every reader's
  anti-join tax at a constant.

Every step is itself an atomic snapshot commit, so a crash mid-pipeline
leaves a readable table at the previous snapshot — the same
crash-safety contract as sinks.writers.swap_dir, upgraded with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable


def lake_daily_ingest(
    spark: SparkSession,
    table: SnapshotTable,
    increment: DataFrame,
    *,
    stats_col: str,
    batch_id: int | None = None,
    key_cols: list[str] | None = None,
    compact_above_files: int = 16,
    compact_above_deletes: int = 4,
    keep_snapshots: int = 7,
) -> dict:
    """One daily tick: land the increment (APPEND by default; MERGE-ON-
    READ upsert when ``key_cols`` is passed — idempotent either way when
    batch_id is passed), compact if fragmented, expire old snapshots.
    Returns a run-log dict (counts only — manifest-sized).

    Two compaction triggers, matching the two ways a daily cadence
    degrades reads: ``compact_above_files`` bounds small-file accretion
    (appends), ``compact_above_deletes`` bounds the outstanding
    equality-delete anti-joins a MOR upsert cadence accumulates
    (Iceberg's rewrite_data_files policy knob)."""
    if key_cols:
        appended = table.commit_merge_on_read(
            increment, key_cols, stats_cols=(stats_col,), batch_id=batch_id
        )
    else:
        appended = table.commit_append(
            increment, stats_cols=(stats_col,), batch_id=batch_id
        )
    m = table.manifest(appended)
    files = len(m.get("files", []))
    n_deletes = len(m.get("deletes", []))
    compacted = None
    if n_deletes > compact_above_deletes:
        compacted = table.compact_deletes(spark, stats_cols=(stats_col,))
    elif files > compact_above_files:
        live = table.read_as_of(spark, appended)
        compacted = table.commit_overwrite(
            live.repartitionByRange(max(2, files // 4), stats_col),
            stats_cols=(stats_col,),
        )
    latest = table.latest_snapshot_id()
    deleted = table.expire_snapshots(keep_from=max(1, latest - keep_snapshots + 1))
    return {
        "appended_snapshot": appended,
        "files_after_append": files,
        "deletes_after_land": n_deletes,
        "compacted_snapshot": compacted,
        "expired_data_dirs": len(deleted),
        "latest": latest,
    }
