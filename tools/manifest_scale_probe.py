"""SnapshotTable manifest-scale probe (round-10 verdict ask 4).

The manifest design collects per-file stats to the driver and stores
them as JSON (`operators/snapshot_table.py:_collect_file_stats`) —
Iceberg-shaped, but rows scale with FILE COUNT, so at 100 TB
(~10^5-10^6 files) the questions are: (a) does commit-time stats
collection stay linear, (b) does scan PLANNING (manifest parse +
pruning arithmetic, no data I/O) stay sub-second, (c) how big does the
manifest JSON get. This probe measures commit wall, manifest bytes,
planning wall, and pruned-scan wall at 1k and 10k files and prints one
JSON line per level for SCALE.md §snaptable.

Planning wall is isolated by timing scan_pruned() up to the returned
(lazy) DataFrame — manifest parse + file filtering only; the action is
timed separately.

Usage: python tools/manifest_scale_probe.py [n_files ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ug_dwh_etl_spark.session import get_spark  # noqa: E402
from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable  # noqa: E402

ROWS_PER_FILE = 100


def probe(spark, n_files: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"snapprobe_{n_files}_")
    try:
        t = SnapshotTable(os.path.join(root, "t"))
        n_rows = n_files * ROWS_PER_FILE
        # range-clustered on k so pruning has real work to do; exactly
        # n_files output files via repartitionByRange
        df = (
            spark.range(n_rows)
            .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
            .repartitionByRange(n_files, "k")
            .sortWithinPartitions("k")
        )
        t0 = time.perf_counter()
        t.commit_overwrite(df, stats_cols=("k",))
        commit_s = time.perf_counter() - t0

        sid = t.latest_snapshot_id()
        manifest_bytes = os.path.getsize(t._manifest_path(sid))
        n_manifest_files = len(t.manifest(sid).get("files", []))

        # planning: manifest parse + prune arithmetic, no data I/O
        lo, hi = str(n_rows // 2), str(n_rows // 2 + ROWS_PER_FILE - 1)
        t0 = time.perf_counter()
        pruned, files_read, files_total = t.scan_pruned(spark, "k", lo, hi)
        plan_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = pruned.count()
        scan_s = time.perf_counter() - t0
        return {
            "n_files": n_files,
            "files_in_manifest": n_manifest_files,
            "commit_s": round(commit_s, 2),
            "manifest_mb": round(manifest_bytes / 1e6, 3),
            "plan_s": round(plan_s, 3),
            "scan_s": round(scan_s, 2),
            "files_read": files_read,
            "files_total": files_total,
            "rows_scanned": n,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1000, 10000]
    spark = get_spark("manifest-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in levels:
        print(json.dumps(probe(spark, n)), flush=True)


if __name__ == "__main__":
    main()
