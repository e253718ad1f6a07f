"""Isolated per-query timing probe for optimization A/B work.

Usage:
    python tools/time_query.py SF_DIR N name [name ...]

Per query: same warmup + noop-sink methodology as bench.py, N timed
runs, prints every run's (wall, ext_cores, steal_cores) and the best
QUIET run — the number an A/B comparison should use (contamination
only ever inflates). Artifact builds are drained so the first timed
run is the warm cost, matching the bench's timing policy.

This is a dev probe: it never writes bench_detail.json and the driver
never invokes it.
"""

from __future__ import annotations

import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse timed_noop + quiet bands + warmup)
from ug_dwh_etl_spark.queries import QUERIES  # noqa: E402
from ug_dwh_etl_spark.queries.registry import MATERIALIZE_EVENTS  # noqa: E402
from ug_dwh_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, n_runs, *names = sys.argv[1:]
    n_runs = int(n_runs)
    spark = get_spark("time_query")
    spark.sparkContext.setLogLevel("ERROR")

    # the bench's warmup block (JVM, codegen, shuffle subsystem, footers)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    (
        spark.range(100_000)
        .selectExpr("id % 32 AS k", "id AS v")
        .groupBy("k")
        .sum("v")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for warm_tbl in ("lineitem", "orders"):
        (
            spark.read.parquet(f"{sf_dir}/{warm_tbl}.parquet")
            .limit(1)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        # pay any materialize_once build outside the timed runs
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        built = [e for e in MATERIALIZE_EVENTS if e["built"]]
        MATERIALIZE_EVENTS.clear()
        runs = []
        for i in range(n_runs):
            gc.collect()
            t, x = bench.timed_noop(fn, spark, sf_dir)
            s = bench.LAST_STEAL_CORES
            MATERIALIZE_EVENTS.clear()
            quiet = x <= bench.QUIET_EXT_CORES and s <= bench.QUIET_STEAL_CORES
            runs.append({"t": round(t, 3), "ext": round(x, 2),
                         "steal": round(s, 2), "quiet": quiet})
            print(f"{name} run{i + 1}: {t:.3f}s ext={x:.2f} steal={s:.2f}"
                  f"{'' if quiet else ' LOUD'}")
        quiet_ts = [r["t"] for r in runs if r["quiet"]]
        best = min(quiet_ts) if quiet_ts else min(r["t"] for r in runs)
        out[name] = {
            "best_quiet": best,
            "n_quiet": len(quiet_ts),
            "runs": runs,
            **(
                {"artifact_builds": {e["name"]: e["secs"] for e in built}}
                if built
                else {}
            ),
        }
        print(f"{name}: best_quiet={best:.3f}s ({len(quiet_ts)}/{n_runs} quiet)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
