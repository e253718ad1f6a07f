"""Measure where stream_session_timeout_tws's wall time goes (round-12
VERDICT ask 8): per-micro-batch durationMs breakdown from the streaming
progress events — is it batch cadence (fixed per-batch machinery), the
RocksDB state store commits, or the Python TWS round trips? Dev probe.

Usage: python tools/stream_session_probe.py SF_DIR [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ug_dwh_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("stream_session_probe")
    spark.sparkContext.setLogLevel("ERROR")
    from ug_dwh_etl_spark.queries import QUERIES
    from ug_dwh_etl_spark.streaming import jobs

    fn = QUERIES["stream_session_timeout_tws"].fn
    # staging is memoized per process: pay it once, time the rest
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"first run (incl staging): {time.perf_counter() - t0:.2f}s")
    for i in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        prog = jobs.LAST_PROGRESS
        print(f"run{i + 1}: {wall:.2f}s; last batch durationMs:")
        if prog:
            print(json.dumps(prog.get("durationMs", {}), indent=1))
            for op in prog.get("stateOperators", []):
                print(
                    " stateOp:",
                    {
                        k: op.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "stateMemory",
                            "numRowsTotal",
                        )
                    },
                )
    # every batch's durations from the query's recent progress are not
    # retained after stop(); re-run with a listener instead
    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def __init__(self):
            self.batches = []

        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            p = e.progress
            self.batches.append(
                (
                    p.batchId,
                    p.numInputRows,
                    dict(p.durationMs),
                )
            )

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    lst = L()
    spark.streams.addListener(lst)
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    time.sleep(1)
    print(f"listener run: {wall:.2f}s, {len(lst.batches)} batches")
    for b in lst.batches:
        print(" batch", b[0], "rows", b[1], json.dumps(b[2]))


if __name__ == "__main__":
    main()
