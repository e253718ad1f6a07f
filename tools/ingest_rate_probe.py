"""Rate-limited paginated-REST ingest probe (round-10 verdict ask 7).

BASELINE.md's ~131k rows/s number uses an in-process page synthesizer —
a compute-bound upper bound. This probe adds the HONEST variant: every
page fetch pays a simulated 1-second API latency (the reference's
actual regime — `/root/reference/Audisto/audisto.py:17-18,126` sleeps
1 s per 100-row page, sequentially), and throughput is measured at
1 / 8 / 32 concurrent in-flight pages. The point the sweep proves:
with page fetches as cluster tasks, throughput = concurrency x
per-page rate — quota-bound parallelism — while the reference's
sequential driver loop is pinned at 1x regardless of cluster size.

Usage: python tools/ingest_rate_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from ug_dwh_etl_spark.session import get_spark  # noqa: E402
from ug_dwh_etl_spark.sources.rest import paginated_ingest  # noqa: E402

PAGE_ROWS = 100  # the reference's chunksize (audisto.py:17)
PAGE_LATENCY_S = 1.0  # the reference's sleep per page (audisto.py:126)
PAGES_PER_LEVEL = {1: 8, 8: 32, 32: 96}  # keep each level ~4-8 waves


def fetch_slow(offset: int, limit: int) -> pd.DataFrame:
    """Deterministic page payload behind a simulated 1 s API call."""
    time.sleep(PAGE_LATENCY_S)
    return pd.DataFrame(
        {"id": range(offset, offset + limit), "rank": [offset % 97] * limit}
    )


def main() -> None:
    spark = get_spark("ingest-rate-probe")
    schema = "id long, rank long"
    # warm the Python-worker/Arrow path so level 1 measures page
    # latency, not process startup
    spark.range(8).mapInPandas(lambda it: it, "id long").count()
    out = {"page_rows": PAGE_ROWS, "page_latency_s": PAGE_LATENCY_S, "levels": {}}
    for n_parallel, n_pages in PAGES_PER_LEVEL.items():
        total = n_pages * PAGE_ROWS
        t0 = time.perf_counter()
        got = paginated_ingest(
            spark,
            total_rows=total,
            chunk_size=PAGE_ROWS,
            fetch_chunk=fetch_slow,
            schema=schema,
            max_parallel=n_parallel,
        ).count()
        wall = time.perf_counter() - t0
        assert got == total, (got, total)
        out["levels"][str(n_parallel)] = {
            "pages": n_pages,
            "rows": total,
            "wall_s": round(wall, 2),
            "rows_per_s": round(total / wall, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
