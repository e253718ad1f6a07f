"""Dump .explain('formatted') for named queries to text files.

Usage:
    python tools/dump_plans.py SF_DIR OUT_DIR SUFFIX name [name ...]

Writes OUT_DIR/<name>_<SUFFIX>.txt per query. Iterative queries (graph
loops) run their fixpoint during construction; the dumped plan is the
final assembled query — the loop internals are documented in code and
OPTIMIZATION notes, the dump proves what the *returned* relation scans
(e.g. a memoized parquet artifact vs a re-derived projection).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ug_dwh_etl_spark.queries import QUERIES
from ug_dwh_etl_spark.session import get_spark


def main() -> None:
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        try:
            import contextlib
            import io

            df = QUERIES[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {name}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
