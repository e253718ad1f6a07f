"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at the given
scale factor, compares row count, column names, and an order-insensitive
value hash (values normalized to strings, rows sorted). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
    python tools/check_oracle.py --times /tmp/times.json [sf_dir] [...]

``--times FILE`` additionally writes {name: seconds} for every query
run — the input the driver-ordering re-splice wants, without log
scraping.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the DRIVER's canonicalizer, including its limits: the
    driver sorts RAW cells (pandas sort_values), which crashes on
    list/array/map cells (unhashable) — so a query emitting one would
    be locally green here while driver-red. Refuse such cells up front;
    the house rule is to ``array_join`` collections at the query edge
    (see sim_quantize_int8 / agg_collect_sorted)."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if not pd.api.types.is_scalar(v):
            raise TypeError(
                f"non-scalar result cell {type(v).__name__} — the driver "
                "canonicalizer cannot sort it; array_join at the query edge"
            )
        if pd.isna(v):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main() -> int:
    argv = list(sys.argv[1:])
    times_path = None
    if "--times" in argv:
        i = argv.index("--times")
        times_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E
    from ug_dwh_etl_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time() - t0:.1f}s)")
            if len(sdf) == 0:
                print(f"  WARNING: empty result")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                ns, no = normalize(sdf), normalize(odf)
            except TypeError as exc:  # driver-uncanonicalizable cell
                failures.append(name)
                print(f"FAIL  {name}: {exc}")
                continue
            ok_vals = ns.equals(no)
            if not ok_vals:
                diff = ns.compare(no) if ns.shape == no.shape else None
                print(f"FAIL  {name}: value mismatch")
                if diff is not None and len(diff):
                    print(diff.head(5))
                else:
                    print("  spark:", ns.head(3).to_dict("records"))
                    print("  duck :", no.head(3).to_dict("records"))
        else:
            print(
                f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}, "
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        if ok_rows and ok_cols and ok_vals:
            times[name] = round(time.time() - t0, 2)
            if len(sdf) == 0:
                # both sides empty is a VACUOUS match (round-11: a scan
                # range outside the fixture's date span was green for a
                # day) — surface it loudly without failing
                print(f"OK    {name}: 0 rows  VACUOUS — oracle and Spark "
                      "both empty; check the predicate touches the fixture")
            else:
                print(f"OK    {name}: {len(sdf)} rows  ({time.time() - t0:.1f}s)")
        else:
            failures.append(name)

    if times_path:
        import json

        with open(times_path, "w") as fh:
            json.dump(times, fh, indent=0, sort_keys=True)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
