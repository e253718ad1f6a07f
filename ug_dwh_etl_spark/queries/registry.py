"""Registry plumbing for the paired Spark-query / DuckDB-oracle surface."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None → rows-only driver check


QUERIES: dict[str, Entry] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Entry(fn=fn, oracle=oracle)
        return fn

    return deco


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reader tolerant of the fixture's timestamp physical type.

    The generator has shipped events.ts as both TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects without the nanosAsLong escape
    hatch) and TIMESTAMP(MICROS) (plain timestamp read). Probe the
    footer schema and convert long-nanos to a timestamp only when the
    file actually stores nanos — micros files pass through untouched
    (DuckDB's view narrows ns → µs identically, so oracles agree either
    way)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
        df.schema  # force footer conversion so a nanos file fails HERE
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        # micros files arrive as TIMESTAMP_NTZ; normalize to TIMESTAMP
        # (LTZ) — watermarks require it, and with the session pinned to
        # UTC the wall-clock values are identical to DuckDB's naive read
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Every materialize_once call appends {"name", "built", "secs"} here —
# bench.py reads this to (a) price each artifact BUILD as its own line
# and (b) mark which queries consume memoized artifacts, so best-of-2
# warm timings can't masquerade as the artifact's cost (round-8 verdict:
# graph_label_propagation "0.087s" was a parquet read of a 9.8s build).
MATERIALIZE_EVENTS: list[dict] = []


def materialize_once(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Compute-once-read-everywhere for derived relations several
    queries share (the link-graph edge table, the LPA partition, the ER
    closure): ``build()`` runs the first time a (process, sf_dir, name)
    triple is seen and its result is written to a per-process parquet
    path; every later caller reads the parquet. This is the warehouse
    posture at 100 TB — a shared derived artifact is materialized by
    the first pipeline that needs it and JOINED by the rest, not
    re-derived per query. Per-process + per-sf_dir keying keeps driver
    rounds, gates, and scale probes isolated from each other."""
    import hashlib
    import os
    import tempfile

    import time

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"mat_{name}_{os.getpid()}", key
    )
    built = not os.path.exists(os.path.join(path, "_SUCCESS"))
    t0 = time.perf_counter()
    if built:
        build().write.mode("overwrite").parquet(path)
    MATERIALIZE_EVENTS.append(
        {
            "name": name,
            "built": built,
            "secs": round(time.perf_counter() - t0, 3) if built else 0.0,
        }
    )
    return spark.read.parquet(path)


def sfdir_key(sf_dir: str) -> str:
    """Collision-proof per-sf_dir path segment for per-process work dirs
    (sha1 of the FULL path — basename keying collides across scale-probe
    mode dirs that share a leaf like 'x4')."""
    import hashlib

    return hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
