"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector. The
  dot product is a JVM-side ``aggregate(zip_with(...))`` fold — no
  Python in the hot path; norms are computed once per row inside
  codegen. At cluster scale this is an embarrassingly-parallel scan:
  no shuffle except the final TakeOrdered(k).
- ``srp_bucket`` / ``ann_topk``: signed-random-projection LSH. Each
  vector gets a b-bit bucket from the signs of b fixed ±1 hyperplanes;
  ANN search only scans the query's bucket. Hyperplanes are seeded
  constants so the DuckDB oracle computes identical buckets. At 100 TB
  the bucket column is precomputed at ingest and the table is
  partitioned/bucketed by it, so a query touches 1/2^b of the data.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

EMBED_DIM = 64
N_HYPERPLANES = 8

_rng = random.Random(7)
HYPERPLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(EMBED_DIM)] for _ in range(N_HYPERPLANES)
]


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold — bitwise-identical to the
    oracle's list_dot_product accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(embeddings: DataFrame, query_id: int, k: int = 10) -> DataFrame:
    """Exact top-k neighbors of the vector with ``vec_id == query_id``."""
    query = embeddings.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q")
    )
    return (
        embeddings.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            cosine(F.col("embedding"), F.col("q")).alias("cos_raw"),
        )
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
    )


def srp_bucket(embedding: Column) -> Column:
    """b-bit signed-random-projection bucket id."""
    bucket = F.lit(0)
    for j, plane in enumerate(HYPERPLANES):
        proj = dot(embedding, F.array(*[F.lit(float(s)) for s in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def with_srp_buckets(embeddings: DataFrame) -> DataFrame:
    return embeddings.withColumn("bucket", srp_bucket(F.col("embedding")))


def ann_topk(embeddings: DataFrame, query_id: int, k: int = 10) -> DataFrame:
    """Approximate top-k: brute-force restricted to the query's SRP
    bucket. Recall is tested against ``cosine_topk`` in the test suite."""
    bucketed = with_srp_buckets(embeddings)
    query = bucketed.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.crossJoin(F.broadcast(query))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_id))
        .select("vec_id", cosine(F.col("embedding"), F.col("q")).alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("cos_raw", 6).alias("cosine"))
    )


# --- oracle-side helpers -------------------------------------------------------

def sql_plane_literal(j: int) -> str:
    vals = ", ".join(f"{s}.0" for s in HYPERPLANES[j])
    return f"[{vals}]::DOUBLE[]"
