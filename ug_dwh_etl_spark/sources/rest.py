"""Distributed paginated-REST ingest (SURVEY.md §2.1 S4).

The reference fetches N pages SEQUENTIALLY with a 1 s sleep per 100-row
chunk (`Audisto/audisto.py:112-134`) — a ~100 rows/s ceiling. The Spark
shape: build a one-column DataFrame of chunk indices, repartition so each
executor owns a slice, and fetch inside ``mapInPandas`` — page fetches
parallelize across the cluster and results land as ordinary partitions,
never passing through the driver.

The HTTP call itself is injectable so tests (and this offline container)
can substitute a deterministic fake.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def paginated_ingest(
    spark: SparkSession,
    total_rows: int,
    chunk_size: int,
    fetch_chunk: Callable[[int, int], pd.DataFrame],
    schema: StructType,
    max_parallel: int | None = None,
) -> DataFrame:
    """Fan a page range out across executors.

    ``fetch_chunk(offset, limit) -> pd.DataFrame`` runs executor-side.
    ``max_parallel`` caps concurrent fetchers (API politeness — the
    knob the reference implements as time.sleep(1)).
    """
    n_chunks = math.ceil(total_rows / chunk_size)
    chunks = spark.range(n_chunks).toDF("chunk_id")
    parallelism = max_parallel or spark.sparkContext.defaultParallelism
    chunks = chunks.repartition(min(n_chunks, parallelism) or 1)

    def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for chunk_id in batch["chunk_id"]:
                yield fetch_chunk(int(chunk_id) * chunk_size, chunk_size)

    return chunks.mapInPandas(fetch_pages, schema=schema)
