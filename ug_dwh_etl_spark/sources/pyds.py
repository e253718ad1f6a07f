"""Spark 4 Python DataSource connector for paginated-REST ingest
(SURVEY.md §2.1 S4 — the idiomatic connector form of ``rest.py``).

The reference fetches pages sequentially with a 1 s sleep
(`Audisto/audisto.py:112-134`). ``rest.paginated_ingest`` parallelizes
that with mapInPandas; this module goes one step further and packages it
as a first-class `spark.read.format("paged_rest")` source: one input
partition per page, so the scheduler owns retry/locality/parallelism and
the source composes with the rest of the reader API (schema, options,
pushdown-ready).

The HTTP call is resolved from the ``fetcher`` option as a
``module:function`` import path (executors re-import it — the function
must be module-level). The default fetcher synthesizes a deterministic
Audisto-shaped rank page, which is what this offline container tests
against.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_SCHEMA = "url string, page_rank double, chei_rank double"


def synthetic_rank_page(offset: int, limit: int):
    """Deterministic stand-in for one Audisto rank-API page."""
    import pandas as pd

    rows = range(offset, offset + limit)
    return pd.DataFrame(
        {
            "url": [f"https://www.example.com/page/{i}" for i in rows],
            "page_rank": [round(1.0 / (i + 1), 8) for i in rows],
            "chei_rank": [round(1.0 / (2 * i + 1), 8) for i in rows],
        }
    )


def _resolve(path: str):
    mod, _, fn = path.partition(":")
    return getattr(importlib.import_module(mod), fn)


class _PagePartition(InputPartition):
    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.total_rows = int(options.get("total_rows", "0"))
        self.chunk_size = int(options.get("chunk_size", "100"))
        self.fetcher = options.get(
            "fetcher", "ug_dwh_etl_spark.sources.pyds:synthetic_rank_page"
        )

    def partitions(self):
        n = -(-self.total_rows // self.chunk_size)
        return [
            _PagePartition(i * self.chunk_size, min(self.chunk_size, self.total_rows - i * self.chunk_size))
            for i in range(n)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        fetch = _resolve(self.fetcher)
        page = fetch(partition.offset, partition.limit)
        cols = [f.name for f in self.schema.fields]
        for row in page[cols].itertuples(index=False):
            yield tuple(row)


class PagedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> PagedRestReader:
        return PagedRestReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> "PagedRestStreamReader":
        return PagedRestStreamReader(schema, dict(self.options))


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """Incremental page ingest — the reference's cron model as a stream.

    The offset is simply "rows ingested so far"; each micro-batch pulls
    the next ``pages_per_batch`` pages, and a Trigger.AvailableNow run
    with a persistent checkpoint advances exactly one catch-up step per
    run and is a no-op once caught up (tested) — i.e. the daily cron
    re-run of `Audisto/audisto.py` with exactly-once bookkeeping for
    free. ``readBetweenOffsets`` replays a committed range on recovery.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.total_rows = int(options.get("total_rows", "0"))
        self.chunk_size = int(options.get("chunk_size", "100"))
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))
        self.fetcher = options.get(
            "fetcher", "ug_dwh_etl_spark.sources.pyds:synthetic_rank_page"
        )

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int):
        # a list-backed iterator, not a generator: the engine pickles the
        # prefetched batch alongside its offset (generators don't pickle)
        fetch = _resolve(self.fetcher)
        page = fetch(start, end - start)
        cols = [f.name for f in self.schema.fields]
        return iter([tuple(row) for row in page[cols].itertuples(index=False)])

    def read(self, start: dict):
        o = start["offset"]
        if o >= self.total_rows:
            return iter([]), {"offset": o}
        end = min(self.total_rows, o + self.chunk_size * self.pages_per_batch)
        return self._rows(o, end), {"offset": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["offset"], end["offset"])


# --- writer side: the alert/export sink as a first-class DataSource -----------
def spool_poster(endpoint: str, payloads: list[str]) -> None:
    """Default poster STUB: append JSON-line payloads to a local spool
    file (the offline stand-in for the reference's Teams webhook POST,
    `sf_html_data.py:28-49`). A real deployment resolves an HTTP poster
    here; executors call it per batch, so alert delivery scales with
    partitions and never serializes through the driver."""
    import os

    os.makedirs(os.path.dirname(endpoint), exist_ok=True)
    with open(endpoint, "a", encoding="utf-8") as f:
        for p in payloads:
            f.write(p + "\n")


class _PostCommit(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class WebhookWriter(DataSourceWriter):
    """One ``write(iterator)`` call per partition: rows serialize to
    JSON and post in batches of ``batch_size`` — the K4 alert sink
    (§2.2) in connector form, usable as ``df.write.format("webhook_alert")``."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.fields = schema.fieldNames()
        self.endpoint = options.get("endpoint", "/tmp/webhook_spool/alerts.jsonl")
        self.poster_path = options.get("poster", "ug_dwh_etl_spark.sources.pyds:spool_poster")
        self.batch_size = int(options.get("batch_size", "100"))

    def write(self, iterator):
        import json as _json

        poster = _resolve(self.poster_path)
        buf: list[str] = []
        n = 0
        for row in iterator:
            buf.append(_json.dumps(dict(zip(self.fields, row)), default=str))
            if len(buf) >= self.batch_size:
                poster(self.endpoint, buf)
                n += len(buf)
                buf = []
        if buf:
            poster(self.endpoint, buf)
            n += len(buf)
        return _PostCommit(n)

    def commit(self, messages) -> None:
        total = sum(m.n for m in messages if m is not None)
        import logging

        logging.getLogger("ug_dwh_etl_spark.alerts").info(
            "webhook_alert: posted %d rows", total
        )

    def abort(self, messages) -> None:  # pragma: no cover - failure path
        pass


class WebhookAlertDataSource(DataSource):
    """`df.write.format("webhook_alert")` — the write-side twin of
    PagedRestDataSource, completing the custom-connector surface
    (read, streaming read, write)."""

    @classmethod
    def name(cls) -> str:
        return "webhook_alert"

    def writer(self, schema: StructType, overwrite: bool) -> WebhookWriter:
        return WebhookWriter(schema, self.options, overwrite)
