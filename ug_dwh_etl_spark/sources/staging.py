"""Pluggable staging connectors (SURVEY.md §2.1 S3, S4, S6).

The reference pulls inputs from Google Drive (`sf_html_data.py:51-85`),
IMAP attachments (`Midoco/product_data.py:40-56`) and a paginated REST API
(`Audisto/audisto.py:88-137`). Those are connector concerns, not query
operators: the engine reads paths; a Source resolves a logical name to a
path, staging bytes first if needed. Network connectors are stubbed —
the container has no credentials — but the interface and the distributed
REST-pagination plan (see ``rest.py``) are real.
"""

from __future__ import annotations

import abc
import os


class Source(abc.ABC):
    """Resolve a logical dataset name to a readable path/glob."""

    @abc.abstractmethod
    def resolve(self, name: str) -> str: ...


class LocalPathSource(Source):
    """Datasets already on a filesystem Spark can scan (the normal case:
    object storage mounted or s3a/gs paths)."""

    def __init__(self, root: str):
        self.root = root

    def resolve(self, name: str) -> str:
        path = os.path.join(self.root, name)
        for candidate in (path, path + ".parquet", path + ".csv"):
            if os.path.exists(candidate):
                return candidate
        return path


class StagedFileSource(Source):
    """Base for fetch-then-read connectors (Drive S3, IMAP S6).

    ``fetch`` runs driver-side ONCE per dataset (auth + listing are not
    distributable); the staged path is then scanned by executors like any
    other file. Subclasses implement ``fetch``; this repo ships stubs
    because no external credentials exist in the build environment.
    """

    def __init__(self, staging_dir: str):
        self.staging_dir = staging_dir

    def fetch(self, name: str) -> str:
        raise NotImplementedError(
            "network connector stub: implement fetch() with real credentials "
            "(reference shape: Drive sf_html_data.py:51-85, IMAP product_data.py:40-56)"
        )

    def resolve(self, name: str) -> str:
        staged = os.path.join(self.staging_dir, name)
        if not os.path.exists(staged):
            return self.fetch(name)
        return staged
