"""Column-name normalization (SURVEY.md §2.3 P7-P8).

Every reference script normalizes names the same way — regex-replace
whitespace / '-' / '"' with '_' and lowercase (e.g.
`sf_html_data.py:167-170`) — applied here once, at the ingest boundary.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NORM = re.compile(r'\s+|-|"')


def normalize_name(name: str) -> str:
    return _NORM.sub("_", name).lower()


def normalize_names(df: DataFrame, renames: dict[str, str] | None = None) -> DataFrame:
    """P7 bulk normalize + P8 explicit mapping renames (applied after,
    keyed on the normalized name — mirrors reference order)."""
    normalized = [normalize_name(c) for c in df.columns]
    out = df.toDF(*normalized)
    if renames:
        out = out.withColumnsRenamed(renames)
    return out
