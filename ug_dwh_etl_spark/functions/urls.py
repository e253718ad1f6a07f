"""URL path-segment extraction — the engine's signature derived-column macro.

Reference behavior (C1 in SURVEY.md §2.10): split a URL on '/' and take
segments k=2..7 as ``root, directory, page_level1..4``, NULL when the URL
is too short (`/root/reference/Screaming Frog/sf_html_data.py:109-115`,
`sf_inlink_bulk_data.py:71-76`, `Audisto/audisto.py:150-155`).

The reference runs one Python lambda per row PER LEVEL (6 splits/row).
Here the split happens once and `try_element_at` indexes it; Catalyst's
common-subexpression elimination keeps it a single split in codegen, and
`try_element_at` returns NULL out-of-range which matches the reference's
``len(x.split('/')) > k else None`` guard exactly (ANSI mode makes plain
``element_at`` throw instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# for 'https://host/a/b/c', split('/') = [https:, '', host, a, b, c]
# reference indexes k=2 (host=root? no: reference's [2] is the host) —
# its `root` is split[2] (the hostname), `directory` split[3], levels 4..7.
URL_LEVEL_NAMES = ("root", "directory", "page_level1", "page_level2", "page_level3", "page_level4")


def url_levels(url: Column | str) -> dict[str, Column]:
    """Columns for root/directory/page_level1..4 from a URL string.

    1-based `try_element_at` positions 3..8 correspond to the reference's
    0-based ``split('/')[2..7]``.
    """
    col = F.col(url) if isinstance(url, str) else url
    parts = F.split(col, "/")
    return {
        name: F.try_element_at(parts, F.lit(i + 3)).alias(name)
        for i, name in enumerate(URL_LEVEL_NAMES)
    }


def with_url_levels(df: DataFrame, url_col: str) -> DataFrame:
    """Attach all six level columns in one pass."""
    return df.withColumns(url_levels(url_col))


def url_levels_sql(url_expr: str, dialect: str = "duckdb") -> list[str]:
    """The same macro as SQL snippets (for oracle parity checks).

    DuckDB's ``string_split(x,'/')[i]`` is 1-based and NULL out-of-range —
    identical semantics to ``try_element_at``.
    """
    if dialect == "duckdb":
        return [
            f"string_split({url_expr}, '/')[{i + 3}] AS {name}"
            for i, name in enumerate(URL_LEVEL_NAMES)
        ]
    return [
        f"try_element_at(split({url_expr}, '/'), {i + 3}) AS {name}"
        for i, name in enumerate(URL_LEVEL_NAMES)
    ]
