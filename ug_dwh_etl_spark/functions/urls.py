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


def url_canonicalize(url: Column | str) -> Column:
    """Canonical URL form for dedup/join keys — the normalization an SEO
    crawl pipeline (the reference's domain) applies before comparing
    URLs across crawls: lowercase scheme+host (path case is
    significant, so only the authority prefix lowercases), strip
    utm_*/gclid/fbclid tracking params (and a then-empty '?'), drop
    fragments, collapse '//' runs in the path, strip one trailing
    slash. Pure nested regexp_replace — runs in codegen on both
    engines; see sql_url_canonicalize for the oracle spelling."""
    c = F.col(url) if isinstance(url, str) else url
    # 1. drop fragment
    c = F.regexp_replace(c, "#.*$", "")
    # 2. strip tracking params (leading '?' or '&' kept correct below)
    c = F.regexp_replace(c, "[?&](utm_[A-Za-z]+|gclid|fbclid)=[^&#]*", "")
    # a surviving '&param' that now FOLLOWS the path (its '?' was
    # stripped) must be promoted back to '?param'
    c = F.regexp_replace(c, "^([^?]*)&", "$1?")
    c = F.regexp_replace(c, "\\?$", "")
    # 3. lowercase scheme://host prefix only
    c = F.concat(
        F.lower(F.regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)),
        F.regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""),
    )
    # 4. collapse duplicate slashes in the path (not the scheme's //)
    c = F.regexp_replace(c, "(?<!:)//+", "/")
    # 5. strip one trailing slash (keep a bare authority's root intact)
    c = F.regexp_replace(c, "(.)/$", "$1")
    return c


def sql_url_canonicalize(expr: str) -> str:
    """DuckDB spelling of url_canonicalize (RE2 lacks lookbehind, so the
    duplicate-slash collapse protects '://' by temporarily encoding
    it)."""
    e = f"regexp_replace({expr}, '#.*$', '')"
    e = f"regexp_replace({e}, '[?&](utm_[A-Za-z]+|gclid|fbclid)=[^&#]*', '', 'g')"
    e = f"regexp_replace({e}, '^([^?]*)&', '\\1?')"
    e = f"regexp_replace({e}, '\\?$', '')"
    e = (
        f"lower(regexp_extract({e}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1)) || "
        f"regexp_replace({e}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', '')"
    )
    e = f"replace({e}, '://', chr(1))"
    e = f"regexp_replace({e}, '//+', '/', 'g')"
    e = f"replace({e}, chr(1), '://')"
    e = f"regexp_replace({e}, '(.)/$', '\\1')"
    return e
