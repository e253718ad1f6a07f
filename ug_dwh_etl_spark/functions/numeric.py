"""Numeric cast macros (SURVEY.md §2.10 C10, C12, C13, C14).

All use try_cast semantics: Spark 4 runs ANSI mode by default, where a
plain CAST on malformed input throws; the reference's pandas semantics
(`errors='coerce'`, NaN-tolerant astype) map to try_cast + coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def locale_decimal(col: Column | str) -> Column:
    """C10 — German-locale money parse: strip '.' thousands separators,
    ','→'.', then full-precision double cast. The reference
    (`Midoco/product_data.py:63-64`) keeps full float precision after the
    parse; quantizing to cents here would silently round sub-cent inputs,
    so cents-quantization belongs at the money-aggregation edge (where the
    DECIMAL-sum parity rule already applies), never at parse time."""
    cleaned = F.regexp_replace(F.regexp_replace(_c(col), r"\.", ""), ",", ".")
    return cleaned.try_cast("double")


def lenient_int(col: Column | str, default: int = 0) -> Column:
    """C12 — ``pd.to_numeric(errors='coerce').fillna(0).astype(int)``
    (`Midoco/product_data.py:67-71`)."""
    return F.coalesce(_c(col).try_cast("long"), F.lit(default))


def fill_cast(col: Column | str, default: float = 0.0) -> Column:
    """C13/C14 — fill-null + float cast on metric columns.

    NOTE reference bug: `sf_html_data.py:153-160` chains
    ``fillna(0, inplace=True)`` (returns None) with ``astype(float)``, so
    the reference actually nulls those columns. We implement the INTENDED
    semantics (fill 0, then cast) per SURVEY.md §5 policy.
    """
    return F.coalesce(_c(col).try_cast("double"), F.lit(float(default)))
