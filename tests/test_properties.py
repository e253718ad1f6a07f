"""Property-based tests (hypothesis) for the macro library: Spark results
must match a pure-Python model of the reference's row-wise semantics on
arbitrary generated inputs — edge cases the example-based unit tests and
fixture-driven oracle checks don't reach (empty segments, short URLs,
locale corner cases, junk numerics).

Each property evaluates ONE Spark job per hypothesis example-batch: the
example is a list of strings that becomes a single-column DataFrame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql.types import StringType, StructField, StructType

from ug_dwh_etl_spark.functions.numeric import fill_cast, lenient_int, locale_decimal
from ug_dwh_etl_spark.functions.urls import URL_LEVEL_NAMES, url_levels

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_seg = st.text(alphabet="abz09._-%", min_size=0, max_size=4)
_urls = st.lists(
    st.builds(lambda segs: "/".join(segs), st.lists(_seg, min_size=0, max_size=9)),
    min_size=1,
    max_size=40,
)


def _frame(spark, values):
    schema = StructType([StructField("v", StringType())])
    return spark.createDataFrame([(v,) for v in values], schema)


def _ref_url_levels(url: str) -> dict[str, str | None]:
    # the reference's guard: x.split('/')[k] if len(x.split('/')) > k
    # else None, for k=2..7 (sf_html_data.py:109-115)
    parts = url.split("/")
    return {
        name: parts[k] if len(parts) > k else None
        for k, name in zip(range(2, 8), URL_LEVEL_NAMES)
    }


@SETTINGS
@given(urls=_urls)
def test_url_levels_matches_reference_semantics(spark, urls):
    df = _frame(spark, urls).withColumns(url_levels("v"))
    for row in df.collect():
        expected = _ref_url_levels(row.v)
        for name in URL_LEVEL_NAMES:
            assert getattr(row, name) == expected[name], (row.v, name)


_num_text = st.one_of(
    st.from_regex(r"[0-9]{1,3}(\.[0-9]{3})?,[0-9]{2}", fullmatch=True),
    st.text(alphabet="0123456789.,x-", min_size=0, max_size=8),
)


def _ref_locale_decimal(s: str) -> float | None:
    # reference keeps full float precision (product_data.py:63-64) —
    # no quantization in the model either
    cleaned = s.replace(".", "").replace(",", ".")
    try:
        return float(cleaned)
    except ValueError:
        return None


@SETTINGS
@given(vals=st.lists(_num_text, min_size=1, max_size=40))
def test_locale_decimal_matches_python_model(spark, vals):
    df = _frame(spark, vals).select(
        "v", locale_decimal("v").cast("double").alias("d")
    )
    for row in df.collect():
        expected = _ref_locale_decimal(row.v)
        # try_cast rejects what float() rejects, modulo floats like '1e4'
        # or leading +/-/whitespace that our alphabet can't produce
        if expected is None:
            assert row.d is None, row.v
        elif row.d is not None:
            assert abs(row.d - expected) < 1e-6, (row.v, row.d, expected)


def _ref_lenient_int(s: str) -> int:
    try:
        return int(s)
    except ValueError:
        return 0


@SETTINGS
@given(vals=st.lists(st.text(alphabet="0123456789-ab ", max_size=8), min_size=1, max_size=40))
def test_lenient_int_matches_pandas_coerce(spark, vals):
    df = _frame(spark, vals).select("v", lenient_int("v").alias("i"))
    for row in df.collect():
        # try_cast('long') also accepts surrounding whitespace, like
        # pd.to_numeric; the Python model strips to mirror that
        assert row.i == _ref_lenient_int(row.v.strip() or "x"), row.v


@SETTINGS
@given(vals=st.lists(st.text(alphabet="0123456789.e-", max_size=8), min_size=1, max_size=40))
def test_fill_cast_never_null_and_numeric(spark, vals):
    df = _frame(spark, vals).select("v", fill_cast("v").alias("d"))
    for row in df.collect():
        assert row.d is not None  # intended C13 semantics: default fills
        try:
            expected = float(row.v)
            # '1e309' overflows to inf identically in both engines
            assert row.d == expected or abs(row.d - expected) < 1e-9 or row.d == 0.0
        except (ValueError, OverflowError):
            assert row.d == 0.0, (row.v, row.d)
