"""Pipeline-composition queries: the reference's three entry points
(SURVEY.md §3 E1-E3) run end-to-end as single lazy plans, each with an
exact DuckDB oracle.

These complement the per-macro queries in ``macros.py``: the macro
queries prove each operator alone; these prove the full reference
transform CHAINS composed exactly as the scripts run them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ug_dwh_etl_spark.plans.reference_pipelines import (
    E2_TOTAL_ROWS,
    e1_crawl_pipeline,
    e2_ranks_pipeline,
    e3_bookings_pipeline,
)
from ug_dwh_etl_spark.queries.registry import register


@register(
    "pipeline_e1_crawl",
    """
    WITH base AS (
      SELECT doc_id, source, n_chars,
             'https://www.example.com/' || lang || '/' || source || '/p' || doc_id::VARCHAR ||
             CASE doc_id % 4 WHEN 0 THEN '.jpg' WHEN 1 THEN '.PNG'
                             WHEN 2 THEN '.html' ELSE '.pdf' END AS address
      FROM documents)
    SELECT doc_id, address,
           string_split(address, '/')[3] AS root,
           string_split(address, '/')[4] AS directory,
           string_split(address, '/')[5] AS page_level1,
           string_split(address, '/')[6] AS page_level2,
           string_split(address, '/')[7] AS page_level3,
           string_split(address, '/')[8] AS page_level4,
           CASE WHEN regexp_matches(address, '(?i)\\.(jpg|jpeg|png|gif|webp|svg|bmp|ico)$')
                THEN 'Picture' ELSE 'HTML' END AS doctype,
           CASE WHEN regexp_matches(source, '^src[0-9]$')  THEN 'Internal'
                WHEN regexp_matches(source, '^src1[0-9]$') THEN 'Whitelabel'
                ELSE 'External' END AS website_type,
           COALESCE(TRY_CAST(CASE WHEN doc_id % 5 = 0 THEN NULL
                                  ELSE n_chars::VARCHAR END AS DOUBLE), 0.0) AS word_metric
    FROM base
    """,
)
def pipeline_e1_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return e1_crawl_pipeline(sf_dir).dataframe(spark)


@register(
    "pipeline_e2_ranks",
    f"""
    WITH fetched AS (
      SELECT 'https://www.example.com/dir' || (i % 7)::VARCHAR || '/page' || i::VARCHAR AS address,
             (i * 37) % 1000 / 100.0 AS page_rank,
             (i * 53) % 1000 / 100.0 AS chei_rank
      FROM range({E2_TOTAL_ROWS}) t(i))
    SELECT address, page_rank, chei_rank,
           string_split(address, '/')[3] AS root,
           string_split(address, '/')[4] AS directory,
           string_split(address, '/')[5] AS page_level1,
           string_split(address, '/')[6] AS page_level2
    FROM fetched
    """,
)
def pipeline_e2_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf-independent: the source is the deterministic REST fake (S4); the
    # oracle regenerates the same pages relationally.
    return e2_ranks_pipeline().dataframe(spark)


@register(
    "pipeline_e3_bookings",
    """
    SELECT COALESCE(TRY_CAST(o_orderkey AS BIGINT), 0) AS buchungsnummer,
           strftime(o_orderdate::DATE, '%Y-%m-%d') AS anlagedatum,
           strftime(l_shipdate::DATE, '%Y-%m-%d') AS reisebeginn,
           ROUND(o_totalprice, 2) AS preis,
           DATE_DIFF('day', o_orderdate::DATE, l_shipdate::DATE) AS tage_bis_reisestart,
           COALESCE(TRY_CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS BIGINT), 0)
             AS personen,
           o_orderstatus AS buchungs_status
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_linenumber = 1
    """,
)
def pipeline_e3_bookings(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    # DATE columns reach pandas as datetime.date on Spark but datetime64
    # on DuckDB; compare as formatted strings (parity rule, SURVEY.md §5).
    df = e3_bookings_pipeline(sf_dir).dataframe(spark)
    return df.withColumns(
        {
            "anlagedatum": F.date_format("anlagedatum", "yyyy-MM-dd"),
            "reisebeginn": F.date_format("reisebeginn", "yyyy-MM-dd"),
        }
    )
