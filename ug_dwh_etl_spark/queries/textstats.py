"""Text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ug_dwh_etl_spark.operators import hashing as H
from ug_dwh_etl_spark.operators.textstats import (
    BPE_ISH_PATTERN,
    STOPWORDS,
    fingerprints,
    langid,
    quality_scores,
    sql_stop_filter,
    token_stats,
)
from ug_dwh_etl_spark.queries.registry import register, table

_TOK_CTE = f"tok AS (SELECT doc_id, text, {H.sql_tokens('text')} AS t FROM documents)"


@register(
    "text_token_stats",
    f"""
    WITH {_TOK_CTE}
    SELECT doc_id,
           len(t) AS n_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
           length(text) AS n_chars_calc,
           ROUND(CASE WHEN len(t) > 0
                      THEN length(array_to_string(t, '')) / len(t) END, 6) AS avg_token_len
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_quality_scores",
    f"""
    WITH {_TOK_CTE}
    SELECT doc_id,
           ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text)::DOUBLE, 6)
             AS alpha_ratio,
           ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)::DOUBLE, 6)
             AS digit_ratio,
           ROUND(length(regexp_replace(text, '[^ ]', '', 'g')) / length(text)::DOUBLE, 6)
             AS space_ratio,
           ROUND(CASE WHEN len(t) > 0
                      THEN {sql_stop_filter('t', STOPWORDS['en'])} / len(t)::DOUBLE
                      ELSE 0.0 END, 6) AS stopword_ratio,
           length(text) >= 100 AS len_ok
    FROM tok
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(table(spark, sf_dir, "documents"), "doc_id", "text")


def _langid_sql() -> str:
    h = {lang: sql_stop_filter("t", words) for lang, words in STOPWORDS.items()}
    return f"""
    WITH {_TOK_CTE}
    SELECT doc_id,
           CASE WHEN {h['en']} >= {h['de']} AND {h['en']} >= {h['fr']}
                 AND {h['en']} >= {h['es']} AND {h['en']} > 0 THEN 'en'
                WHEN {h['de']} >= {h['fr']} AND {h['de']} >= {h['es']}
                 AND {h['de']} > 0 THEN 'de'
                WHEN {h['fr']} >= {h['es']} AND {h['fr']} > 0 THEN 'fr'
                WHEN {h['es']} > 0 THEN 'es'
                ELSE 'und' END AS predicted_lang
    FROM tok
    """


@register("text_langid", _langid_sql())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_fingerprints",
    f"""
    WITH {_TOK_CTE}
    SELECT doc_id,
           md5(array_to_string(t, ' ')) AS fingerprint,
           ('0x' || substr(md5(array_to_string(t, ' ')), 1, 15))::BIGINT AS fingerprint_int
    FROM tok
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(table(spark, sf_dir, "documents"), "doc_id", "text")
