"""Multimodal queries: binary-payload plumbing with exact oracles.

The payloads are UTF-8 bytes of documents.text, so DuckDB can recompute
byte lengths and md5 digests over the same content — proving the Spark
side's binary handling (encode, octet_length, mapInPandas feature
extraction) end-to-end without any image libraries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ug_dwh_etl_spark.operators.multimodal import extract_features, media_from_documents
from ug_dwh_etl_spark.queries.registry import register, table


@register(
    "multimodal_meta_stats",
    """
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           COUNT(*) AS n,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           MAX(strlen(text) % 640 + 1) AS max_width,
           MAX(strlen(text) * 10) AS max_duration_ms
    FROM documents
    GROUP BY media_type
    """,
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("meta.byte_len").alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )


@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           strlen(text) AS byte_len,
           md5(text) AS content_md5,
           ROUND(('0x' || substr(md5(text), 1, 4))::BIGINT / 65536.0, 6) AS f0
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas runs the Arrow-batched extractor; f0 (first 2 digest
    # bytes / 2^16) is recomputable relationally, proving the Python
    # batch path produced the right bytes.
    media = media_from_documents(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "byte_len",
        "content_md5",
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


@register(
    "multimodal_frame_plan",
    """
    WITH vid AS (
      SELECT doc_id AS media_id, strlen(text) * 10 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, CAST(t AS BIGINT) AS frame_ms,
           CAST(t / 500 AS BIGINT) AS frame_idx
    FROM (SELECT media_id, duration_ms,
                 unnest(generate_series(0, duration_ms - 1, 500)) AS t
          FROM vid)
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling PLAN for the video rows: one output row per
    500 ms sample position, derived from metadata duration — the
    scheduling half of frame extraction, computed relationally
    (sequence + explode, zero Python). The decode half consumes this
    exact relation through mapInPandas against the stubbed codec
    (operators/multimodal.py sample_frames), so at 100 TB the expensive
    stage is driven by a partitionable frame-task table instead of
    per-file driver loops."""
    media = media_from_documents(table(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video"
    )
    frames = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("meta.duration_ms") - 1,
                F.lit(500).cast("long"),
            )
        ).alias("frame_ms"),
    )
    return frames.select(
        "media_id",
        "frame_ms",
        (F.col("frame_ms") / 500).cast("long").alias("frame_idx"),
    )


@register(
    "multimodal_dedup_payloads",
    """
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           md5(text) AS content_md5,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY media_type, content_md5
    """,
)
def multimodal_dedup_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup of binary media payloads — the image/audio
    counterpart of dedup_exact_groups. md5 over the raw bytes needs no
    codec, so it is the real production shape for multimodal training
    sets (dedupe before decode): one shuffle on (media_type, digest),
    survivor = min id, digest computed scan-side in codegen."""
    media = media_from_documents(table(spark, sf_dir, "documents"))
    return media.groupBy(
        "media_type", F.md5("payload").alias("content_md5")
    ).agg(
        F.min("media_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
