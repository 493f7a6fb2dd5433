"""Oracle-checked multimodal-pipeline queries (north-star ops): binary
payload decode stats, video frame-sampling plans, image resize plans —
the Spark plumbing is real (mapInPandas / sequence+explode); only the
codec byte-work is stubbed (see llm/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.llm.multimodal import (
    decode_media,
    frame_sample,
    media_table,
    resize_plan,
)


def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind stats from the Arrow-batched decode: count, total/max
    payload bytes. (The checksum column is pinned by unit tests; byte
    arithmetic isn't SQL-expressible for the oracle.)"""
    out = decode_media(media_table(spark, sf_dir))
    return (
        out.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("media_ct"),
            F.sum("byte_len").alias("bytes_total"),
            F.max("byte_len").alias("bytes_max"),
        )
        .orderBy("kind")
    )


def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sample plan totals (stride 30): videos, sampled frames,
    sum of sampled indices."""
    fs = frame_sample(media_table(spark, sf_dir), stride=30)
    return fs.agg(
        F.countDistinct("media_id").alias("video_ct"),
        F.count(F.lit(1)).alias("frame_ct"),
        F.sum("frame_idx").alias("idx_sum"),
    )


def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize targets for every image payload."""
    return resize_plan(media_table(spark, sf_dir), max_side=256).orderBy("media_id")


def media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact blob dedup, chunk-hash first pass: md5 over the leading 64
    payload bytes (the cheap prefilter real media pipelines run before
    full-content hashing), JVM-side on the binary column — payload bytes
    never reach Python. Per kind: blobs, distinct chunk hashes, dups."""
    m = media_table(spark, sf_dir)
    fp = F.md5(F.expr("substring(payload, 1, 64)"))
    return (
        m.select("kind", fp.alias("fp"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("blob_ct"),
            F.countDistinct("fp").alias("distinct_fp"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("dup_ct"),
        )
        .orderBy("kind")
    )


QUERIES = {
    "media_decode_stats": media_decode_stats,
    "media_frame_plan": media_frame_plan,
    "media_resize_plan": media_resize_plan,
    "media_exact_dedup": media_exact_dedup,
}

_KIND = "(['image','audio','video'])[(doc_id % 3) + 1]"

ORACLE = {
    # payload = utf-8 text bytes and the corpus is ASCII, so the 64-byte
    # binary prefix equals the 64-char text prefix
    "media_exact_dedup": f"""
        SELECT {_KIND} AS kind,
               COUNT(*) AS blob_ct,
               COUNT(DISTINCT md5(substring(text, 1, 64))) AS distinct_fp,
               CAST(COUNT(*) - COUNT(DISTINCT md5(substring(text, 1, 64))) AS BIGINT)
                   AS dup_ct
        FROM documents
        GROUP BY 1 ORDER BY 1
    """,
    "media_decode_stats": f"""
        SELECT {_KIND} AS kind,
               COUNT(*) AS media_ct,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS bytes_total,
               MAX(octet_length(encode(text))) AS bytes_max
        FROM documents
        GROUP BY 1 ORDER BY 1
    """,
    # videos: n_frames = doc_id % 300 + 1, stride 30 ->
    # c = floor((n_frames - 1) / 30) + 1 sampled frames,
    # idx_sum per video = 30 * c * (c - 1) / 2
    "media_frame_plan": """
        WITH v AS (
            SELECT doc_id, doc_id % 300 + 1 AS n_frames,
                   (doc_id % 300) // 30 + 1 AS c
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT COUNT(*) AS video_ct,
               CAST(SUM(c) AS BIGINT) AS frame_ct,
               CAST(SUM(30 * c * (c - 1) // 2) AS BIGINT) AS idx_sum
        FROM v
    """,
    "media_resize_plan": """
        WITH img AS (
            SELECT doc_id AS media_id,
                   CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
                   CAST(doc_id % 1080 + 1 AS INTEGER) AS height
            FROM documents WHERE doc_id % 3 = 0
        )
        SELECT media_id, width, height,
               CAST(CASE WHEN greatest(width, height) > 256
                    THEN ceil(width / (greatest(width, height) / 256))
                    ELSE width END AS INTEGER) AS target_width,
               CAST(CASE WHEN greatest(width, height) > 256
                    THEN ceil(height / (greatest(width, height) / 256))
                    ELSE height END AS INTEGER) AS target_height
        FROM img ORDER BY media_id
    """,
}
