"""Oracle-checked queries for the tumbling-window aggregation suite
(SURVEY §2.5 A1-A6, §2.7 W1-W6) over the `events` stream table.

The reference uses 10-second windows on a dense stream; the testdata events
are spread over 30 days, so 10-minute / 1-day windows exercise the same
operator shapes with populated buckets. Spark's ``window()`` aligns buckets
to the epoch — the DuckDB oracle reproduces that with floor(epoch/size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.money import dsum
from gmall_flink_spark.operators.windows import tumble_agg
from gmall_flink_spark.sources.tables import table


def window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 + A6: 10-minute tumbling count + money sum per event_type with
    stt/edt decoration (the DwsTrafficVcChArIsNewPageViewWindow shape,
    app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:130-154)."""
    ev = table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("pv_ct"), dsum("value", "value_sum")],
    ).orderBy("stt", "event_type")


def window_pv_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + exact distinct (D4-in-window): per 1-hour window pv, exact uv,
    and view-page count (the home/detail UV shape,
    app/dws/DwsTrafficHomeDetailPageViewWindow.java:121-133)."""
    ev = table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "1 hour",
        [],
        [
            F.count(F.lit(1)).alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            F.sum((F.col("event_type") == "view").cast("bigint")).alias("view_ct"),
        ],
    ).orderBy("stt")


def window_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: 1-day tumbling exact-decimal money aggregates per event_type
    (the sku/province money-window shape,
    app/dws/DwsTradeSkuOrderWindow.java:149-166)."""
    ev = table(spark, sf_dir, "events")
    out = tumble_agg(
        ev,
        "ts",
        "1 day",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("event_ct"),
            dsum("value", "value_sum"),
            F.max(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_max"),
        ],
    )
    return out.withColumn(
        "value_avg", F.col("value_sum") / F.col("event_ct")
    ).orderBy("stt", "event_type")


QUERIES = {
    "window_event_counts": window_event_counts,
    "window_pv_uv": window_pv_uv,
    "window_daily_value": window_daily_value,
}


def _bucket(size_s: int) -> str:
    return f"to_timestamp(CAST(floor(epoch(ts) / {size_s}) * {size_s} AS BIGINT))"


ORACLE = {
    "window_event_counts": f"""
        SELECT strftime({_bucket(600)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket(600)} + INTERVAL '600 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               COUNT(*) AS pv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1, 2, 3 ORDER BY stt, event_type
    """,
    "window_pv_uv": f"""
        SELECT strftime({_bucket(3600)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket(3600)} + INTERVAL '3600 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               COUNT(*) AS pv_ct,
               COUNT(DISTINCT user_id) AS uv_ct,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view_ct
        FROM events
        GROUP BY 1, 2 ORDER BY stt
    """,
    "window_daily_value": f"""
        SELECT strftime({_bucket(86400)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket(86400)} + INTERVAL '86400 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               COUNT(*) AS event_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
               CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_max,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS value_avg
        FROM events
        GROUP BY 1, 2, 3 ORDER BY stt, event_type
    """,
}
