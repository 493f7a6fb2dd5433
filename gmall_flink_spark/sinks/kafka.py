"""Kafka sinks (K1 fixed topic, K2 per-record routing, K3 keyed upsert
topic; util/KafkaUtil.java:55-60, app/dwd/DwdBaseApp.java:100-106,
util/FlinkSqlUtil.java:42-50).

No broker in the test environment — the parquet-backed writers in
sinks/upsert.py are the tested stand-ins; these builders encode the exact
production form so deployment is a writer swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_kafka_json(df: DataFrame, key_col: str | None = None, topic_col: str | None = None) -> DataFrame:
    """Serialize all columns to a JSON `value` (K6 snake_case is the column
    naming convention already); optionally keep a `key` (K3 upsert topics
    partition and compact by it) and a per-row `topic` (K2 routing — the
    Kafka sink honors a `topic` column natively)."""
    payload = [c for c in df.columns if c not in (key_col, topic_col)]
    out = df.select(
        F.to_json(F.struct(*payload)).alias("value"),
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        *([F.col(topic_col).alias("topic")] if topic_col else []),
    )
    return out


def kafka_writer(df: DataFrame, bootstrap: str, topic: str | None, checkpoint: str):
    """writeStream builder for K1/K2/K3: fixed `topic` option, or per-row
    `topic` column when topic=None (K2)."""
    w = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        w = w.option("topic", topic)
    return w
