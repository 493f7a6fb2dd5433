"""Kafka sources (S1/S2, util/KafkaUtil.java:25-53, FlinkSqlUtil.java:22-31).

No broker exists in the test environment — the file-backed synthesizers
(cdc_synth/log_synth) stand in, and every transform downstream of the
source is identical. These wrappers exist so a production deployment swaps
one call:

    raw = kafka_topic(spark, "broker:9092", "topic_db")        # instead of
    raw = topic_db_envelope(spark, sf_dir)                      # test form

Parity notes vs the reference:
  - `startingOffsets=latest` mirrors OffsetsInitializer.latest().
  - The reference installs a null-tolerant deserializer; Spark's Kafka
    source already yields null `value` rows instead of crashing — the P1
    parse (`from_json` + filter) drops them, same net behavior.
  - groupId is injected for broker-side quota/monitoring parity; Spark
    manages offsets itself via checkpoints (W11), not the consumer group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_topic(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming string-value source for one topic (S1): one `value` column,
    ready for parse_envelope / parse_page_log."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    return reader.load().select(F.col("value").cast("string").alias("value"))
