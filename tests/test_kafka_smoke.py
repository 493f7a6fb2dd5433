"""Opt-in real-broker Kafka smoke test (S1 source / K1-K2 sink round-trip).

The sandbox has no broker, so this module always SKIPS there (visibly,
with the reason below); set ``KAFKA_BOOTSTRAP=host:port`` against a real
broker — launched with the spark-sql-kafka-0-10 connector on the
classpath and topic auto-creation enabled (or the two smoke topics
pre-created) — to execute the production option strings in
``sources/kafka.py`` / ``sinks/kafka.py`` (reference
util/KafkaUtil.java:25-60) instead of the file-stream twins every other
streaming test uses.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason=(
        "no Kafka broker in this environment — set KAFKA_BOOTSTRAP=host:port "
        "(with the spark-sql-kafka connector on the Spark classpath) to run "
        "the real-broker round-trip"
    ),
)


def test_kafka_round_trip_with_topic_routing(spark, tmp_path):
    """to_kafka_json -> kafka_writer (per-row `topic` column, K2) ->
    kafka_topic (S1, earliest offsets) must round-trip every record to the
    topic its sink_table routed it to."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.sinks.kafka import kafka_writer, to_kafka_json
    from gmall_flink_spark.sources.kafka import kafka_topic

    run = uuid.uuid4().hex[:8]
    topics = {0: f"gmall_smoke_{run}_a", 1: f"gmall_smoke_{run}_b"}

    rows = [(i, f"sku_{i}", i % 2) for i in range(20)]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(rows, "id long, sku string, route int").write.parquet(src_dir)

    stream = (
        spark.readStream.schema("id long, sku string, route int")
        .parquet(src_dir)
        .withColumn(
            "topic",
            F.when(F.col("route") == 0, topics[0]).otherwise(topics[1]),
        )
        .drop("route")
    )
    out = to_kafka_json(stream, key_col="id", topic_col="topic")
    q = (
        kafka_writer(out, BOOTSTRAP, topic=None, checkpoint=str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    for route, topic in topics.items():
        got = (
            kafka_topic(spark, BOOTSTRAP, topic, starting_offsets="earliest")
            .writeStream.format("memory")
            .queryName(f"smoke_{route}")
            .trigger(availableNow=True)
            .start()
        )
        got.awaitTermination(120)
        vals = [
            json.loads(r["value"])
            for r in spark.sql(f"SELECT value FROM smoke_{route}").collect()
        ]
        want = {(i, f"sku_{i}") for i, _, r in rows if r == route}
        assert {(v["id"], v["sku"]) for v in vals} == want, topic
