"""Changelog-consuming sinks (SURVEY §2.2 K2/K3/K4).

The reference emits retracting changelogs to upsert-Kafka with a PK
(util/FlinkSqlUtil.java:42-50) and dim upserts to HBase
(app/dim/func/DimSinkFunction.java:41-62). Our contract is "final rows
only": each micro-batch is key-compacted and MERGEd into a keyed state
table. Here the state table is plain parquet rewritten atomically (rename)
— on a real cluster this is a Delta/Iceberg ``MERGE INTO`` with the same
keep-last semantics, partitioned/bucketed by the key so the merge touches
only matching files; the compaction logic (keep_last on keys) is identical.

``topic_router`` is K2: per-record dynamic sink routing — the batch file
analogue of the Kafka sink honoring a per-row ``topic`` column
(app/dwd/DwdBaseApp.java:100-106), expressed as ``partitionBy`` so each
"topic" lands in its own directory.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from gmall_flink_spark.operators.dedup import keep_last


def upsert_into(state_path: str, batch_df: DataFrame, keys: list[str], order_by: list[str]) -> None:
    """MERGE one (micro-)batch into the keyed parquet state table: union the
    existing state with the batch, keep the last row per key under
    ``order_by``, atomically swap. The batch twin of K3 upsert-Kafka
    consumption and of the K4 HBase dim put path."""
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    compacted = keep_last(batch_df, keys, order_by)
    if os.path.exists(state_path):
        prior = spark.read.parquet(state_path)
        # a batch row beats a prior row at an equal version (__src tiebreak):
        # a re-put of the same version overwrites, like an HBase put.
        merged = prior.select(*batch_df.columns).withColumn("__src", F.lit(0)).unionAll(
            compacted.withColumn("__src", F.lit(1))
        )
        compacted = keep_last(merged, keys, [*order_by, "__src"]).drop("__src")
    tmp = state_path.rstrip("/") + ".__tmp__"
    compacted.write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.replace(tmp, state_path)


def upsert_writer(state_path: str, keys: list[str], order_by: list[str]):
    """foreachBatch form of ``upsert_into`` for writeStream (K3)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        upsert_into(state_path, batch_df, keys, order_by)

    return write


def topic_router(base_path: str, topic_col: str = "sink_table"):
    """K2: route each row to its own sink directory by a per-row column."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").partitionBy(topic_col).parquet(base_path)

    return write
