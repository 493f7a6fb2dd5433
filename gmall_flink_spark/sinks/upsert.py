"""Changelog-consuming sinks (SURVEY §2.2 K2/K3/K4).

The reference emits retracting changelogs to upsert-Kafka with a PK
(util/FlinkSqlUtil.java:42-50) and dim upserts to HBase
(app/dim/func/DimSinkFunction.java:41-62). Our contract is "final rows
only": each micro-batch is key-compacted and MERGEd into a keyed state
table. The state table is hash-bucketed parquet (sinks/_bucketed.py): the
merge reads and rewrites only the bucket directories the batch touches, so
per-batch I/O is proportional to the batch, not to accumulated state — on
a real cluster this is a Delta/Iceberg ``MERGE INTO`` on a table
partitioned by the same key bucket; the compaction logic (keep_last on
keys) is identical.

``topic_router`` is K2: per-record dynamic sink routing — the batch file
analogue of the Kafka sink honoring a per-row ``topic`` column
(app/dwd/DwdBaseApp.java:100-106), expressed as ``partitionBy`` so each
"topic" lands in its own directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gmall_flink_spark.operators.dedup import keep_last
from gmall_flink_spark.sinks._bucketed import (
    check_buckets,
    pin_batch,
    unpin_batch,
    read_prior,
    read_state,
    swap_buckets,
    touched_buckets,
    with_bucket,
)

__all__ = ["upsert_into", "upsert_writer", "topic_router", "read_state"]


def upsert_into(
    state_path: str,
    batch_df: DataFrame,
    keys: list[str],
    order_by: list[str],
    n_buckets: int = 16,
) -> None:
    """MERGE one (micro-)batch into the keyed parquet state table: compact
    the batch (keep-last per key), then merge it into the touched key
    buckets only. The batch twin of K3 upsert-Kafka consumption and of the
    K4 HBase dim put path."""
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    check_buckets(state_path, n_buckets)
    pinned = pin_batch(
        with_bucket(keep_last(batch_df, keys, order_by), keys, n_buckets)
    )
    try:
        compacted = pinned
        buckets = touched_buckets(compacted)
        prior = read_prior(spark, state_path, buckets)
        if prior is not None:
            # a batch row beats a prior row at an equal version (__src tiebreak):
            # a re-put of the same version overwrites, like an HBase put.
            merged = prior.select(*compacted.columns).withColumn("__src", F.lit(0)).unionAll(
                compacted.withColumn("__src", F.lit(1))
            )
            compacted = keep_last(merged, keys, [*order_by, "__src"]).drop("__src")
        swap_buckets(compacted, state_path, buckets, n_buckets)
    finally:
        unpin_batch(pinned)


def upsert_writer(state_path: str, keys: list[str], order_by: list[str], n_buckets: int = 16):
    """foreachBatch form of ``upsert_into`` for writeStream (K3)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        upsert_into(state_path, batch_df, keys, order_by, n_buckets)

    return write


def topic_router(base_path: str, topic_col: str = "sink_table"):
    """K2: route each row to its own sink directory by a per-row column."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").partitionBy(topic_col).parquet(base_path)

    return write
