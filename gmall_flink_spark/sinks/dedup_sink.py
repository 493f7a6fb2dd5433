"""Cross-batch exact-dedup ingest: the streaming form of corpus-scale exact
deduplication (north-star op), built on the bucketed state layer.

Each micro-batch: compact within the batch (keep lowest order key per
fingerprint), anti-join against the seen-fingerprint state for the touched
key buckets only, append the survivors. Unlike
``dropDuplicatesWithinWatermark`` (time-bounded state), the seen-set is
UNBOUNDED by design — corpus dedup must remember every fingerprint ever
ingested — so the state lives in a bucketed table (per-batch I/O ∝ the
batch's bucket spread, not corpus size; at cluster scale a Delta/Iceberg
table bucket-partitioned by fingerprint hash with a MERGE ... WHEN NOT
MATCHED INSERT)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.operators.dedup import keep_first
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

__all__ = ["dedup_append", "dedup_writer", "read_state"]


def dedup_append(
    state_path: str,
    batch_df: DataFrame,
    fingerprint_col: str,
    order_by: list[str],
    n_buckets: int = 16,
) -> None:
    """Append the batch rows whose fingerprint was never seen before; the
    first arrival (by ``order_by``) owns the fingerprint forever."""
    spark = batch_df.sparkSession
    check_buckets(state_path, n_buckets)
    compacted = pin_batch(with_bucket(
        keep_first(batch_df, [fingerprint_col], order_by), [fingerprint_col], n_buckets
    ))
    try:
        buckets = touched_buckets(compacted)
        prior = read_prior(spark, state_path, buckets)
        fresh = compacted
        if prior is not None:
            fresh = compacted.join(
                prior.select(F.col(fingerprint_col).alias("__seen")),
                compacted[fingerprint_col] == F.col("__seen"),
                "left_anti",
            )
        merged = fresh if prior is None else prior.select(*fresh.columns).unionAll(fresh)
        swap_buckets(merged, state_path, buckets, n_buckets)
    finally:
        unpin_batch(compacted)


def dedup_writer(
    state_path: str, fingerprint_col: str, order_by: list[str], n_buckets: int = 16
):
    """foreachBatch form of ``dedup_append`` for writeStream."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        dedup_append(state_path, batch_df, fingerprint_col, order_by, n_buckets)

    return write
