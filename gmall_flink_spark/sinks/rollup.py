"""Incremental rollup maintenance (the continuous-aggregate / "hypertable
rollup" pattern): a summary table kept current by merging per-micro-batch
partial aggregates, instead of recomputing the full aggregate each time.

Correct for algebraic aggregates (count/sum/min/max — anything with a
merge function): rollup(all data) == merge(rollup(batch_1..n)). Each batch
costs one small aggregation + a merge keyed on the rollup keys; at 100 TB
the summary table is partitioned by its key (typically the time bucket) so
the merge touches only the buckets the batch contains — a Delta MERGE in
production, an atomic parquet swap here (same pattern as sinks/upsert.py).

The batch twin (what tests compare against) is the plain groupBy over all
input — SURVEY §5.3 streaming-equals-batch contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: merge functions per partial-column suffix convention
_MERGE = {"ct": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def merge_rollup(state_path: str, batch_partial: DataFrame, keys: list[str]) -> None:
    """Merge one batch's partial aggregate into the rollup table. Partial
    columns are matched to merge functions by suffix: *_ct/_sum -> sum,
    *_min -> min, *_max -> max."""
    spark = batch_partial.sparkSession
    merged = batch_partial
    if os.path.exists(state_path):
        prior = spark.read.parquet(state_path)
        merged = prior.select(*batch_partial.columns).unionAll(batch_partial)
    vals = [c for c in batch_partial.columns if c not in keys]
    aggs = []
    for c in vals:
        fn = _MERGE.get(c.rsplit("_", 1)[-1])
        if fn is None:
            raise ValueError(f"column {c!r} has no mergeable suffix (_ct/_sum/_min/_max)")
        aggs.append(fn(c).alias(c))
    out = merged.groupBy(*keys).agg(*aggs)
    tmp = state_path.rstrip("/") + ".__tmp__"
    out.write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.replace(tmp, state_path)


def rollup_writer(state_path: str, keys: list[str], agg_fn):
    """foreachBatch form: ``agg_fn(batch_df) -> partial DataFrame`` computes
    the batch's partial aggregate (same keys + suffixed value columns)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_rollup(state_path, agg_fn(batch_df), keys)

    return write
