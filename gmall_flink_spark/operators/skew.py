"""Skew-resilient aggregation (SURVEY §4 scale posture; the Spark-native
replacement for the reference's HBase rowkey salting,
util/HBaseUtil.java:137-147 / util/GetRowKeyUDF.java:18-62).

AQE's skew-join splitting handles joins; for *aggregations* over a heavily
skewed key, ``salted_agg`` pre-splits each group into ``n_salts`` shards
(map-side random-free salt = hash of a unique column), partially aggregates
per shard, then merges — two small shuffles instead of one giant hot
partition. Result-identical to the direct groupBy for algebraic aggregates
(sum/count/min/max), which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: str,
    n_salts: int,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
) -> DataFrame:
    """Two-stage aggregation: shard each key group by ``hash(salt_on) %
    n_salts``, aggregate shards, then aggregate the shard partials.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the partials
    (e.g. partial ``sum(x) as s`` → final ``sum(s) as x_sum``).
    """
    salted = df.withColumn("__salt", F.pmod(F.hash(F.col(salt_on)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
