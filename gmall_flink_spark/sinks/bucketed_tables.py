"""Bucketed-table writes for shuffle-free co-located joins.

Spark's `bucketBy` persists the hash partitioning INTO the table layout:
two tables bucketed the same way on their join key sort-merge-join with
ZERO exchanges — the shuffle is paid once at write time and amortized over
every subsequent join/aggregation on that key. At 100 TB this is the
difference between re-shuffling both fact tables per query and reading
co-located buckets; it's the batch-layout analogue of the keyed state
buckets in ``_bucketed.py``.

Requirements for exchange-free joins (asserted by
``tests/test_plan_shape.py::test_bucketed_tables_join_without_shuffle``):
same bucket count on both sides, join key == bucket column, and
``spark.sql.sources.bucketing.enabled`` (default on). Aggregations on the
bucket key also skip their exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int,
    path: str,
    sort: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed table at ``path``. ``sort``
    additionally orders rows within each bucket file (lets sort-merge join
    skip its per-partition sort too)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        w = w.sortBy(*sort)
    w.saveAsTable(table_name)
