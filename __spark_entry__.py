"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the DuckDB correctness gate. The catalog itself lives in
``gmall_flink_spark/queries/*`` and is assembled by
``gmall_flink_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_spark.registry import all_oracle_sql, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: six-way snowflake join +
    exact-decimal revenue aggregation (SURVEY §2.4 J1/J7, §2.5 A3)."""
    from gmall_flink_spark.queries.relational import q5_region_revenue
    from gmall_flink_spark.session import pin_oracle_conf

    pin_oracle_conf(spark)
    return q5_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
