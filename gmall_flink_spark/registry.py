"""Query catalog: assembles every oracle-checked query from the
gmall_flink_spark.queries modules into the driver contract
(``queries()`` / ``oracle_sql()`` in __spark_entry__.py).

Each module exposes QUERIES (name -> callable(spark, sf_dir) -> DataFrame)
and ORACLE (name -> DuckDB SQL, omitted for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_spark.session import pin_oracle_conf

_QUERY_MODULES = [
    "gmall_flink_spark.queries.relational",
    "gmall_flink_spark.queries.tpch_extra",
    "gmall_flink_spark.queries.analytic",
    "gmall_flink_spark.queries.dedup",
    "gmall_flink_spark.queries.windows",
    "gmall_flink_spark.queries.cdc",
    "gmall_flink_spark.queries.log",
    "gmall_flink_spark.queries.text",
    "gmall_flink_spark.queries.llm_dedup",
    "gmall_flink_spark.queries.llm_pipeline",
    "gmall_flink_spark.queries.similarity",
    "gmall_flink_spark.queries.multimodal",
    "gmall_flink_spark.queries.scale",
    "gmall_flink_spark.queries.entity",
    "gmall_flink_spark.queries.datasel",
    "gmall_flink_spark.queries.classify",
]


def _collect() -> tuple[dict[str, Callable], dict[str, str]]:
    queries: dict[str, Callable] = {}
    oracle: dict[str, str] = {}
    for modname in _QUERY_MODULES:
        mod = import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries, _ = _collect()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_oracle_conf(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in queries.items()}


def all_oracle_sql() -> dict[str, str]:
    _, oracle = _collect()
    return oracle
