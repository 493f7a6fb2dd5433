"""S5: JDBC snapshot source (SURVEY §2.1).

The reference snapshots MySQL config/dim tables with flink-connector-jdbc
(`app/dim/DimApp.java` reads `table_process` via MySQL; `util/MysqlUtil`
builds the DDL). Spark's native `spark.read.jdbc` is the same capability;
what matters at scale is the PARTITIONED read: `partition_column` /
`num_partitions` splits the snapshot into parallel range queries so a
large dim table doesn't serialize through one connection — the JDBC
analogue of a parquet scan's split planning. Predicate pushdown also
applies: filters on the DataFrame become WHERE clauses in the remote
query (visible as PushedFilters in `.explain`).

The test environment has no MySQL; embedded Derby (shipped with Spark for
the Hive metastore) provides a real JDBC round-trip — same code path,
different driver/url. `tests/test_operators.py::test_jdbc_snapshot_s5`
seeds Derby from the parquet dim and proves snapshot == source, serial
and partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Snapshot a JDBC table. With ``partition_column`` (a numeric/indexed
    key) the read issues ``num_partitions`` parallel range queries —
    required for any dim big enough to matter; without it the snapshot is
    a single-connection scan (fine for config tables of KBs)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def jdbc_seed(
    df: DataFrame, url: str, table: str, driver: str = DERBY_DRIVER
) -> None:
    """Write ``df`` into a JDBC table (test fixture standing in for the
    upstream MySQL the reference snapshots; also the K-pattern for small
    result publication)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
