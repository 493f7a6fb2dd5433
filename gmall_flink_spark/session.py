"""SparkSession factory.

The reference pins parallelism=3 (Kafka partitions, util/Common.java:8) and
timezone UTC+8 (util/DateFormatUtil.java:25). Here parallelism is a config
knob sized for the cluster (tests run local[$SPARK_GRAFT_CPUS]) and the
session timezone defaults to UTC so epoch arithmetic matches the DuckDB
oracle; gmall-parity streaming tests pass tz="Asia/Shanghai".

Scale posture (100 TB target):
  - AQE on: runtime coalescing, skew-join splitting, dynamic join selection.
  - shuffle partitions sized by env (32 locally; a real cluster would use
    2-3x total cores — override via SPARK_GRAFT_SHUFFLE_PARTITIONS).
  - Arrow enabled so the few Pandas-UDF operators batch-transfer columns.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: built-in state store providers by short name (SURVEY §4: the reference
#: runs HashMap state, app/dws/DwsTradeOrderWindow.java:42; at 100× keyed
#: state the on-heap HDFSBackedStateStore OOMs and RocksDB spills to disk —
#: VERDICT r10 task 1 exercises the whole streaming suite under it)
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "gmall-flink-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    tz: str = "UTC",
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read as long, sources.tables normalizes to micros (DuckDB parity).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if state_store is not None:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            STATE_STORE_PROVIDERS[state_store],
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def pin_oracle_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable conf on an externally provided session (the
    correctness driver passes its own SparkSession to ``queries()``).

    UTC makes Spark's epoch math on the naive parquet timestamps identical to
    DuckDB's; Arrow speeds the Pandas-UDF operators.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the driver's plain session defaults to 200 shuffle partitions and a
    # 10 MB broadcast threshold — size both the way get_spark does, so the
    # gate runs the plans we designed (broadcast dims, right-sized
    # shuffles). Only UNTOUCHED defaults are normalized: a deliberately-set
    # value (a test disabling broadcast, an operator sizing its own
    # shuffle) must survive the per-query re-pin.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
        )
    if spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760b":
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    return spark
