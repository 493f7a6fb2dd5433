from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from gmall_flink_spark.session import get_spark

    # SPARK_GRAFT_STATE_STORE=rocksdb runs the ENTIRE suite under
    # RocksDBStateStoreProvider — the 100x-keyed-state posture sweep
    # (VERDICT r10 task 1; results recorded in SCALE.md r11). Default is
    # Spark's on-heap provider, matching the driver's plain session.
    state_store = os.environ.get("SPARK_GRAFT_STATE_STORE") or None
    # Smaller shuffle fan-out keeps tiny-SF tests fast; prod default is 32+.
    spark = get_spark(
        app_name="gmall-tests", shuffle_partitions=8, state_store=state_store
    )
    yield spark
    spark.stop()
