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

    # Smaller shuffle fan-out keeps tiny-SF tests fast; prod default is 32+.
    spark = get_spark(app_name="gmall-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
