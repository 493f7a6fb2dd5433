"""Driver-gate rehearsal: every registered query with an oracle must
hash-match DuckDB at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import pytest

from gmall_flink_spark.registry import all_oracle_sql, all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

_QUERIES = all_queries()
_ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, name):
    ok, msg = compare(spark, _QUERIES[name], _ORACLE[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only(spark, name):
    df = _QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
