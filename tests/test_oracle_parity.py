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


_NO_ORACLE = sorted(set(_QUERIES) - set(_ORACLE))


def test_every_query_is_oracle_checked():
    """Every registered query currently ships a DuckDB oracle; the driver's
    weaker rows-only check applies to none of them. (When this set was
    parametrized into a rows-only runner, the empty parameter set surfaced
    as an unexplained runtime skip — r04 "What's wrong" #5.) If a genuinely
    non-SQL-expressible query is ever registered without an oracle, this
    fails: either write the oracle or consciously re-add a rows-only
    runner for the new name."""
    assert _NO_ORACLE == []
