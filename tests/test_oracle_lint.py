"""Static lint over every registered oracle SQL string.

Round 1 lost 15 hash matches to one typing class: DuckDB types an un-cast
``SUM(<integer>)`` as HUGEINT, which the driver's pandas fetch renders as
float64 while the Spark side stays int64 — value-identical rows, different
hashes.  The fix is a ``CAST(... AS BIGINT)`` in the oracle; this lint makes
the whole class impossible to reintroduce: it ``DESCRIBE``s every oracle
against DuckDB (no execution, just the inferred output schema) and fails if
any result column is HUGEINT-typed.  Runs at sf0.001 views purely for name
resolution — DESCRIBE never scans data, so this is milliseconds per query.
"""

from __future__ import annotations

import duckdb
import pytest

from gmall_flink_spark.registry import all_oracle_sql
from gmall_flink_spark.sources.tables import TABLES
from tests.conftest import SF_SMOKE

_ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_output_schema_is_hugeint_clean(con, name):
    sql = _ORACLE[name].strip().rstrip(";")
    schema = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(col, typ) for col, typ, *_ in schema if "HUGEINT" in typ.upper()]
    assert not bad, (
        f"{name}: oracle output column(s) typed HUGEINT {bad} — the driver's "
        f"pandas path coerces HUGEINT to float64 while Spark stays int64; "
        f"wrap the aggregate in CAST(... AS BIGINT)"
    )
