"""Local re-implementation of the driver's correctness gate: run each
registered Spark query and its DuckDB oracle SQL on the same parquet
tables; compare row count, column names, and order-insensitive values.

Driver-faithful typing: both sides are fetched through the pandas path
(Spark ``toPandas`` / DuckDB ``.df()``) so the same coercions apply that
the real gate applies — DuckDB HUGEINT (un-cast ``SUM(int)``) and
nullable ints become float64, DECIMAL becomes float64.  Cells are
normalized with a type tag so an int64 on one side never matches a
float64 on the other (the exact failure mode of round 1), while float
and Decimal normalize identically (the driver's str() render treats
``Decimal('1.5')`` and ``1.5`` the same).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from gmall_flink_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _norm_cell(v):
    # Missing values: None / NaN / NaT.  Nullable-int NaN is symmetric
    # (both pandas paths coerce the column to float64).
    if v is None or v is pd.NaT:
        return "\0NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\0NULL"
    if isinstance(v, np.floating) and np.isnan(v):
        return "\0NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{int(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating, decimal.Decimal)):
        return f"f:{float(v):.9g}"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        # Lenient: a midnight timestamp equals the bare date (duckdb's
        # pandas path renders DATE as datetime64, Spark keeps date).
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return f"t:{v.date().isoformat()}"
        return f"t:{v.isoformat(sep=' ')}"
    if isinstance(v, _dt.date):
        return f"t:{v.isoformat()}"
    return "s:" + str(v)


def _norm_pdf(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def compare(spark, query_fn, sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    s_pdf = sdf.toPandas()
    o_pdf = run_oracle(sql, sf_dir)
    if sorted(s_pdf.columns) != sorted(o_pdf.columns):
        return False, (
            f"columns differ: spark={sorted(s_pdf.columns)} "
            f"oracle={sorted(o_pdf.columns)}"
        )
    if len(s_pdf) != len(o_pdf):
        return False, f"row count differs: spark={len(s_pdf)} oracle={len(o_pdf)}"
    sn, on = _norm_pdf(s_pdf), _norm_pdf(o_pdf)
    if sn != on:
        diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"ok ({len(s_pdf)} rows)"
