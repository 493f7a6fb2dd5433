"""Local re-implementation of the driver's correctness gate: run each
registered Spark query and its DuckDB oracle SQL on the same parquet
tables; compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb

from gmall_flink_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v) if v is not None else "\0NULL"


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, query_fn, sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    sn, on = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
    if sn != on:
        diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
