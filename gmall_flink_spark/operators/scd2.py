"""SCD2 versioning: turn a changelog into slowly-changing-dimension
history rows (the batch form of the reference DIM layer's
close-previous-version upserts, app/dim/DimApp.java).

Shared by the oracle-checked batch query (queries/cdc.py::cdc_scd2_history)
and the incremental streaming sink (sinks/scd2.py) — "streaming =
incremental batch" means both must call the SAME transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    df: DataFrame, key: str, order_cols: list[str], from_col: str
) -> DataFrame:
    """Per ``key``, number versions by ``order_cols`` and close each one
    with the next version's ``from_col`` (``valid_to`` NULL while current).
    One shuffle on the key; everything else is window-local."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.withColumn("ver", F.row_number().over(w).cast("bigint")).withColumn(
        "valid_to", F.lead(from_col).over(w)
    )
