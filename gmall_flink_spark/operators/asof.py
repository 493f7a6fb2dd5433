"""As-of join — a temporal operator Spark lacks natively (the batch analog
of the reference's `FOR SYSTEM_TIME AS OF` lookup join J3 generalized to
*event-time* versions: each left row matched to the latest right row at or
before its timestamp).

Implementation is pure DataFrame composition (no UDF): union-tag both
sides, one shuffle on the key, a single ordered window pass carries the
most recent right-side payload forward (`last(..., ignorenulls)`), then
keep left rows. This is the standard log-merge formulation:

  cost = one shuffle + one sort per key — the same as a sort-merge join,
  with none of the per-left-row range probing a naive implementation does;
  skewed keys are split by AQE.

A time-bounded variant (`tolerance`) drops matches older than the bound,
mirroring the reference's interval-join lower bound
(app/dwd/DwdTradePayDetailSuc.java:125-126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach ``payload`` columns from the latest right
    row with ``right_ts <= left_ts`` (per ``on`` key); nulls when no prior
    right row exists (left outer as-of).

    Ties (right_ts == left_ts) match, like DuckDB/pandas ASOF backward.
    When several right rows share the winning timestamp the one latest in
    the (ts, payload) order wins — deterministic for deterministic payloads.
    """
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("__payload"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(lt.schema["__left"].dataType.simpleString()).alias("__left"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    )
    merged = lt.unionByName(rt)
    # right rows sort before left rows at equal ts (_SIDE 0 < 1) so a
    # same-timestamp right row is visible to the left row — backward asof.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", _SIDE, "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        rts = Window.partitionBy("__k").orderBy("__ts", _SIDE, "__payload").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carried = carried.withColumn(
            "__match_ts", F.last(F.when(F.col(_SIDE) == 0, F.col("__ts")), ignorenulls=True).over(rts)
        ).withColumn(
            "__match",
            F.when(
                F.col("__match_ts")
                >= F.col("__ts") - F.expr(f"interval {tolerance_seconds} seconds"),
                F.col("__match"),
            ),
        )
    out = carried.where(F.col(_SIDE) == 1).select("__left.*", "__match.*")
    return out
