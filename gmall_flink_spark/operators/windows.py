"""Tumbling-window aggregation helpers (SURVEY §2.5 A1-A6, §2.7 W1-W6).

The reference aggregates every DWS stream in 10-second event-time tumbling
windows (util/Common.java:9) and decorates each output row with the window
start/end as 'yyyy-MM-dd HH:mm:ss' strings (util/WindowUtil.java:17-25,
applied via WindowFunction in every DWS app). Here:

  tumble()        -> Spark's native window() TVF (epoch-aligned buckets)
  decorate()      -> the stt/edt string columns (A6)

Batch and streaming use the same expressions — streaming only adds
``withWatermark`` before the groupBy (see streaming/pipelines.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumble(ts: Column | str, size: str = "10 minutes") -> Column:
    """Tumbling event-time window column (W1/W2). Spark aligns windows to
    the epoch, so bucket starts equal floor(epoch/size)*size — which is what
    the DuckDB oracle computes."""
    return F.window(ts, size)


def decorate(df: DataFrame, window_col: str = "window") -> DataFrame:
    """A6: replace the window struct with stt/edt string columns."""
    return df.withColumns(
        {
            "stt": F.date_format(F.col(f"{window_col}.start"), TS_FMT),
            "edt": F.date_format(F.col(f"{window_col}.end"), TS_FMT),
        }
    ).drop(window_col)


def tumble_agg(
    df: DataFrame,
    ts: str,
    size: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """groupBy(window, keys).agg(...) + stt/edt decoration — the shape of
    all 9 DWS window apps (e.g. app/dws/DwsTradeOrderWindow.java:99-112).
    Partial (map-side) aggregation comes free from Catalyst's hash-agg."""
    return decorate(df.groupBy(tumble(ts, size), *keys).agg(*aggs))
