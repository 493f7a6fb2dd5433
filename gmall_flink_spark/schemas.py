"""Schema registry (SURVEY §1): fixed StructTypes for the envelopes the
reference treats as schemaless JSON, with MapType escape hatches for the
dynamic CDC row images.

Reference shapes:
  CDC changelog envelope   util/FlinkSqlUtil.java:9-15
      {database, table, type, ts, data map<string,string>, old map<...>}
  Debezium config envelope app/dim/func/DimCreateTableMapFunction.java:34-44
      {before, after, op}
  page log                 app/dwd/DwdTrafficBaseLogSplit.java:101-110
      {common{...}, page{...}, start{...}, actions[], displays[], err{}, ts}
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_S = StringType()

#: Maxwell-style CDC changelog envelope (ts in epoch **seconds**,
#: util/FlinkSqlUtil.java:17 TO_TIMESTAMP_LTZ(ts,0)).
CDC_ENVELOPE = StructType(
    [
        StructField("database", _S),
        StructField("table", _S),
        StructField("type", _S),
        StructField("ts", LongType()),
        StructField("data", MapType(_S, _S)),
        StructField("old", MapType(_S, _S)),
    ]
)

#: Debezium envelope for the routing/pruning config table
#: (gmall_config.table_process; fields per bean/TableProcess.java:14-33).
CONFIG_ROW = StructType(
    [
        StructField("source_table", _S),
        StructField("source_type", _S),
        StructField("sink_table", _S),
        StructField("sink_type", _S),
        StructField("sink_columns", _S),
        StructField("sink_row_key", _S),
        StructField("op", _S),
    ]
)

DEBEZIUM_CONFIG = StructType(
    [
        StructField("before", CONFIG_ROW),
        StructField("after", CONFIG_ROW),
        StructField("op", _S),
    ]
)

_COMMON = StructType([StructField(f, _S) for f in ("ar", "uid", "os", "ch", "is_new", "md", "mid", "vc", "ba", "sid")])
_PAGE = StructType(
    [
        StructField("page_id", _S),
        StructField("item", _S),
        StructField("during_time", LongType()),
        StructField("item_type", _S),
        StructField("last_page_id", _S),
    ]
)
_ACTION = StructType(
    [
        StructField("action_id", _S),
        StructField("item", _S),
        StructField("item_type", _S),
        StructField("ts", LongType()),
    ]
)
_DISPLAY = StructType(
    [
        StructField("display_type", _S),
        StructField("item", _S),
        StructField("item_type", _S),
        StructField("order", LongType()),
        StructField("pos_id", _S),
    ]
)
_START = StructType(
    [
        StructField("entry", _S),
        StructField("loading_time", LongType()),
        StructField("open_ad_id", _S),
    ]
)
_ERR = StructType([StructField("error_code", _S), StructField("msg", _S)])

#: app/web event log (ts in epoch **milliseconds**).
PAGE_LOG = StructType(
    [
        StructField("common", _COMMON),
        StructField("page", _PAGE),
        StructField("start", _START),
        StructField("actions", ArrayType(_ACTION)),
        StructField("displays", ArrayType(_DISPLAY)),
        StructField("err", _ERR),
        StructField("ts", LongType()),
    ]
)
