"""CDC-envelope operator library (SURVEY §2.3 P1-P8, §2.4 J6).

The reference consumes Maxwell changelog JSON from Kafka topic_db and
interprets it with a fixed family of predicates/projections; this module is
that family as composable DataFrame transforms. All expressions are
JVM-side built-ins (element_at / map_filter / when) — whole-stage codegen
applies, no Python in the hot path.

Reference citations per op in the docstrings below.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.schemas import CDC_ENVELOPE

BOOTSTRAP_TYPES = ("bootstrap-start", "bootstrap-insert", "bootstrap-complete")


def parse_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1: safe JSON parse, dropping malformed rows (the try/except flatMap
    at app/dim/DimApp.java:60-74). from_json PERMISSIVE yields null for
    garbage → filter."""
    j = F.from_json(F.col(value_col), CDC_ENVELOPE)
    return (
        raw.select(j.alias("j"))
        .where(F.col("j").isNotNull() & F.col("j.table").isNotNull())
        .select("j.*")
    )


def drop_bootstrap(df: DataFrame) -> DataFrame:
    """P2: drop Maxwell bootstrap markers (app/dim/DimApp.java:65-68)."""
    return df.where(~F.col("type").isin(*BOOTSTRAP_TYPES))


def src_filter(df: DataFrame, table: str, types: Sequence[str] | None = None) -> DataFrame:
    """P4: source-table/type predicate (`WHERE database='gmall_flink' AND
    table='cart_info' AND type='insert'`, app/dwd/DwdTradeCartAdd.java:43-45)."""
    cond = F.col("table") == table
    if types:
        cond = cond & F.col("type").isin(*types)
    return df.where(cond)


def d(field: str) -> Column:
    """P3: row-image field access `data['x']`."""
    return F.element_at(F.col("data"), field)


def o(field: str) -> Column:
    """P3: previous-image field access `old['x']`."""
    return F.element_at(F.col("old"), field)


def pluck(df: DataFrame, fields: Mapping[str, str]) -> DataFrame:
    """P3: map-field projection — {out_name: data_key}
    (app/dwd/DwdTradeCartAdd.java:29-41)."""
    return df.select(*[d(k).alias(out) for out, k in fields.items()])


def insert_or_increase(field: str) -> Column:
    """P5 predicate: `type='insert' OR (type='update' AND old[f] IS NOT NULL
    AND data[f] > old[f])` with numeric compare
    (app/dwd/DwdTradeCartAdd.java:45-47)."""
    return (F.col("type") == "insert") | (
        (F.col("type") == "update")
        & o(field).isNotNull()
        & (d(field).cast("long") > o(field).cast("long"))
    )


def delta(field: str) -> Column:
    """P5 projection: inserted quantity, or the increase for updates
    (`IF(insert, num, num - old_num)`, app/dwd/DwdTradeCartAdd.java:33)."""
    return F.when(F.col("type") == "insert", d(field).cast("long")).otherwise(
        d(field).cast("long") - o(field).cast("long")
    )


def status_transition(field: str, to: str, from_: str | None = None) -> Column:
    """P6/P7: CDC state-machine predicate. ``from_=None`` = any previous
    state (cancel, app/dwd/DwdCancelOrderDetail.java:65-67); exact from-state
    otherwise (refund 1002→1005, app/dwd/DwdTradeRefundOrderDetail.java:44-46)."""
    cond = (F.col("type") == "update") & o(field).isNotNull() & (d(field) == to)
    if from_ is not None:
        cond = cond & (o(field) == from_)
    return cond


def prune_data(df: DataFrame, columns_csv: Column, out: str = "data_pruned") -> DataFrame:
    """P8: config-driven column pruning — keep only the row-image keys named
    in the config's comma-separated sink_columns
    (app/dim/func/DimTableProcessFunction.java:90-93)."""
    wanted = F.split(columns_csv, ",")
    return df.withColumn(out, F.map_filter("data", lambda k, _v: F.array_contains(wanted, k)))


def route_with_config(df: DataFrame, config: DataFrame, match_type: bool = True) -> DataFrame:
    """J6: broadcast-config routing join — every envelope row matched to its
    config entry (by source_table, optionally +source_type), annotated with
    sink metadata and column-pruned (app/dim/DimApp.java:94-102,
    app/dwd/func/DwdTableProcessFunction.java:60-99).

    The reference distributes the config via Flink broadcast state with a
    JDBC cold-start fallback; in Spark the config is a small DataFrame
    broadcast per batch — the cold-start path disappears by construction.
    """
    cond = df["table"] == config["source_table"]
    if match_type:
        cond = cond & (df["type"] == config["source_type"])
    routed = df.join(F.broadcast(config), cond, "inner")
    return prune_data(routed, F.col("sink_columns"))


def parse_envelope_split(raw: DataFrame, value_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """P1 with a dead-letter channel: (parsed, dead). The reference swallows
    malformed rows inside a try/except flatMap (app/dim/DimApp.java:60-74);
    production pipelines keep them — `dead` carries the raw payload for a
    quarantine sink, one scan feeding both branches."""
    j = F.from_json(F.col(value_col), CDC_ENVELOPE)
    tagged = raw.select(F.col(value_col).alias("value"), j.alias("j"))
    ok = tagged.where(F.col("j").isNotNull() & F.col("j.table").isNotNull()).select("j.*")
    dead = tagged.where(F.col("j").isNull() | F.col("j.table").isNull()).select(
        "value", F.length("value").alias("raw_len")
    )
    return ok, dead
