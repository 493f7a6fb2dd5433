"""Deterministic page-log synthesizer (FIXTURES.md §2; reference envelope
app/dwd/DwdTrafficBaseLogSplit.java:101-110).

Wraps the driver's `events` table into the reference's topic_log JSON shape
(common/page/start/actions/displays/err + ts). All derivations are pure
arithmetic on (event_id, user_id, event_type, ts) so the DuckDB oracle can
reproduce every downstream result straight from `events`.

Derivation contract (shared with queries/log.py oracles):

  corrupt JSON      event_id % 101 == 0                  (P1 drop path)
  common.mid        'mid_' || (user_id % 500)
  common.uid        user_id
  common.ch         ('xiaomi','appstore','huawei','web')[event_id % 4]
  common.is_new     event_id % 5 == 0 -> '1' else '0'    (claimed, unreliable)
  common.vc         'v' || (event_id % 3)
  common.ar         (user_id % 7)
  ts (millis)       epoch_ms(events.ts)
  kind:
    'signup'   -> start log  {entry: event_id%2 ? 'icon':'notice',
                              loading_time: event_id % 3000,
                              open_ad_id: event_id % 10}      no page
    'error'    -> err struct {error_code: event_id % 7, msg: 'boom'}
                  + page log (continues processing, like the reference)
    others     -> page log:
        page_id       view->'good_detail' | click->'home'
                      | purchase->'trade' | error->'mine'
        last_page_id  view->'home' | purchase->'cart' | else NULL
        item          view/purchase: json props.k      item_type 'sku_id'
        during_time   event_id % 100000
    actions   purchase: 2 rows (cart_add @ts+1s, trade @ts+2s, item=props.k)
              click: 1 row (favor_add @ts+1s, item NULL)
    displays  view: (event_id % 3) + 1 rows, display_type alternates
              'query'/'promotion', item = props.k + i, order i+1, pos_id i%5
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.sources.tables import table

CHANNELS = ("xiaomi", "appstore", "huawei", "web")


def _common() -> Column:
    eid, uid = F.col("event_id"), F.col("user_id")
    ch = F.array(*[F.lit(c) for c in CHANNELS])[(eid % 4).cast("int")]
    return F.struct(
        (uid % 7).cast("string").alias("ar"),
        uid.cast("string").alias("uid"),
        F.lit("Android 13").alias("os"),
        ch.alias("ch"),
        F.when(eid % 5 == 0, "1").otherwise("0").alias("is_new"),
        F.lit("Xiaomi 12").alias("md"),
        F.concat(F.lit("mid_"), (uid % 500).cast("string")).alias("mid"),
        F.concat(F.lit("v"), (eid % 3).cast("string")).alias("vc"),
        F.lit("Xiaomi").alias("ba"),
        (eid % 997).cast("string").alias("sid"),
    )


def page_log_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topic_log as raw JSON `value` strings (the S1 Kafka shape)."""
    ev = table(spark, sf_dir, "events")
    eid, typ = F.col("event_id"), F.col("event_type")
    k = F.get_json_object("props", "$.k").cast("long")
    ts_ms = (F.unix_timestamp("ts") * 1000 + (eid % 1000)).alias("ts")

    is_start = typ == "signup"
    has_item = typ.isin("view", "purchase")
    page = F.when(
        ~is_start,
        F.struct(
            F.when(typ == "view", "good_detail")
            .when(typ == "click", "home")
            .when(typ == "purchase", "trade")
            .otherwise("mine")
            .alias("page_id"),
            F.when(has_item, k.cast("string")).alias("item"),
            (eid % 100000).alias("during_time"),
            F.when(has_item, "sku_id").alias("item_type"),
            F.when(typ == "view", "home").when(typ == "purchase", "cart").alias("last_page_id"),
        ),
    )
    start = F.when(
        is_start,
        F.struct(
            F.when(eid % 2 == 0, "icon").otherwise("notice").alias("entry"),
            (eid % 3000).alias("loading_time"),
            (eid % 10).cast("string").alias("open_ad_id"),
        ),
    )
    err = F.when(
        typ == "error",
        F.struct(
            (eid % 7).cast("string").alias("error_code"),
            F.lit("boom").alias("msg"),
        ),
    )

    def action(action_id: str, offset_s: int, with_item: bool) -> Column:
        return F.struct(
            F.lit(action_id).alias("action_id"),
            (k.cast("string") if with_item else F.lit(None).cast("string")).alias("item"),
            (F.lit("sku_id") if with_item else F.lit(None).cast("string")).alias("item_type"),
            (F.unix_timestamp("ts") * 1000 + (eid % 1000) + offset_s * 1000).alias("ts"),
        )

    actions = (
        F.when(typ == "purchase", F.array(action("cart_add", 1, True), action("trade", 2, True)))
        .when(typ == "click", F.array(action("favor_add", 1, False)))
    )
    display = lambda i: F.struct(  # noqa: E731
        F.when(F.lit(i % 2 == 0), "query").otherwise("promotion").alias("display_type"),
        (k + i).cast("string").alias("item"),
        F.lit("sku_id").alias("item_type"),
        F.lit(i + 1).cast("long").alias("order"),
        F.lit(i % 5).cast("string").alias("pos_id"),
    )
    displays = F.when(
        typ == "view",
        F.slice(F.array(*[display(i) for i in range(3)]), 1, (eid % 3 + 1).cast("int")),
    )

    envelope = F.struct(
        _common().alias("common"),
        page.alias("page"),
        start.alias("start"),
        actions.alias("actions"),
        displays.alias("displays"),
        err.alias("err"),
        ts_ms,
    )
    value = F.when(eid % 101 == 0, F.lit('{"broken')).otherwise(F.to_json(envelope))
    return ev.select(value.alias("value"))


def page_log_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsed topic_log, materialized once per SF (the topic at rest; see
    sources/materialize.py). The raw JSON path above runs at cache build."""
    from gmall_flink_spark.operators.log_split import parse_page_log
    from gmall_flink_spark.sources.materialize import materialized

    return materialized(
        spark, sf_dir, "topic_log_parsed",
        lambda: parse_page_log(page_log_json(spark, sf_dir)),
    )
