"""Oracle-checked CDC pipelines (SURVEY §2.3, §2.11 DWD apps).

Each query runs the full reference-shaped path: raw changelog JSON strings
(sources/cdc_synth) → safe parse (P1) → bootstrap filter (P2) → table/type
predicates (P4) → envelope predicates/projections (P3/P5/P6/P7) →
enrichment or config routing (J3/J6/P8). The DuckDB oracle reproduces the
expected output directly from the base tables via the synthesizer's
arithmetic contract (see sources/cdc_synth.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.operators.cdc import (
    d,
    delta,
    drop_bootstrap,
    insert_or_increase,
    route_with_config,
    src_filter,
    status_transition,
)
from gmall_flink_spark.operators.cdc import o
from gmall_flink_spark.operators.dedup import keep_first, keep_last
from gmall_flink_spark.schemas import CONFIG_ROW
from gmall_flink_spark.sources.cdc_synth import (
    activity_envelope,
    cart_envelope,
    coupon_envelope,
    detail_envelope,
    orders_envelope,
    topic_db_envelope,
)
from gmall_flink_spark.sources.tables import table

#: table_process config (FIXTURES.md §3); in production a JDBC/Delta table
#: re-read per micro-batch, here a deterministic inline frame.
CONFIG_ROWS = [
    ("order_info", "insert", "dim_order_info", "dim", "id,user_id,total_amount", "id", "r"),
    ("order_info", "update", "dwd_order_update", "dwd", "id,order_status", "id", "r"),
    ("cart_info", "insert", "dwd_cart_add", "dwd", "id,sku_id,sku_num", "id", "r"),
]


def _config_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CONFIG_ROWS, CONFIG_ROW)


def cdc_cart_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdTradeCartAdd pipeline (app/dwd/DwdTradeCartAdd.java:19-72):
    insert-or-qty-increase facts with the added quantity (P1,P2,P4,P5)."""
    env = drop_bootstrap(cart_envelope(spark, sf_dir))
    cart = src_filter(env, "cart_info", ["insert", "update"])
    return (
        cart.where(insert_or_increase("sku_num"))
        .select(
            d("id").cast("bigint").alias("id"),
            d("sku_id").cast("bigint").alias("sku_id"),
            delta("sku_num").alias("sku_num_delta"),
            F.date_format(F.timestamp_seconds("ts"), "yyyy-MM-dd").alias("cart_date"),
        )
        .orderBy("id")
    )


def cancel_segment_frame(env: DataFrame, cust: DataFrame) -> DataFrame:
    """The DwdCancelOrderDetail transform, batch/stream agnostic
    (app/dwd/DwdCancelOrderDetail.java:65-67): cancel transitions (P6, any
    previous state → '1003') enriched via a broadcast dim lookup (J3),
    aggregated per segment. The streaming pipeline
    (streaming/pipelines.py::cancel_segment_stream) runs THIS function on
    an envelope stream in complete output mode — batch and stream share
    the code, like refund_region_frame."""
    cancels = src_filter(drop_bootstrap(env), "order_info").where(
        status_transition("order_status", to="1003")
    )
    return (
        cancels.select(
            d("user_id").cast("bigint").alias("user_id"),
            d("total_amount").cast("decimal(18,2)").alias("amount"),
        )
        .join(F.broadcast(cust), F.col("user_id") == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("cancel_ct"),
            F.sum("amount").cast("double").alias("cancel_amount"),
        )
    )


def cdc_cancel_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdCancelOrderDetail shape (app/dwd/DwdCancelOrderDetail.java:65-67):
    the shared transform (cancel_segment_frame) over the batch envelope."""
    return cancel_segment_frame(
        orders_envelope(spark, sf_dir), table(spark, sf_dir, "customer")
    ).orderBy("segment")


def refund_pay_suc_frame(
    env: DataFrame, cust: DataFrame, nation: DataFrame
) -> DataFrame:
    """The DwdTradeRefundPaySuc transform, batch/stream agnostic
    (app/dwd/DwdTradeRefundPaySuc.java:23-159): exact refund-pay-success
    transition (P7 — the synth maps the reference's refund_payment
    '1602' success state to order_status '1004' reached from '1001',
    the status pair unused by the other trade pipelines) + the same
    J3×2 chained broadcast lookups the reference's :104-127 runs,
    aggregated at nation grain. Shared verbatim with the streaming
    pipeline (streaming/pipelines.py::refund_pay_suc_stream)."""
    refunds = src_filter(drop_bootstrap(env), "order_info").where(
        status_transition("order_status", to="1004", from_="1001")
    )
    return (
        refunds.select(
            d("user_id").cast("bigint").alias("user_id"),
            d("total_amount").cast("decimal(18,2)").alias("amount"),
        )
        .join(F.broadcast(cust), F.col("user_id") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("refund_pay_ct"),
            F.sum("amount").cast("double").alias("refund_pay_amount"),
        )
    )


def cdc_refund_pay_suc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdTradeRefundPaySuc shape: the shared transform
    (refund_pay_suc_frame) over the batch envelope."""
    return refund_pay_suc_frame(
        orders_envelope(spark, sf_dir),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
    ).orderBy("nation_name")


def cdc_pay_suc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdTradePayDetailSuc shape (app/dwd/DwdTradePayDetailSuc.java:68-70):
    exact from-state transition 1002→1005 (P7) with two chained broadcast
    lookups (J3×2, cf. DwdTradeRefundPaySuc.java:104-127)."""
    env = drop_bootstrap(orders_envelope(spark, sf_dir))
    pays = src_filter(env, "order_info").where(
        status_transition("order_status", to="1005", from_="1002")
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        pays.select(
            d("user_id").cast("bigint").alias("user_id"),
            d("total_amount").cast("decimal(18,2)").alias("amount"),
        )
        .join(F.broadcast(cust), F.col("user_id") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("paysuc_ct"),
            F.sum("amount").cast("double").alias("paysuc_amount"),
        )
        .orderBy("nation_name")
    )


#: payment-type dict (the reference's dim_base_dic rows the HBase lookup
#: join resolves, app/dwd/DwdTradePayDetailSuc.java:76-96)
PAY_DICT_ROWS = [
    ("1101", "Alipay"),
    ("1102", "Wechat"),
    ("1103", "UnionPay"),
]

#: J5 interval-join band for the pay-detail composition: the reference's
#: od.rt ∈ [pi.rt − 15 min, pi.rt + 5 s] mirrored to this data's skew
#: direction (synthetic details time at l_shipdate, AFTER the payment's
#: o_orderdate — TPC-H ships 1-121 days after ordering, so the band
#: [pi − 5 s, pi + 90 d] selects a real subset the way the reference's
#: pay-after-order band does).
PAY_DETAIL_LO_S = 5
PAY_DETAIL_HI_S = 90 * 86400


def pay_suc_with_name(env: DataFrame, dic: DataFrame) -> DataFrame:
    """The payment_info_with_name view (app/dwd/DwdTradePayDetailSuc.java:
    59-96), batch/stream agnostic: P7 exact 1002→1005 pay-success
    transitions, a deterministic payment_type code (the synth envelope
    carries none; '110'||(id%3+1) stands in for data['payment_type']),
    then the J3 dict lookup as a broadcast join — Spark's as-of-now form
    of the reference's `FOR SYSTEM_TIME AS OF pi.pt` HBase lookup."""
    pays = src_filter(drop_bootstrap(env), "order_info").where(
        status_transition("order_status", to="1005", from_="1002")
    )
    pi = pays.select(
        d("id").cast("bigint").alias("order_id"),
        d("user_id").cast("bigint").alias("user_id"),
        F.concat(
            F.lit("110"), ((d("id").cast("bigint") % 3) + 1).cast("string")
        ).alias("payment_type_code"),
        F.col("ts").alias("pay_ts"),
    )
    return pi.join(
        F.broadcast(dic), pi.payment_type_code == dic.dic_code
    ).drop("dic_code").withColumnRenamed("dic_name", "payment_type_name")


def cdc_pay_detail_suc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL DwdTradePayDetailSuc composition
    (app/dwd/DwdTradePayDetailSuc.java:59-158): P7 pay-success transitions
    → J3 dict lookup (payment_type → name) → J5 interval join with the
    order_detail fact stream on order_id within the band documented at
    PAY_DETAIL_LO_S/HI_S (the reference's :100-127 join bounds) → K3
    keep-first compaction per order_detail_id (the upsert-Kafka PK,
    :131-158). The streaming twin
    (streaming/pipelines.py::pay_detail_suc_stream) runs this composition
    as ONE availableNow query.

    Scale: the dict is rows-bounded (broadcast); pays and details shuffle
    once on order_id — the interval predicate rides the equi-join as a
    post-filter, so no range-join blowup; K3 compaction is one keyed
    window over detail id."""
    dic = spark.createDataFrame(PAY_DICT_ROWS, "dic_code string, dic_name string")
    pi = pay_suc_with_name(orders_envelope(spark, sf_dir), dic)
    od = src_filter(
        drop_bootstrap(detail_envelope(spark, sf_dir)),
        "order_detail", ["insert"],
    ).select(
        d("id").cast("bigint").alias("order_detail_id"),
        d("order_id").cast("bigint").alias("order_id"),
        d("sku_id").cast("bigint").alias("sku_id"),
        d("sku_num").cast("bigint").alias("sku_num"),
        d("split_total_amount").cast("decimal(18,2)").alias("amount"),
        F.col("ts").alias("od_ts"),
    )
    wide = od.join(pi, "order_id").where(
        (F.col("od_ts") >= F.col("pay_ts") - PAY_DETAIL_LO_S)
        & (F.col("od_ts") <= F.col("pay_ts") + PAY_DETAIL_HI_S)
    )
    return (
        keep_first(wide, ["order_detail_id"], ["od_ts", "sku_num", "amount"])
        .select(
            "order_detail_id", "order_id", "user_id", "sku_id", "sku_num",
            F.col("amount").cast("double").alias("split_payment_amount"),
            "payment_type_code", "payment_type_name", "pay_ts",
        )
        .orderBy("order_detail_id")
    )


def cdc_config_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DimApp/DwdBaseApp config-routing core (J6 broadcast-config join +
    P8 column pruning, app/dim/DimApp.java:94-102): the combined topic_db
    stream routed by (source_table, source_type), row images pruned to the
    config's sink_columns."""
    env = drop_bootstrap(topic_db_envelope(spark, sf_dir))
    routed = route_with_config(env, _config_df(spark), match_type=True)
    return (
        routed.groupBy("sink_table")
        .agg(
            F.count(F.lit(1)).alias("row_ct"),
            F.sum(F.size(F.map_keys("data_pruned"))).alias("keys_ct"),
            F.sum(F.element_at("data_pruned", "id").cast("bigint")).alias("id_sum"),
        )
        .orderBy("sink_table")
    )


def cdc_sku_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 upsert-compaction batch twin (`GROUP BY pk` + last value,
    util/FlinkSqlUtil.java:42-50) composed with D3 keep-last: the current
    per-sku cart state from the changelog."""
    env = drop_bootstrap(cart_envelope(spark, sf_dir))
    cart = src_filter(env, "cart_info", ["insert", "update"]).select(
        d("sku_id").cast("bigint").alias("sku_id"),
        d("id").cast("bigint").alias("id"),
        d("sku_num").cast("bigint").alias("sku_num"),
        F.col("ts"),
    )
    return (
        keep_last(cart, ["sku_id"], ["ts", "id", "sku_num"])
        .select("sku_id", F.col("id").alias("last_id"), F.col("sku_num").alias("last_sku_num"))
        .orderBy("sku_id")
    )


def cdc_order_detail_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdTradeOrderDetail 4-way wide fact
    (app/dwd/DwdTradeOrderDetail.java:122-169): order_detail INNER JOIN
    order_info (J1) LEFT JOIN detail_activity LEFT JOIN detail_coupon (J2×2),
    then K3 key-compaction (keep-first per order_detail_id — the batch twin
    of the upsert-Kafka sink, util/FlinkSqlUtil.java:42-50).

    Scale: the two optional sides are ~1/5 and ~1/7 of lineitem — still too
    big to broadcast at 100 TB, so all four sides shuffle on the same
    order_detail_id/order_id keys; AQE picks broadcast at small SF.
    """
    od = src_filter(
        drop_bootstrap(detail_envelope(spark, sf_dir)),
        "order_detail", ["insert"],
    ).select(
        d("id").cast("bigint").alias("id"),
        d("order_id").cast("bigint").alias("order_id"),
        d("sku_id").cast("bigint").alias("sku_id"),
        d("sku_num").cast("bigint").alias("sku_num"),
        d("split_total_amount").cast("decimal(18,2)").alias("split_total_amount"),
        F.col("ts"),
    )
    oi = src_filter(
        drop_bootstrap(orders_envelope(spark, sf_dir)),
        "order_info", ["insert"],
    ).select(
        d("id").cast("bigint").alias("order_id"),
        d("user_id").cast("bigint").alias("user_id"),
    )
    oa = activity_envelope(spark, sf_dir).select(
        d("order_detail_id").cast("bigint").alias("id"),
        d("activity_id").cast("bigint").alias("activity_id"),
    )
    oc = coupon_envelope(spark, sf_dir).select(
        d("order_detail_id").cast("bigint").alias("id"),
        d("coupon_id").cast("bigint").alias("coupon_id"),
    )
    wide = (
        od.join(oi, "order_id")
        .join(oa, "id", "left")
        .join(oc, "id", "left")
        .select(
            "id", "order_id", "user_id", "sku_id", "sku_num",
            F.col("split_total_amount").cast("double").alias("split_total_amount"),
            "activity_id", "coupon_id", "ts",
        )
    )
    # K3 compaction: the packed PK can still collide when the synthetic
    # lineitem repeats a full (orderkey,linenumber,partkey,suppkey) quad;
    # order by every projected column so the kept row is deterministic.
    return (
        keep_first(wide, ["id"], ["ts", "sku_num", "split_total_amount"])
        .drop("ts")
        .orderBy("id")
    )


def refund_region_frame(
    env: DataFrame, cust: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """The DwdTradeRefundOrderDetail transform, batch/stream agnostic:
    exact transition to '1006' (P7) + two chained broadcast dim lookups
    (customer→nation→region) + the region-grain aggregate. The streaming
    pipeline (streaming/pipelines.py::refund_region_stream) runs THIS
    function on an envelope stream in complete output mode — batch and
    stream share the code, so their equality test pins the semantics of
    one transform, not two implementations."""
    refunds = src_filter(drop_bootstrap(env), "order_info").where(
        status_transition("order_status", to="1006", from_="1001")
    )
    return (
        refunds.select(
            d("user_id").cast("bigint").alias("user_id"),
            d("total_amount").cast("decimal(18,2)").alias("amount"),
            # old.total_amount carries exact scale-3 digits (total * 0.8);
            # parse at scale 3 — a (18,2) cast would ROUND here while DuckDB
            # TRUNCATES, so keep the arithmetic exact on both sides.
            (d("total_amount").cast("decimal(18,2)") - o("total_amount").cast("decimal(18,3)"))
            .alias("amount_change"),
        )
        .join(F.broadcast(cust), F.col("user_id") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("refund_ct"),
            F.sum("amount").cast("double").alias("refund_amount"),
            F.sum("amount_change").cast("double").alias("amount_change_sum"),
        )
    )


def cdc_refund_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdTradeRefundOrderDetail shape
    (app/dwd/DwdTradeRefundOrderDetail.java:44-46,100-106): exact transition
    to '1006' (P7) with two chained broadcast dim lookups (J3×2,
    customer→nation→region) aggregated at region grain — the shared
    transform (refund_region_frame) over the batch envelope."""
    return refund_region_frame(
        orders_envelope(spark, sf_dir),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    ).orderBy("region_name")


#: base_dic lookup table (S6: the HBase dict table declared at
#: app/dwd/DwdInterationCommentInfo.java:52-59), inline like table_process.
DICT_ROWS = [
    ("view", "Page View"),
    ("click", "Item Click"),
    ("purchase", "Purchase"),
    ("signup", "Sign Up"),
    ("error", "Client Error"),
]


def lookup_dict_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdInterationCommentInfo dict-lookup join (J3 `FOR SYSTEM_TIME AS
    OF pt`, app/dwd/DwdInterationCommentInfo.java:64-78): every event enriched
    with the dict name for its type code via broadcast join — the Spark
    "as-of now" equivalent of the HBase lookup — then aggregated."""
    ev = table(spark, sf_dir, "events")
    dic = spark.createDataFrame(DICT_ROWS, "dic_code string, dic_name string")
    return (
        ev.join(F.broadcast(dic), ev.event_type == dic.dic_code, "left")
        .groupBy(F.col("dic_name"))
        .agg(
            F.count(F.lit(1)).alias("event_ct"),
            F.countDistinct("user_id").alias("user_ct"),
        )
        .orderBy("dic_name")
    )


def cdc_dead_letter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 dead-letter channel (operators/cdc.py::parse_envelope_split): the
    malformed-row quarantine counts per source topic — rows the reference
    silently swallows (app/dim/DimApp.java:60-74) but a production pipeline
    must account for."""
    from gmall_flink_spark.sources.cdc_synth import (
        cart_dead_letters,
        orders_dead_letters,
    )

    dead_o = orders_dead_letters(spark, sf_dir)
    dead_c = cart_dead_letters(spark, sf_dir)
    return (
        dead_o.select(F.lit("order_info").alias("source"), "raw_len")
        .unionAll(dead_c.select(F.lit("cart_info").alias("source"), "raw_len"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("dead_ct"), F.sum("raw_len").alias("raw_bytes"))
        .orderBy("source")
    )


def cart_uu_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTradeCartAddUuWindow pipeline (W5 + D4 + A5,
    app/dws/DwsTradeCartAddUuWindow.java:37-142): event time =
    coalesce(operate_time, create_time) (W5), first-event-per-day dedup per
    sku (D4; sku plays the uu key on this testdata), daily unique counts."""
    from gmall_flink_spark.operators.dedup import first_per_day

    env = drop_bootstrap(cart_envelope(spark, sf_dir))
    cart = src_filter(env, "cart_info", ["insert", "update"]).select(
        d("sku_id").cast("bigint").alias("sku_id"),
        F.coalesce(
            F.to_timestamp(d("operate_time")), F.to_timestamp(d("create_time"))
        ).alias("rt"),
    )
    firsts = first_per_day(cart, "sku_id", "rt", order_by=["rt", "sku_id"])
    return (
        firsts.groupBy("cur_date")
        .agg(F.count(F.lit(1)).alias("cart_uu_ct"))
        .orderBy("cur_date")
    )


def dws_payment_uu_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTradePaymentWindow pipeline
    (app/dws/DwsTradePaymentWindow.java:60-110): consume the P7 pay-suc
    detail stream keyed by user_id, D5 per-day dedup + first-ever (new
    payer) flag, then the A5 pairwise counters (payment_suc_unique_user_ct,
    payment_suc_new_user_ct) in tumbling windows with A6 stt/edt
    decoration. The reference keeps a curDate ValueState per user and sums
    (uv, newUv) pairs per window; the batch twin is daily_new_flags over
    the pay-suc transitions followed by a day-grain tumble_agg (windows are
    day-sized here because D5 emits at most one row per user per day).

    Scale: one shuffle on user_id for the D5 window, one keyed day-window
    agg — the same two-exchange shape as every DWS UU window."""
    from gmall_flink_spark.operators.dedup import daily_new_flags
    from gmall_flink_spark.operators.windows import tumble_agg

    env = drop_bootstrap(orders_envelope(spark, sf_dir))
    pays = src_filter(env, "order_info").where(
        status_transition("order_status", to="1005", from_="1002")
    ).select(
        d("user_id").cast("bigint").alias("user_id"),
        F.timestamp_seconds("ts").alias("rt"),
    )
    flags = daily_new_flags(pays, "user_id", "rt")
    return (
        tumble_agg(
            flags.withColumn("day_ts", F.to_timestamp("cur_date")),
            "day_ts",
            "1 day",
            [],
            [
                F.count(F.lit(1)).alias("payment_suc_uu_ct"),
                F.sum("is_first_ever").alias("payment_suc_new_user_ct"),
            ],
        )
        .select("stt", "edt", "payment_suc_uu_ct", "payment_suc_new_user_ct")
        .orderBy("stt")
    )


def dws_order_uu_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTradeOrderWindow pipeline
    (app/dws/DwsTradeOrderWindow.java:36-126): consume the DWD
    order-detail wide stream (detail inserts × order_info user
    attribution, K3-compacted per detail id), key by user, D5 per-day
    dedup + first-ever flag, then the A5 pairwise counters
    (order_unique_user_ct, order_new_user_ct) in day windows with A6
    stt/edt — the order-grain sibling of dws_payment_uu_window, fed from
    the wide-join layer instead of a status transition.

    Scale: one detail→order equi-join (both shuffle on order_id; AQE
    broadcasts at small SF), one user-key D5 window, one day-window agg."""
    from gmall_flink_spark.operators.dedup import daily_new_flags
    from gmall_flink_spark.operators.windows import tumble_agg

    od = src_filter(
        drop_bootstrap(detail_envelope(spark, sf_dir)),
        "order_detail", ["insert"],
    ).select(
        d("id").cast("bigint").alias("id"),
        d("order_id").cast("bigint").alias("order_id"),
        F.col("ts"),
    )
    oi = src_filter(
        drop_bootstrap(orders_envelope(spark, sf_dir)),
        "order_info", ["insert"],
    ).select(
        d("id").cast("bigint").alias("order_id"),
        d("user_id").cast("bigint").alias("user_id"),
    )
    wide = keep_first(od.join(oi, "order_id"), ["id"], ["ts"])
    flags = daily_new_flags(
        wide.select("user_id", F.timestamp_seconds("ts").alias("rt")),
        "user_id",
        "rt",
    )
    return (
        tumble_agg(
            flags.withColumn("day_ts", F.to_timestamp("cur_date")),
            "day_ts",
            "1 day",
            [],
            [
                F.count(F.lit(1)).alias("order_uu_ct"),
                F.sum("is_first_ever").alias("order_new_user_ct"),
            ],
        )
        .select("stt", "edt", "order_uu_ct", "order_new_user_ct")
        .orderBy("stt")
    )


#: SCD2 audit slice: full history is corpus-sized, so the checked surface is
#: a deterministic 2% of dimension keys (the window logic runs identically).
SCD2_MOD = 50


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension-history build from the changelog (the batch form of
    the reference's DIM layer upserts, app/dim/DimApp.java: each update
    closes the previous version): per key, versions ordered by (ts, id)
    carry valid_from and valid_to = next version's valid_from (NULL while
    current). The key filter sits below the window, so Spark prunes the
    scan to the audited keys before any shuffle."""
    from gmall_flink_spark.operators.scd2 import scd2_versions

    env = drop_bootstrap(cart_envelope(spark, sf_dir))
    cart = (
        src_filter(env, "cart_info", ["insert", "update"])
        .select(
            d("sku_id").cast("bigint").alias("sku_id"),
            d("id").cast("bigint").alias("id"),
            d("sku_num").cast("bigint").alias("sku_num"),
            F.col("ts"),
        )
        .where(F.pmod(F.col("sku_id"), F.lit(SCD2_MOD)) == 0)
    )
    return (
        scd2_versions(cart, "sku_id", ["ts", "id"], "ts")
        .select(
            "sku_id",
            "ver",
            F.col("ts").alias("valid_from"),
            "valid_to",
            "sku_num",
        )
        .orderBy("sku_id", "ver")
    )


QUERIES = {
    "cdc_cart_add": cdc_cart_add,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_dead_letter_stats": cdc_dead_letter_stats,
    "cart_uu_daily": cart_uu_daily,
    "cdc_order_detail_wide": cdc_order_detail_wide,
    "cdc_refund_region": cdc_refund_region,
    "lookup_dict_enrich": lookup_dict_enrich,
    "cdc_cancel_enrich": cdc_cancel_enrich,
    "cdc_pay_suc": cdc_pay_suc,
    "cdc_pay_detail_suc": cdc_pay_detail_suc,
    "cdc_refund_pay_suc": cdc_refund_pay_suc,
    "dws_payment_uu_window": dws_payment_uu_window,
    "dws_order_uu_window": dws_order_uu_window,
    "cdc_config_route": cdc_config_route,
    "cdc_sku_last_state": cdc_sku_last_state,
}

# shared exclusions mirroring the synthesizer contract
_CART_OK = "(l_orderkey + l_linenumber) % 13 != 0 AND l_linenumber % 7 != 0"
_ORD_OK = "o_orderkey % 97 != 0 AND o_orderkey % 10 <= 8"

ORACLE = {
    "cart_uu_daily": f"""
        WITH cart AS (
            SELECT l_partkey AS sku_id,
                   strftime(l_shipdate + CASE WHEN l_linenumber % 2 = 0
                            THEN INTERVAL '1 hour' ELSE INTERVAL '0 hour' END,
                            '%Y-%m-%d') AS cur_date
            FROM lineitem WHERE {_CART_OK}
        )
        SELECT cur_date, COUNT(DISTINCT sku_id) AS cart_uu_ct
        FROM cart GROUP BY 1 ORDER BY 1
    """,
    "cdc_dead_letter_stats": """
        SELECT * FROM (
            SELECT 'cart_info' AS source, COUNT(*) AS dead_ct,
                   COUNT(*) * len('NOT_JSON{"oops"') AS raw_bytes
            FROM lineitem WHERE (l_orderkey + l_linenumber) % 13 = 0
            UNION ALL
            SELECT 'order_info', COUNT(*), COUNT(*) * len('NOT_JSON{"oops"')
            FROM orders WHERE o_orderkey % 97 = 0
        ) ORDER BY source
    """,
    "cdc_order_detail_wide": """
        WITH od AS (
            SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey) * 1000
                       + l_suppkey AS id,
                   l_orderkey AS order_id,
                   l_partkey AS sku_id,
                   CAST(l_quantity AS BIGINT) AS sku_num,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                       AS split_total_amount,
                   CASE WHEN l_partkey % 5 = 0 THEN l_partkey % 10 END AS activity_id,
                   CASE WHEN l_suppkey % 7 = 0 THEN l_suppkey % 13 END AS coupon_id
            FROM lineitem
            WHERE (l_orderkey * 7 + l_linenumber) % 89 != 0
              AND l_linenumber % 11 != 0
            QUALIFY row_number() OVER (
                PARTITION BY id
                ORDER BY epoch(l_shipdate), CAST(l_quantity AS BIGINT),
                         l_extendedprice) = 1
        )
        SELECT id, order_id, o_custkey AS user_id, sku_id, sku_num,
               split_total_amount, activity_id, coupon_id
        FROM od JOIN orders ON order_id = o_orderkey
        WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 <= 5
        ORDER BY id
    """,
    "cdc_refund_region": """
        SELECT r_name AS region_name,
               COUNT(*) AS refund_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS refund_amount,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                        - CAST(o_totalprice AS DECIMAL(18,2))
                          * CAST('0.8' AS DECIMAL(2,1)))
                    AS DOUBLE) AS amount_change_sum
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = region.r_regionkey
        WHERE o_orderkey % 97 != 0
          AND o_orderkey % 10 IN (6, 7)
          AND o_orderkey % 4 = 3
        GROUP BY 1 ORDER BY 1
    """,
    "lookup_dict_enrich": """
        SELECT CASE event_type
                   WHEN 'view' THEN 'Page View'
                   WHEN 'click' THEN 'Item Click'
                   WHEN 'purchase' THEN 'Purchase'
                   WHEN 'signup' THEN 'Sign Up'
                   WHEN 'error' THEN 'Client Error'
               END AS dic_name,
               COUNT(*) AS event_ct,
               COUNT(DISTINCT user_id) AS user_ct
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
    "cdc_cart_add": f"""
        SELECT (l_orderkey * 10 + l_linenumber) AS id,
               l_partkey AS sku_id,
               CASE WHEN l_linenumber % 2 = 1 THEN CAST(l_quantity AS BIGINT)
                    ELSE 3 END AS sku_num_delta,
               strftime(l_shipdate, '%Y-%m-%d') AS cart_date
        FROM lineitem
        WHERE {_CART_OK}
          AND (l_linenumber % 2 = 1 OR l_orderkey % 3 = 0)
        ORDER BY id
    """,
    "cdc_cancel_enrich": """
        SELECT c_mktsegment AS segment,
               COUNT(*) AS cancel_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cancel_amount
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey % 97 != 0
          AND o_orderkey % 10 IN (6, 7)
          AND o_orderkey % 4 = 0
        GROUP BY 1 ORDER BY 1
    """,
    "dws_payment_uu_window": """
        WITH pays AS (
            SELECT DISTINCT o_custkey AS user_id,
                   strftime(o_orderdate, '%Y-%m-%d') AS cur_date
            FROM orders
            WHERE o_orderkey % 97 != 0
              AND o_orderkey % 10 IN (6, 7)
              AND o_orderkey % 4 = 2
        ),
        flagged AS (
            SELECT cur_date,
                   CASE WHEN cur_date = MIN(cur_date) OVER (PARTITION BY user_id)
                        THEN 1 ELSE 0 END AS is_first_ever
            FROM pays
        )
        SELECT cur_date || ' 00:00:00' AS stt,
               strftime(cur_date::DATE + 1, '%Y-%m-%d') || ' 00:00:00' AS edt,
               COUNT(*) AS payment_suc_uu_ct,
               CAST(SUM(is_first_ever) AS BIGINT) AS payment_suc_new_user_ct
        FROM flagged GROUP BY cur_date ORDER BY stt
    """,
    "dws_order_uu_window": """
        WITH od AS (
            SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey)
                       * 1000 + l_suppkey AS id,
                   l_orderkey AS order_id,
                   MIN(epoch(l_shipdate)) AS ts
            FROM lineitem
            WHERE (l_orderkey * 7 + l_linenumber) % 89 != 0
              AND l_linenumber % 11 != 0
            GROUP BY 1, 2
        ),
        u AS (
            SELECT DISTINCT o_custkey AS user_id,
                   strftime(to_timestamp(ts), '%Y-%m-%d') AS cur_date
            FROM od JOIN orders ON order_id = o_orderkey
            WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 <= 5
        ),
        flagged AS (
            SELECT cur_date,
                   CASE WHEN cur_date = MIN(cur_date) OVER (PARTITION BY user_id)
                        THEN 1 ELSE 0 END AS is_first_ever
            FROM u
        )
        SELECT cur_date || ' 00:00:00' AS stt,
               strftime(cur_date::DATE + 1, '%Y-%m-%d') || ' 00:00:00' AS edt,
               COUNT(*) AS order_uu_ct,
               CAST(SUM(is_first_ever) AS BIGINT) AS order_new_user_ct
        FROM flagged GROUP BY cur_date ORDER BY stt
    """,
    "cdc_refund_pay_suc": """
        SELECT n_name AS nation_name,
               COUNT(*) AS refund_pay_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS refund_pay_amount
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderkey % 97 != 0
          AND o_orderkey % 10 IN (6, 7)
          AND o_orderkey % 4 = 1
        GROUP BY 1 ORDER BY 1
    """,
    "cdc_pay_detail_suc": """
        WITH pi AS (
            SELECT o_orderkey AS order_id,
                   o_custkey AS user_id,
                   '110' || CAST(o_orderkey % 3 + 1 AS VARCHAR)
                       AS payment_type_code,
                   CASE o_orderkey % 3 + 1
                        WHEN 1 THEN 'Alipay'
                        WHEN 2 THEN 'Wechat'
                        WHEN 3 THEN 'UnionPay' END AS payment_type_name,
                   CAST(epoch(o_orderdate) AS BIGINT) AS pay_ts
            FROM orders
            WHERE o_orderkey % 97 != 0
              AND o_orderkey % 10 IN (6, 7)
              AND o_orderkey % 4 = 2
        ),
        od AS (
            SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey)
                       * 1000 + l_suppkey AS order_detail_id,
                   l_orderkey AS order_id,
                   l_partkey AS sku_id,
                   CAST(l_quantity AS BIGINT) AS sku_num,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                       AS split_payment_amount,
                   CAST(epoch(l_shipdate) AS BIGINT) AS od_ts
            FROM lineitem
            WHERE (l_orderkey * 7 + l_linenumber) % 89 != 0
              AND l_linenumber % 11 != 0
        )
        SELECT order_detail_id, od.order_id, user_id, sku_id, sku_num,
               split_payment_amount, payment_type_code, payment_type_name,
               pay_ts
        FROM od JOIN pi ON od.order_id = pi.order_id
        WHERE od_ts >= pay_ts - 5 AND od_ts <= pay_ts + 90 * 86400
        QUALIFY row_number() OVER (
            PARTITION BY order_detail_id
            ORDER BY od_ts, sku_num, split_payment_amount) = 1
        ORDER BY order_detail_id
    """,
    "cdc_pay_suc": """
        SELECT n_name AS nation_name,
               COUNT(*) AS paysuc_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS paysuc_amount
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderkey % 97 != 0
          AND o_orderkey % 10 IN (6, 7)
          AND o_orderkey % 4 = 2
        GROUP BY 1 ORDER BY 1
    """,
    "cdc_config_route": f"""
        SELECT * FROM (
            SELECT 'dim_order_info' AS sink_table,
                   COUNT(*) AS row_ct, 3 * COUNT(*) AS keys_ct,
                   CAST(SUM(o_orderkey) AS BIGINT) AS id_sum
            FROM orders WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 <= 5
            UNION ALL
            SELECT 'dwd_order_update', COUNT(*), 2 * COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
            FROM orders WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 IN (6, 7)
            UNION ALL
            SELECT 'dwd_cart_add', COUNT(*), 3 * COUNT(*),
                   CAST(SUM(l_orderkey * 10 + l_linenumber) AS BIGINT)
            FROM lineitem WHERE {_CART_OK} AND l_linenumber % 2 = 1
        ) ORDER BY sink_table
    """,
    "cdc_scd2_history": f"""
        WITH cart AS (
            SELECT l_partkey AS sku_id,
                   (l_orderkey * 10 + l_linenumber) AS id,
                   CAST(l_quantity AS BIGINT) AS sku_num,
                   CAST(epoch(l_shipdate) AS BIGINT) AS ts
            FROM lineitem
            WHERE {_CART_OK} AND l_partkey % {SCD2_MOD} = 0
        )
        SELECT sku_id,
               CAST(row_number() OVER w AS BIGINT) AS ver,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               sku_num
        FROM cart
        WINDOW w AS (PARTITION BY sku_id ORDER BY ts, id)
        ORDER BY sku_id, ver
    """,
    "cdc_sku_last_state": f"""
        WITH cart AS (
            SELECT l_partkey AS sku_id,
                   (l_orderkey * 10 + l_linenumber) AS id,
                   CAST(l_quantity AS BIGINT) AS sku_num,
                   CAST(epoch(l_shipdate) AS BIGINT) AS ts
            FROM lineitem
            WHERE {_CART_OK}
        )
        SELECT sku_id, id AS last_id, sku_num AS last_sku_num
        FROM cart
        QUALIFY row_number() OVER (PARTITION BY sku_id
                                   ORDER BY ts DESC, id DESC, sku_num DESC) = 1
        ORDER BY sku_id
    """,
}
