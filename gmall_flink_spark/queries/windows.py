"""Oracle-checked queries for the tumbling-window aggregation suite
(SURVEY §2.5 A1-A6, §2.7 W1-W6) over the `events` stream table.

The reference uses 10-second windows on a dense stream; the testdata events
are spread over 30 days, so 10-minute / 1-day windows exercise the same
operator shapes with populated buckets. Spark's ``window()`` aligns buckets
to the epoch — the DuckDB oracle reproduces that with floor(epoch/size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.money import dsum
from gmall_flink_spark.operators.windows import decorate, tumble_agg
from gmall_flink_spark.sources.tables import table


def window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 + A6: 10-minute tumbling count + money sum per event_type with
    stt/edt decoration (the DwsTrafficVcChArIsNewPageViewWindow shape,
    app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:130-154)."""
    ev = table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("pv_ct"), dsum("value", "value_sum")],
    ).orderBy("stt", "event_type")


def window_pv_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + exact distinct (D4-in-window): per 1-hour window pv, exact uv,
    and view-page count (the home/detail UV shape,
    app/dws/DwsTrafficHomeDetailPageViewWindow.java:121-133)."""
    ev = table(spark, sf_dir, "events")
    return tumble_agg(
        ev,
        "ts",
        "1 hour",
        [],
        [
            F.count(F.lit(1)).alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            F.sum((F.col("event_type") == "view").cast("bigint")).alias("view_ct"),
        ],
    ).orderBy("stt")


def window_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: 1-day tumbling exact-decimal money aggregates per event_type
    (the sku/province money-window shape,
    app/dws/DwsTradeSkuOrderWindow.java:149-166)."""
    ev = table(spark, sf_dir, "events")
    out = tumble_agg(
        ev,
        "ts",
        "1 day",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("event_ct"),
            dsum("value", "value_sum"),
            F.max(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_max"),
        ],
    )
    return out.withColumn(
        "value_avg", F.col("value_sum") / F.col("event_ct")
    ).orderBy("stt", "event_type")


def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time window — beyond the reference (it has
    only tumbling, SURVEY §2.7): 1-hour windows every 30 minutes; each event
    lands in 2 windows."""
    ev = table(spark, sf_dir, "events")
    return decorate(
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type").agg(
            F.count(F.lit(1)).alias("pv_ct")
        )
    ).orderBy("stt", "event_type")


def window_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (gap 30 minutes) per user — also beyond the
    reference; per user: session count, total events, largest session."""
    ev = table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("session_ct"),
            F.sum("n").alias("event_ct"),
            F.max("n").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def dws_brand_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTradeSkuOrderWindow pipeline composed end-to-end
    (app/dws/DwsTradeSkuOrderWindow.java:50-376): CDC order_detail stream →
    D2 keep-first dedup per detail id → J7 dim enrichment (broadcast part,
    the 6-level chain collapsed to its Spark form) → A3 exact-decimal money
    sums in 30-day tumbling windows → A6 stt/edt decoration.

    Scale: dedup shuffles once on the detail id; the window agg reshuffles
    on (window, brand) with map-side partials; the dim join broadcasts."""
    from gmall_flink_spark.operators.cdc import d, drop_bootstrap, src_filter
    from gmall_flink_spark.operators.dedup import keep_first
    from gmall_flink_spark.sources.cdc_synth import detail_envelope

    od = src_filter(
        drop_bootstrap(detail_envelope(spark, sf_dir)), "order_detail", ["insert"]
    ).select(
        d("id").cast("bigint").alias("id"),
        d("sku_id").cast("bigint").alias("sku_id"),
        d("sku_num").cast("bigint").alias("sku_num"),
        d("split_total_amount").cast("decimal(18,2)").alias("amount"),
        F.timestamp_seconds("ts").alias("rt"),
    )
    od = keep_first(od, ["id"], ["rt", "sku_num", "amount"])
    part = table(spark, sf_dir, "part")
    enriched = od.join(F.broadcast(part), od.sku_id == part.p_partkey)
    return tumble_agg(
        enriched,
        "rt",
        "30 days",
        [F.col("p_brand").alias("brand")],
        [
            F.count(F.lit(1)).alias("order_ct"),
            F.sum("sku_num").alias("sku_num_sum"),
            F.sum("amount").cast("double").alias("amount_sum"),
        ],
    ).orderBy("stt", "brand")


def dws_nation_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTradeProvinceOrderWindow pipeline (A4 + D2 + J8,
    app/dws/DwsTradeProvinceOrderWindow.java:36-140): order inserts from the
    changelog, windowed per geography with count + exact-decimal amount,
    name-enriched via broadcast dims, stt/edt decorated."""
    from gmall_flink_spark.operators.cdc import d, drop_bootstrap, src_filter
    from gmall_flink_spark.sources.cdc_synth import orders_envelope

    oi = src_filter(
        drop_bootstrap(orders_envelope(spark, sf_dir)), "order_info", ["insert"]
    ).select(
        d("id").cast("bigint").alias("order_id"),
        d("user_id").cast("bigint").alias("user_id"),
        d("total_amount").cast("decimal(18,2)").alias("amount"),
        F.timestamp_seconds("ts").alias("rt"),
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    enriched = (
        oi.join(F.broadcast(cust), oi.user_id == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return tumble_agg(
        enriched,
        "rt",
        "30 days",
        [F.col("n_name").alias("nation_name")],
        [
            F.count(F.lit(1)).alias("order_ct"),
            F.countDistinct("user_id").alias("user_ct"),
            F.sum("amount").cast("double").alias("order_amount"),
        ],
    ).orderBy("stt", "nation_name")


def window_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k (the streaming leaderboard shape): per 1-day tumbling
    window, the top-2 event types by count — window agg then rank within
    the window key (one shuffle per stage, no global sort of events)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    counts = tumble_agg(
        ev, "ts", "1 day", ["event_type"], [F.count(F.lit(1)).alias("ev_ct")]
    )
    w = Window.partitionBy("stt").orderBy(F.desc("ev_ct"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("stt", "edt", "rk", "event_type", "ev_ct")
        .orderBy("stt", "rk")
    )


#: burst window sized to the testdata's event rate (150 users x 5 types over
#: a month → ~6 h is the "burst" scale here; production sets seconds).
BURST_WINDOW_US = 360 * 60 * 1_000_000


def events_burst_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style burst detection (the Flink-CEP pattern family, expressed
    relationally): alert on the 3rd same-type event of a user inside the
    burst window — ts(n) - ts(n-2) <= W via lag(2) over the (user, type)
    ordering. One shuffle on the key; microsecond integer arithmetic keeps
    the predicate engine-portable."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    return (
        ev.withColumn("us2", F.lag("us", 2).over(w))
        .where(F.col("us2").isNotNull() & (F.col("us") - F.col("us2") <= BURST_WINDOW_US))
        .select(
            "user_id",
            "event_type",
            "event_id",
            (F.col("us") - F.col("us2")).alias("span_us"),
        )
        .orderBy("event_id")
    )


QUERIES = {
    "window_topk_types": window_topk_types,
    "events_burst_alert": events_burst_alert,
    "window_event_counts": window_event_counts,
    "dws_brand_order_window": dws_brand_order_window,
    "dws_nation_order_window": dws_nation_order_window,
    "window_pv_uv": window_pv_uv,
    "window_daily_value": window_daily_value,
    "window_sliding_counts": window_sliding_counts,
    "window_session_stats": window_session_stats,
}


def _bucket(size_s: int) -> str:
    return f"to_timestamp(CAST(floor(epoch(ts) / {size_s}) * {size_s} AS BIGINT))"


def _bucket_of(col: str, size_s: int) -> str:
    return f"to_timestamp(CAST(floor(epoch({col}) / {size_s}) * {size_s} AS BIGINT))"


ORACLE = {
    "events_burst_alert": f"""
        WITH t AS (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
        ),
        l AS (
            SELECT *, lag(us, 2) OVER (PARTITION BY user_id, event_type
                                       ORDER BY us, event_id) AS us2
            FROM t
        )
        SELECT user_id, event_type, event_id, us - us2 AS span_us
        FROM l
        WHERE us2 IS NOT NULL AND us - us2 <= {BURST_WINDOW_US}
        ORDER BY event_id
    """,
    "window_sliding_counts": f"""
        WITH hops AS (
            SELECT event_type,
                   to_timestamp(CAST(floor((epoch(ts) - off) / 3600) * 3600 + off
                                     AS BIGINT)) AS wstart
            FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS off)
            WHERE floor((epoch(ts) - off) / 3600) * 3600 + off <= epoch(ts)
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(wstart + INTERVAL '3600 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               COUNT(*) AS pv_ct
        FROM hops GROUP BY 1, 2, 3 ORDER BY stt, event_type
    """,
    "window_session_stats": """
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        per AS (SELECT user_id, sid, COUNT(*) AS n FROM sess GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS session_ct, CAST(SUM(n) AS BIGINT) AS event_ct,
               MAX(n) AS max_session_events
        FROM per GROUP BY 1 ORDER BY 1
    """,
    "dws_nation_order_window": f"""
        WITH oi AS (
            SELECT o_orderkey AS order_id, o_custkey AS user_id,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS amount,
                   to_timestamp(CAST(floor(epoch(o_orderdate)) AS BIGINT)) AS rt
            FROM orders
            WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 <= 5
        )
        SELECT strftime({_bucket_of('rt', 2592000)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket_of('rt', 2592000)} + INTERVAL '2592000 seconds',
                        '%Y-%m-%d %H:%M:%S') AS edt,
               n_name AS nation_name,
               COUNT(*) AS order_ct,
               COUNT(DISTINCT user_id) AS user_ct,
               CAST(SUM(amount) AS DOUBLE) AS order_amount
        FROM oi
        JOIN customer ON user_id = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3 ORDER BY stt, nation_name
    """,
    "dws_brand_order_window": f"""
        WITH od AS (
            SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey) * 1000
                       + l_suppkey AS id,
                   l_partkey AS sku_id,
                   CAST(l_quantity AS BIGINT) AS sku_num,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS amount,
                   to_timestamp(CAST(floor(epoch(l_shipdate)) AS BIGINT)) AS rt
            FROM lineitem
            WHERE (l_orderkey * 7 + l_linenumber) % 89 != 0
              AND l_linenumber % 11 != 0
            QUALIFY row_number() OVER (
                PARTITION BY id ORDER BY rt, sku_num, amount) = 1
        )
        SELECT strftime({_bucket_of('rt', 2592000)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket_of('rt', 2592000)} + INTERVAL '2592000 seconds',
                        '%Y-%m-%d %H:%M:%S') AS edt,
               p_brand AS brand,
               COUNT(*) AS order_ct,
               CAST(SUM(sku_num) AS BIGINT) AS sku_num_sum,
               CAST(SUM(amount) AS DOUBLE) AS amount_sum
        FROM od JOIN part ON sku_id = p_partkey
        GROUP BY 1, 2, 3 ORDER BY stt, brand
    """,
    "window_topk_types": f"""
        WITH counts AS (
            SELECT strftime({_bucket(86400)}, '%Y-%m-%d %H:%M:%S') AS stt,
                   strftime({_bucket(86400)} + INTERVAL '86400 seconds',
                            '%Y-%m-%d %H:%M:%S') AS edt,
                   event_type, COUNT(*) AS ev_ct
            FROM events GROUP BY 1, 2, 3
        )
        SELECT stt, edt,
               row_number() OVER (PARTITION BY stt
                                  ORDER BY ev_ct DESC, event_type) AS rk,
               event_type, ev_ct
        FROM counts
        QUALIFY rk <= 2
        ORDER BY stt, rk
    """,
    "window_event_counts": f"""
        SELECT strftime({_bucket(600)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket(600)} + INTERVAL '600 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               COUNT(*) AS pv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1, 2, 3 ORDER BY stt, event_type
    """,
    "window_pv_uv": f"""
        SELECT strftime({_bucket(3600)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket(3600)} + INTERVAL '3600 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               COUNT(*) AS pv_ct,
               COUNT(DISTINCT user_id) AS uv_ct,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_ct
        FROM events
        GROUP BY 1, 2 ORDER BY stt
    """,
    "window_daily_value": f"""
        SELECT strftime({_bucket(86400)}, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({_bucket(86400)} + INTERVAL '86400 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               event_type,
               COUNT(*) AS event_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
               CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_max,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS value_avg
        FROM events
        GROUP BY 1, 2, 3 ORDER BY stt, event_type
    """,
}
