"""Oracle-checked queries over the synthesized topic_log stream
(SURVEY §2.8 M1, §2.11 DwdTrafficBaseLogSplit + traffic DWS shapes).

Full reference-shaped path: raw log JSON (sources/log_synth) → P1 parse →
M1 five-way split with array explodes → DWS-style aggregations. DuckDB
oracles reproduce the results from `events` via the synthesizer's
arithmetic contract (log_synth docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.operators.log_split import split_log
from gmall_flink_spark.sources.log_synth import page_log_parsed


def _splits(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return split_log(page_log_parsed(spark, sf_dir))


def log_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 shape check: per split-output row count + distinct device count
    (the five topics of DwdTrafficBaseLogSplit.java:151-185).

    ONE-SCAN form (r11, closes the VERDICT r10 `weak` drift row): the
    split predicates are conditional aggregates of a single pass over the
    parsed log — exploded splits count as sum(size(array)) and their
    device counts as countDistinct over a predicate-masked mid — then one
    stack() unpivots the 1-row aggregate into the 5-row report. Replaces
    the 5-branch tagged union (5 scans + union + groupBy + names join):
    measured 1.4-1.6 s → 0.73-0.96 s warm at sf0.1, and the cold plan is
    a fraction of the size (the drift was first-execution planning cost
    of the wide union, not operator work — see BENCHNOTES r11). Split
    semantics mirror operators/log_split.py::split_log exactly: action/
    display rows require a PAGE row with a non-null array, an empty array
    contributes 0 rows and no device."""
    parsed = page_log_parsed(spark, sf_dir)
    is_err = F.col("err").isNotNull()
    is_start = F.col("start").isNotNull()
    is_page = F.col("start").isNull() & F.col("page").isNotNull()
    has_act = is_page & F.col("actions").isNotNull()
    has_disp = is_page & F.col("displays").isNotNull()
    mid = F.col("common.mid")
    row = parsed.agg(
        F.coalesce(F.sum(is_err.cast("bigint")), F.lit(0)).alias("r_err"),
        F.countDistinct(F.when(is_err, mid)).alias("m_err"),
        F.coalesce(F.sum(is_start.cast("bigint")), F.lit(0)).alias("r_start"),
        F.countDistinct(F.when(is_start, mid)).alias("m_start"),
        F.coalesce(F.sum(is_page.cast("bigint")), F.lit(0)).alias("r_page"),
        F.countDistinct(F.when(is_page, mid)).alias("m_page"),
        F.coalesce(
            F.sum(F.when(has_act, F.size("actions")).otherwise(0)).cast("bigint"),
            F.lit(0),
        ).alias("r_action"),
        F.countDistinct(
            F.when(has_act & (F.size("actions") > 0), mid)
        ).alias("m_action"),
        F.coalesce(
            F.sum(F.when(has_disp, F.size("displays")).otherwise(0)).cast("bigint"),
            F.lit(0),
        ).alias("r_display"),
        F.countDistinct(
            F.when(has_disp & (F.size("displays") > 0), mid)
        ).alias("m_display"),
    )
    return row.selectExpr(
        "stack(5, 'action', r_action, m_action, 'display', r_display, m_display, "
        "'err', r_err, m_err, 'page', r_page, m_page, 'start', r_start, m_start) "
        "as (split, row_ct, mid_ct)"
    ).orderBy("split")


def log_display_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 display explode: per (display_type, pos_id) row count and item sum
    (the exploded displays enriched with common+page_id,
    DwdTrafficBaseLogSplit.java:128-142)."""
    d = _splits(spark, sf_dir)["display"]
    return (
        d.groupBy("display_type", "pos_id")
        .agg(
            F.count(F.lit(1)).alias("row_ct"),
            F.sum(F.col("item").cast("bigint")).alias("item_sum"),
            F.sum("display_order").alias("order_sum"),
        )
        .orderBy("display_type", "pos_id")
    )


def log_action_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 action explode: per action_id count, devices, last action ts."""
    a = _splits(spark, sf_dir)["action"]
    return (
        a.groupBy("action_id")
        .agg(
            F.count(F.lit(1)).alias("row_ct"),
            F.countDistinct("mid").alias("mid_ct"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("action_id")
    )


def log_pvuv_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTrafficVcChArIsNewPageViewWindow grain (A1) computed from the
    split page stream: per channel pv, exact uv (distinct mid), total
    during_time (app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:130-154)."""
    p = _splits(spark, sf_dir)["page"]
    return (
        p.groupBy("ch")
        .agg(
            F.count(F.lit(1)).alias("pv_ct"),
            F.countDistinct("mid").alias("uv_ct"),
            F.sum("during_time").alias("dur_sum"),
        )
        .orderBy("ch")
    )


def dws_home_detail_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwsTrafficHomeDetailPageViewWindow pipeline (A5 + D4,
    app/dws/DwsTrafficHomeDetailPageViewWindow.java:70-133): daily exact UV
    of the home and good_detail pages via first-event-per-day dedup on
    (mid, page_id), summed as two counters per day."""
    from gmall_flink_spark.operators.dedup import first_per_day

    p = _splits(spark, sf_dir)["page"].where(
        F.col("page_id").isin("home", "good_detail")
    )
    p = p.withColumn("k", F.concat_ws("|", "mid", "page_id"))
    p = p.withColumn("rt", F.timestamp_millis("ts"))
    firsts = first_per_day(p, "k", "rt", order_by=["rt", "ts"])
    return (
        firsts.groupBy("cur_date")
        .agg(
            F.sum((F.col("page_id") == "home").cast("bigint")).alias("home_uv_ct"),
            F.sum((F.col("page_id") == "good_detail").cast("bigint")).alias("detail_uv_ct"),
        )
        .orderBy("cur_date")
    )


def log_traffic_grain_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DwsTrafficVcChArIsNewPageViewWindow grain (A1+A6+W1,
    app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:130-154): 1-day
    tumbling windows keyed by (vc, ch, ar, is_new) with pv, exact uv, and
    duration sums, stt/edt-decorated."""
    from gmall_flink_spark.operators.windows import tumble_agg

    p = _splits(spark, sf_dir)["page"].withColumn("rt", F.timestamp_millis("ts"))
    return tumble_agg(
        p,
        "rt",
        "1 day",
        ["vc", "ch", "ar", "is_new"],
        [
            F.count(F.lit(1)).alias("pv_ct"),
            F.countDistinct("mid").alias("uv_ct"),
            F.sum("during_time").alias("dur_sum"),
        ],
    ).orderBy("stt", "vc", "ch", "ar", "is_new")


QUERIES = {
    "log_split_counts": log_split_counts,
    "dws_home_detail_uv": dws_home_detail_uv,
    "log_display_flat": log_display_flat,
    "log_action_stats": log_action_stats,
    "log_pvuv_channel": log_pvuv_channel,
    "log_traffic_grain_window": log_traffic_grain_window,
}

_OK = "event_id % 101 != 0"
_CH = "(['xiaomi','appstore','huawei','web'])[(event_id % 4) + 1]"

ORACLE = {
    "log_traffic_grain_window": f"""
        WITH p AS (
            SELECT 'v' || CAST(event_id % 3 AS VARCHAR) AS vc,
                   {_CH} AS ch,
                   CAST(user_id % 7 AS VARCHAR) AS ar,
                   CASE WHEN event_id % 5 = 0 THEN '1' ELSE '0' END AS is_new,
                   user_id % 500 AS mid,
                   event_id % 100000 AS during_time,
                   to_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) * 1000
                                  + event_id % 1000) // 1000 // 86400) * 86400)
                       AS wstart
            FROM events
            WHERE {_OK} AND event_type != 'signup'
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(wstart + INTERVAL '86400 seconds', '%Y-%m-%d %H:%M:%S') AS edt,
               vc, ch, ar, is_new,
               COUNT(*) AS pv_ct,
               COUNT(DISTINCT mid) AS uv_ct,
               CAST(SUM(during_time) AS BIGINT) AS dur_sum
        FROM p GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY stt, vc, ch, ar, is_new
    """,
    "dws_home_detail_uv": f"""
        WITH p AS (
            SELECT strftime(to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) * 1000
                       + event_id % 1000) // 1000), '%Y-%m-%d') AS cur_date,
                   user_id % 500 AS mid,
                   CASE WHEN event_type = 'click' THEN 'home'
                        WHEN event_type = 'view' THEN 'good_detail' END AS page_id
            FROM events
            WHERE {_OK} AND event_type IN ('click', 'view')
        )
        SELECT cur_date,
               COUNT(DISTINCT CASE WHEN page_id = 'home' THEN mid END) AS home_uv_ct,
               COUNT(DISTINCT CASE WHEN page_id = 'good_detail' THEN mid END)
                   AS detail_uv_ct
        FROM p GROUP BY 1 ORDER BY 1
    """,
    "log_split_counts": f"""
        WITH ev AS (SELECT *, user_id % 500 AS mid FROM events WHERE {_OK})
        SELECT * FROM (
            SELECT 'action' AS split,
                   CAST(SUM(CASE event_type WHEN 'purchase' THEN 2
                       WHEN 'click' THEN 1 ELSE 0 END) AS BIGINT) AS row_ct,
                   COUNT(DISTINCT CASE WHEN event_type IN ('purchase','click')
                                       THEN mid END) AS mid_ct
            FROM ev
            UNION ALL
            SELECT 'display',
                   CAST(SUM(CASE WHEN event_type = 'view' THEN event_id % 3 + 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT CASE WHEN event_type = 'view' THEN mid END)
            FROM ev
            UNION ALL
            SELECT 'err', COUNT(*), COUNT(DISTINCT mid)
            FROM ev WHERE event_type = 'error'
            UNION ALL
            SELECT 'page', COUNT(*), COUNT(DISTINCT mid)
            FROM ev WHERE event_type != 'signup'
            UNION ALL
            SELECT 'start', COUNT(*), COUNT(DISTINCT mid)
            FROM ev WHERE event_type = 'signup'
        ) ORDER BY split
    """,
    "log_display_flat": f"""
        WITH d AS (
            SELECT unnest(generate_series(0, event_id % 3)) AS i,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
            WHERE {_OK} AND event_type = 'view'
        )
        SELECT CASE WHEN i % 2 = 0 THEN 'query' ELSE 'promotion' END
                   AS display_type,
               CAST(i % 5 AS VARCHAR) AS pos_id,
               COUNT(*) AS row_ct,
               CAST(SUM(k + i) AS BIGINT) AS item_sum,
               CAST(SUM(i + 1) AS BIGINT) AS order_sum
        FROM d GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "log_action_stats": f"""
        WITH base AS (
            SELECT *, user_id % 500 AS mid,
                   CAST(floor(epoch(ts)) AS BIGINT) * 1000 + event_id % 1000 AS ts_ms
            FROM events WHERE {_OK}
        )
        SELECT * FROM (
            SELECT 'cart_add' AS action_id, COUNT(*) AS row_ct,
                   COUNT(DISTINCT mid) AS mid_ct, MAX(ts_ms) + 1000 AS max_ts
            FROM base WHERE event_type = 'purchase'
            UNION ALL
            SELECT 'favor_add', COUNT(*), COUNT(DISTINCT mid), MAX(ts_ms) + 1000
            FROM base WHERE event_type = 'click'
            UNION ALL
            SELECT 'trade', COUNT(*), COUNT(DISTINCT mid), MAX(ts_ms) + 2000
            FROM base WHERE event_type = 'purchase'
        ) ORDER BY action_id
    """,
    "log_pvuv_channel": f"""
        SELECT {_CH} AS ch,
               COUNT(*) AS pv_ct,
               COUNT(DISTINCT user_id % 500) AS uv_ct,
               CAST(SUM(event_id % 100000) AS BIGINT) AS dur_sum
        FROM events
        WHERE {_OK} AND event_type != 'signup'
        GROUP BY 1 ORDER BY 1
    """,
}
