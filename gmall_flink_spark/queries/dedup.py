"""Oracle-checked queries for the dedup/stateful suite (SURVEY §2.6) over
the `events` stream table: user_id plays the reference's mid/user_id key,
event time spans 30 days so first-per-day, first-ever and 7-day-return
paths all fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.money import dsum
from gmall_flink_spark.operators.dedup import (
    daily_new_flags,
    first_per_day,
    keep_first,
    keep_last,
    repair_is_new,
    returning_flags,
)
from gmall_flink_spark.sources.tables import table

_TS_STR = "yyyy-MM-dd HH:mm:ss"


def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: first event per user (order: ts, event_id tie-break)."""
    ev = table(spark, sf_dir, "events")
    return (
        keep_first(ev, ["user_id"], ["ts", "event_id"])
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", _TS_STR).alias("ts_str"),
        )
        .orderBy("user_id")
    )


def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: latest event per user (reference: timer-based keep-last)."""
    ev = table(spark, sf_dir, "events")
    return (
        keep_last(ev, ["user_id"], ["ts", "event_id"])
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", _TS_STR).alias("ts_str"),
        )
        .orderBy("user_id")
    )


def uv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: exact daily UV via first-event-per-day detection."""
    ev = table(spark, sf_dir, "events")
    return (
        first_per_day(ev, "user_id", "ts", ["ts", "event_id"])
        .groupBy("cur_date")
        .agg(F.count(F.lit(1)).alias("uv_ct"))
        .orderBy("cur_date")
    )


def uv_new_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: daily unique users + first-ever (new) users."""
    ev = table(spark, sf_dir, "events")
    return (
        daily_new_flags(ev, "user_id", "ts")
        .groupBy("cur_date")
        .agg(
            F.count(F.lit(1)).alias("uu_ct"),
            F.sum("is_first_ever").alias("new_ct"),
        )
        .orderBy("cur_date")
    )


def returning_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: daily unique users + returners (>=7-day gap)."""
    ev = table(spark, sf_dir, "events")
    return (
        returning_flags(ev, "user_id", "ts", gap_days=7)
        .groupBy("cur_date")
        .agg(
            F.count(F.lit(1)).alias("uu_ct"),
            F.sum("is_back").alias("back_ct"),
        )
        .orderBy("cur_date")
    )


def is_new_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: repair a deliberately unreliable is_new flag (claimed = even
    event_id) against each user's true first-seen day."""
    ev = table(spark, sf_dir, "events")
    claimed = (F.col("event_id") % 2 == 0).cast("int")
    fixed = repair_is_new(ev.withColumn("claimed", claimed), "user_id", "ts", F.col("claimed"))
    return (
        fixed.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("cur_date"))
        .agg(
            F.sum("claimed").alias("claimed_ct"),
            F.sum("is_new_fixed").alias("fixed_ct"),
        )
        .orderBy("cur_date")
    )


def dedup_per_type_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 composition: keep-first per (user, event_type), then aggregate —
    the 'dedup the retraction storm, then sum money' DWS pattern
    (app/dws/DwsTradeSkuOrderWindow.java:112-166)."""
    ev = table(spark, sf_dir, "events")
    return (
        keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("user_ct"),
            dsum("value", "first_value_sum"),
        )
        .orderBy("event_type")
    )


def uv_daily_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-distinct UV (HyperLogLog++) — the optional cheaper mode SURVEY
    §2.5 notes for the exact-UV detectors. Not registered in QUERIES: an
    approximation has no deterministic SQL oracle (a registry entry would be
    a guaranteed red driver row); tests/test_dedup_approx.py asserts the HLL
    relative-error bound against the exact column instead. At 100 TB this is
    a constant-memory sketch per group vs an exact distinct shuffle."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("cur_date"))
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("uv_approx"),
            F.countDistinct("user_id").alias("uv_exact"),
        )
        .orderBy("cur_date")
    )


from gmall_flink_spark.operators.sketch import KMV_K, KMV_M, kmv_estimate, kmv_hash


def uv_daily_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-distinct daily UV via a deterministic KMV (k-minimum-values)
    sketch over the portable 48-bit hash (operators/sketch.py) — unlike HLL
    this is exactly reproducible cross-engine, so the approximation itself
    is oracle-checked. Exact count rides along so the error is visible;
    when a day has fewer than k distinct users the sketch degrades to
    exact. At 100 TB the sketch is a k-value state per group versus an
    exact-distinct shuffle of every key; the streaming form merges the same
    state per micro-batch (sinks/kmv_sink.py)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("cur_date"), "user_id"
    ).distinct()
    hashed = pairs.withColumn("h", kmv_hash(F.col("user_id")))
    w = Window.partitionBy("cur_date").orderBy("h")
    ranked = hashed.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("cur_date")
        .agg(
            F.count(F.lit(1)).alias("exact_ct"),
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("h_k"),
        )
        .select(
            "cur_date",
            "exact_ct",
            kmv_estimate("exact_ct", "h_k").alias("kmv_ct"),
        )
        .orderBy("cur_date")
    )



def uv_rolling7_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLL-UP: 7-day rolling distinct users from merged per-day
    KMV sketches, next to the exact rolling count. The per-day state is k
    hashes; a week's estimate is min-k of the UNION of 7 day sketches —
    the mergeability that makes KMV a warehouse primitive (day sketches
    roll to week/month/anything without touching raw keys, the same merge
    the streaming sink does across batches). Exact rolling distinct, by
    contrast, must re-touch every (day, user) pair per window.

    Scale: per-day sketches are k int64s; the rolling window runs over the
    DAYS table (rows ∝ time, not data volume — the one unpartitioned
    window in the suite, deliberately) and is a CALENDAR range frame on
    the day number, so a gap day widens nothing: both columns always
    cover exactly [day-6, day]; the exact column's day-range join
    re-shuffles the pair table and is the cost the sketch removes."""
    from pyspark.sql import Window

    from gmall_flink_spark.operators.sketch import KMV_K, kmv_estimate, kmv_hash

    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), "user_id"
    ).distinct()
    hashed = pairs.select("d", kmv_hash(F.col("user_id")).alias("h"))
    per_day = hashed.groupBy("d").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, KMV_K).alias("sk")
    )
    day_num = F.datediff(F.to_date("d"), F.lit("1970-01-01"))
    w = Window.orderBy(day_num).rangeBetween(-6, 0)
    rolled = per_day.withColumn(
        "sk7",
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sk").over(w)))),
            1,
            KMV_K,
        ),
    ).withColumn("n7", F.size("sk7").cast("bigint"))
    # shared estimator arithmetic (operators/sketch.py) — CASE branches
    # evaluate lazily, so element_at stays in-bounds under ANSI
    est = kmv_estimate("n7", f"element_at(sk7, {KMV_K})")
    days = per_day.select(F.to_date("d").alias("day7"))
    exact = (
        F.broadcast(days)
        .join(
            pairs.withColumn("pd", F.to_date("d")),
            (F.col("pd") >= F.date_sub(F.col("day7"), 6))
            & (F.col("pd") <= F.col("day7")),
        )
        .groupBy("day7")
        .agg(F.count_distinct("user_id").alias("exact_ct"))
        .select(F.date_format("day7", "yyyy-MM-dd").alias("d"), "exact_ct")
    )
    return (
        rolled.select("d", est.alias("kmv_ct"))
        .join(exact, "d")
        .select("d", "exact_ct", "kmv_ct")
        .orderBy("d")
    )


QUERIES = {
    "uv_daily_kmv": uv_daily_kmv,
    "uv_rolling7_kmv": uv_rolling7_kmv,
    "dedup_keep_first": dedup_keep_first,
    "dedup_keep_last": dedup_keep_last,
    "uv_daily": uv_daily,
    "uv_new_daily": uv_new_daily,
    "returning_users_daily": returning_users_daily,
    "is_new_repair": is_new_repair,
    "dedup_per_type_spend": dedup_per_type_spend,
}

ORACLE = {
    "dedup_keep_first": """
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
        ORDER BY user_id
    """,
    "dedup_keep_last": """
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id
    """,
    "uv_daily_kmv": f"""
        WITH p AS (
            SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS cur_date, user_id
            FROM events
        ),
        h AS (
            SELECT cur_date,
                   ('0x' || substr(md5('0|' || user_id::VARCHAR), 1, 15))::BIGINT >> 12
                       AS h
            FROM p
        ),
        r AS (
            SELECT cur_date, h,
                   row_number() OVER (PARTITION BY cur_date ORDER BY h) AS rk
            FROM h
        ),
        agg AS (
            SELECT cur_date, COUNT(*) AS exact_ct,
                   MAX(CASE WHEN rk = {KMV_K} THEN h END) AS h_k
            FROM r GROUP BY 1
        )
        SELECT cur_date, exact_ct,
               CAST(CASE WHEN exact_ct < {KMV_K} THEN exact_ct
                         ELSE {(KMV_K - 1) * KMV_M} // greatest(h_k, 1)
                    END AS BIGINT) AS kmv_ct
        FROM agg ORDER BY 1
    """,
    "uv_daily": """
        SELECT strftime(ts, '%Y-%m-%d') AS cur_date,
               COUNT(DISTINCT user_id) AS uv_ct
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "uv_new_daily": """
        WITH daily AS (
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS cur_date FROM events
        ), flagged AS (
            SELECT cur_date,
                   CASE WHEN cur_date = MIN(cur_date) OVER (PARTITION BY user_id)
                        THEN 1 ELSE 0 END AS is_first_ever
            FROM daily
        )
        SELECT cur_date, COUNT(*) AS uu_ct, CAST(SUM(is_first_ever) AS BIGINT) AS new_ct
        FROM flagged GROUP BY cur_date ORDER BY cur_date
    """,
    "returning_users_daily": """
        WITH daily AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), flagged AS (
            SELECT d,
                   CASE WHEN date_diff('day',
                            LAG(d) OVER (PARTITION BY user_id ORDER BY d), d) >= 7
                        THEN 1 ELSE 0 END AS is_back
            FROM daily
        )
        SELECT strftime(d, '%Y-%m-%d') AS cur_date,
               COUNT(*) AS uu_ct, CAST(SUM(is_back) AS BIGINT) AS back_ct
        FROM flagged GROUP BY d ORDER BY d
    """,
    "is_new_repair": """
        WITH ev AS (
            SELECT *,
                   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS claimed,
                   strftime(ts, '%Y-%m-%d') AS cur_date,
                   MIN(strftime(ts, '%Y-%m-%d')) OVER (PARTITION BY user_id) AS first_date
            FROM events
        )
        SELECT cur_date,
               CAST(SUM(claimed) AS BIGINT) AS claimed_ct,
               CAST(SUM(CASE WHEN claimed = 1 AND cur_date = first_date THEN 1 ELSE 0 END) AS BIGINT) AS fixed_ct
        FROM ev GROUP BY cur_date ORDER BY cur_date
    """,
    "dedup_per_type_spend": """
        WITH firsts AS (
            SELECT * FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) = 1
        )
        SELECT event_type, COUNT(*) AS user_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS first_value_sum
        FROM firsts GROUP BY event_type ORDER BY event_type
    """,
}

from gmall_flink_spark.operators.sketch import KMV_K as _K, KMV_M as _M  # noqa: E402

ORACLE["uv_rolling7_kmv"] = f"""
    WITH p AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d, user_id FROM events
    ),
    h AS (
        SELECT d,
               ('0x' || substr(md5('0|' || user_id::VARCHAR), 1, 15))::BIGINT >> 12
                   AS h
        FROM p
    ),
    per_day AS (
        SELECT d, (list_sort(list(h)))[1:{_K}] AS sk FROM h GROUP BY d
    ),
    rolled AS (
        SELECT d,
               (list_sort(list_distinct(flatten(
                   list(sk) OVER (ORDER BY d::DATE
                                  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                                  AND CURRENT ROW)))))[1:{_K}] AS sk7
        FROM per_day
    ),
    est AS (
        SELECT d,
               CAST(CASE WHEN len(sk7) < {_K} THEN len(sk7)
                         ELSE {(_K - 1) * _M} // greatest(sk7[{_K}], 1)
                    END AS BIGINT) AS kmv_ct
        FROM rolled
    ),
    exact AS (
        SELECT d1.d, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS exact_ct
        FROM (SELECT DISTINCT d FROM p) d1
        JOIN p ON p.d::DATE BETWEEN d1.d::DATE - 6 AND d1.d::DATE
        GROUP BY d1.d
    )
    SELECT est.d, exact.exact_ct, est.kmv_ct
    FROM est JOIN exact ON est.d = exact.d
    ORDER BY est.d
"""
