"""Analytic-SQL surface: running window functions, pivot, cube, set ops —
the classic warehouse idioms a reference user expects beyond the operator
inventory (all free in Spark; each oracle-checked).

Scale notes: running windows shuffle once on the partition key and sort
within partitions (no global sort); the pivot is a conditional aggregation
with pinned pivot values (never a dynamic distinct scan); cube costs one
shuffle per grouping-set expansion, handled by Spark's Expand operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_flink_spark.functions.money import dec
from gmall_flink_spark.sources.tables import table

#: pinned pivot domain (dynamic pivots scan twice; fixed values keep the
#: plan a single conditional aggregation)
_STATUSES = ("F", "O", "P")


def running_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running order-value totals per customer (cumsum + lag delta + order
    sequence — the lead/lag/cumulative trio) for a deterministic customer
    slice."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    amt = dec("o_totalprice")
    return (
        orders.select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderkey").alias("order_id"),
            F.row_number().over(w).alias("order_seq"),
            F.sum(amt).over(w).cast("double").alias("running_total"),
            F.lag(amt).over(w).cast("double").alias("prev_amount"),
        )
        .orderBy("cust_id", "order_seq")
    )


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted: one row per priority, one column per order
    status (pinned domain)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(F.count(F.lit(1)))
        .select(
            "priority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s.lower()}_ct") for s in _STATUSES],
        )
        .orderBy("priority")
    )


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets with exact
    decimal revenue — the grouping-sets generalization of rollup_revenue."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).alias("order_ct"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy(
            F.col("status").asc_nulls_first(), F.col("priority").asc_nulls_first()
        )
    )


def customer_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family (ntile / dense_rank / percent_rank):
    customers quartiled by account balance within their nation; per
    (nation, quartile) count and exact-cents balance total. Deterministic:
    the window orders by (c_acctbal, c_custkey) so ties split stably."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    ranked = cust.select(
        F.col("c_nationkey").alias("nation_id"),
        F.ntile(4).over(w).alias("quartile"),
        cents.alias("bal_cents"),
    )
    return (
        ranked.groupBy("nation_id", "quartile")
        .agg(
            F.count(F.lit(1)).alias("cust_ct"),
            F.sum("bal_cents").alias("bal_cents_total"),
        )
        .orderBy("nation_id", "quartile")
    )


def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers in the BUILDING segment INTERSECT high-value
    customers, EXCEPT recent-order customers — counted per nation."""
    cust = table(spark, sf_dir, "customer")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    recent = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    keys = building.intersect(rich).exceptAll(recent.distinct())
    return (
        keys.join(cust, "c_custkey")
        .groupBy(F.col("c_nationkey").alias("nation_id"))
        .agg(F.count(F.lit(1)).alias("cust_ct"))
        .orderBy("nation_id")
    )


#: quantile-sketch sample size (error ~ 1/sqrt(k) per quantile)
SKETCH_K = 256


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch per event type: a bottom-K-by-portable-hash
    uniform sample (the min-k construction shared with the KMV sketch —
    deterministic, seed-free, and mergeable: min-k of a union is
    batching-insensitive), quantiles read off the sample next to the exact
    quantiles so the sketch error is visible. Unlike t-digest/GK sketches
    the state is order-independent, which is what makes an *approximate
    quantile* oracle-checkable cross-engine.

    Scale: exact per-key quantiles sort every value of a key on one
    reducer; the sketch keeps K rows per key (local bottom-k per partition,
    one small merge), and the sample is reusable for every quantile."""
    from gmall_flink_spark.functions.text import md5_long

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        md5_long(F.col("event_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h", "value")
    sample = ev.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= SKETCH_K
    )
    sample_agg = sample.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med_sketch"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_sketch"),
    )
    full_agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med_exact"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_exact"),
    )
    return (
        full_agg.join(sample_agg, "event_type")
        .select(
            "event_type", "n_total", "n_sample",
            "med_exact", "med_sketch", "p90_exact", "p90_sketch",
        )
        .orderBy("event_type")
    )


def events_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-one-hour window (RANGE frame over event-time
    microseconds, per user slice): how many events and how much value the
    same user produced in the 3600 s ending at each event — the
    rate-limit / velocity-check idiom that tumbling windows can't express
    (every row gets its own window). Value sums in exact cents.

    Scale: one shuffle on the user key, per-user sort — same cost class as
    any keyed window; the RANGE frame is a sliding cursor over the sorted
    run, not a self-join."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id") % 100 == 0)
    us = F.unix_micros(F.col("ts"))
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-(3_600_000_000 - 1), 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            us.alias("ts_us"),
            F.count(F.lit(1)).over(w).alias("trail_ct"),
            F.sum(cents).over(w).alias("trail_cents"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (path analysis): for each user's event
    stream ordered by (ts, event_id), count from->to transitions and the
    distinct users making each — the Markov-chain / funnel-edge view.

    Scale: one shuffle on the user key + per-user sort for the lead();
    the matrix aggregation is a tiny groupBy with map-side partials."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("next_type", F.lead("event_type").over(w))
    return (
        t.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("trans_ct"),
            F.countDistinct("user_id").alias("user_ct"),
        )
        .orderBy("from_type", "to_type")
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort triangle: users grouped by first-active day
    (cohort), counted per day-offset they return — the D1/D7/D30 retention
    table every activity pipeline publishes.

    Scale: (user, day) distinct is one shuffle; the cohort is a window
    min over the user partition — one more exchange, NOT a groupBy+self-
    join (which re-shuffles the daily frame a third time); the triangle
    itself is tiny. No self-join over the raw events."""
    ev = table(spark, sf_dir, "events")
    daily = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id")
    return (
        daily.withColumn("cohort_d", F.min("d").over(w))
        .groupBy(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort"),
            F.datediff("d", "cohort_d").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort", "day_offset")
    )


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: median absolute deviation
    (MAD) outliers — |value − median| > 3·MAD. The robust-statistics
    counterpart of z-score alerting (one extreme value can't move the
    threshold, unlike mean/stddev).

    Integer-exact construction so the oracle matches bit-for-bit with no FP
    boundary: values become cents; ``med2c`` = 2× the interpolated median
    of cents (even-count interpolation of integers halves are exact when
    doubled), ``d = |2·cents − med2c|`` is an integer, ``mad4`` = 2× the
    interpolated median of d (= 4× MAD in cents), and the outlier test is
    the pure-integer ``2·d > 3·mad4``.

    Scale: two windowed medians per event_type — exact medians cost a
    per-key sort (the honest price; an approximate variant would use
    percentile_approx map-side), then one tiny aggregate. The projected
    events relation and the decorated ``d`` frame are each consumed by
    TWO downstream aggregates (unshared subtrees to Catalyst), so both
    are localCheckpointed: the parquet scan and the median aggregation
    run once instead of being re-planned per consumer (4 scans + a
    twice-run percentile before; 1 scan after)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)
    med = ev.groupBy("event_type").agg(
        (2 * F.expr("percentile(c, 0.5)")).cast("bigint").alias("med2c"),
        F.count(F.lit(1)).alias("n"),
    )
    d = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(2 * F.col("c") - F.col("med2c"))
    ).localCheckpoint(eager=False)
    mad = d.groupBy("event_type").agg(
        (2 * F.expr("percentile(d, 0.5)")).cast("bigint").alias("mad4"),
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("med2c").alias("med2c"),
            F.max("mad4").alias("mad4"),
            F.sum((2 * F.col("d") > 3 * F.col("mad4")).cast("bigint")).alias(
                "outlier_ct"
            ),
        )
        .orderBy("event_type")
    )


#: heavy-hitter report size for events_cms_topk
CMS_TOP = 10


def events_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch audit: build the d*w counter table over
    event user_ids (operators/sketch.py::cms_counters — deterministic
    seeded hashes, so the approximation itself is oracle-checked like the
    KMV sketch), then report the exact top-10 heaviest users with their
    CMS estimate side by side. The estimate is min over d rows of the
    user's bucket counters — always >= the exact count (pinned by
    test_cms_never_underestimates), with overestimate ~2n/w.

    Scale: the sketch is the extreme map-side-combine aggregation — every
    partition reduces to <= d*w partial cells before ONE tiny shuffle, and
    the counter table is d*w rows no matter the key cardinality, so it
    broadcasts back for estimation. Additive cells make it the natural
    rollup_writer payload for streaming maintenance (no new sink code).
    The exact top-10 here is the audit's truth reference; production uses
    the sketch precisely when exact counting is too wide."""
    from gmall_flink_spark.operators.sketch import CMS_D, cms_bucket, cms_counters

    ev = table(spark, sf_dir, "events").select("user_id")
    counters = cms_counters(ev, "user_id")
    cand = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_ct"))
        .orderBy(F.desc("exact_ct"), "user_id")
        .limit(CMS_TOP)
    )
    lookups = cand.select(
        "user_id",
        "exact_ct",
        F.posexplode(
            F.array(*[cms_bucket(F.col("user_id"), s) for s in range(CMS_D)])
        ).alias("depth", "bucket"),
    )
    return (
        lookups.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("user_id", "exact_ct")
        .agg(F.min("ct").alias("cms_est"))
        .orderBy(F.desc("exact_ct"), "user_id")
    )



#: columns profiled by stats_table_profile
_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def stats_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table in ONE pass:
    per column, null count, exact distinct count, and min/max — the
    statistics a data pipeline records per snapshot for drift detection
    and that a cost-based optimizer feeds on. One row per column via an
    unpivot of the single aggregate row.

    Scale: one scan; the k exact count_distincts expand the input k ways
    before the aggregate (Spark's Expand operator — the honest exact
    cost, documented). At 100 TB the exact distincts swap for the KMV
    sketch (operators/sketch.py) column-by-column; nulls/min/max are
    plain map-side partials either way."""
    d = table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("row_ct")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"null_{c}"),
            F.count_distinct(c).alias(f"dist_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    one = d.agg(*aggs)
    stack = ", ".join(
        f"'{c}', null_{c}, dist_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        "row_ct",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, null_ct, distinct_ct, min_val, max_val)",
    ).select(
        "column_name", "row_ct", "null_ct", "distinct_ct", "min_val", "max_val"
    ).orderBy("column_name")


QUERIES = {
    "stats_table_profile": stats_table_profile,
    "events_cms_topk": events_cms_topk,
    "running_customer_totals": running_customer_totals,
    "value_quantile_sketch": value_quantile_sketch,
    "events_trailing_hour": events_trailing_hour,
    "events_transition_matrix": events_transition_matrix,
    "events_retention_cohorts": events_retention_cohorts,
    "pivot_status_by_priority": pivot_status_by_priority,
    "cube_status_priority": cube_status_priority,
    "segment_set_ops": segment_set_ops,
    "customer_value_quartiles": customer_value_quartiles,
    "events_anomaly_mad": events_anomaly_mad,
}

ORACLE = {
    "value_quantile_sketch": f"""
        WITH h AS (
            SELECT event_type, value,
                   ('0x' || substr(md5('0|' || event_id::VARCHAR), 1, 15))::BIGINT AS h
            FROM events
        ),
        s AS (
            SELECT event_type, value FROM (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h, value) AS rk
                FROM h
            ) WHERE rk <= {SKETCH_K}
        ),
        f AS (
            SELECT event_type, COUNT(*) AS n_total,
                   round(quantile_cont(value, 0.5), 6) AS med_exact,
                   round(quantile_cont(value, 0.9), 6) AS p90_exact
            FROM h GROUP BY 1
        ),
        ss AS (
            SELECT event_type, COUNT(*) AS n_sample,
                   round(quantile_cont(value, 0.5), 6) AS med_sketch,
                   round(quantile_cont(value, 0.9), 6) AS p90_sketch
            FROM s GROUP BY 1
        )
        SELECT event_type, n_total, n_sample,
               med_exact, med_sketch, p90_exact, p90_sketch
        FROM f JOIN ss USING (event_type)
        ORDER BY event_type
    """,
    "events_trailing_hour": """
        SELECT user_id, event_id,
               epoch_us(ts) AS ts_us,
               COUNT(*) OVER w AS trail_ct,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                   AS trail_cents
        FROM events
        WHERE user_id % 100 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, event_id
    """,
    "running_customer_totals": """
        SELECT o_custkey AS cust_id, o_orderkey AS order_id,
               row_number() OVER w AS order_seq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS running_total,
               CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS prev_amount
        FROM orders
        WHERE o_custkey % 100 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY cust_id, order_seq
    """,
    "pivot_status_by_priority": """
        SELECT o_orderpriority AS priority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                   AS status_f_ct,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                   AS status_o_ct,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
                   AS status_p_ct
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "cube_status_priority": """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               COUNT(*) AS order_ct,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status NULLS FIRST, priority NULLS FIRST
    """,
    "customer_value_quartiles": """
        WITH r AS (
            SELECT c_nationkey AS nation_id,
                   ntile(4) OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS quartile,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
        )
        SELECT nation_id, quartile, COUNT(*) AS cust_ct,
               CAST(SUM(bal_cents) AS BIGINT) AS bal_cents_total
        FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "segment_set_ops": """
        WITH keys AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        SELECT c_nationkey AS nation_id, COUNT(*) AS cust_ct
        FROM keys JOIN customer USING (c_custkey)
        GROUP BY 1 ORDER BY 1
    """,
}

ORACLE["events_anomaly_mad"] = """
    WITH c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
    ),
    med AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(2 * quantile_cont(c, 0.5) AS BIGINT) AS med2c
        FROM c GROUP BY event_type
    ),
    d AS (
        SELECT c.event_type, ABS(2 * c.c - m.med2c) AS d, m.n, m.med2c
        FROM c JOIN med m ON c.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, CAST(2 * quantile_cont(d, 0.5) AS BIGINT) AS mad4
        FROM d GROUP BY event_type
    )
    SELECT d.event_type, MAX(d.n) AS n, MAX(d.med2c) AS med2c,
           MAX(mad.mad4) AS mad4,
           CAST(SUM(CASE WHEN 2 * d.d > 3 * mad.mad4 THEN 1 ELSE 0 END)
                AS BIGINT) AS outlier_ct
    FROM d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type ORDER BY d.event_type
"""

ORACLE["events_transition_matrix"] = """
    WITH t AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS trans_ct,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_ct
    FROM t WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    ORDER BY from_type, to_type
"""

ORACLE["events_retention_cohorts"] = """
    WITH daily AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    first AS (SELECT user_id, MIN(d) AS cohort_d FROM daily GROUP BY user_id)
    SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort,
           date_diff('day', cohort_d, d) AS day_offset,
           CAST(COUNT(DISTINCT daily.user_id) AS BIGINT) AS active_users
    FROM daily JOIN first ON daily.user_id = first.user_id
    GROUP BY cohort, day_offset
    ORDER BY cohort, day_offset
"""

from gmall_flink_spark.operators.sketch import CMS_D, CMS_W  # noqa: E402

ORACLE["events_cms_topk"] = f"""
    WITH ev AS (SELECT user_id FROM events),
    h AS (
        SELECT user_id, s AS depth,
               ('0x' || substr(md5(s::VARCHAR || '|' || user_id::VARCHAR),
                               1, 15))::BIGINT % {CMS_W} AS bucket
        FROM ev, (SELECT unnest(range({CMS_D})) AS s)
    ),
    counters AS (
        SELECT depth, bucket, CAST(COUNT(*) AS BIGINT) AS ct
        FROM h GROUP BY 1, 2
    ),
    cand AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_ct
        FROM ev GROUP BY 1
        ORDER BY exact_ct DESC, user_id LIMIT {CMS_TOP}
    ),
    lookups AS (
        SELECT c.user_id, c.exact_ct, s AS depth,
               ('0x' || substr(md5(s::VARCHAR || '|' || c.user_id::VARCHAR),
                               1, 15))::BIGINT % {CMS_W} AS bucket
        FROM cand c, (SELECT unnest(range({CMS_D})) AS s)
    )
    SELECT l.user_id, l.exact_ct, CAST(MIN(k.ct) AS BIGINT) AS cms_est
    FROM lookups l JOIN counters k USING (depth, bucket)
    GROUP BY 1, 2
    ORDER BY exact_ct DESC, user_id
"""

ORACLE["stats_table_profile"] = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS row_ct,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ct,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS distinct_ct,
           MIN({c})::VARCHAR AS min_val,
           MAX({c})::VARCHAR AS max_val
    FROM documents
    """
    for c in _PROFILE_COLS
) + "\nORDER BY column_name"
