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
    parse_envelope,
    route_with_config,
    src_filter,
    status_transition,
)
from gmall_flink_spark.operators.dedup import keep_last
from gmall_flink_spark.schemas import CONFIG_ROW
from gmall_flink_spark.sources.cdc_synth import cart_cdc_json, orders_cdc_json, topic_db
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
    env = drop_bootstrap(parse_envelope(cart_cdc_json(spark, sf_dir)))
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


def cdc_cancel_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdCancelOrderDetail shape (app/dwd/DwdCancelOrderDetail.java:65-67):
    cancel transitions (P6, any previous state → '1003') enriched via a
    broadcast dim lookup (J3) and aggregated per segment."""
    env = drop_bootstrap(parse_envelope(orders_cdc_json(spark, sf_dir)))
    cancels = src_filter(env, "order_info").where(
        status_transition("order_status", to="1003")
    )
    cust = table(spark, sf_dir, "customer")
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
        .orderBy("segment")
    )


def cdc_pay_suc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DwdTradePayDetailSuc shape (app/dwd/DwdTradePayDetailSuc.java:68-70):
    exact from-state transition 1002→1005 (P7) with two chained broadcast
    lookups (J3×2, cf. DwdTradeRefundPaySuc.java:104-127)."""
    env = drop_bootstrap(parse_envelope(orders_cdc_json(spark, sf_dir)))
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


def cdc_config_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DimApp/DwdBaseApp config-routing core (J6 broadcast-config join +
    P8 column pruning, app/dim/DimApp.java:94-102): the combined topic_db
    stream routed by (source_table, source_type), row images pruned to the
    config's sink_columns."""
    env = drop_bootstrap(parse_envelope(topic_db(spark, sf_dir)))
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
    env = drop_bootstrap(parse_envelope(cart_cdc_json(spark, sf_dir)))
    cart = src_filter(env, "cart_info", ["insert", "update"]).select(
        d("sku_id").cast("bigint").alias("sku_id"),
        d("id").cast("bigint").alias("id"),
        d("sku_num").cast("bigint").alias("sku_num"),
        F.col("ts"),
    )
    return (
        keep_last(cart, ["sku_id"], ["ts", "id"])
        .select("sku_id", F.col("id").alias("last_id"), F.col("sku_num").alias("last_sku_num"))
        .orderBy("sku_id")
    )


QUERIES = {
    "cdc_cart_add": cdc_cart_add,
    "cdc_cancel_enrich": cdc_cancel_enrich,
    "cdc_pay_suc": cdc_pay_suc,
    "cdc_config_route": cdc_config_route,
    "cdc_sku_last_state": cdc_sku_last_state,
}

# shared exclusions mirroring the synthesizer contract
_CART_OK = "(l_orderkey + l_linenumber) % 13 != 0 AND l_linenumber % 7 != 0"
_ORD_OK = "o_orderkey % 97 != 0 AND o_orderkey % 10 <= 8"

ORACLE = {
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
                   SUM(o_orderkey) AS id_sum
            FROM orders WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 <= 5
            UNION ALL
            SELECT 'dwd_order_update', COUNT(*), 2 * COUNT(*), SUM(o_orderkey)
            FROM orders WHERE o_orderkey % 97 != 0 AND o_orderkey % 10 IN (6, 7)
            UNION ALL
            SELECT 'dwd_cart_add', COUNT(*), 3 * COUNT(*),
                   SUM(l_orderkey * 10 + l_linenumber)
            FROM lineitem WHERE {_CART_OK} AND l_linenumber % 2 = 1
        ) ORDER BY sink_table
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
        QUALIFY row_number() OVER (PARTITION BY sku_id ORDER BY ts DESC, id DESC) = 1
        ORDER BY sku_id
    """,
}
