"""Extended relational surface: the remaining TPC-H query *shapes* adapted
to the driver testdata star schema (which has no partsupp table and no
commit/receipt dates — each query keeps the plan shape that makes the
original interesting and states the adaptation).

Shapes covered beyond queries/relational.py:
  q2   correlated min over a group (min-cost supplier)    -> agg + self-join
  q7   two-sided dim attribution (supp nation x cust nation)
  q8   market-share ratio of conditional aggregates per year
  q9   profit decomposition per nation-year
  q11  group HAVING against a global scalar aggregate
  q12  dual conditional counts with a derived date predicate
  q13  histogram of per-key outer-join counts (agg of agg)
  q15  argmax against a scalar subquery (top supplier)
  q16  distinct-count with anti-join exclusion list
  q17  correlated average threshold (small-quantity revenue)
  q20  semi-join on an aggregate-derived threshold
  q21  exists/not-exists combo (sole failing supplier)
  q22  anti join + scalar-aggregate threshold (idle rich customers)

All money math follows functions/money.py: cast to DECIMAL(18,2) before
aggregating (exact, shuffle-order-independent), surface as double. Ratio /
threshold comparisons that mix an aggregate with a constant factor do ONE
double operation on exact inputs so both engines agree bit-for-bit.

Scale notes: facts join facts on their keys (shuffle, AQE-skew-safe); every
dim is broadcast; the scalar aggregates (q11/q15/q22) are 1-row broadcasts,
not driver collects; the per-group thresholds (q2/q17/q20) are computed as
aggregate frames joined back on the group key — the distributed form of the
correlated subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.money import dec
from gmall_flink_spark.sources.tables import table

def _rev() -> F.Column:
    one = F.lit(1).cast("decimal(18,2)")
    return dec("l_extendedprice") * (one - dec("l_discount"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape (correlated MIN): for each EUROPE-supplied STANDARD
    size-15 part, the supplier(s) with the minimum account balance among
    suppliers that have actually shipped it (lineitem stands in for
    partsupp). Correlation is expressed as a per-part min aggregate joined
    back on the part key — the shuffle-friendly form."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    supplied = (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), pairs.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    min_bal = supplied.groupBy(F.col("p_partkey").alias("mb_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        supplied.join(
            min_bal,
            (supplied.p_partkey == min_bal.mb_partkey)
            & (supplied.s_acctbal == min_bal.min_bal),
        )
        .select(
            F.col("s_acctbal").alias("supp_acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
            F.col("p_partkey").alias("part_id"),
            F.col("p_name").alias("part_name"),
        )
        .orderBy(F.desc("supp_acctbal"), "supp_nation", "supp_name", "part_id")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: shipping volume between two nations per year, both
    directions (supplier nation x customer nation cross-attribution)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("ship_year")
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"), F.count(F.lit(1)).alias("line_ct"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: NATION_3 suppliers' share of revenue to ASIA
    customers per order year — a ratio of a conditional aggregate over the
    total (one double division on exact decimal sums)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    nation_c = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev()
    target = F.when(F.col("supp_nation") == "NATION_3", rev)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation_s), sup.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.sum(target).cast("double").alias("target_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "mkt_share",
            F.round(
                F.coalesce(F.col("target_revenue"), F.lit(0.0)) / F.col("total_revenue"), 6
            ),
        )
        .orderBy("order_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit per supplier-nation per year on parts named
    '%red%'. No partsupp -> supply cost modeled as 50% of retail value;
    rev and cost are exact decimal sums, combined with ONE double op."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    # qty * retailprice is an exact 2-decimal value (qty integral): the
    # double product rounds back to it exactly under a 2-decimal cast
    cost = (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.sum(_rev()).cast("double").alias("gross_revenue"),
            F.sum(cost).cast("double").alias("retail_value"),
            F.count(F.lit(1)).alias("line_ct"),
        )
        .withColumn(
            "profit", F.round(F.col("gross_revenue") - 0.5 * F.col("retail_value"), 2)
        )
        .orderBy("supp_nation", "order_year")
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: parts whose shipped value exceeds a fraction of the
    global shipped value — group HAVING vs a scalar aggregate (1-row
    broadcast, not a driver collect)."""
    li = table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(F.sum(dec("l_extendedprice")).alias("val"))
    total = val.agg(F.sum("val").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > 0.0002 * F.col("total").cast("double"))
        .select(
            F.col("l_partkey").alias("part_id"),
            F.col("val").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "part_id")
    )


def q12_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (no commitdate -> derived delay): lines shipped >60
    days after order date, split into high/low priority counts per
    linestatus — dual CASE-WHEN conditional counts."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    late = F.datediff("l_shipdate", "o_orderdate") > 60
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("bigint")).alias("high_ct"),
            F.sum((~high).cast("bigint")).alias("low_ct"),
        )
        .orderBy("l_linestatus")
    )


def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: distribution of customers by their count of
    non-urgent orders — outer join, per-key count, then a histogram of the
    counts (aggregate of an aggregate; customers with none count as 0)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_ct"))
    )
    return (
        per_cust.groupBy("order_ct")
        .agg(F.count(F.lit(1)).alias("cust_ct"))
        .orderBy(F.desc("cust_ct"), F.desc("order_ct"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: supplier(s) achieving the maximum revenue over one
    year — argmax against a scalar subquery; equality compares exact
    decimals, so ties surface deterministically."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    sup = table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    mx = per_supp.agg(F.max("total_rev").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            F.col("l_suppkey").alias("supp_id"),
            F.col("s_name").alias("supp_name"),
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("supp_id")
    )


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct suppliers per (brand, type, size) over
    shipped part-supplier pairs, excluding Brand#1 and an exclusion list of
    suppliers (negative balance, the 'complaints' stand-in) via anti join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 10, 15, 20))
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type", "size")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: revenue from Brand#3 lines whose quantity is below
    20% of that part's average — the correlated average as a per-part
    aggregate joined back; the threshold compare is exact integer/decimal
    arithmetic (5*n*qty < sum_qty), no FP boundary."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    stats = branded.groupBy(F.col("l_partkey").alias("st_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")
    )
    return (
        branded.join(stats, branded.l_partkey == stats.st_partkey)
        .where(dec("l_quantity") * F.col("n_lines") * 5 < F.col("sum_qty"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("line_ct"),
        )
    )


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers that shipped more than 25% of some
    '%red%' part's 1997 volume — semi join on an aggregate-derived
    threshold, then dim enrichment."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    part = table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    red = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_pair = red.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("pair_qty")
    )
    per_part = red.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(dec("l_quantity")).alias("part_qty")
    )
    heavy = (
        per_pair.join(per_part, per_pair.l_partkey == per_part.pt_partkey)
        .where(
            F.col("pair_qty").cast("double") > 0.25 * F.col("part_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        heavy.join(F.broadcast(sup), heavy.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_suppkey").alias("supp_id"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
        )
        .orderBy("supp_id")
    )


def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (EXISTS + NOT EXISTS): suppliers who were the ONLY
    supplier with a returned line on a multi-supplier finished order —
    expressed as per-order distinct-supplier aggregates joined back (the
    distributed form of the double correlated subquery)."""
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    f_lines = li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
    ord_stats = f_lines.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "nsupp_r"
        ),
    )
    r_pairs = (
        f_lines.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        r_pairs.join(ord_stats, r_pairs.l_orderkey == ord_stats.os_orderkey)
        .where((F.col("nsupp") > 1) & (F.col("nsupp_r") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(F.col("s_name").alias("supp_name"), "numwait")
        .orderBy(F.desc("numwait"), "supp_name")
        .limit(20)
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: customers with above-average positive balance and
    no recent (>=1999) orders, per nation. The average threshold is exact
    integer math on cents (bal_cents * n_pos > sum_pos_cents), the
    no-orders test an anti join, the global stats a 1-row broadcast."""
    cust = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    stats = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_pos_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .crossJoin(F.broadcast(stats))
        .where(cents * F.col("n_pos") > F.col("sum_pos_cents"))
        .groupBy(F.col("c_nationkey").alias("nation_id"))
        .agg(
            F.count(F.lit(1)).alias("cust_ct"),
            F.sum(cents).alias("acctbal_cents"),
        )
        .orderBy("nation_id")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_ship_delay_buckets": q12_ship_delay_buckets,
    "q13_order_count_histogram": q13_order_count_histogram,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count_by_part": q16_supplier_count_by_part,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_sole_failing_supplier": q21_sole_failing_supplier,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

_DISC = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)

ORACLE = {
    "q2_min_cost_supplier": """
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        supplied AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name
            FROM pairs
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        )
        SELECT s_acctbal AS supp_acctbal, s_name AS supp_name,
               n_name AS supp_nation, p_partkey AS part_id, p_name AS part_name
        FROM supplied s
        WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM supplied m
                           WHERE m.p_partkey = s.p_partkey)
        ORDER BY supp_acctbal DESC, supp_nation, supp_name, part_id
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS ship_year,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue,
               COUNT(*) AS line_ct
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q8_market_share": f"""
        SELECT EXTRACT(year FROM o_orderdate) AS order_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_DISC} END) AS DOUBLE)
                   AS target_revenue,
               CAST(SUM({_DISC}) AS DOUBLE) AS total_revenue,
               round(coalesce(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_DISC} END) AS DOUBLE), 0.0)
                     / CAST(SUM({_DISC}) AS DOUBLE), 6) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1 ORDER BY 1
    """,
    "q9_product_profit": f"""
        SELECT n_name AS supp_nation,
               EXTRACT(year FROM o_orderdate) AS order_year,
               CAST(SUM({_DISC}) AS DOUBLE) AS gross_revenue,
               CAST(SUM(CAST(l_quantity * p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS retail_value,
               COUNT(*) AS line_ct,
               round(CAST(SUM({_DISC}) AS DOUBLE)
                     - 0.5 * CAST(SUM(CAST(l_quantity * p_retailprice AS DECIMAL(18,2))) AS DOUBLE),
                     2) AS profit
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q11_important_parts": """
        WITH val AS (
            SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
            FROM lineitem GROUP BY 1
        )
        SELECT l_partkey AS part_id, CAST(val AS DOUBLE) AS part_value
        FROM val
        WHERE CAST(val AS DOUBLE) >
              0.0002 * (SELECT CAST(SUM(val) AS DOUBLE) FROM val)
        ORDER BY part_value DESC, part_id
    """,
    "q12_ship_delay_buckets": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_ct,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_ct
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE datediff('day', o_orderdate, l_shipdate) > 60
        GROUP BY 1 ORDER BY 1
    """,
    "q13_order_count_histogram": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS order_ct
            FROM customer
            LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
              ON c_custkey = o_custkey
            GROUP BY 1
        )
        SELECT order_ct, COUNT(*) AS cust_ct
        FROM per_cust GROUP BY 1
        ORDER BY cust_ct DESC, order_ct DESC
    """,
    "q15_top_supplier": f"""
        WITH per_supp AS (
            SELECT l_suppkey, SUM({_DISC}) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1
        )
        SELECT l_suppkey AS supp_id, s_name AS supp_name,
               CAST(total_rev AS DOUBLE) AS total_revenue
        FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM per_supp)
        ORDER BY supp_id
    """,
    "q16_supplier_count_by_part": """
        SELECT p_brand AS brand, p_type AS type, p_size AS size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, brand, type, size
    """,
    "q17_small_quantity_revenue": """
        WITH branded AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        ),
        stats AS (
            SELECT l_partkey AS st_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   COUNT(*) AS n_lines
            FROM branded GROUP BY 1
        )
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
                   AS avg_yearly,
               COUNT(*) AS line_ct
        FROM branded JOIN stats ON l_partkey = st_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * n_lines * 5 < sum_qty
    """,
    "q20_excess_shippers": """
        WITH red AS (
            SELECT l_partkey, l_suppkey, l_quantity
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        ),
        per_pair AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty
            FROM red GROUP BY 1, 2
        ),
        per_part AS (
            SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty
            FROM red GROUP BY 1
        ),
        heavy AS (
            SELECT DISTINCT pp.l_suppkey
            FROM per_pair pp JOIN per_part pt ON pp.l_partkey = pt.l_partkey
            WHERE CAST(pair_qty AS DOUBLE) > 0.25 * CAST(part_qty AS DOUBLE)
        )
        SELECT s_suppkey AS supp_id, s_name AS supp_name, n_name AS supp_nation
        FROM heavy
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        ORDER BY supp_id
    """,
    "q21_sole_failing_supplier": """
        WITH f_lines AS (
            SELECT l_orderkey, l_suppkey, l_returnflag
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        ord_stats AS (
            SELECT l_orderkey AS os_orderkey,
                   COUNT(DISTINCT l_suppkey) AS nsupp,
                   COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
                       AS nsupp_r
            FROM f_lines GROUP BY 1
        ),
        r_pairs AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM f_lines WHERE l_returnflag = 'R'
        )
        SELECT s_name AS supp_name, COUNT(*) AS numwait
        FROM r_pairs
        JOIN ord_stats ON l_orderkey = os_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE nsupp > 1 AND nsupp_r = 1
        GROUP BY 1
        ORDER BY numwait DESC, supp_name
        LIMIT 20
    """,
    "q22_idle_rich_customers": """
        WITH stats AS (
            SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS sum_pos_cents,
                   COUNT(*) AS n_pos
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey AS nation_id, COUNT(*) AS cust_ct,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS acctbal_cents
        FROM customer, stats
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
          AND CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos_cents
        GROUP BY 1 ORDER BY 1
    """,
}
