"""Oracle-checked scale-technique queries: binned range join and salted
two-stage aggregation (operators/range_join.py, operators/skew.py). Both
are result-identical to their naive forms — the oracle checks the naive
form, the Spark plan runs the scalable one."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.operators.range_join import banded, range_join
from gmall_flink_spark.operators.skew import salted_agg
from gmall_flink_spark.sources.tables import table

#: overlapping quantity bands (a point can match several)
BANDS = [(i, i * 5.0, i * 5.0 + 7.0) for i in range(10)]


def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: lineitem quantities vs overlapping bands,
    aggregated per band (equi-bucketed plan, not a cross-product)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bands = banded(spark, BANDS)
    joined = range_join(li, bands, "l_quantity", "lo", "hi", bucket_width=5.0)
    return (
        joined.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("line_ct"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty_sum"),
        )
        .orderBy("band_id")
    )


def salted_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient two-stage aggregation over events per day — identical
    result to the direct groupBy (which is what the oracle runs)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return salted_agg(
        ev,
        ["day"],
        salt_on="event_id",
        n_salts=16,
        partial_aggs=[
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        ],
        final_aggs=[
            F.sum("c").alias("event_ct"),
            F.sum("v").cast("double").alias("value_sum"),
        ],
    ).orderBy("day")


QUERIES = {
    "range_join_bands": range_join_bands,
    "salted_daily_totals": salted_daily_totals,
}

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT {i} AS band_id, {lo} AS lo, {hi} AS hi" for i, lo, hi in BANDS
)

ORACLE = {
    "range_join_bands": f"""
        WITH bands AS ({_BANDS_SQL})
        SELECT band_id,
               COUNT(*) AS line_ct,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
        FROM lineitem JOIN bands
          ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band_id ORDER BY band_id
    """,
    "salted_daily_totals": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               COUNT(*) AS event_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
}
