"""Oracle-checked entity-resolution queries (blocked fuzzy matching).

The Spark side finds candidate pairs with the exact wildcard-blocking
join (operators/fuzzy.py — one equi-join shuffle, alphabet-bounded
buckets); the DuckDB oracle brute-forces the full O(n²) levenshtein join,
so a parity pass proves the blocking is COMPLETE (finds every pair), not
just plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.operators.fuzzy import hamming1_pairs
from gmall_flink_spark.sources.tables import table

#: customer names are 'Customer#%09d' — 9 digit positions, 1-based 10..18
NAME_DIGIT_POSITIONS = range(10, 19)
NAME_LEN = 18


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer pairs whose names differ by at most one character
    (hamming<=1 record linkage), aggregated per differing position:
    pair count and key checksums."""
    from gmall_flink_spark.sources.tables import spread

    # spread: the wildcard-key expansion fuses onto the scan, and the
    # single-row-group test parquet plans that scan as one task
    cust = spread(table(spark, sf_dir, "customer"), "c_custkey").select(
        "c_custkey", "c_name"
    )
    pairs = hamming1_pairs(
        cust, key_col="c_name", id_col="c_custkey", positions=NAME_DIGIT_POSITIONS
    )
    return (
        pairs.groupBy("diff_pos")
        .agg(
            F.count(F.lit(1)).alias("pair_ct"),
            F.sum("a_id").cast("bigint").alias("a_key_sum"),
            F.sum("b_id").cast("bigint").alias("b_key_sum"),
        )
        .orderBy("diff_pos")
    )


QUERIES = {"fuzzy_name_pairs": fuzzy_name_pairs}

# diff_pos for the oracle: first position where the two (equal-length)
# names disagree — generated CASE over every position so a pair differing
# OUTSIDE the blocked digit range would surface as a parity mismatch.
_DIFF_POS = (
    "CASE "
    + " ".join(
        f"WHEN substr(an,{p},1) != substr(bn,{p},1) THEN {p}"
        for p in range(1, NAME_LEN + 1)
    )
    + " END"
)

ORACLE = {
    "fuzzy_name_pairs": f"""
        WITH p AS (
            SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
                   a.c_name AS an, b.c_name AS bn
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
             AND len(a.c_name) = len(b.c_name)
             AND levenshtein(a.c_name, b.c_name) <= 1
        )
        SELECT {_DIFF_POS} AS diff_pos,
               CAST(COUNT(*) AS BIGINT) AS pair_ct,
               CAST(SUM(a_key) AS BIGINT) AS a_key_sum,
               CAST(SUM(b_key) AS BIGINT) AS b_key_sum
        FROM p
        GROUP BY diff_pos
        ORDER BY diff_pos
    """,
}
