"""Blocked fuzzy matching (entity resolution).

Exact hamming<=1 pair enumeration over a fixed-length key via wildcard
(deletion-neighborhood) blocking: for every position p allowed to vary,
a row's blocking key is the key string with position p masked out. Two
equal-length strings at hamming distance 1 differ in exactly one position
and therefore share exactly one wildcard key; identical strings share all
of them. The candidate join is a plain equi-join on the wildcard key —
one shuffle — and every bucket is bounded by the alphabet size at the
masked position (10 for digits), so there is no quadratic hot bucket at
any scale: the construction is EXACT, not approximate, unlike
similarity-LSH blocking (llm/dedup.py) which needs a bucket cap.

Reference parity: the reference has no fuzzy join; this extends the
dim-enrichment join family (SURVEY §2.4) with the standard record-linkage
operator a 100 TB entity-dedup pipeline needs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming1_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    positions: Iterable[int],
) -> DataFrame:
    """All pairs (a, b) with ``a_id < b_id`` whose ``key_col`` values are
    equal length and differ in at most one of ``positions`` (1-based),
    verified with the built-in levenshtein. Returns one row per pair:
    (a_id, b_id, a_key, b_key, diff_pos) — ``diff_pos`` is the masked
    position of the bucket that produced the pair (min over buckets for
    identical keys).
    """
    keys = [
        F.struct(
            F.lit(p).alias("pos"),
            F.concat(
                F.expr(f"substring({key_col}, 1, {p - 1})"),
                F.lit("\x00"),
                F.expr(f"substring({key_col}, {p + 1})"),
            ).alias("bkey"),
        )
        for p in positions
    ]
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_key"),
        F.explode(F.array(*keys)).alias("_b"),
    ).select("_id", "_key", F.col("_b.pos").alias("pos"), F.col("_b.bkey").alias("bkey"))
    a = sig.select(
        "pos", "bkey", F.col("_id").alias("a_id"), F.col("_key").alias("a_key")
    )
    b = sig.select(
        "pos", "bkey", F.col("_id").alias("b_id"), F.col("_key").alias("b_key")
    )
    return (
        a.join(b, ["pos", "bkey"])
        .where(F.col("a_id") < F.col("b_id"))
        # a key of length p-1 and one of length p collide on the position-p
        # wildcard (both append nothing past the mask) — the length filter
        # pins the equal-length contract; levenshtein pins hamming<=1
        .where(F.length("a_key") == F.length("b_key"))
        .where(F.levenshtein(F.col("a_key"), F.col("b_key")) <= 1)
        .groupBy("a_id", "b_id")
        .agg(
            F.min("pos").alias("diff_pos"),
            F.first("a_key").alias("a_key"),
            F.first("b_key").alias("b_key"),
        )
        # identical keys (hamming 0) collide in EVERY bucket and differ at
        # no position: diff_pos is NULL, matching the oracle's CASE
        .withColumn(
            "diff_pos",
            F.when(F.col("a_key") != F.col("b_key"), F.col("diff_pos")),
        )
    )
