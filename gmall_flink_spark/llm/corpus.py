"""Corpus-management operators for training-data pipelines: benchmark
decontamination, deterministic sampling, per-group selection, and embedding
normalization/quantization.

Scale posture (100 TB):
  - decontamination: the benchmark/eval set is tiny next to the corpus, so
    its shingle set is a broadcast — the corpus side stays map-only until
    the final per-doc aggregate (one shuffle on doc_id). No all-pairs work.
  - hash sampling: pure map-side predicate on a portable hash — no shuffle,
    no RNG state, reproducible across engines and re-runs (the property
    that matters for dataset versioning).
  - quantization: per-row array math (JVM higher-order functions), exact
    integer surface for cross-engine checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import md5_long
from gmall_flink_spark.llm.dedup import word_shingles


def decontaminate_overlap(
    corpus: DataFrame, benchmark: DataFrame, n: int = 5
) -> DataFrame:
    """Per corpus doc, the count of distinct n-token shingles shared with
    the benchmark set (docs with overlap are contamination suspects).

    ``benchmark`` is expected to be small (an eval set): its distinct
    shingle set is broadcast, so the corpus scan never shuffles until the
    per-doc count. ONE pass over the corpus shingles: left-join the
    broadcast benchmark set and count totals and hits in the same
    aggregation. Returns (doc_id, overlap_ct, shingle_ct), hit docs only."""
    bench_sh = (
        word_shingles(benchmark, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        word_shingles(corpus, n=n)
        .join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("_hit").alias("overlap_ct"),
            F.count(F.lit(1)).alias("shingle_ct"),
        )
        .where(F.col("overlap_ct") > 0)
        .select("doc_id", "overlap_ct", "shingle_ct")
    )


def hash_sample(df: DataFrame, key: Column, pct: int, buckets: int = 100) -> DataFrame:
    """Deterministic ``pct``/``buckets`` sample: keep rows whose portable
    key hash lands in the first ``pct`` buckets. Map-only, seed-free,
    engine-portable — the reproducible alternative to rand()-sampling."""
    return df.where(F.pmod(md5_long(key.cast("string")), F.lit(buckets)) < pct)


def topk_per_group(
    df: DataFrame, group: str, order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group by a deterministic order (window row_number —
    one shuffle on the group key, no global sort)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def quantize_i8_sum(vec: Column, norm: Column) -> Column:
    """Sum of the int8-quantized normalized components
    (round(127 * x / norm) per element) — the integer checksum surface of a
    scalar-quantization pass."""
    return F.aggregate(
        F.transform(vec, lambda x: F.round(F.lit(127.0) * x.cast("double") / norm).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
