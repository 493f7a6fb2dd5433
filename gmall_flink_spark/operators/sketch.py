"""Deterministic distinct-count sketches (KMV / k-minimum-values).

The sketch hash is the portable md5_long shifted to 48 bits so the
estimator numerator (k-1)*M fits int64 and the whole estimate is ONE exact
integer division — reproducible across engines, which is what lets the
approximate op pass the DuckDB hash gate (queries/dedup.py::uv_daily_kmv)
AND lets the streaming sink's merged state agree exactly with the batch
query (sinks/kmv_sink.py).

KMV is mergeable by construction: the k smallest hashes of a union are a
subset of the union of each side's k smallest — per-batch state is k
values per group, never the key set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import md5_long

KMV_K = 64
KMV_M = 1 << 48


def kmv_hash(key: Column) -> Column:
    """48-bit portable sketch hash of a key column."""
    return F.shiftright(md5_long(key.cast("string")), 12)


def kmv_estimate(n_col: str, hk_col: str) -> Column:
    """Distinct-count estimate from a group's stored sketch: exact while the
    group holds fewer than k hashes, else (k-1)*M div h_k (h_k = k-th
    smallest). Pure integer arithmetic end-to-end (`div`, never `/`).
    Takes column NAMES because SQL `div` is only reachable via expr."""
    return (
        F.when(F.col(n_col) < KMV_K, F.col(n_col))
        .otherwise(F.expr(f"{(KMV_K - 1) * KMV_M}L div greatest({hk_col}, 1L)"))
        .cast("bigint")
    )


# ------------------------------------------------------------- count-min

#: count-min geometry: 4 independent rows x 64 buckets. Depth drives the
#: failure probability (~e^-d), width the overestimate (~2n/w); both are
#: knobs, and the whole sketch is d*w int64 counters regardless of key
#: cardinality.
CMS_D = 4
CMS_W = 64


def cms_bucket(key: Column, depth: int) -> Column:
    """Row-``depth`` bucket of a key: the seeded portable hash mod W —
    deterministic, so the sketch (unlike count-min over runtime-seeded
    hashes) is reproducible cross-engine and oracle-checkable."""
    return F.pmod(md5_long(key.cast("string"), depth), F.lit(CMS_W))


def cms_counters(df, key: str):
    """Build the count-min counter table (depth, bucket, ct) for a key
    column: one posexplode to (row, bucket) pairs, ONE groupBy over d*w
    cells — the extreme map-side-combine case (every partition reduces to
    <= d*w partial rows before the shuffle). Counters are additive and
    mergeable: summing two tables' cells sketches the concatenated input,
    which is what makes the sketch a rollup_writer payload per micro-batch
    (tests pin streaming == batch)."""
    buckets = F.array(*[cms_bucket(F.col(key), s) for s in range(CMS_D)])
    return (
        df.select(F.posexplode(buckets).alias("depth", "bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )


# ----------------------------------------------------------------- bloom

#: bloom geometry: m bits x k hash functions. With n distinct keys the
#: false-positive rate is ~(1 - e^(-k*n/m))^k; m = 2^14, k = 4 reads
#: ~2.4% at n = m/8. m bounds the STATE (<= m distinct positions — always
#: broadcastable) no matter the corpus size, which is the whole point of
#: a dedup pre-filter.
BLOOM_M = 1 << 14
BLOOM_K = 4

#: the affine family modulus shared with minhash (prime > m*k, keeps every
#: product far inside int64)
_BLOOM_P = 1_000_000_007


def bloom_positions(key: Column, k: int = BLOOM_K, m: int = BLOOM_M) -> Column:
    """The k bloom bit positions of a key, via the SAME portable affine
    family minhash uses (h_s(x) = ((2s+1)·md5(x) + s² + 7) mod P, then
    mod m) — one md5 per key feeds all k positions, and every position is
    reproducible in DuckDB, so bloom membership verdicts are
    oracle-checkable like every other sketch here."""
    base = md5_long(key.cast("string"))
    return F.array(
        *[
            F.pmod(
                F.pmod((2 * s + 1) * base + F.lit(s * s + 7), F.lit(_BLOOM_P)),
                F.lit(m),
            ).cast("bigint")
            for s in range(k)
        ]
    )


def bloom_build(df, key: str, k: int = BLOOM_K, m: int = BLOOM_M):
    """The bloom SET as a relation: the distinct bit positions lit by the
    key column — at most m rows regardless of input size, mergeable by
    plain union+distinct (bitwise OR in relational form), which makes it
    both broadcastable at probe time and a rollup-sink payload per
    micro-batch."""
    return (
        df.select(F.explode(bloom_positions(F.col(key), k, m)).alias("pos"))
        .distinct()
    )


def bloom_probe(df, key: str, bloom, k: int = BLOOM_K, m: int = BLOOM_M):
    """Per-KEY bloom verdicts: one row per distinct key value of ``df``
    with ``maybe_dup`` = 1 iff ALL k positions are lit (the classic
    no-false-negative contract — an inserted key always reads 1; a 1 on
    an uninserted key is the measured false positive). The bloom side is
    <= m rows, so the probe is a broadcast join against the exploded
    positions followed by a per-key hit count; callers join the verdict
    back on the key column when they need row grain."""
    exploded = (
        df.select(key)
        .distinct()
        .select(key, F.explode(bloom_positions(F.col(key), k, m)).alias("pos"))
    )
    # LEFT join keeps all k position rows per key, so one aggregate both
    # counts the lit positions (non-null marker) and retains zero-hit keys
    # — a single consumer of the distinct-keys stage (an inner join +
    # join-back would make Catalyst compute the distinct twice)
    return (
        exploded.join(F.broadcast(bloom.withColumn("__lit", F.lit(1))), "pos", "left")
        .groupBy(key)
        .agg((F.count("__lit") == k).cast("int").alias("maybe_dup"))
    )
