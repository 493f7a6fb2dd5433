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


def chunk_spans(n: Column, size: int, stride: int) -> Column:
    """Overlapping token-window spans for document chunking (the
    fixed-context splitting step of RAG/training prep): for a doc of ``n``
    tokens, an ``array<struct<start,len>>`` of windows starting every
    ``stride`` tokens, each ``size`` tokens long (the final windows
    truncate at the doc end). A tail window that covers no tokens beyond
    its predecessor (``start + size - stride >= n``) is dropped — it would
    be a strict subspan — except the first window, which always survives.

    Entirely JVM higher-order functions (sequence/transform/filter) on a
    scalar ``n`` — no explode required for span ACCOUNTING (size/aggregate
    over the array stay map-side); consumers that need one row per chunk
    explode the array and pay that fan-out explicitly."""
    starts = F.sequence(F.lit(0).cast("bigint"), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    spans = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"), F.least(F.lit(size), n - s).alias("len")
        ),
    )
    kept = F.filter(
        spans,
        lambda sp: (sp["start"] == 0) | (sp["start"] + F.lit(size - stride) < n),
    )
    return F.when(n > 0, kept).otherwise(
        F.array().cast("array<struct<start:bigint,len:bigint>>")
    )


def pack_greedy(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tok_col: str,
    budget: int,
) -> DataFrame:
    """Greedy sequence packing: walk each group's docs in ``order_col``
    order, appending to the current bin until adding the next doc would
    exceed ``budget`` tokens, then open a new bin (an oversized doc gets a
    bin of its own). Returns one row per doc:
    ``group_cols + [bin, doc, tok]``.

    Scale posture (100 TB): packing is inherently sequential, so the
    parallel unit is the group key — callers shard the corpus (e.g.
    source x hash-shard) so every group is bounded. Each group's
    (doc, tok) pairs are gathered once (one shuffle) and folded entirely
    JVM-side with a higher-order ``aggregate`` — no Python in the loop, no
    driver-side state, and bins never span shards, which is exactly how a
    multi-writer training-shard packer behaves."""
    def step(acc: Column, x: Column) -> Column:
        overflow = (acc["fill"] + x["tok"]) > budget
        nbin = F.when(overflow, acc["bin"] + 1).otherwise(acc["bin"])
        nfill = F.when(overflow, x["tok"]).otherwise(acc["fill"] + x["tok"])
        entry = F.struct(
            nbin.alias("bin"), x["doc"].alias("doc"), x["tok"].alias("tok")
        )
        return F.struct(
            nfill.alias("fill"),
            nbin.alias("bin"),
            F.concat(acc["out"], F.array(entry)).alias("out"),
        )

    packed = (
        df.select(
            *group_cols,
            F.struct(
                F.col(order_col).cast("bigint").alias("doc"),
                F.col(tok_col).cast("bigint").alias("tok"),
            ).alias("item"),
        )
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("item")).alias("items"))
        .select(
            *group_cols,
            F.aggregate(
                "items",
                F.struct(
                    F.lit(0).cast("bigint").alias("fill"),
                    F.lit(0).cast("bigint").alias("bin"),
                    F.array()
                    .cast("array<struct<bin:bigint,doc:bigint,tok:bigint>>")
                    .alias("out"),
                ),
                step,
            )["out"].alias("packed"),
        )
    )
    return packed.select(*group_cols, F.explode("packed").alias("e")).select(
        *group_cols, "e.bin", "e.doc", "e.tok"
    )

#: 60-bit hash range of functions.text.md5_long — maps h to u in (0, 1)
_HASH_RANGE = float(2**60)


def exp_jump_key(key: Column, weight: Column) -> Column:
    """Efraimidis-Spirakis weighted-sampling key: ``-ln(u) / w`` with
    ``u = (md5_long(key) + 0.5) / 2^60``. Keeping the k SMALLEST keys per
    group draws a weighted sample without replacement (a row's inclusion
    odds scale with ``w``), deterministically — u comes from the portable
    hash, so the draw is seed-free, engine-portable, and mergeable
    (min-k of a union) exactly like the bottom-k uniform sampler.
    Rounded to 9 decimals so cross-engine FP ordering has a stable
    tie-break surface (ties then break on the caller's id column)."""
    u = (md5_long(key.cast("string")) + F.lit(0.5)) / F.lit(_HASH_RANGE)
    return F.round(-F.log(u) / F.greatest(weight.cast("double"), F.lit(1.0)), 9)



#: datasheet-rollup statistic kinds, multiplexed into one state table
#: (single merge + single replay marker per batch, like the NB trainer)
DS_KIND_VOL = "vol"
DS_KIND_LANG = "lang"


def datasheet_partial():
    """Per-micro-batch partial for INCREMENTAL dataset-card maintenance:
    the card's algebraic columns (doc/token volume, quality-score mass,
    language spread) are pure counts and sums, so a streaming corpus
    intake keeps them current through the rollup sink — the card is
    always fresh without rescanning history. Rows are
    (kind, source, lang, doc_ct, token_ct, score_sum): kind='vol'
    carries the per-source volume/quality sums (lang=''), kind='lang'
    one row per (source, lang) whose presence count feeds the distinct-
    language column at read time.

    The NON-algebraic card columns (LM-surprisal mass — classes move
    with global counts — and near-dup membership) stay read-time
    derivations over their own stages; this partial maintains exactly
    the columns that merge associatively, and
    ``datasheet_state_card`` labels the split.

    Use with ``rollup_writer(state, keys=["kind", "source", "lang"],
    agg_fn=datasheet_partial())``."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.functions.text import token_count
    from gmall_flink_spark.queries.text import doc_quality_scores

    def partial(batch_df: DataFrame) -> DataFrame:
        q = doc_quality_scores(batch_df).groupBy("source").agg(
            F.sum("score").alias("score_sum")
        )
        vol = (
            batch_df.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("doc_ct"),
                F.sum(token_count("text").cast("bigint")).alias("token_ct"),
            )
            .join(q, "source", "left")
            .select(
                F.lit(DS_KIND_VOL).alias("kind"),
                "source",
                F.lit("").alias("lang"),
                "doc_ct",
                "token_ct",
                F.coalesce("score_sum", F.lit(0)).alias("score_sum"),
            )
        )
        lang = batch_df.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("doc_ct")
        ).select(
            F.lit(DS_KIND_LANG).alias("kind"),
            "source",
            "lang",
            "doc_ct",
            F.lit(0).cast("bigint").alias("token_ct"),
            F.lit(0).cast("bigint").alias("score_sum"),
        )
        return vol.unionByName(lang)

    return partial


def datasheet_state_card(spark, state_path: str) -> DataFrame:
    """The card's algebraic columns from accumulated rollup state:
    (source, doc_ct, token_ct, lang_ct, score_sum) — bit-equal to the
    corresponding columns of the batch ``corpus_datasheet`` after any
    replay (counts merge associatively; the rollup sink's replay marker
    makes at-least-once delivery exactly-once)."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.sinks._bucketed import read_state

    st = read_state(spark, state_path)
    vol = st.where(F.col("kind") == DS_KIND_VOL).select(
        "source", "doc_ct", "token_ct", "score_sum"
    )
    lang_ct = (
        st.where(F.col("kind") == DS_KIND_LANG)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("lang_ct"))
    )
    return vol.join(lang_ct, "source").select(
        "source", "doc_ct", "token_ct", "lang_ct", "score_sum"
    )
