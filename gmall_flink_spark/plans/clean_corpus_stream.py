"""Streaming clean-corpus ingest: the foreachBatch composition of the
corpus pipeline (quality filter → benchmark decontamination → cross-batch
exact dedup) — the continuous form of queries/llm_pipeline.llm_clean_corpus.

Per micro-batch:
  1. Gopher-rule quality flags drop low-quality docs (stateless, map-side).
  2. Decontamination against the benchmark shingle set (computed once and
     broadcast into every batch join — at scale a static eval set, not a
     stream), in one of two modes: DOC-LEVEL (default — docs sharing a
     5-gram with the benchmark drop) or SPAN-LEVEL (``scrub_spans=True``
     — hit docs are kept with the covered token positions cut from their
     carried mass; the shared covered_positions kernel).
  3. Survivors pass the bucketed seen-fingerprint sink (sinks/dedup_sink):
     the FIRST arrival of each fingerprint is kept forever, later
     duplicates drop — including duplicates of docs that arrived in earlier
     batches (state the within-watermark dedup operators cannot keep).

The kept-corpus state is the pipeline's output table; streaming-equals-
batch is pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import fingerprint, gopher_keep, tokenize
from gmall_flink_spark.llm.dedup import word_shingles
from gmall_flink_spark.sinks.dedup_sink import dedup_append


def quality_keep(docs: DataFrame) -> DataFrame:
    """The Gopher-rule keep predicate (functions/text.gopher_keep — one
    Python source of the thresholds), as a stateless filter."""
    toked = docs.withColumn("toks", tokenize("text"))
    return toked.where(gopher_keep(F.col("toks"), "text")).drop("toks")


def clean_corpus_writer(
    state_path: str,
    bench_shingles: DataFrame,
    n_buckets: int = 16,
    totals_path: str | None = None,
    exclude_bench: bool = True,
    scrub_spans: bool = False,
):
    """foreachBatch: filter, decontaminate against the broadcast benchmark
    shingle set, then cross-batch dedup-append on the 8-token-prefix
    fingerprint (first doc_id wins). Survivors carry their token count so
    downstream governance (the epoch card) reads mass, not just
    membership.

    ``scrub_spans`` (VERDICT r12 task 4) switches decontamination from
    DOC-LEVEL drop to the SPAN-LEVEL scrub (the GPT-3 appendix-C rule the
    batch llm_decontaminate_scrub reports): hit documents are KEPT, with
    exactly the token positions covered by a benchmark-matching
    NGRAM_N-gram removed from their carried token mass — the arithmetic
    is the shared queries/llm_pipeline.covered_positions kernel, the
    shingle dictionary broadcast per batch. Dedup identity stays the RAW
    text fingerprint (scrubbing changes a doc's mass, not which doc it
    is), so the keep set is unchanged; only ``tok`` reflects the scrub.
    Stream == batch is pinned by
    test_streaming_span_scrub_equals_batch_scrub.

    ``totals_path`` (optional) additionally maintains the per-source RAW
    ingest counts through the rollup sink — the denominator the epoch
    card needs. Write order is crash-safe: the idempotent dedup merge
    first, the marker-guarded rollup second, so a crash between them
    replays the merge harmlessly and the counts land exactly once.

    ``exclude_bench`` (default on) drops benchmark-slice docs
    (doc_id % BENCH_MOD == 0 — the batch twin's split rule) from BOTH the
    kept path and the totals denominator INSIDE the writer, so
    ``corpus_build_card`` equals the batch ``llm_corpus_build`` by
    construction even when the ingest stream carries raw documents
    (ADVICE r10 #4: previously the bench exclusion was an implicit
    precondition of the test fixture, and a raw feed inflated total_ct
    relative to the batch twin). Turn it off only when the feed is
    already bench-free AND the id space does not follow the modulo
    convention."""
    from gmall_flink_spark.queries.llm_pipeline import BENCH_MOD, NGRAM_N

    bench = bench_shingles.select("shingle").distinct()
    totals_w = None
    if totals_path is not None:
        from gmall_flink_spark.sinks.rollup import rollup_writer

        totals_w = rollup_writer(
            totals_path,
            ["source"],
            lambda df: df.groupBy("source").agg(
                F.count(F.lit(1)).cast("bigint").alias("total_ct")
            ),
            n_buckets,
        )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if exclude_bench:
            batch_df = batch_df.where(F.col("doc_id") % BENCH_MOD != 0)
        q = quality_keep(batch_df)
        if scrub_spans:
            from gmall_flink_spark.functions.text import fingerprint_from_tokens
            from gmall_flink_spark.queries.llm_pipeline import covered_positions

            toked = q.select("doc_id", "source", tokenize("text").alias("toks"))
            cut = (
                covered_positions(toked, bench)
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cut"))
            )
            survivors = toked.join(cut, "doc_id", "left").select(
                "doc_id",
                "source",
                # same bytes as fingerprint("text", 8), computed off the
                # toks column already in hand — no second tokenize pass
                fingerprint_from_tokens("toks", prefix_tokens=8).alias("fp"),
                (F.size("toks") - F.coalesce("cut", F.lit(0)))
                .cast("bigint")
                .alias("tok"),
            )
        else:
            hits = (
                # n=NGRAM_N, never a literal: the doc-level batch twin
                # (llm_decontaminate) keys off the same constant
                word_shingles(q, n=NGRAM_N)
                .join(F.broadcast(bench), "shingle")
                .select("doc_id")
                .distinct()
            )
            survivors = q.join(hits, "doc_id", "left_anti").select(
                "doc_id",
                "source",
                fingerprint("text", prefix_tokens=8).alias("fp"),
                F.size(tokenize("text")).cast("bigint").alias("tok"),
            )
        dedup_append(state_path, survivors, "fp", ["doc_id"], n_buckets)
        if totals_w is not None:
            totals_w(batch_df, batch_id)

    return write


def corpus_build_card(spark, state_path: str, totals_path: str) -> DataFrame:
    """The STREAMING epoch sign-off: the same per-source report
    llm_corpus_build computes in batch, derived at read time from the
    continuously-maintained ingest states — kept membership/mass from the
    cross-batch dedup state, raw volume from the totals rollup, the
    temperature-mix arithmetic from the ONE shared tail
    (queries/llm_pipeline.corpus_mix_report). Governance stays fresh per
    micro-batch with zero rescans of history; stream == batch is pinned
    by test_streaming_corpus_build_card_equals_batch."""
    from gmall_flink_spark.functions.text import md5_long
    from gmall_flink_spark.queries.datasel import N_SHARDS, SHARD_CK_MOD
    from gmall_flink_spark.queries.llm_pipeline import corpus_mix_report
    from gmall_flink_spark.sinks.dedup_sink import read_state as read_kept
    from gmall_flink_spark.sinks.rollup import read_state as read_totals

    kept = (
        read_kept(spark, state_path)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_ct"),
            F.sum("tok").alias("kept_tok"),
            F.countDistinct(
                F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(N_SHARDS))
            ).alias("shard_spread"),
            F.sum(F.col("doc_id") % SHARD_CK_MOD).alias("kept_id_ck"),
        )
    )
    totals = read_totals(spark, totals_path).select("source", "total_ct")
    stats = totals.join(kept, "source", "left").select(
        "source",
        "total_ct",
        F.coalesce("kept_ct", F.lit(0)).alias("kept_ct"),
        F.coalesce("kept_tok", F.lit(0)).alias("kept_tok"),
        F.coalesce("shard_spread", F.lit(0)).alias("shard_spread"),
        F.coalesce("kept_id_ck", F.lit(0)).alias("kept_id_ck"),
    )
    return corpus_mix_report(stats).orderBy("source")
