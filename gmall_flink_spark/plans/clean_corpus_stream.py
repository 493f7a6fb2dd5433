"""Streaming clean-corpus ingest: the foreachBatch composition of the
corpus pipeline (quality filter → benchmark decontamination → cross-batch
exact dedup) — the continuous form of queries/llm_pipeline.llm_clean_corpus.

Per micro-batch:
  1. Gopher-rule quality flags drop low-quality docs (stateless, map-side).
  2. Docs sharing a 5-gram with the benchmark set drop (the benchmark
     shingle frame is computed once and broadcast into every batch join —
     at scale a static eval set, not a stream).
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


def clean_corpus_writer(state_path: str, bench_shingles: DataFrame, n_buckets: int = 16):
    """foreachBatch: filter, decontaminate against the broadcast benchmark
    shingle set, then cross-batch dedup-append on the 8-token-prefix
    fingerprint (first doc_id wins)."""
    bench = bench_shingles.select("shingle").distinct()

    def write(batch_df: DataFrame, batch_id: int) -> None:
        q = quality_keep(batch_df)
        hits = (
            word_shingles(q, n=5)
            .join(F.broadcast(bench), "shingle")
            .select("doc_id")
            .distinct()
        )
        survivors = q.join(hits, "doc_id", "left_anti").select(
            "doc_id", "source", fingerprint("text", prefix_tokens=8).alias("fp")
        )
        dedup_append(state_path, survivors, "fp", ["doc_id"], n_buckets)

    return write
