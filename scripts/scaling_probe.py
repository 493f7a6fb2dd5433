#!/usr/bin/env python3
"""Empirical scaling probe: run representative registry queries against a
K-times-replicated input (each table becomes a directory of K symlinks to
the sf0.1 parquet — the engine sees K x the rows through the same code
path) and report time ratios. A family whose ratio grows ~linearly (or
better, sublinearly per-row) survives scale-up; a super-linear ratio is a
cliff to investigate. Results recorded in SCALE.md.

Usage: python scripts/scaling_probe.py [K] (default 5; needs a quiet host)

``--distinct`` switches documents replication from symlinks to an
ID-DISTINCT materialized corpus (VERDICT r06 #2 / r07 #6): replica i
remaps doc_id by +i*stride and salts every token with the replica tag, so
replicas share no ids and no shingles. Symlink replication is
dedup-ADVERSARIAL for the pair-graph family — every copy of a doc is an
exact dup of K-1 others and each (doc_id, token) unit row multiplies, so
verify volume grows ~K² without the corpus actually growing; the
id-distinct mode measures those queries under real corpus growth (K
independent corpora of identical shape: dup families scale in count, not
in size). Only the pair-graph probes run in this mode.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
#: dims stay 1x (at scale dims grow far slower than facts; replicating
#: customer K x would also break PK semantics for join results)
FACTS = {"lineitem", "orders", "events", "documents", "embeddings"}

PROBES = [
    "q1_pricing_summary",       # scan + agg
    "q5_region_revenue",        # snowflake join + agg
    "q18_large_orders",         # join + group-having + topk
    "window_event_counts",      # event-time tumble agg
    "dedup_keep_first",         # keyed window dedup
    "text_quality",             # tokenizer + per-doc scoring
    "minhash_band_buckets",     # shingle -> signature -> bands
    "llm_pack_sequences",       # grouped JVM fold
    "events_burst_alert",       # keyed lag window
    "text_winnow_fingerprint",  # map-only gram hashing + winnow selection
    "winnow_match_pairs",       # df-capped fingerprint self-join
    "value_quantile_sketch",    # bottom-k sample vs exact per-key quantiles
    "llm_token_budget",         # two-pass bucket-granular budget cut
    "embed_srp_near_dup",       # SRP signatures + band-bucket join (NB:
                                #   replication is LSH-adversarial — every
                                #   copy collides, so buckets grow Kx)
    "events_transition_matrix", # keyed lead() + tiny matrix agg
    "events_retention_cohorts", # distinct (user, day) + cohort triangle
    "text_pii_scrub",           # map-only regexp detect/redact
    "llm_weighted_sample",      # per-stratum min-k weighted keys
    "dedup_rep_select",         # shared CC mapping + component argmax
    "llm_vocab_topk",           # token-key agg + TakeOrdered cut
    "llm_chunk_split",          # per-doc span arrays, no explode
    "llm_bpe_pairs",            # bigram zip_with + pair-key agg + TakeOrdered
    "text_boilerplate",         # shingle df build + dictionary-hit join
    "dedup_simhash_pairs",      # capped band-bucket self-join + xor verify
    "media_phash_pairs",        # Arrow phash kernel + shared banding
    "events_cms_topk",          # count-min cells (extreme map-side combine)
    "llm_bpe_merge_round",      # 1-row pair broadcast + match-island window
    "uv_rolling7_kmv",          # per-day min-k sketches + days-table window
    "stats_table_profile",      # one-pass profile (Expand x k distincts)
    "dedup_cross_source",       # exact sampled pair graph + source matrix
    "sim_pq_topk",              # PQ train + code scan x broadcast ADC LUT
                                #   (NB: replicated vec_ids collapse in the
                                #   (vec_id, sub) argmin, so codebooks and
                                #   results match 1x; input rows still Kx)
    # round 6 additions
    "sim_filtered_topk",        # label-sharded (multi-tenant) exact search
    "embed_semdedup_drops",     # shared cluster-blocked pair scan + ledger
    "dedup_allpairs_exact",     # sampled exact prefix-filter graph (NB:
                                #   replication duplicates (doc_id, token)
                                #   unit rows, inflating set sizes — cost
                                #   signal only, not meaningful jaccard)
    "text_bigram_lm_score",     # bigram conditional-surprisal histogram
    "split_leakage_audit",      # sampled exact graph x hash splits (NB:
                                #   replication inflates unit-set sizes Kx,
                                #   so verify volume ~Kx² — cost signal
                                #   only; see SCALE.md r06 rows)
    "llm_split_by_cluster",     # + memoized CC over the same graph
    # round 9 addition
    "substr_dup_spans",         # W-gram inversion + interval merge (NB:
                                #   replication duplicates every gram, so
                                #   ALL positions mark duplicated — cost
                                #   signal only; id-distinct mode measures
                                #   real growth)
    # round 9 continuation
    "web_domain_pagerank",      # link-graph build + 5 broadcast-rank rounds
                                #   (node universe fixed: Kx edges, same graph)
    "llm_dsir_weights",         # bucket aggs + broadcast lambda + doc agg
    "llm_shard_manifest",       # shard shuffle + per-shard window sort
    # round 9 continuation 2
    "nb_lang_confusion",        # NB train (ckpt'd counts) + token-join score
    "ccnet_ppl_buckets",        # bigram scores + per-source ntile window
    "sim_hard_negatives_ivf",   # IVF assignment + probed triplet ranking
    "llm_temperature_mix",      # source agg + integer-sqrt mixture
]


#: pair-graph probes whose symlink-replication ratios are cost signals
#: only (see PROBES annotations) — the id-distinct mode measures these
DISTINCT_PROBES = [
    "dedup_allpairs_exact",
    "split_leakage_audit",
    "llm_split_by_cluster",
    "dedup_cross_source",
    "minhash_band_buckets",
    "substr_dup_spans",
    "llm_bpe_train",             # salted tokens grow the pair vocabulary Kx
    "llm_dsir_weights",          # salted tokens: same 64-bucket model, Kx scan
]


def build_scaled_dir(base: str, k: int) -> str:
    root = f"/tmp/gmall_scale_x{k}"
    if os.path.exists(root):
        shutil.rmtree(root)
    for t in TABLES:
        d = os.path.join(root, f"{t}.parquet")
        os.makedirs(d)
        copies = k if t in FACTS else 1
        for i in range(copies):
            os.symlink(os.path.join(base, f"{t}.parquet"), os.path.join(d, f"copy-{i}.parquet"))
    return root


def build_distinct_documents(spark, root: str, base: str, k: int) -> None:
    """Replace the symlinked documents replication under ``root`` with K
    id-distinct, token-salted replicas (replica 0 = the original corpus
    verbatim). doc_id stride is a multiple of 4 so the deterministic
    1-in-AUDIT_MOD sample keeps the same density in every replica."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    stride = ((int(max_id) // 4) + 1) * 4

    def replica(i: int):
        if i == 0:
            return docs
        salted = F.array_join(
            F.transform(
                F.split("text", " "),
                # empty tokens stay empty: the tokenizers drop them, and
                # salting one into existence would add phantom shingles
                lambda t: F.when(t == "", t).otherwise(
                    F.concat(t, F.lit(f"~r{i}"))
                ),
            ),
            " ",
        )
        return docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride)).withColumn(
            "text", salted
        )

    out = replica(0)
    for i in range(1, k):
        out = out.unionAll(replica(i))
    d = os.path.join(root, "documents.parquet")
    shutil.rmtree(d)
    out.repartition(16).write.parquet(d)


def build_distinct_facts(spark, root: str, base: str, k: int) -> None:
    """Replace the symlinked orders / lineitem / events replication under
    ``root`` with K ID-DISTINCT replicas (replica 0 = the originals
    verbatim): o_orderkey and l_orderkey shift by the SAME stride (their
    join survives per replica), event_id and user_id shift by their own
    strides. Dim FKs (o_custkey, l_partkey, l_suppkey) stay — dims remain
    1x, so dim joins keep their selectivity. Symlink replication keeps
    duplicate keys, so every fact-fact equi-join fans out xK per matched
    pair (output xK^2 per join edge — the cdc_order_detail_wide x42.5
    artifact); id-distinct replication is what a true sfK generator
    produces, and it also grows the KEY space of user-keyed state xK."""
    from pyspark.sql import functions as F

    def stride_of(df, col):
        m = df.agg(F.max(col)).collect()[0][0]
        return ((int(m) // 4) + 1) * 4

    orders = spark.read.parquet(os.path.join(base, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(base, "lineitem.parquet"))
    events = spark.read.parquet(os.path.join(base, "events.parquet"))
    o_stride = max(stride_of(orders, "o_orderkey"), stride_of(lineitem, "l_orderkey"))
    e_stride = stride_of(events, "event_id")
    u_stride = stride_of(events, "user_id")

    def shifted(df, shifts, i):
        out = df
        for col, stride in shifts:
            out = out.withColumn(col, F.col(col) + F.lit(i * stride))
        return out

    plans = {
        "orders": (orders, [("o_orderkey", o_stride)]),
        "lineitem": (lineitem, [("l_orderkey", o_stride)]),
        "events": (events, [("event_id", e_stride), ("user_id", u_stride)]),
    }
    for name, (df, shifts) in plans.items():
        out = df
        for i in range(1, k):
            out = out.unionAll(shifted(df, shifts, i))
        d = os.path.join(root, f"{name}.parquet")
        shutil.rmtree(d)
        out.repartition(16).write.parquet(d)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    distinct = "--distinct" in sys.argv[1:]
    k = int(args[0]) if args else 5
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = build_scaled_dir(base, k)

    from gmall_flink_spark.registry import all_queries
    from gmall_flink_spark.session import get_spark

    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["q1_pricing_summary"](spark, base).write.format("noop").mode("overwrite").save()

    from gmall_flink_spark.sources.tables import clear_session_memos

    probes = PROBES
    if distinct:
        build_distinct_documents(spark, scaled, base, k)
        probes = DISTINCT_PROBES
        print(f"id-distinct documents mode (K={k} salted replicas)")
    print(f"{'query':28s} {'1x':>7s} {'%dx' % k:>7s} {'ratio':>6s}")
    for name in probes:
        # untimed 1x warm-up so codegen/compilation doesn't land in the
        # 1x column and flatter the ratio
        queries[name](spark, base).write.format("noop").mode("overwrite").save()
        t: dict[str, float] = {}
        for tag, d in (("1x", base), ("kx", scaled)):
            clear_session_memos()
            t0 = time.perf_counter()
            queries[name](spark, d).write.format("noop").mode("overwrite").save()
            t[tag] = time.perf_counter() - t0
        print(f"{name:28s} {t['1x']:7.2f} {t['kx']:7.2f} {t['kx']/t['1x']:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
