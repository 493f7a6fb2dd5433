"""Data-selection & epoch-construction queries (north-star training-data
ops beyond cleaning/dedup): link-graph host reputation (PageRank), DSIR
distribution-matching importance weights, and the deterministic
global-shuffle shard manifest. All oracle-checked; all integer-exact so
DuckDB parity is hash-for-hash under any execution order.

The link graph and the URL forms reuse queries/llm_pipeline's synthesis
formulas (the oracle re-derives canonical domains from the formulas, the
engine goes through the real normalize_url/registered_domain path — so
web parity keeps proving the normalizer, never mirroring it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import md5_long, tokenize
from gmall_flink_spark.functions.web import normalize_url, registered_domain
from gmall_flink_spark.llm.bpe import BPE_TRAIN_ROUNDS
from gmall_flink_spark.llm.graph import PR_DAMP, PR_ITERS, PR_Q, pagerank
from gmall_flink_spark.queries.llm_pipeline import (
    _CLEAN_FLAGGED,
    _TOKS,
    _raw_url,
    BENCH_MOD,
    MIX_TOKEN_TARGET,
    URL_TLDS,
    llm_corpus_build,
)
from gmall_flink_spark.sources.tables import table

#: link-target synthesis: doc with id i links its own domain to
#: 'src((i*7+3) % DST_MOD)' under tld index (i%5)%3 — a deterministic,
#: formula-derivable web graph (DST_MOD = the corpus' 20 sources, so the
#: target universe matches the source universe and rank mass circulates)
DST_MOD = 20


def _dst_domain() -> Column:
    did = F.col("doc_id")
    tld = F.element_at(
        F.array(*[F.lit(t) for t in URL_TLDS]), ((did % 5) % 3 + 1).cast("int")
    )
    return F.concat(
        F.lit("src"), ((did * 7 + 3) % DST_MOD).cast("string"), F.lit("."), tld
    )


def web_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-reputation ranking over the corpus link graph — the crawl
    governance signal that prioritizes fetches and weighs domain quality
    (Page et al. 1999; the CommonCrawl-style host-level rank). Each doc
    contributes one edge: its own registrable domain (derived through the
    REAL url path — synth noisy url -> normalize_url ->
    registered_domain; the oracle re-derives the canonical domain from
    the synthesis formulas, so parity again proves the normalizer) links
    to a formula-derived target domain. Fixed PR_ITERS integer-exact
    power iterations; output is every node with its Q-scaled rank.

    Scale: the host graph is millions of nodes at 100 TB — tiny next to
    the corpus — so the rank vector broadcasts and each iteration is ONE
    groupBy(dst) shuffle with map-side partials (llm/graph.py)."""
    docs = table(spark, sf_dir, "documents")
    edges = docs.select(
        registered_domain(normalize_url(_raw_url())).alias("src"),
        _dst_domain().alias("dst"),
    )
    ranks = pagerank(edges, iters=PR_ITERS, damp=PR_DAMP, q=PR_Q)
    return ranks.select(F.col("node").alias("domain"), "rank_q").orderBy(
        F.desc("rank_q"), "domain"
    )


#: DSIR hashed-feature space (Xie et al. 2023, "Data Selection for
#: Language Models via Importance Resampling"): token features hash into
#: this many buckets, so the model is dictionary-bounded no matter the
#: corpus vocabulary
DSIR_BUCKETS = 64


def _flog2(x) -> F.Column:
    """floor(log2(n)) as an exact BIGINT class for integer n >= 1 (the
    suite's standard integer-log trick: FP log2 of an int < 2^53 cannot
    cross an integer boundary off exact powers)."""
    return F.floor(F.log2(x.cast("double"))).cast("bigint")


def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights, integer-exact: score each raw-corpus
    doc by how much its hashed-unigram distribution looks like the target
    (benchmark) slice vs the raw corpus itself. Per feature bucket b the
    log-ratio class is

        r(b) = (flog2(p_b + 1) - flog2(p_total))
             - (flog2(q_b + 1) - flog2(q_total))

    (add-1 smoothed target/raw counts, both normalized by their totals in
    log2 units); a doc's score is the exact integer sum of r over its
    token occurrences. Positive score = more target-like than the raw
    average — the distribution-matching SELECTION signal that quality
    filters (which score docs in isolation) cannot express. Output: the
    per-source selection report (docs, target-like docs, score moments).

    Scale: the lambda table is DSIR_BUCKETS rows — it broadcasts onto
    the token scan; two vocab-free bucket aggs (map-side partials) + one
    (source, doc) agg. Bucket hashing is scan-stage JVM md5."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.explode(tokenize("text")).alias("t"),
    ).withColumn("b", F.pmod(md5_long(F.col("t")), F.lit(DSIR_BUCKETS)))
    # ONE bucket aggregation over the token scan, split by benchmark
    # membership (optimization r14, guide §1.2/§2.3): the previous form
    # aggregated bench/raw bucket counts and the two totals as four
    # separate frames, so Catalyst re-ran the tokenize-explode scan five
    # times per execution (p, q, both totals, per_doc). Now the bucket
    # table carries both counts, the totals fold from the 64-row bucket
    # table itself, and only the per-doc scoring pass re-reads the corpus
    # — 2 scans total, identical arithmetic.
    is_bench = (F.col("doc_id") % BENCH_MOD == 0).cast("bigint")
    bucket = toks.groupBy("b").agg(
        F.sum(is_bench).alias("p_ct"),
        F.sum(1 - is_bench).alias("q_ct"),
    )
    totals = bucket.agg(
        F.sum("p_ct").alias("p_total"), F.sum("q_ct").alias("q_total")
    )
    lam = (
        bucket.where(F.col("q_ct") > 0)  # the old q-side LEFT join's domain
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                (_flog2(F.col("p_ct") + 1) - _flog2(F.col("p_total")))
                - (_flog2(F.col("q_ct") + 1) - _flog2(F.col("q_total")))
            ).alias("r"),
        )
    )
    raw_t = toks.where(F.col("doc_id") % BENCH_MOD != 0)
    per_doc = (
        raw_t.join(F.broadcast(lam), "b")
        .groupBy("source", "doc_id")
        .agg(F.sum("r").alias("score"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum((F.col("score") > 0).cast("bigint")).alias("targetlike_ct"),
            F.sum("score").alias("score_sum"),
            F.min("score").alias("score_min"),
            F.max("score").alias("score_max"),
        )
        .orderBy("source")
    )


#: epoch-construction geometry: shards per epoch and the small weight the
#: order checksum folds each position through
N_SHARDS = 16
SHARD_CK_MOD = 997


def llm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard manifest — the epoch
    construction step of a training pipeline: every doc lands in shard
    ``portable_hash(doc_id) % N_SHARDS`` at position ``row_number`` by
    ``(hash, doc_id)`` within the shard, and the manifest records each
    shard's doc/token mass, boundary docs, and an ORDER-sensitive
    checksum (sum of position * (doc_id % SHARD_CK_MOD)) — parity on the
    checksum proves both engines materialize the exact same epoch order,
    which is what makes the shuffle reproducible and a data loader
    resumable mid-epoch.

    Scale: seed-free hash sharding is map-side; ONE shuffle on the shard
    key, then a per-shard (distributed) sort — there is never a global
    sort, and shard count scales freely because position is derived
    within the shard."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.size(tokenize("text")).alias("n_toks"),
        md5_long(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("shard", F.pmod(F.col("h"), F.lit(N_SHARDS)))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    s = h.withColumn("rn", F.row_number().over(w))
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum("n_toks").alias("token_ct"),
            F.min_by("doc_id", "rn").alias("first_doc"),
            F.max_by("doc_id", "rn").alias("last_doc"),
            F.sum(
                F.col("rn").cast("bigint") * (F.col("doc_id") % SHARD_CK_MOD)
            ).alias("order_checksum"),
        )
        .orderBy("shard")
    )


#: session memo of the corpus word-occurrence dictionary
#: (source, word, occ) — the tokenize-explode-aggregate pass that the
#: char-level encode/audit queries (llm_wordpiece_encode,
#: llm_unigram_encode, llm_unigram_roundtrip) and the WordPiece
#: trainer's word counts all used to run INDEPENDENTLY (four corpus
#: scans of the same aggregation — optimization r14, guide §2.4). One
#: shuffle builds it; every consumer re-aggregates the
#: |source x word|-bounded dictionary. At 100 TB this is the
#: word-frequency table a tokenizer pipeline materializes exactly once.
_WORD_OCC: dict[tuple, DataFrame] = {}

#: per-memo build locks (optimization r15): llm_tokenizer_compare warms
#: the three INDEPENDENT trainer-family memos from a small driver thread
#: pool (guide §2.6 — overlap independent jobs so one chain's stragglers
#: back-fill with another chain's tasks). Each memo keeps its
#: single-threaded build invariant by building UNDER ITS LOCK and
#: publishing once; different memos build concurrently, the same memo
#: never does. Sequential callers (every other query) see zero change —
#: an uncontended lock acquisition per call.
import threading as _threading

_MEMO_LOCKS: dict[int, _threading.Lock] = {}
_MEMO_LOCKS_GUARD = _threading.Lock()


def _memo_lock(memo: dict) -> _threading.Lock:
    with _MEMO_LOCKS_GUARD:
        return _MEMO_LOCKS.setdefault(id(memo), _threading.Lock())


def _word_occ(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    with _memo_lock(_WORD_OCC):
        key = memo_key(spark, sf_dir, "documents", _WORD_OCC)
        if key not in _WORD_OCC:
            docs = table(spark, sf_dir, "documents")
            wc = (
                docs.select("source", F.explode(tokenize("text")).alias("word"))
                .groupBy("source", "word")
                .agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
            )
            _WORD_OCC[key] = wc.localCheckpoint(eager=True)
        return _WORD_OCC[key]


#: session memo of the trained BPE state — (merge table, encoded corpus)
#: share the per-round checkpoints across llm_bpe_train / llm_bpe_encode
_BPE_STATE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _bpe_state(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from gmall_flink_spark.llm.bpe import bpe_train_state
    from gmall_flink_spark.sources.tables import memo_key

    with _memo_lock(_BPE_STATE):
        key = memo_key(spark, sf_dir, "documents", _BPE_STATE)
        if key not in _BPE_STATE:
            docs = table(spark, sf_dir, "documents")
            toked = docs.select(
                "doc_id",
                "source",
                "lang",
                F.size(tokenize("text")).cast("bigint").alias("n0"),
                tokenize("text").alias("l"),
            )
            # doc_id rides along so llm_bpe_roundtrip can join the encoded
            # corpus back to the originals; the trainer never reads carry cols
            _BPE_STATE[key] = bpe_train_state(
                toked,
                "l",
                rounds=BPE_TRAIN_ROUNDS,
                carry=("doc_id", "source", "lang", "n0"),
            )
        return _BPE_STATE[key]


def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BPE tokenizer TRAINING: learn BPE_TRAIN_ROUNDS merges
    over the corpus with real sequence rewriting between rounds (the
    single-round statistics live in llm_bpe_pairs / llm_bpe_merge_round;
    this is the full loop whose output — the ordered merge list — IS the
    artifact a trained BPE tokenizer ships). Semantics, the delimited-
    string replace trick, and the (count desc, a, b) tie-break are
    documented in llm/bpe.py; the oracle unrolls the identical rounds.

    Scale: per round ONE bounded-key (a, b) shuffle with map-side
    partials + a TakeOrdered top-1 + a map-only replace over
    checkpointed strings — K times the llm_bpe_pairs cost class."""
    return _bpe_state(spark, sf_dir)[0].orderBy("round")


def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the tokenizer loop: encode the corpus with the
    merges just trained (sharing the per-round checkpoints with
    llm_bpe_train through the session memo) and report per-source
    compression — docs, tokens before/after, merges applied, and the
    compression ratio in basis points. The fertility/compression report
    is how a tokenizer's fit to a corpus is judged before committing to
    it for a training run.

    Scale: the encoded corpus is the trainer's terminal checkpoint; this
    query adds one map-side token count and one source-key aggregate."""
    _, enc = _bpe_state(spark, sf_dir)
    from gmall_flink_spark.llm.bpe import seq_token_count

    agg = enc.groupBy("source").agg(
        F.count(F.lit(1)).alias("doc_ct"),
        F.sum("n0").alias("tok_before"),
        F.sum(seq_token_count("s")).alias("tok_after"),
    )
    return agg.select(
        "source",
        "doc_ct",
        "tok_before",
        "tok_after",
        (F.col("tok_before") - F.col("tok_after")).alias("merged_ct"),
        F.when(F.col("tok_before") == 0, F.lit(10000).cast("bigint"))
        .otherwise(F.expr("(10000 * tok_after) DIV tok_before"))
        .alias("ratio_bp"),
    ).orderBy("source")


#: sampled-trainer slice: keep docs whose portable doc_id hash lands in the
#: first BPE_SAMPLE_PCT of 100 buckets (llm/corpus.hash_sample) — the
#: 100 TB tokenizer-training posture (merges learned on a sample, the full
#: corpus only ever encoded, map-only). Hash-keyed, so the slice is
#: unbiased w.r.t. the synth's doc_id-periodic source/lang attributes.
BPE_SAMPLE_PCT = 40

#: session memo of the sampled-trained state: (merge table, full corpus
#: encoded with those merges)
_BPE_SAMPLED: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _bpe_sampled_state(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from gmall_flink_spark.llm.bpe import bpe_apply_merges, bpe_train_state
    from gmall_flink_spark.llm.corpus import hash_sample
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _BPE_SAMPLED)
    if key not in _BPE_SAMPLED:
        docs = table(spark, sf_dir, "documents")
        toked = docs.select(
            "doc_id",
            "lang",
            F.size(tokenize("text")).cast("bigint").alias("n0"),
            tokenize("text").alias("l"),
        )
        sample = hash_sample(toked, F.col("doc_id"), BPE_SAMPLE_PCT)
        merges, _ = bpe_train_state(sample, "l", rounds=BPE_TRAIN_ROUNDS)
        # the merge list IS the shipped artifact — K driver-side rows,
        # bounded by the round count, never corpus-sized
        mrows = [
            (r["round"], r["pair_a"], r["pair_b"], r["pair_ct"])
            for r in merges.orderBy("round").collect()
        ]
        merges_df = spark.createDataFrame(
            mrows, "round int, pair_a string, pair_b string, pair_ct bigint"
        )
        enc = bpe_apply_merges(
            toked, "l", [(a, b) for _, a, b, _ in mrows], carry=("lang", "n0")
        )
        _BPE_SAMPLED[key] = (merges_df, enc)
    return _BPE_SAMPLED[key]


def llm_bpe_train_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training on a HASH SAMPLE of the corpus (the missing 100 TB
    posture VERDICT r09 named: llm_bpe_train rewrites the full corpus K
    times, which a real tokenizer run never does — merges are learned on
    a sample and only ENCODING touches everything). Same trainer, same
    tie-break, over the deterministic BPE_SAMPLE_PCT%% hash slice; the
    oracle pins the identical sample rule, so the slice itself is part of
    the checked contract.

    Scale: the K-round rewrite loop now costs K × sample-size; the full
    corpus is read once, map-only, by the encode half
    (llm_bpe_fertility_sampled)."""
    return _bpe_sampled_state(spark, sf_dir)[0].orderBy("round")


def llm_bpe_fertility_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility by language of the FULL corpus encoded with the
    sampled-trained merges (llm/bpe.bpe_apply_merges — K literal replaces
    fused into one scan projection, zero shuffles): the check that a
    tokenizer trained on a slice still compresses every language before
    it is committed to a run. Compare against llm_bpe_fertility_lang
    (full-corpus-trained) to read the sampling cost directly."""
    from gmall_flink_spark.llm.bpe import seq_token_count

    _, enc = _bpe_sampled_state(spark, sf_dir)
    agg = enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_ct"),
        F.sum("n0").alias("tok_before"),
        F.sum(seq_token_count("s")).alias("tok_after"),
    )
    return agg.select(
        "lang",
        "doc_ct",
        "tok_before",
        "tok_after",
        (F.col("tok_before") - F.col("tok_after")).alias("merged_ct"),
        F.when(F.col("tok_before") == 0, F.lit(10000).cast("bigint"))
        .otherwise(F.expr("(10000 * tok_after) DIV tok_before"))
        .alias("ratio_bp"),
    ).orderBy("lang")


def llm_bpe_fertility_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY BY LANGUAGE — the multilingual-equity check run
    on a freshly trained tokenizer (a BPE trained on a skewed mix
    compresses the dominant language far better; fertility = tokens per
    original whitespace token is the standard measure, e.g. XLM-R's
    tokenizer analyses): the corpus encoded with the merges just trained
    (terminal state of the SAME per-round rewrite chain, shared through
    the _BPE_STATE session memo), aggregated per LANG instead of per
    source. A lang whose ratio_bp stays near 10000 gets no compression —
    the signal to retrain with a rebalanced mix or a bigger vocab.

    Scale: marginal over the trainer's checkpoints — one map-side token
    count + one lang-key aggregate."""
    from gmall_flink_spark.llm.bpe import seq_token_count

    _, enc = _bpe_state(spark, sf_dir)
    agg = enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_ct"),
        F.sum("n0").alias("tok_before"),
        F.sum(seq_token_count("s")).alias("tok_after"),
    )
    return agg.select(
        "lang",
        "doc_ct",
        "tok_before",
        "tok_after",
        (F.col("tok_before") - F.col("tok_after")).alias("merged_ct"),
        F.when(F.col("tok_before") == 0, F.lit(10000).cast("bigint"))
        .otherwise(F.expr("(10000 * tok_after) DIV tok_before"))
        .alias("ratio_bp"),
    ).orderBy("lang")


#: session memo of the sampled-trained unigram-LM vocab (ranked frame) —
#: llm_unigram_train and llm_unigram_encode share one EM run
_UNIGRAM_VOCAB: dict[tuple, DataFrame] = {}


def _unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.llm.corpus import hash_sample
    from gmall_flink_spark.llm.unigram import unigram_train, word_counts
    from gmall_flink_spark.sources.tables import memo_key

    with _memo_lock(_UNIGRAM_VOCAB):
        key = memo_key(spark, sf_dir, "documents", _UNIGRAM_VOCAB)
        if key not in _UNIGRAM_VOCAB:
            docs = table(spark, sf_dir, "documents")
            words = word_counts(hash_sample(docs, F.col("doc_id"), BPE_SAMPLE_PCT))
            _UNIGRAM_VOCAB[key] = unigram_train(words)
        return _UNIGRAM_VOCAB[key]


def llm_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training — the
    prune-down counterpart of BPE's merge-up (VERDICT r10 task 4): seed
    every substring of the sampled corpus' words, rank pieces by usage,
    and run UNIGRAM_EM_ROUNDS hard-EM rounds where each word takes its
    canonical minimal segmentation (Viterbi, integer Zipf-rank costs —
    llm/unigram.py docstring) and piece counts are re-estimated from the
    chosen segmentations. Output = the final ranked vocab, the artifact a
    unigram tokenizer ships. Trained on the same 40% hash slice as
    llm_bpe_train_sampled (the 100 TB posture: training touches the
    sample, only encoding touches everything).

    The oracle verifies the engine's DP by BRUTE-FORCE enumeration of
    every segmentation per word (recursive CTE) — an independent method,
    not a mirror of the optimization."""
    v = _unigram_vocab(spark, sf_dir)
    return v.select(
        "piece",
        F.length("piece").cast("bigint").alias("piece_len"),
        "cnt",
        "rank",
        "cost_q",
    ).orderBy("rank")


def llm_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL corpus encoded with the sample-trained unigram vocab
    (llm/unigram.unigram_encode_stats — the collected bounded vocab as a
    map literal, segmentation as a pure map-side expression, zero
    shuffles before the per-source aggregate): per source, ALL word
    occurrences, UNK occurrences (over-cap words — the representation-
    limit contract, llm/unigram.py), total pieces, total quantized cost,
    total chars over encoded words, and fertility (pieces per encoded
    word x100). The unigram analogue of llm_bpe_fertility_sampled;
    out-of-vocab single chars (possible under sampled training) cost
    UNIGRAM_UNK_COST and are segmentable, unknown multi-char pieces are
    not."""
    from gmall_flink_spark.llm.unigram import collect_costs, unigram_encode_stats

    v = _unigram_vocab(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    return unigram_encode_stats(
        docs, collect_costs(v), "source", wc=_word_occ(spark, sf_dir)
    ).orderBy("source")


def llm_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer LOSSLESSNESS audit, the governance check shipped next to
    every production tokenizer: DECODE the BPE-encoded corpus (merged
    tokens split back on the JOIN byte, sequence separators back to
    spaces) and verify decode(encode(text)) equals the whitespace-
    normalized original for EVERY document. Reports per-source doc_ct and
    roundtrip_ok_ct.

    The oracle is INDEPENDENT of the tokenizer by design: losslessness
    means ok_ct must equal doc_ct, so the oracle simply counts documents
    per source — any encode that drops/reorders a token, or any decode
    that mis-handles the delimiter invariant, surfaces as ok_ct < doc_ct
    and a hash mismatch. (Contract: corpus text never contains the SEP/
    JOIN control bytes — guaranteed by whitespace tokenization; llm/bpe.py
    module doc.)

    Scale: decode is three map-side string ops over the trainer's
    terminal checkpoint + one doc_id equi-join back to the corpus and a
    source-key aggregate — no new corpus-sized shuffle beyond the join."""
    from gmall_flink_spark.llm.bpe import BPE_JOIN, BPE_SEP

    _, enc = _bpe_state(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws(" ", tokenize("text")).alias("orig")
    )
    dec = enc.select(
        "doc_id",
        "source",
        F.when(F.length("s") <= 2, F.lit("")).otherwise(
            F.replace(
                F.replace(
                    F.expr("substring(s, 2, length(s) - 2)"),
                    F.lit(BPE_SEP + BPE_SEP),
                    F.lit(" "),
                ),
                F.lit(BPE_JOIN),
                F.lit(" "),
            )
        ).alias("decoded"),
    )
    return (
        dec.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum((F.col("decoded") == F.col("orig")).cast("bigint")).alias(
                "roundtrip_ok_ct"
            ),
        )
        .orderBy("source")
    )


def llm_unigram_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer losslessness audit (the segmentation twin of
    llm_bpe_roundtrip): a Viterbi path is only a valid SEGMENTATION if its
    pieces concatenate back to the word — verify that for every in-cap
    distinct word of the corpus, weighted by occurrences. Reports per
    source: ALL word occurrences and distinct words (over-cap words are
    unrepresentable → counted and NOT ok, the representation-limit
    contract), and the ok counts for both.

    Oracle independence, same design as the BPE audit: validity means the
    ok columns must equal the IN-CAP totals, so the oracle counts all
    words and in-cap words per source straight off the documents table
    (the tokenize + length-cap rule mirrored in SQL) and never touches
    the DP. A DP bug that emits a path whose pieces don't re-spell the
    word is caught by construction.

    Scale: dictionary-encode posture as llm_unigram_encode — the DP runs
    once per DISTINCT in-cap word; the audit adds one map-side compare."""
    from gmall_flink_spark.llm.unigram import (
        UNIGRAM_MAX_WORD_LEN,
        USEP,
        collect_costs,
        with_viterbi,
    )

    costs = collect_costs(_unigram_vocab(spark, sf_dir))
    # the shared word-occurrence dictionary (one corpus pass per session
    # — optimization r14); every frame below is dictionary-bounded
    wc = _word_occ(spark, sf_dir)
    seg = with_viterbi(
        wc.select("word")
        .where(F.length("word") <= UNIGRAM_MAX_WORD_LEN)
        .distinct(),
        "word",
        costs,
    ).select(
        "word",
        (F.replace(F.col("st")["path"], F.lit(USEP), F.lit("")) == F.col("word"))
        .cast("bigint")
        .alias("ok"),
    )
    return (
        wc.join(seg, "word", "left")
        .select("source", "occ", F.coalesce("ok", F.lit(0).cast("bigint")).alias("ok"))
        .groupBy("source")
        .agg(
            F.sum("occ").cast("bigint").alias("word_occ_ct"),
            F.count(F.lit(1)).alias("distinct_word_ct"),
            F.sum(F.col("occ") * F.col("ok")).cast("bigint").alias("roundtrip_ok_occ"),
            F.sum("ok").cast("bigint").alias("roundtrip_ok_distinct"),
        )
        .orderBy("source")
    )


QUERIES = {
    "web_domain_pagerank": web_domain_pagerank,
    "llm_dsir_weights": llm_dsir_weights,
    "llm_shard_manifest": llm_shard_manifest,
    "llm_bpe_train": llm_bpe_train,
    "llm_bpe_encode": llm_bpe_encode,
    "llm_bpe_fertility_lang": llm_bpe_fertility_lang,
    "llm_bpe_train_sampled": llm_bpe_train_sampled,
    "llm_bpe_fertility_sampled": llm_bpe_fertility_sampled,
    # the epoch-construction composition lives in queries/llm_pipeline.py
    # (it shares _clean_ranked with llm_clean_corpus) but registers here,
    # next to the shard constants its arithmetic and oracle pin
    "llm_corpus_build": llm_corpus_build,
    "llm_unigram_train": llm_unigram_train,
    "llm_unigram_encode": llm_unigram_encode,
    "llm_bpe_roundtrip": llm_bpe_roundtrip,
    "llm_unigram_roundtrip": llm_unigram_roundtrip,
}

_MD5H = "('0x' || substr(md5('0|' || {key}), 1, 15))::BIGINT"

_TLD = "(['com','org','net'])[(doc_id % 3) + 1]"
_DST_TLD = "(['com','org','net'])[((doc_id % 5) % 3) + 1]"

#: unrolled integer power iteration — the same arithmetic as
#: llm/graph.pagerank, one CTE per round
_PR_BASE = (100 - PR_DAMP) * PR_Q // 100


def _pagerank_oracle() -> str:
    rounds = []
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
    r{i} AS (
        SELECT n.node,
               CAST({_PR_BASE} + ({PR_DAMP} * COALESCE(c.c, 0)) // 100
                    AS BIGINT) AS rank_q
        FROM n LEFT JOIN (
            SELECT dst AS node, SUM((r{i - 1}.rank_q * w) // out_w) AS c
            FROM ewo JOIN r{i - 1} ON ewo.src = r{i - 1}.node
            GROUP BY dst
        ) c ON n.node = c.node
    )""")
    return f"""
    WITH de AS (
        SELECT source || '.' || {_TLD} AS src,
               'src' || CAST((doc_id * 7 + 3) % {DST_MOD} AS VARCHAR)
                     || '.' || {_DST_TLD} AS dst
        FROM documents
    ),
    e AS (SELECT src, dst FROM de WHERE src != dst),
    ew AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
           FROM e GROUP BY src, dst),
    o AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM ew GROUP BY src),
    ewo AS (SELECT ew.src, ew.dst, w, out_w FROM ew JOIN o ON ew.src = o.src),
    n AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    r0 AS (SELECT node, CAST({PR_Q} AS BIGINT) AS rank_q FROM n),
    {",".join(rounds)}
    SELECT node AS domain, rank_q FROM r{PR_ITERS}
    ORDER BY rank_q DESC, domain
    """


#: SQL fragments of the delimited-string BPE form (llm/bpe.py: SEP=0x1f
#: between/around tokens, JOIN=0x1e inside merged tokens)
_BPE_S = "chr(31)"
_BPE_J = "chr(30)"


def _bpe_rounds_cte(where: str = "TRUE") -> str:
    """Shared unrolled K-round BPE CTE chain (mirrors llm/bpe.py): per
    round, bigram counts from the split sequence strings, the
    deterministic top-1, and the invariant-preserving replace rewrite —
    carrying (source, n0) like the engine so the encode twin can
    aggregate the terminal state d{K+1}. ``where`` restricts the TRAINING
    corpus (the sampled-trainer twin pins its hash-sample rule here)."""
    parts = [f"""
    WITH d1 AS MATERIALIZED (
        SELECT source, lang, len({_TOKS}) AS n0,
               {_BPE_S} || array_to_string({_TOKS}, {_BPE_S}||{_BPE_S})
                   || {_BPE_S} AS s
        FROM documents WHERE {where}
    )"""]
    for i in range(1, BPE_TRAIN_ROUNDS + 1):
        parts.append(f"""
    p{i} AS MATERIALIZED (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS pair_ct
        FROM (
            SELECT u.p['a'] AS a, u.p['b'] AS b
            FROM (SELECT string_split(substr(s, 2, length(s) - 2),
                                      {_BPE_S}||{_BPE_S}) AS l FROM d{i}) t,
                 LATERAL unnest([{{'a': l[j], 'b': l[j + 1]}}
                                 for j in range(1, len(l))]) AS u(p)
        ) GROUP BY a, b ORDER BY pair_ct DESC, a, b LIMIT 1
    )""")
        parts.append(f"""
    d{i + 1} AS MATERIALIZED (
        -- LEFT JOIN + CASE mirrors the engine's empty-top early stop
        -- (llm/bpe.py): a round with no remaining bigram leaves the
        -- corpus untouched instead of wiping it to zero rows.
        SELECT source, lang, n0,
               CASE WHEN a IS NULL THEN s
                    ELSE replace(s,
                         {_BPE_S} || a || {_BPE_S}||{_BPE_S} || b || {_BPE_S},
                         {_BPE_S} || a || {_BPE_J} || b || {_BPE_S}) END AS s
        FROM d{i} LEFT JOIN p{i} ON TRUE
    )""")
    return ",".join(parts)


def _bpe_train_oracle() -> str:
    rounds_sel = "\n    UNION ALL ".join(
        f"SELECT {i} AS round, a AS pair_a, b AS pair_b, pair_ct FROM p{i}"
        for i in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    return _bpe_rounds_cte() + f"\n    {rounds_sel}\n    ORDER BY round"


def _bpe_encode_oracle() -> str:
    k1 = BPE_TRAIN_ROUNDS + 1
    return _bpe_rounds_cte() + f""",
    enc AS (
        SELECT source, CAST(n0 AS BIGINT) AS n0,
               CASE WHEN length(s) <= 2 THEN 0
                    ELSE len(string_split(substr(s, 2, length(s) - 2),
                                          {_BPE_S}||{_BPE_S})) END AS n1
        FROM d{k1}
    ),
    agg AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(n0) AS BIGINT) AS tok_before,
               CAST(SUM(n1) AS BIGINT) AS tok_after
        FROM enc GROUP BY source
    )
    SELECT source, doc_ct, tok_before, tok_after,
           tok_before - tok_after AS merged_ct,
           CASE WHEN tok_before = 0 THEN 10000
                ELSE (10000 * tok_after) // tok_before END AS ratio_bp
    FROM agg ORDER BY source"""


def _bpe_fertility_oracle() -> str:
    k1 = BPE_TRAIN_ROUNDS + 1
    return _bpe_rounds_cte() + f""",
    enc AS (
        SELECT lang, CAST(n0 AS BIGINT) AS n0,
               CASE WHEN length(s) <= 2 THEN 0
                    ELSE len(string_split(substr(s, 2, length(s) - 2),
                                          {_BPE_S}||{_BPE_S})) END AS n1
        FROM d{k1}
    ),
    agg AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(n0) AS BIGINT) AS tok_before,
               CAST(SUM(n1) AS BIGINT) AS tok_after
        FROM enc GROUP BY lang
    )
    SELECT lang, doc_ct, tok_before, tok_after,
           tok_before - tok_after AS merged_ct,
           CASE WHEN tok_before = 0 THEN 10000
                ELSE (10000 * tok_after) // tok_before END AS ratio_bp
    FROM agg ORDER BY lang"""


#: the sampled-trainer slice rule in SQL — MUST stay in lockstep with
#: hash_sample(md5_long) in _bpe_sampled_state
_BPE_SAMPLE_WHERE = f"{_MD5H.format(key='doc_id')} % 100 < {BPE_SAMPLE_PCT}"


def _bpe_train_sampled_oracle() -> str:
    rounds_sel = "\n    UNION ALL ".join(
        f"SELECT {i} AS round, a AS pair_a, b AS pair_b, pair_ct FROM p{i}"
        for i in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    return _bpe_rounds_cte(_BPE_SAMPLE_WHERE) + f"\n    {rounds_sel}\n    ORDER BY round"


def _bpe_fertility_sampled_oracle() -> str:
    """Train chain over the hash sample (p1..pK), then the FULL corpus
    encoded by applying those merges in order (f1..f{K+1}, LEFT JOIN +
    CASE so a short merge list leaves later rounds as no-ops), aggregated
    per lang — the twin of bpe_apply_merges over the sampled artifact."""
    parts = [_bpe_rounds_cte(_BPE_SAMPLE_WHERE)]
    parts.append(f""",
    f1 AS (
        SELECT lang, len({_TOKS}) AS n0,
               {_BPE_S} || array_to_string({_TOKS}, {_BPE_S}||{_BPE_S})
                   || {_BPE_S} AS s
        FROM documents
    )""")
    for i in range(1, BPE_TRAIN_ROUNDS + 1):
        parts.append(f""",
    f{i + 1} AS (
        SELECT lang, n0,
               CASE WHEN a IS NULL THEN s
                    ELSE replace(s,
                         {_BPE_S} || a || {_BPE_S}||{_BPE_S} || b || {_BPE_S},
                         {_BPE_S} || a || {_BPE_J} || b || {_BPE_S}) END AS s
        FROM f{i} LEFT JOIN p{i} ON TRUE
    )""")
    parts.append(f""",
    enc AS (
        SELECT lang, CAST(n0 AS BIGINT) AS n0,
               CASE WHEN length(s) <= 2 THEN 0
                    ELSE len(string_split(substr(s, 2, length(s) - 2),
                                          {_BPE_S}||{_BPE_S})) END AS n1
        FROM f{BPE_TRAIN_ROUNDS + 1}
    ),
    agg AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(n0) AS BIGINT) AS tok_before,
               CAST(SUM(n1) AS BIGINT) AS tok_after
        FROM enc GROUP BY lang
    )
    SELECT lang, doc_ct, tok_before, tok_after,
           tok_before - tok_after AS merged_ct,
           CASE WHEN tok_before = 0 THEN 10000
                ELSE (10000 * tok_after) // tok_before END AS ratio_bp
    FROM agg ORDER BY lang""")
    return "".join(parts)


# ---- unigram-LM oracle: brute-force segmentation enumeration ----------
# The engine's Viterbi DP is verified by ENUMERATING every segmentation of
# every word with a recursive CTE and taking the (cost, pct, path) minimum
# — a genuinely independent method (the dedup_allpairs_exact pattern).
# Every macro below mirrors a constant from llm/unigram.py; touching one
# side means touching both.


def _uni_ranked(src: str, out: str) -> str:
    """rank = row_number over (cnt desc, piece asc); cost_q =
    length(bin(rank)) — mirrors llm/unigram.ranked."""
    return f"""{out} AS MATERIALIZED (
      SELECT piece, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS BIGINT) AS rank,
             CAST(length(printf('%b',
                  ROW_NUMBER() OVER (ORDER BY cnt DESC, piece))) AS BIGINT) AS cost_q
      FROM {src})"""


def _uni_edges(words: str, vocab: str, out: str) -> str:
    """Per (word, start): valid pieces with costs — vocab pieces plus the
    UNK single-char fallback for chars absent from the vocab."""
    from gmall_flink_spark.llm.unigram import UNIGRAM_MAX_PIECE, UNIGRAM_UNK_COST

    lens = ",".join(str(i) for i in range(1, UNIGRAM_MAX_PIECE + 1))
    return f"""{out} AS MATERIALIZED (
      SELECT x.word, x.i - 1 AS s_pos, x.i - 1 + length(v.piece) AS e_pos,
             v.piece, v.cost_q AS cost
      FROM (SELECT p.word, p.i, substring(p.word, p.i, ll.l) AS sub
            FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i
                  FROM {words}) p,
                 (SELECT unnest([{lens}]) AS l) ll
            WHERE p.i + ll.l - 1 <= length(p.word)) x
      JOIN {vocab} v ON x.sub = v.piece
      UNION ALL
      SELECT p.word, p.i - 1, p.i, substring(p.word, p.i, 1),
             CAST({UNIGRAM_UNK_COST} AS BIGINT)
      FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM {words}) p
      WHERE substring(p.word, p.i, 1) NOT IN
            (SELECT piece FROM {vocab} WHERE length(piece) = 1))"""


def _uni_best(words: str, edges: str, out: str) -> str:
    """Enumerate all segmentations (recursive CTE over the edge DAG) and
    keep the canonical minimum per word: (cost, pct, path) — the exact
    tie-break of llm/unigram.with_viterbi."""
    return f"""seg_{out} AS (
      SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost,
             CAST(0 AS BIGINT) AS pct, '' AS path
      FROM {words}
      UNION ALL
      SELECT s.word, e.e_pos, s.cost + e.cost, s.pct + 1,
             s.path || chr(31) || e.piece
      FROM seg_{out} s JOIN {edges} e ON e.word = s.word AND e.s_pos = s.pos),
    {out} AS MATERIALIZED (
      SELECT word, cost, pct, path FROM (
        SELECT word, cost, pct, path,
               ROW_NUMBER() OVER (PARTITION BY word
                                  ORDER BY cost, pct, path) AS rn
        FROM seg_{out} WHERE pos = length(word))
      WHERE rn = 1)"""


def _uni_mstep(words: str, best: str, out: str) -> str:
    """Recount pieces from the chosen segmentations; chars always kept
    (zero-filled), multi-char pruned to UNIGRAM_KEEP_MULTI — mirrors the
    M-step of llm/unigram.unigram_train."""
    from gmall_flink_spark.llm.unigram import UNIGRAM_KEEP_MULTI

    return f"""cnt_{out} AS MATERIALIZED (
      SELECT piece, CAST(SUM(wcount) AS BIGINT) AS cnt
      FROM (SELECT word, unnest(string_split(substring(path, 2), chr(31))) AS piece
            FROM {best}) q
      JOIN {words} USING (word)
      GROUP BY piece),
    {out} AS MATERIALIZED (
      SELECT c.piece, CAST(COALESCE(k.cnt, 0) AS BIGINT) AS cnt
      FROM uchars c LEFT JOIN cnt_{out} k USING (piece)
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM cnt_{out} WHERE length(piece) > 1
        ORDER BY cnt DESC, piece LIMIT {UNIGRAM_KEEP_MULTI}))"""


def _uni_train_cte() -> str:
    """The shared WITH body: sampled words -> seed -> 2 hard-EM rounds ->
    final ranked vocab v2."""
    from gmall_flink_spark.llm.unigram import (
        UNIGRAM_MAX_WORD_LEN,
        UNIGRAM_SEED_MULTI,
    )

    return f"""WITH RECURSIVE
    uwords AS MATERIALIZED (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
      FROM (SELECT unnest({_TOKS}) AS w FROM documents WHERE {_BPE_SAMPLE_WHERE})
      WHERE length(w) <= {UNIGRAM_MAX_WORD_LEN}
      GROUP BY w),
    useed AS MATERIALIZED (
      SELECT sub AS piece, CAST(SUM(wcount) AS BIGINT) AS cnt
      FROM (SELECT p.word, p.wcount, substring(p.word, p.i, ll.l) AS sub
            FROM (SELECT word, wcount, unnest(range(1, length(word) + 1)) AS i
                  FROM uwords) p,
                 (SELECT unnest([1,2,3,4]) AS l) ll
            WHERE p.i + ll.l - 1 <= length(p.word)) x
      GROUP BY sub),
    uchars AS MATERIALIZED (SELECT piece FROM useed WHERE length(piece) = 1),
    uvocab0 AS MATERIALIZED (
      SELECT piece, cnt FROM useed WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM useed WHERE length(piece) > 1
        ORDER BY cnt DESC, piece LIMIT {UNIGRAM_SEED_MULTI})),
    {_uni_ranked("uvocab0", "v0")},
    {_uni_edges("uwords", "v0", "e1")},
    {_uni_best("uwords", "e1", "b1")},
    {_uni_mstep("uwords", "b1", "uvocab1")},
    {_uni_ranked("uvocab1", "v1")},
    {_uni_edges("uwords", "v1", "e2")},
    {_uni_best("uwords", "e2", "b2")},
    {_uni_mstep("uwords", "b2", "uvocab2")},
    {_uni_ranked("uvocab2", "v2")}"""


def _unigram_train_oracle() -> str:
    return (
        _uni_train_cte()
        + """
    SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len, cnt, rank, cost_q
    FROM v2 ORDER BY rank"""
    )


def _unigram_encode_oracle() -> str:
    from gmall_flink_spark.llm.unigram import UNIGRAM_MAX_WORD_LEN

    return (
        _uni_train_cte()
        + f""",
    fw AS (
      SELECT source, w AS word
      FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)),
    dw AS (SELECT DISTINCT word FROM fw
           WHERE length(word) <= {UNIGRAM_MAX_WORD_LEN}),
    {_uni_edges("dw", "v2", "eF")},
    {_uni_best("dw", "eF", "bF")}
    SELECT f.source,
           CAST(COUNT(*) AS BIGINT) AS word_ct,
           -- over-cap words LEFT-join to nothing: counted as UNK, never
           -- dropped (the representation-limit contract)
           CAST(SUM(CASE WHEN b.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS unk_ct,
           CAST(SUM(COALESCE(b.pct, 0)) AS BIGINT) AS piece_ct,
           CAST(SUM(COALESCE(b.cost, 0)) AS BIGINT) AS cost_total,
           CAST(SUM(CASE WHEN b.word IS NULL THEN 0 ELSE length(f.word) END)
                AS BIGINT) AS char_ct,
           CAST(CASE WHEN COUNT(b.word) = 0 THEN 0
                     ELSE (100 * SUM(COALESCE(b.pct, 0))) // COUNT(b.word)
                END AS BIGINT) AS fertility_x100
    FROM fw f LEFT JOIN bF b USING (word)
    GROUP BY f.source ORDER BY f.source"""
    )


# mirrored constant for the unigram-roundtrip oracle's in-cap word rule
from gmall_flink_spark.llm.unigram import UNIGRAM_MAX_WORD_LEN as _UNI_MAX_WORD

ORACLE = {
    "web_domain_pagerank": _pagerank_oracle(),
    "llm_bpe_train": _bpe_train_oracle(),
    "llm_bpe_encode": _bpe_encode_oracle(),
    "llm_bpe_fertility_lang": _bpe_fertility_oracle(),
    "llm_bpe_train_sampled": _bpe_train_sampled_oracle(),
    "llm_bpe_fertility_sampled": _bpe_fertility_sampled_oracle(),
    "llm_unigram_train": _unigram_train_oracle(),
    "llm_unigram_encode": _unigram_encode_oracle(),
    # losslessness audits: the oracle is DELIBERATELY tokenizer-free —
    # round-trip identity means the ok columns must equal the totals, so
    # the expected frame is computable straight off documents; any engine
    # encode/decode defect breaks the equality and hash-mismatches
    "llm_bpe_roundtrip": """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           CAST(COUNT(*) AS BIGINT) AS roundtrip_ok_ct
    FROM documents GROUP BY source ORDER BY source""",
    "llm_unigram_roundtrip": f"""
    WITH w AS (
      SELECT source, t.word AS word
      FROM (SELECT source,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents) d,
           UNNEST(d.toks) AS t(word)
    )
    -- totals count ALL words; ok counts only in-cap ones (over-cap words
    -- are unrepresentable by contract — counted, never ok)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS word_occ_ct,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS distinct_word_ct,
           CAST(SUM(CASE WHEN length(word) <= {_UNI_MAX_WORD} THEN 1 ELSE 0 END)
                AS BIGINT) AS roundtrip_ok_occ,
           CAST(COUNT(DISTINCT CASE WHEN length(word) <= {_UNI_MAX_WORD}
                                    THEN word END)
                AS BIGINT) AS roundtrip_ok_distinct
    FROM w GROUP BY source ORDER BY source""",
    "llm_corpus_build": f"""
    WITH {_CLEAN_FLAGGED},
    kept AS (
        SELECT source, doc_id, tok FROM flagged
        WHERE q_ok AND NOT contam
          AND doc_id NOT IN (SELECT doc_id FROM dups)
    ),
    tot AS (SELECT source, COUNT(*) AS total_ct FROM flagged GROUP BY source),
    per AS (
        SELECT source,
               COUNT(*) AS kept_ct,
               SUM(tok) AS kept_tok,
               COUNT(DISTINCT
                   ('0x' || substr(md5('0|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % {N_SHARDS}) AS shard_spread,
               SUM(doc_id % {SHARD_CK_MOD}) AS kept_id_ck
        FROM kept GROUP BY source
    ),
    j AS (
        SELECT t.source,
               CAST(t.total_ct AS BIGINT) AS total_ct,
               CAST(COALESCE(p.kept_ct, 0) AS BIGINT) AS kept_ct,
               CAST(COALESCE(p.kept_tok, 0) AS BIGINT) AS kept_tok,
               CAST(COALESCE(p.shard_spread, 0) AS BIGINT) AS shard_spread,
               CAST(COALESCE(p.kept_id_ck, 0) AS BIGINT) AS kept_id_ck,
               CAST(floor(sqrt(CAST(COALESCE(p.kept_tok, 0) AS DOUBLE)))
                    AS BIGINT) AS weight_q
        FROM tot t LEFT JOIN per p ON t.source = p.source
    ),
    wt AS (SELECT CAST(SUM(weight_q) AS BIGINT) AS w FROM j)
    SELECT source, total_ct, kept_ct, kept_tok, shard_spread, kept_id_ck,
           weight_q,
           CAST(CASE WHEN w > 0 THEN {MIX_TOKEN_TARGET} * weight_q // w
                     ELSE 0 END AS BIGINT) AS alloc_tok,
           CAST(CASE WHEN kept_tok > 0 AND w > 0
                     THEN (100 * ({MIX_TOKEN_TARGET} * weight_q // w)) // kept_tok
                     ELSE 0 END AS BIGINT) AS epochs_x100
    FROM j CROSS JOIN wt ORDER BY source
    """,
    "llm_dsir_weights": f"""
    WITH toks AS (
        SELECT source, doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    tb AS (
        SELECT source, doc_id,
               {_MD5H.format(key="t")} % {DSIR_BUCKETS} AS b
        FROM toks
    ),
    p AS (SELECT b, COUNT(*) AS p_ct FROM tb
          WHERE doc_id % {BENCH_MOD} = 0 GROUP BY b),
    q AS (SELECT b, COUNT(*) AS q_ct FROM tb
          WHERE doc_id % {BENCH_MOD} != 0 GROUP BY b),
    tot AS (
        SELECT (SELECT COUNT(*) FROM tb WHERE doc_id % {BENCH_MOD} = 0)
                   AS p_total,
               (SELECT COUNT(*) FROM tb WHERE doc_id % {BENCH_MOD} != 0)
                   AS q_total
    ),
    lam AS (
        SELECT q.b,
               (CAST(FLOOR(LOG2(COALESCE(p_ct, 0) + 1)) AS BIGINT)
                - CAST(FLOOR(LOG2(p_total)) AS BIGINT))
               - (CAST(FLOOR(LOG2(q_ct + 1)) AS BIGINT)
                  - CAST(FLOOR(LOG2(q_total)) AS BIGINT)) AS r
        FROM q LEFT JOIN p ON q.b = p.b CROSS JOIN tot
    ),
    per_doc AS (
        SELECT source, doc_id, SUM(r) AS score
        FROM tb JOIN lam ON tb.b = lam.b
        WHERE doc_id % {BENCH_MOD} != 0
        GROUP BY source, doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS targetlike_ct,
           CAST(SUM(score) AS BIGINT) AS score_sum,
           CAST(MIN(score) AS BIGINT) AS score_min,
           CAST(MAX(score) AS BIGINT) AS score_max
    FROM per_doc GROUP BY source ORDER BY source
    """,
    "llm_shard_manifest": f"""
    WITH h AS (
        SELECT doc_id, len({_TOKS}) AS n_toks,
               {_MD5H.format(key="CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    ),
    s AS (
        SELECT *, h % {N_SHARDS} AS shard,
               ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                                  ORDER BY h, doc_id) AS rn
        FROM h
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           CAST(SUM(n_toks) AS BIGINT) AS token_ct,
           arg_min(doc_id, rn) AS first_doc,
           arg_max(doc_id, rn) AS last_doc,
           CAST(SUM(rn * (doc_id % {SHARD_CK_MOD})) AS BIGINT)
               AS order_checksum
    FROM s GROUP BY shard ORDER BY shard
    """,
}


# ---------------------------------------------------------------------------
# WordPiece tokenizer family (llm/wordpiece.py) — the third tokenizer next
# to BPE (frequency-scored merges) and unigram-LM (likelihood pruning):
# likelihood-SCORED merges + greedy longest-match-first encode (Schuster &
# Nakajima 2012, the BERT tokenizer). Trained on the full in-cap DISTINCT
# word frame (the dictionary posture: trainer cost scales with distinct
# words, not occurrences — word frequencies ride along as weights).
# ---------------------------------------------------------------------------

#: session memo of the trained WordPiece state — (merge table, vocab dict)
_WP_STATE: dict[tuple, tuple[DataFrame, dict]] = {}


def _wp_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-cap (word, wcount) — a re-aggregation of the shared
    (source, word, occ) frame (optimization r14, guide §2.4): the
    second aggregation runs over the |source x word|-bounded dictionary,
    never the corpus, so the trainer's word counts cost zero extra
    corpus passes. The length filter commutes with the re-agg (it is on
    the group key)."""
    from gmall_flink_spark.llm.wordpiece import WP_MAX_WORD_LEN

    return (
        _word_occ(spark, sf_dir)
        .where(F.length("word") <= WP_MAX_WORD_LEN)
        .groupBy("word")
        .agg(F.sum("occ").cast("bigint").alias("wcount"))
    )


def _wp_state(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    """(merge table, vocab dict) memo. Training words = in-cap words whose
    every char is inside the LIMITED alphabet (llm/wordpiece.py: the
    limit_alphabet contract — a word containing a dropped char could
    never contribute an emittable piece); the vocab alphabet is that
    limited set, so encode-side words carrying a dropped char dead-end
    to UNK in the parity gate (ADVICE r12)."""
    from gmall_flink_spark.llm.wordpiece import (
        WP_TRAIN_ROUNDS,
        collect_vocab,
        limited_alphabet,
        wordpiece_train_state,
    )
    from gmall_flink_spark.sources.tables import memo_key

    with _memo_lock(_WP_STATE):
        key = memo_key(spark, sf_dir, "documents", _WP_STATE)
        if key not in _WP_STATE:
            words = _wp_words(spark, sf_dir).localCheckpoint(eager=True)
            alpha = limited_alphabet(words)
            train_words = words.where(
                F.length(F.translate(F.col("word"), "".join(alpha), "")) == 0
            )
            merges, _ = wordpiece_train_state(train_words, WP_TRAIN_ROUNDS)
            merges = merges.localCheckpoint(eager=True)
            _WP_STATE[key] = (merges, collect_vocab(alpha, merges))
        return _WP_STATE[key]


def llm_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece tokenizer TRAINING (llm/wordpiece.py): BPE's merge loop
    with the LIKELIHOOD pair score — each round merges the (a, b)
    maximizing pair_ct / (cnt_a · cnt_b) over frequency-weighted
    character sequences of the corpus' alphabet-clean distinct words,
    ranked by EXACT integer cross-multiplication (never floating
    division — module docstring), and the merged token is the plain
    substring a||b. Output = the ordered merge table with the score's
    three integer inputs per round (the artifact a WordPiece trainer
    ships, plus the evidence to audit each pick).

    Scale: per round two bounded-key shuffles (weighted bigram + unigram
    counts over the distinct-word dictionary), two broadcast joins, the
    exact tournament reduce over the bounded pairs table, and a map-only
    replace over checkpointed strings."""
    return _wp_state(spark, sf_dir)[0].orderBy("round")


def llm_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL corpus encoded with the trained WordPiece vocab by greedy
    LONGEST-MATCH-FIRST segmentation (the BERT encode rule — genuinely
    different from BPE merge-order application and from unigram minimal-
    cost Viterbi): per source, ALL word occurrences, UNK occurrences
    (a position with no matching piece voids the whole word — live in
    the gate via the limited alphabet — and over-cap words count as UNK
    by the representation-limit contract, llm/wordpiece.py docstring),
    ok occurrences, pieces and chars over ok words, fertility x100, and
    roundtrip_ok — the engine-side losslessness proof
    (concat(pieces) == word, reconstructed from the DP's path string; the
    oracle derives ok counts from its own greedy walk, so an engine DP
    that puts wrong pieces on the path hash-mismatches even with correct
    counts).

    DICTIONARY-ENCODE posture (llm/unigram.py lesson): the greedy DP runs
    once per DISTINCT in-cap word, occurrence counts LEFT-join back
    (over-cap words miss and coalesce to UNK); the vocab is the bounded
    collected artifact bound as a map literal — encode itself is a
    zero-shuffle map pass, the 100 TB posture."""
    from gmall_flink_spark.llm.bpe import BPE_SEP
    from gmall_flink_spark.llm.wordpiece import WP_MAX_WORD_LEN, with_greedy_pieces

    _, vocab = _wp_state(spark, sf_dir)
    # the shared word-occurrence dictionary (one corpus pass per session
    # — optimization r14); every frame below is dictionary-bounded
    wc = _word_occ(spark, sf_dir)
    seg = with_greedy_pieces(
        wc.select("word")
        .where(F.length("word") <= WP_MAX_WORD_LEN)
        .distinct(),
        "word",
        vocab,
    ).select(
        "word",
        F.col("wp")["ok"].cast("bigint").alias("ok"),
        F.col("wp")["pct"].alias("pct"),
        (
            F.replace(F.col("wp")["path"], F.lit(BPE_SEP), F.lit(""))
            == F.col("word")
        ).cast("bigint").alias("rt"),
    )
    j = wc.join(seg, "word", "left").select(
        "source",
        "occ",
        "word",
        F.coalesce("ok", F.lit(0).cast("bigint")).alias("ok"),
        F.coalesce("pct", F.lit(0).cast("bigint")).alias("pct"),
        F.coalesce("rt", F.lit(0).cast("bigint")).alias("rt"),
    )
    ok_occ = F.sum(F.col("occ") * F.col("ok")).cast("bigint")
    piece_ct = F.sum(F.col("occ") * F.col("pct") * F.col("ok")).cast("bigint")
    return (
        j.groupBy("source")
        .agg(
            F.sum("occ").cast("bigint").alias("word_ct"),
            F.sum(F.col("occ") * (F.lit(1) - F.col("ok"))).cast("bigint").alias("unk_ct"),
            ok_occ.alias("ok_ct"),
            piece_ct.alias("piece_ct"),
            F.sum(F.col("occ") * F.length("word") * F.col("ok"))
            .cast("bigint")
            .alias("char_ct"),
            F.sum(F.col("occ") * F.col("ok") * F.col("rt"))
            .cast("bigint")
            .alias("roundtrip_ok"),
            F.when(ok_occ == 0, F.lit(0).cast("bigint"))
            .otherwise(F.expr(
                "CAST((100 * sum(occ * pct * ok)) DIV sum(occ * ok) AS BIGINT)"
            ))
            .alias("fertility_x100"),
        )
        .orderBy("source")
    )


def _wp_rounds_cte() -> str:
    """Unrolled K-round WordPiece trainer CTE chain (mirrors
    llm/wordpiece.py): the limited alphabet (top WP_ALPHABET_LIMIT chars
    by weighted count, char-asc tie-break), alphabet-clean training
    words, then per round frequency-weighted unigram and bigram counts
    over the char-sequence strings, the deterministic top-1 by EXACT
    INT128 cross-multiplication (NOT EXISTS anti-join — a rational max
    has no overflow-safe scalar sort key; the engine's twin is the
    arbitrary-precision tournament reduce), and the plain-concat replace
    rewrite.

    Every per-round CTE is MATERIALIZED: wt/wu/wps/wd are each referenced
    2-3 times per level and DuckDB's default inlining re-expands the
    whole upstream chain per reference -- measured ~3^K blowup (256 s
    at sf0.01); materialization makes the unroll linear. The anti-join
    is quadratic in DISTINCT BIGRAM TYPES (bounded by the alphabet², a
    few thousand) — never corpus-sized."""
    from gmall_flink_spark.llm.wordpiece import (
        WP_ALPHABET_LIMIT,
        WP_MAX_WORD_LEN,
        WP_TRAIN_ROUNDS,
    )

    parts = [f"""
    WITH wpw AS MATERIALIZED (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
      FROM (SELECT unnest({_TOKS}) AS w FROM documents)
      WHERE length(w) <= {WP_MAX_WORD_LEN}
      GROUP BY w),
    walpha AS MATERIALIZED (
      SELECT c FROM (
        SELECT c, SUM(wcount) AS cnt
        FROM (SELECT unnest([substring(word, i, 1)
                             for i in range(1, length(word) + 1)]) AS c,
                     wcount
              FROM wpw)
        GROUP BY c ORDER BY cnt DESC, c LIMIT {WP_ALPHABET_LIMIT})),
    wtr AS MATERIALIZED (
      -- alphabet-clean training words: no char outside walpha
      SELECT word, wcount FROM wpw
      WHERE length(translate(word,
                (SELECT string_agg(c, '' ORDER BY c) FROM walpha), '')) = 0),
    wd1 AS MATERIALIZED (
      SELECT word, wcount,
             {_BPE_S} || array_to_string(
                 [substring(word, i, 1) for i in range(1, length(word) + 1)],
                 {_BPE_S}||{_BPE_S}) || {_BPE_S} AS s
      FROM wtr)"""]
    for i in range(1, WP_TRAIN_ROUNDS + 1):
        parts.append(f"""
    wt{i} AS MATERIALIZED (SELECT wcount,
                     string_split(substr(s, 2, length(s) - 2),
                                  {_BPE_S}||{_BPE_S}) AS l
              FROM wd{i}),
    wu{i} AS MATERIALIZED (SELECT t, CAST(SUM(wcount) AS BIGINT) AS cnt
              FROM (SELECT wcount, unnest(l) AS t FROM wt{i})
              GROUP BY t),
    wps{i} AS MATERIALIZED (
      SELECT a, b, pair_ct, ua.cnt AS cnt_a, ub.cnt AS cnt_b
      FROM (
        SELECT a, b, CAST(SUM(wcount) AS BIGINT) AS pair_ct
        FROM (SELECT wcount, u.p['a'] AS a, u.p['b'] AS b
              FROM wt{i},
                   LATERAL unnest([{{'a': l[j], 'b': l[j + 1]}}
                                   for j in range(1, len(l))]) AS u(p))
        GROUP BY a, b) pc
      JOIN wu{i} ua ON pc.a = ua.t
      JOIN wu{i} ub ON pc.b = ub.t),
    wp{i} AS MATERIALIZED (
      SELECT a, b, pair_ct, cnt_a, cnt_b
      FROM wps{i} s
      WHERE NOT EXISTS (
        SELECT 1 FROM wps{i} t
        WHERE CAST(t.pair_ct AS HUGEINT) * s.cnt_a * s.cnt_b
            > CAST(s.pair_ct AS HUGEINT) * t.cnt_a * t.cnt_b)
      ORDER BY pair_ct DESC, a, b
      LIMIT 1),
    wd{i + 1} AS MATERIALIZED (
      -- LEFT JOIN + CASE mirrors the engine's empty-top early stop
      SELECT word, wcount,
             CASE WHEN a IS NULL THEN s
                  ELSE replace(s,
                       {_BPE_S} || a || {_BPE_S}||{_BPE_S} || b || {_BPE_S},
                       {_BPE_S} || a || b || {_BPE_S}) END AS s
      FROM wd{i} LEFT JOIN wp{i} ON TRUE)""")
    return ",".join(parts)


def _wp_train_oracle() -> str:
    from gmall_flink_spark.llm.wordpiece import WP_TRAIN_ROUNDS

    rounds_sel = "\n    UNION ALL ".join(
        f"SELECT {i} AS round, a AS pair_a, b AS pair_b, pair_ct, cnt_a, cnt_b"
        f" FROM wp{i}"
        for i in range(1, WP_TRAIN_ROUNDS + 1)
    )
    return _wp_rounds_cte() + f"\n    {rounds_sel}\n    ORDER BY round"


def _wp_merge_vocab_sel() -> str:
    """The merge-product half of the WordPiece vocab, as a UNION select —
    ONE source for both the encode oracle's wvocab and the tokenizer-
    compare artifact count (a drift here would silently desync the two)."""
    from gmall_flink_spark.llm.wordpiece import WP_TRAIN_ROUNDS

    return "\n      UNION ".join(
        f"SELECT a || b AS piece FROM wp{i}"
        for i in range(1, WP_TRAIN_ROUNDS + 1)
    )


def _wp_encode_oracle() -> str:
    """Greedy longest-match-first walk, unrolled one CTE level per
    consumed piece (WP_MAX_WORD_LEN levels) over the DISTINCT in-cap
    words; vocab = the LIMITED alphabet ∪ the K merge products. Words
    over the cap never reach the walk — they LEFT-join back as UNK (the
    representation-limit contract). An independent implementation of the
    same greedy contract — the engine unrolls column expressions, the
    oracle unrolls CTEs with IN-subquery membership probes."""
    from gmall_flink_spark.llm.wordpiece import WP_MAX_WORD_LEN

    vocab_sel = _wp_merge_vocab_sel()
    levels = []
    step_case = "CASE\n" + "\n".join(
        f"            WHEN length(word) - pos + 1 >= {l} AND"
        f" substring(word, pos, {l}) IN (SELECT piece FROM wvocab)"
        f" THEN {l}"
        for l in range(WP_MAX_WORD_LEN, 0, -1)
    ) + "\n          END"
    for k in range(1, WP_MAX_WORD_LEN + 1):
        levels.append(f"""
    wg{k} AS MATERIALIZED (
      SELECT word,
             CASE WHEN ok = 0 OR pos > length(word) THEN pos
                  ELSE pos + coalesce(step, 0) END AS pos,
             CASE WHEN ok = 0 THEN 0
                  WHEN pos > length(word) THEN ok
                  WHEN step IS NULL THEN 0 ELSE 1 END AS ok,
             CASE WHEN ok = 0 OR pos > length(word) OR step IS NULL THEN pct
                  ELSE pct + 1 END AS pct
      FROM (SELECT word, pos, ok, pct,
                   {step_case} AS step
            FROM wg{k - 1}))""")
    return (
        _wp_rounds_cte()
        + f""",
    wvocab AS MATERIALIZED (
      SELECT c AS piece FROM walpha
      UNION
      {vocab_sel}),
    fw AS (
      SELECT source, w AS word, CAST(COUNT(*) AS BIGINT) AS occ
      FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)
      GROUP BY source, w),
    wg0 AS (SELECT DISTINCT word, 1 AS pos, 1 AS ok, CAST(0 AS BIGINT) AS pct
            FROM fw WHERE length(word) <= {WP_MAX_WORD_LEN}),
    {",".join(levels)},
    wseg AS (
      SELECT word,
             CASE WHEN ok = 1 AND pos > length(word) THEN 1 ELSE 0 END AS ok,
             pct
      FROM wg{WP_MAX_WORD_LEN})
    SELECT f.source,
           CAST(SUM(occ) AS BIGINT) AS word_ct,
           CAST(SUM(occ * (1 - COALESCE(s.ok, 0))) AS BIGINT) AS unk_ct,
           CAST(SUM(occ * COALESCE(s.ok, 0)) AS BIGINT) AS ok_ct,
           CAST(SUM(occ * COALESCE(s.pct * s.ok, 0)) AS BIGINT) AS piece_ct,
           CAST(SUM(occ * length(f.word) * COALESCE(s.ok, 0)) AS BIGINT)
               AS char_ct,
           -- greedy pieces concat back to the word by construction; the
           -- engine reconstructs from its path string independently
           CAST(SUM(occ * COALESCE(s.ok, 0)) AS BIGINT) AS roundtrip_ok,
           CAST(CASE WHEN SUM(occ * COALESCE(s.ok, 0)) = 0 THEN 0
                     ELSE (100 * SUM(occ * COALESCE(s.pct * s.ok, 0)))
                          // SUM(occ * COALESCE(s.ok, 0))
                END AS BIGINT) AS fertility_x100
    FROM fw f LEFT JOIN wseg s USING (word)
    GROUP BY f.source ORDER BY f.source"""
    )


QUERIES["llm_wordpiece_train"] = llm_wordpiece_train
QUERIES["llm_wordpiece_encode"] = llm_wordpiece_encode
ORACLE["llm_wordpiece_train"] = _wp_train_oracle()
ORACLE["llm_wordpiece_encode"] = _wp_encode_oracle()


def llm_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family tokenizer SELECTION card — the governance artifact an
    LLM corpus owner reads before committing a 100 TB encode to one
    tokenizer: for each trained family (BPE merge-up, WordPiece
    likelihood-merge, unigram-LM prune-down), the corpus-level
    compression in ONE comparable row — input units (BPE: word tokens
    before merging; WordPiece/unigram: characters of encodable words),
    output units (tokens / pieces after encoding), the output/input
    ratio in basis points, and the shipped artifact's size (BPE: learned
    merges; WordPiece: limited alphabet + merge products; unigram: final
    ranked vocab).

    Scale: pure composition — each family's encode aggregate reuses the
    session-memoized trainer state the family's own queries built (zero
    new corpus passes beyond the three encode aggregates); artifact
    sizes are the bounded collected artifacts' row counts. The oracle
    re-derives each family via its full independent CTE chain scoped
    inside a derived table (no cross-family name collisions).

    Fresh-session cold path (optimization r15, guide §2.6): the three
    trainer chains are INDEPENDENT (BPE merge loop, WordPiece likelihood
    loop, unigram EM), and each is a sequence of small driver-synced
    rounds that leaves most executors idle between jobs — so the compare
    card warms the three memos from a 3-thread driver pool before
    composing. Each memo still builds single-threaded under its own lock
    (build once, publish once — _memo_lock); the pool only overlaps
    DIFFERENT chains' jobs, which Spark's FIFO scheduler back-fills onto
    idle executors. With warm memos the pool is three no-op lookups."""
    from concurrent.futures import ThreadPoolExecutor

    try:
        from pyspark import inheritable_thread_target as _itt
    except ImportError:  # pragma: no cover - older Spark
        def _itt(f):
            return f

    warmers = [
        lambda: _bpe_state(spark, sf_dir),
        lambda: _wp_state(spark, sf_dir),
        lambda: _unigram_vocab(spark, sf_dir),
    ]
    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = [pool.submit(_itt(w)) for w in warmers]
        for fut in futures:
            fut.result()  # surface any build error before composing

    b = llm_bpe_encode(spark, sf_dir).agg(
        F.sum("tok_before").cast("bigint").alias("input_units"),
        F.sum("tok_after").cast("bigint").alias("output_units"),
    )
    w = llm_wordpiece_encode(spark, sf_dir).agg(
        F.sum("char_ct").cast("bigint").alias("input_units"),
        F.sum("piece_ct").cast("bigint").alias("output_units"),
    )
    u = llm_unigram_encode(spark, sf_dir).agg(
        F.sum("char_ct").cast("bigint").alias("input_units"),
        F.sum("piece_ct").cast("bigint").alias("output_units"),
    )
    sizes = {
        "bpe": _bpe_state(spark, sf_dir)[0].count(),
        "wordpiece": len(_wp_state(spark, sf_dir)[1]),
        "unigram": _unigram_vocab(spark, sf_dir).count(),
    }
    out = None
    for fam, agg in (("bpe", b), ("wordpiece", w), ("unigram", u)):
        row = agg.select(
            F.lit(fam).alias("family"),
            "input_units",
            "output_units",
            F.when(F.col("input_units") == 0, F.lit(10000).cast("bigint"))
            .otherwise(F.expr("(10000 * output_units) DIV input_units"))
            .alias("ratio_bp"),
            F.lit(sizes[fam]).cast("bigint").alias("artifact_size"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("family")


def _wp_vocab_count_cte() -> str:
    return (
        _wp_rounds_cte()
        + f""",
    wvocab AS (SELECT c AS piece FROM walpha UNION {_wp_merge_vocab_sel()})
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wvocab"""
    )


def _tokenizer_compare_oracle() -> str:
    """Each family's full oracle chain runs scoped inside its own derived
    table (DuckDB supports WITH inside subqueries), so the three
    generated CTE chains can never collide on names; artifact sizes come
    from the train oracles the same way."""
    bpe_ratio = (
        "CASE WHEN SUM(tok_before) = 0 THEN 10000 "
        "ELSE (10000 * SUM(tok_after)) // SUM(tok_before) END"
    )
    cw_ratio = (
        "CASE WHEN SUM(char_ct) = 0 THEN 10000 "
        "ELSE (10000 * SUM(piece_ct)) // SUM(char_ct) END"
    )
    return f"""
    SELECT 'bpe' AS family,
           CAST(SUM(tok_before) AS BIGINT) AS input_units,
           CAST(SUM(tok_after) AS BIGINT) AS output_units,
           CAST({bpe_ratio} AS BIGINT) AS ratio_bp,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM ({_bpe_train_oracle()}) bt) AS artifact_size
    FROM ({_bpe_encode_oracle()}) be
    UNION ALL
    SELECT 'unigram' AS family,
           CAST(SUM(char_ct) AS BIGINT) AS input_units,
           CAST(SUM(piece_ct) AS BIGINT) AS output_units,
           CAST({cw_ratio} AS BIGINT) AS ratio_bp,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM ({_unigram_train_oracle()}) ut) AS artifact_size
    FROM ({_unigram_encode_oracle()}) ue
    UNION ALL
    SELECT 'wordpiece' AS family,
           CAST(SUM(char_ct) AS BIGINT) AS input_units,
           CAST(SUM(piece_ct) AS BIGINT) AS output_units,
           CAST({cw_ratio} AS BIGINT) AS ratio_bp,
           (SELECT n FROM ({_wp_vocab_count_cte()}) wv) AS artifact_size
    FROM ({_wp_encode_oracle()}) we
    ORDER BY family"""


QUERIES["llm_tokenizer_compare"] = llm_tokenizer_compare
ORACLE["llm_tokenizer_compare"] = _tokenizer_compare_oracle()


# ---------------------------------------------------------------------------
# Curriculum ordering — the training-ORDER governance artifact next to the
# training-SET ones (llm_corpus_build decides WHAT trains, llm_shard_manifest
# decides WHERE it lives; this decides WHEN it is seen).
# ---------------------------------------------------------------------------

#: curriculum stages (quality quartiles, low -> high: the decay-phase
#: anneal recipe — the highest-quality stage lands at the END of training)
CURRICULUM_STAGES = 4


def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CURRICULUM manifest: every doc gets the shared
    integer quality score (queries/text.doc_quality_scores — the one
    scoring contract, SQL twin SCORED_DOCS_SQL), docs are staged into
    CURRICULUM_STAGES per-source quality quartiles (ntile over the total
    order score, doc_id — low first, so the highest-quality quartile
    anneals at the end of training), and WITHIN each stage the training
    position is a seed-free hash shuffle (portable md5 hash, the
    llm_shard_manifest identity) — deterministic like everything a
    reproducible run ships, but uncorrelated with doc_id/source order.
    One row per (source, stage): docs, tokens, first/last doc in
    training order, and an order checksum sum(pos · (doc_id mod 997))
    that pins the exact permutation — two orders with equal counts
    cannot both pass.

    Scale: both windows are keyed by source (ntile) and (source, stage)
    (row_number) — no global sort; the checksum aggregate is one
    bounded-key shuffle. An exact global interleave would need a total
    order; the per-source manifest is what a sharded writer consumes."""
    from pyspark.sql import Window

    from gmall_flink_spark.functions.text import md5_long
    from gmall_flink_spark.queries.text import doc_quality_scores

    docs = table(spark, sf_dir, "documents")
    scored = doc_quality_scores(docs).join(
        docs.select(
            "doc_id", F.size(tokenize("text")).cast("bigint").alias("n_toks")
        ),
        "doc_id",
    )
    ws = Window.partitionBy("source").orderBy("score", "doc_id")
    staged = scored.withColumn(
        "stage", F.ntile(CURRICULUM_STAGES).over(ws)
    )
    wp = Window.partitionBy("source", "stage").orderBy(
        md5_long(F.col("doc_id").cast("string")), "doc_id"
    )
    pos = staged.withColumn("pos", F.row_number().over(wp).cast("bigint"))
    return (
        pos.groupBy("source", "stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_ct"),
            F.sum("n_toks").cast("bigint").alias("token_ct"),
            F.min("score").cast("bigint").alias("score_min"),
            F.max("score").cast("bigint").alias("score_max"),
            F.min_by("doc_id", "pos").alias("first_doc"),
            F.max_by("doc_id", "pos").alias("last_doc"),
            F.sum(F.col("pos") * (F.col("doc_id") % SHARD_CK_MOD))
            .cast("bigint")
            .alias("order_checksum"),
        )
        .orderBy("source", "stage")
    )


def _curriculum_oracle() -> str:
    from gmall_flink_spark.queries.text import SCORED_DOCS_SQL

    return f"""
    WITH scored AS ({SCORED_DOCS_SQL}),
    tok AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_toks
            FROM documents),
    st AS (
        SELECT s.source, s.doc_id, s.score, t.n_toks,
               ntile({CURRICULUM_STAGES}) OVER (
                   PARTITION BY s.source ORDER BY s.score, s.doc_id
               ) AS stage
        FROM scored s JOIN tok t USING (doc_id)),
    po AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY source, stage
                   ORDER BY {_MD5H.format(key="CAST(doc_id AS VARCHAR)")},
                            doc_id) AS BIGINT) AS pos
        FROM st)
    SELECT source, stage,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           CAST(SUM(n_toks) AS BIGINT) AS token_ct,
           CAST(MIN(score) AS BIGINT) AS score_min,
           CAST(MAX(score) AS BIGINT) AS score_max,
           arg_min(doc_id, pos) AS first_doc,
           arg_max(doc_id, pos) AS last_doc,
           CAST(SUM(pos * (doc_id % {SHARD_CK_MOD})) AS BIGINT)
               AS order_checksum
    FROM po GROUP BY source, stage ORDER BY source, stage
    """


QUERIES["llm_curriculum_order"] = llm_curriculum_order
ORACLE["llm_curriculum_order"] = _curriculum_oracle()


def llm_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ROUND-BUDGET planning curve (the PLAN-step pattern of
    lsh_sensitivity_curve, applied to BPE): corpus token count after each
    merge-round prefix 0..K, with cumulative and per-round merged
    occurrences and the compression ratio in basis points — the table
    that answers "how many merge rounds does THIS corpus need" before
    committing to a 100 TB encode. Per-round merged counts are measured
    by re-encoding, not read from the trainer's pair_ct — greedy
    non-overlapping application merges FEWER occurrences than the pair
    count when matches overlap (the 'a a a' case), so the curve is a
    genuinely different statistic from the merge table.

    Scale: the merge list is the K-row collected artifact; each curve
    point is one map-only prefix re-encode + a global sum (K+1 passes —
    at corpus scale run the curve on the trainer's hash sample; the
    full-corpus form here matches the oracle's corpus exactly)."""
    from gmall_flink_spark.llm.bpe import bpe_apply_merges, seq_token_count

    merges_df, _ = _bpe_state(spark, sf_dir)
    mrows = [
        (r["pair_a"], r["pair_b"]) for r in merges_df.orderBy("round").collect()
    ]
    docs = table(spark, sf_dir, "documents")
    toked = docs.select(
        tokenize("text").alias("l"),
        F.size(tokenize("text")).cast("bigint").alias("n0"),
    )
    frames = [
        toked.agg(F.sum("n0").alias("tok_ct")).select(
            F.lit(0).alias("round"), F.col("tok_ct").cast("bigint").alias("tok_ct")
        )
    ]
    for i in range(1, len(mrows) + 1):
        enc = bpe_apply_merges(toked, "l", mrows[:i])
        frames.append(
            enc.agg(F.sum(seq_token_count("s")).alias("tok_ct")).select(
                F.lit(i).alias("round"),
                F.col("tok_ct").cast("bigint").alias("tok_ct"),
            )
        )
    curve = frames[0]
    for f in frames[1:]:
        curve = curve.unionByName(f)
    from pyspark.sql import Window

    w = Window.orderBy("round")  # 7-row frame: the unpartitioned window is bounded
    tok0 = F.first("tok_ct").over(
        Window.orderBy("round").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        curve.withColumn("tok0", tok0)
        .withColumn(
            "merged_ct", (F.col("tok0") - F.col("tok_ct")).cast("bigint")
        )
        .withColumn(
            "round_merged_ct",
            F.coalesce(
                F.lag("tok_ct").over(w) - F.col("tok_ct"), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn(
            "ratio_bp",
            F.when(F.col("tok0") == 0, F.lit(10000).cast("bigint")).otherwise(
                F.expr("CAST((10000 * tok_ct) DIV tok0 AS BIGINT)")
            ),
        )
        .drop("tok0")
        .orderBy("round")
    )


def _bpe_curve_oracle() -> str:
    counts = []
    for i in range(0, BPE_TRAIN_ROUNDS + 1):
        counts.append(f"""
    c{i} AS (
        SELECT CAST({i} AS INTEGER) AS round,
               CAST(SUM(CASE WHEN length(s) <= 2 THEN 0
                        ELSE len(string_split(substr(s, 2, length(s) - 2),
                                              {_BPE_S}||{_BPE_S})) END)
                    AS BIGINT) AS tok_ct
        FROM d{i + 1})""")
    # the engine emits one curve point per LEARNED merge (+round 0); when
    # the trainer early-stops (no bigram left), rounds past the stop have
    # an empty p{i} — gate them out of the union so the row counts match
    # on degenerate/tiny corpora (ADVICE r12)
    union = "\n        UNION ALL ".join(
        ["SELECT * FROM c0"]
        + [
            f"SELECT * FROM c{i} WHERE EXISTS (SELECT 1 FROM p{i})"
            for i in range(1, BPE_TRAIN_ROUNDS + 1)
        ]
    )
    return (
        _bpe_rounds_cte()
        + ","
        + ",".join(counts)
        + f""",
    curve AS ({union})
    SELECT round, tok_ct,
           CAST((SELECT tok_ct FROM c0) - tok_ct AS BIGINT) AS merged_ct,
           CAST(COALESCE(LAG(tok_ct) OVER (ORDER BY round) - tok_ct, 0)
                AS BIGINT) AS round_merged_ct,
           CAST(CASE WHEN (SELECT tok_ct FROM c0) = 0 THEN 10000
                     ELSE (10000 * tok_ct) // (SELECT tok_ct FROM c0)
                END AS BIGINT) AS ratio_bp
    FROM curve ORDER BY round"""
    )


QUERIES["llm_bpe_compression_curve"] = llm_bpe_compression_curve
ORACLE["llm_bpe_compression_curve"] = _bpe_curve_oracle()
