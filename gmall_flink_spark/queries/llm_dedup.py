"""Oracle-checked deduplication queries over `documents` (north-star ops:
exact, MinHash-LSH, n-gram jaccard, SimHash). Thresholds use integer
arithmetic (scale*inter vs q*union) — no FP boundaries to disagree on."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import fingerprint
from gmall_flink_spark.llm.dedup import (
    EXACT_FP_MAX_GROUP,
    connected_components,
    containment_scored_pairs,
    doc_tokens,
    exact_fingerprint_pairs,
    jaccard_pairs,
    lsh_candidates,
    lsh_candidates_two_level,
    matrix_bands,
    minhash_matrix,
    prefix_filter_candidates,
    shingles_from_tokens,
    simhash,
)
from gmall_flink_spark.llm.substring import (
    SUBSTR_MIN_OCC,
    SUBSTR_W,
    dup_span_stats,
)
from gmall_flink_spark.sources.tables import table

MINHASH_K = 12
ROWS_PER_BAND = 3
#: level-2 band width for over-cap coarse buckets (llm/dedup.py::
#: lsh_candidates_two_level): 6-row bands double the signature entropy, so
#: mega-bucket members split into pairable sub-cap buckets (2 fine bands
#: from the same 12 minhashes; ~0.78 pair recall at j=0.9)
FINE_ROWS_PER_BAND = 6
# Shingle document-frequency cap for the unrestricted inverted-index join:
# a single stop-phrase shingle shared by M docs costs O(M^2) pairs, so the
# ngram path only scores *discriminative* shingles (df <= cap). 5 both
# exercises the cap at test SF (max df there is 7) and is the scale guard.
NGRAM_MAX_DF = 5
# LSH degenerate-bucket cap (see llm/dedup.lsh_candidates): a bucket of B
# docs costs B²/2 pairs — without the cap sixteen >200-member buckets at
# sf0.1 contribute 15.2M of 15.3M pairs. The production candidate rule is
# TWO-LEVEL (lsh_candidates_two_level): over-cap coarse-bucket members are
# re-banded at FINE_ROWS_PER_BAND and pair within sub-cap fine buckets;
# still-over-cap fine buckets are dropped (bounded-cost residual —
# lsh_recall_audit measures exactly what that residual costs on this
# corpus, and dedup_allpairs_exact/dedup_components_exact are the exact
# complement). A star fallback (O(B) edges to the bucket min) exists as an
# lsh_candidates option for homogeneous mega-buckets.
LSH_MAX_BUCKET = 50


def dedup_exact_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on a 2-token-prefix fingerprint: dup
    groups with member count and representative (min doc_id)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint("text", prefix_tokens=2).alias("fp2"))
        .groupBy("fp2")
        .agg(F.count(F.lit(1)).alias("dup_ct"), F.min("doc_id").alias("keep_doc"))
        .where(F.col("dup_ct") > 1)
        .orderBy("fp2")
    )


#: tokenized documents (doc_id, toks array), memoized per (session, sf_dir,
#: content stamp — sources.tables.memo_key): the scan + tokenize stage feeds
#: the token-unit explode (minhash/jaccard-verify) AND the 3-gram shingle
#: explode (ngram_jaccard_stats); one eager localCheckpoint serves both, so
#: the corpus is scanned and tokenized exactly once per session.
_DOC_TOKS: dict[tuple, DataFrame] = {}


def _doc_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _DOC_TOKS)
    if key not in _DOC_TOKS:
        toked = doc_tokens(table(spark, sf_dir, "documents"))
        _DOC_TOKS[key] = toked.localCheckpoint(eager=True)
    return _DOC_TOKS[key]


#: distinct (doc_id, token) units, memoized like _doc_toks: the unit
#: explode feeds BOTH the minhash-signature path and the jaccard verify in
#: every LSH query, and Catalyst plans each reference as its own explode;
#: one eager localCheckpoint serves them all (the same shared-stage pattern
#: as _components / _winnow_docs).
_DOC_UNITS: dict[tuple, DataFrame] = {}


def _doc_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _DOC_UNITS)
    if key not in _DOC_UNITS:
        units = _doc_toks(spark, sf_dir).select(
            "doc_id", F.explode(F.array_distinct("toks")).alias("shingle")
        )
        _DOC_UNITS[key] = units.localCheckpoint(eager=True)
    return _DOC_UNITS[key]


#: WIDE minhash signature matrix (doc_id, _m0.._m{k-1}), memoized like
#: _doc_units: the signature groupBy is the one shuffle every banding
#: pays, and both band widths of the two-level candidate rule PLUS the
#: bucket report (minhash_band_buckets) are map-only projections of this
#: one frame (llm/dedup.matrix_bands) — so the matrix is aggregated
#: exactly once per (session, sf_dir, content stamp). The matrix is BARE
#: since optimization r15: the per-doc unit count and the token-set
#: fingerprint that rode this groupBy in r14 are map-only projections of
#: the token arrays (_doc_stats / llm.dedup.doc_set_stats), so the
#: signature exchange ships only the k fixed-width minhash partials —
#: never the distinct-token payload — and standalone banding consumers
#: (minhash_band_buckets) stop paying for aggregates they don't read.
#: At production scale this is the persisted signature table of the
#: dedup index.
_MINHASH_MX: dict[tuple, DataFrame] = {}


def _minhash_mx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _MINHASH_MX)
    if key not in _MINHASH_MX:
        mx = minhash_matrix(_doc_units(spark, sf_dir), MINHASH_K)
        _MINHASH_MX[key] = mx.localCheckpoint(eager=True)
    return _MINHASH_MX[key]


#: (doc_id, n, setfp) derived map-only from the token arrays (see
#: llm.dedup.doc_set_stats), memoized with a LAZY localCheckpoint: the
#: frame is referenced several times inside exact_fingerprint_pairs and
#: the verify join, and each unshared reference would otherwise re-run
#: the doc-text-sized sort+concat+md5 map per doc (measured ~35% on the
#: simhash card when left unshared). Checkpointed it computes once per
#: session at first action; lazy, so plan-only consumers stay jobless.
_DOC_STATS: dict[tuple, DataFrame] = {}


def _doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.llm.dedup import doc_set_stats
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _DOC_STATS)
    if key not in _DOC_STATS:
        _DOC_STATS[key] = doc_set_stats(_doc_toks(spark, sf_dir)).localCheckpoint(
            eager=False
        )
    return _DOC_STATS[key]


#: two-level LSH candidate pairs, memoized like the other shared stages:
#: the verified pair graph builds on them and lsh_recall_audit scores the
#: SAME production candidate rule — one banding pipeline serves both.
#: oversize_fine="star" since r14 (VERDICT r13 task 2, decided on the sf1
#: measurement in RECALL_SF1_r14_pre.json): still-over-cap fine buckets
#: contribute B-1 hub edges instead of being dropped — exact-verified
#: downstream like every candidate, linear cost, and the component-level
#: co-membership recall of the exact closure at the sf1 construction rose
#: 1.2% -> 6.3% at 98.2% pair precision for ~zero wall cost.
_LSH_CANDS: dict[tuple, DataFrame] = {}


def _lsh_cands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _LSH_CANDS)
    if key not in _LSH_CANDS:
        cands = lsh_candidates_two_level(
            _minhash_mx(spark, sf_dir),
            ROWS_PER_BAND,
            FINE_ROWS_PER_BAND,
            max_bucket=LSH_MAX_BUCKET,
            oversize_fine="star",
        )
        _LSH_CANDS[key] = cands.localCheckpoint(eager=True)
    return _LSH_CANDS[key]


#: identical-document pair graph (token-set-fingerprint pre-pass), memoized
#: like the other shared stages: both the verified MinHash pair graph and
#: lsh_recall_audit union it in (VERDICT r13 weak #1 — identical documents
#: share every band value, so the capped banded index is structurally blind
#: to exactly the heaviest duplicates; the SimHash family routed around the
#: cap this way in r10 and the sf1 audit showed MinHash losing 22,423/22,450
#: exact pairs without it)
_EXACT_PAIRS: dict[tuple, DataFrame] = {}


def _exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _EXACT_PAIRS)
    if key not in _EXACT_PAIRS:
        # the fingerprint is a MAP-ONLY projection of the token arrays
        # (optimization r15 — no aggregation at all); the pair expansion
        # here only touches the per-doc fp frame, never the units
        fp = _doc_stats(spark, sf_dir).select("doc_id", "setfp")
        pairs = exact_fingerprint_pairs(None, fp=fp).select(
            F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b")
        )
        _EXACT_PAIRS[key] = pairs.localCheckpoint(eager=True)
    return _EXACT_PAIRS[key]


#: verified near-dup pair graph (LSH candidates -> exact jaccard, j >= 0.9,
#: UNION the exact-fingerprint pre-pass at jaccard 1 by construction),
#: memoized like _doc_units/_components: minhash_lsh_pairs, the component
#: pipeline, and dedup_cross_source all consume the SAME verify join — the
#: suite's third-heaviest stage — so it runs once per (session, sf_dir,
#: content stamp), and the j-threshold lives in exactly one place.
_VERIFIED: dict[tuple, DataFrame] = {}

#: exact-jaccard verify threshold j >= VERIFY_J_NUM/VERIFY_J_DEN for the
#: LSH-candidate pair graph — hoisted out of _verified_pairs' body so the
#: artifact stamp hashes it as a CONSTANT (ADVICE r11 / VERDICT r11 task 3):
#: the `WHERE 10 * inter >= 9 * uni` clauses in the oracle SQL mirror this
#: ratio — changing it means changing both sides and re-running the sweep.
VERIFY_J_NUM = 9
VERIFY_J_DEN = 10


def _verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _VERIFIED)
    if key not in _VERIFIED:
        units = _doc_units(spark, sf_dir)
        # guide §2.6 overlap (optimization r15): the candidate banding
        # (matrix -> two-level buckets) and the exact-fingerprint
        # pre-pass (doc stats -> fp self-join) are INDEPENDENT chains of
        # small driver-synced jobs over DISJOINT memos once the shared
        # token parents above exist ({_MINHASH_MX, _LSH_CANDS} vs
        # {_DOC_STATS, _EXACT_PAIRS}) — built sequentially they leave
        # executors idle between jobs, so a cold call warms both from a
        # 2-thread pool (the llm_tokenizer_compare trainer-chain
        # pattern). Warm-memo calls resolve as two dict lookups.
        from concurrent.futures import ThreadPoolExecutor

        try:
            from pyspark import inheritable_thread_target as _itt
        except ImportError:  # pragma: no cover - older Spark
            def _itt(f):
                return f

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_cands = pool.submit(_itt(lambda: _lsh_cands(spark, sf_dir)))
            f_exact = pool.submit(_itt(lambda: _exact_pairs(spark, sf_dir)))
            cands = f_cands.result()
            f_exact.result()  # surface any build error before composing
        # per-doc sizes are a MAP-ONLY projection of the token arrays
        # (optimization r15): zero shuffles for the verify join's
        # length-ratio prune AND the exact path below
        sizes = _doc_stats(spark, sf_dir).select("doc_id", "n")
        # ratio=(NUM, DEN) is the lossless length prune for the j >= NUM/DEN
        # threshold below — identical verified output, fewer unit joins
        jac = jaccard_pairs(
            units, cands, ratio=(VERIFY_J_NUM, VERIFY_J_DEN), sizes=sizes
        )
        lsh_verified = jac.where(
            VERIFY_J_DEN * F.col("inter") >= VERIFY_J_NUM * F.col("uni")
        ).select("doc_a", "doc_b", "inter", "uni")
        # exact-fingerprint pre-pass (VERDICT r13 weak #1): identical token
        # sets have inter == uni == |set| by construction, so the pairs skip
        # the verify join entirely — one sizes lookup on doc_a suffices
        # (doc_b's set is identical). verify(cands ∪ exact) == verify(cands)
        # ∪ exact, which is what the oracle's unioned _CANDS computes; a pair
        # both paths find carries identical (inter, uni), so DISTINCT over
        # all four columns collapses it.
        exact = (
            _exact_pairs(spark, sf_dir)
            .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .select("doc_a", "doc_b", F.col("n").alias("inter"), F.col("n").alias("uni"))
        )
        _VERIFIED[key] = (
            lsh_verified.unionByName(exact).distinct().localCheckpoint(eager=True)
        )
    return _VERIFIED[key]


def dedup_containment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set-CONTAINMENT dedup card on the deterministic
    1-in-AUDIT_MOD sample: unordered pairs where either side's token set
    is >= 90% inside the other (|A∩B| >= 0.9·|A|), split into mutual /
    one-way, plus the governance count symmetric dedup cannot see —
    ``beyond_jaccard_ct``, pairs at containment >= 0.9 whose jaccard is
    < 0.9 (the quote/excerpt class: a paragraph inside a page has
    containment ~1 and jaccard ~0.01; GPT-3 appendix-C scrubs exactly
    this shape by span, this card measures it by set).

    Candidates come from the one-sided prefix filter inside
    llm/dedup.containment_scored_pairs (provably complete at the
    threshold per direction — the docstring there carries the proof),
    canonicalized to unordered pairs and scored once by an exact
    sorted-int-array intersection over the dictionary-encoded token
    universe. The ORACLE brute-forces all shingle-sharing sample pairs
    independently (no prefix mirroring, inverted-index form), so parity
    doubles as a completeness proof of the prefix bound AND of the
    array-scoring rewrite — the same audit structure as
    dedup_allpairs_exact.

    Scale: sample-bounded by construction (never corpus-quadratic); the
    directed prefix join costs Σ df over each doc's ~n/10+1 RAREST tokens
    (the AllPairs bound, one-sided)."""
    units = _doc_units(spark, sf_dir).where(
        F.pmod(F.col("doc_id"), F.lit(AUDIT_MOD)) == 0
    )
    f = containment_scored_pairs(units, VERIFY_J_NUM, VERIFY_J_DEN)
    ain = VERIFY_J_DEN * F.col("inter") >= VERIFY_J_NUM * F.col("na")
    bin_ = VERIFY_J_DEN * F.col("inter") >= VERIFY_J_NUM * F.col("nb")
    j9 = VERIFY_J_DEN * F.col("inter") >= VERIFY_J_NUM * F.col("uni")
    kept = f.where(ain | bin_)
    return kept.agg(
        F.count(F.lit(1)).alias("pair_ct"),
        F.coalesce(
            F.sum(F.when(ain & bin_, 1).otherwise(0)), F.lit(0)
        ).alias("mutual_ct"),
        F.coalesce(
            F.sum(F.when(ain.cast("int") + bin_.cast("int") == 1, 1).otherwise(0)),
            F.lit(0),
        ).alias("oneway_ct"),
        F.coalesce(
            F.sum(F.when(~j9, 1).otherwise(0)), F.lit(0)
        ).alias("beyond_jaccard_ct"),
        F.coalesce(F.sum("inter"), F.lit(0)).alias("inter_sum"),
        F.coalesce(F.sum("doc_a"), F.lit(0)).alias("a_id_sum"),
        F.coalesce(F.sum("doc_b"), F.lit(0)).alias("b_id_sum"),
    )


def minhash_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH stage 1-3 (shingle→minhash→band): multi-member band
    buckets — each is a candidate near-dup cluster."""
    bands = matrix_bands(_minhash_mx(spark, sf_dir), ROWS_PER_BAND)
    return (
        bands.groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("member_ct"), F.sum("doc_id").alias("doc_id_sum"))
        .where(F.col("member_ct") > 1)
        .orderBy("band", "band_sig")
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup: two-level bucket-join candidates (sub-cap
    coarse buckets all-pair; over-cap bucket members re-band at the fine
    width; still-over-cap fine buckets contribute B-1 star edges to
    their min-id hub — r14, chosen on the sf1 measurement in
    RECALL_SF1_r14_pre.json) verified by exact token-set jaccard, kept
    at j >= 0.9 (10*inter >= 9*union), UNIONed with the exact
    token-set-fingerprint pre-pass (jaccard 1 by construction —
    identical documents share every band value, so the bucket cap is
    structurally blind to exactly the heaviest duplicates; the pre-pass
    finds them in one hash aggregation, the same routing the SimHash
    family applies). Pair recall of the combined rule is MEASURED by
    lsh_recall_audit; the exact complement for the NEAR class is
    dedup_allpairs_exact."""
    return _verified_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def ngram_jaccard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle inverted-index dedup: pair counts at exact integer
    jaccard thresholds (any overlap / j>=0.2 / j>=0.5) over discriminative
    shingles (df <= NGRAM_MAX_DF — the hot-key quadratic-bucket guard).
    Shingles derive from the _doc_toks shared token stage, so the scan +
    tokenize work is the same checkpoint the MinHash family reads."""
    jac = jaccard_pairs(
        shingles_from_tokens(_doc_toks(spark, sf_dir), n=3), max_df=NGRAM_MAX_DF
    )
    return jac.agg(
        F.count(F.lit(1)).alias("pair_ct"),
        F.sum((5 * F.col("inter") >= F.col("uni")).cast("bigint")).alias("j02_ct"),
        F.sum((2 * F.col("inter") >= F.col("uni")).cast("bigint")).alias("j05_ct"),
        F.max("inter").alias("max_inter"),
    )


#: per-doc near-dup component mapping, memoized per (SparkContext, sf_dir,
#: content stamp — see sources.tables.memo_key): dedup_components and
#: dedup_rep_select consume the same LSH → verify → connected-components
#: pipeline (the suite's third-heaviest stage); at production scale the
#: mapping is a persisted table both read. A recreated session or an
#: in-session rewrite of documents.parquet rebuilds instead of serving a
#: dead/stale DF.
_COMPONENTS: dict[tuple, DataFrame] = {}

#: bucket count of the persisted component-mapping artifact (doc_id-hashed
#: directories via sinks/_bucketed.py — the layout the MERGE sinks use, so
#: an incremental maintainer can later merge into the same table)
COMPONENTS_N_BUCKETS = 16


def _components_stamp(sf_dir: str) -> str:
    """Content-stamped invalidation key for the persisted mapping: the
    documents parquet's (mtime_ns, size) — a testdata regen produces a new
    artifact directory — plus a hash of the producing code, so editing the
    pair pipeline can never serve a stale mapping (the materialize.py
    lesson). The code hash covers EVERY layer the artifact derives from
    (ADVICE r10 #1): llm/dedup.py (minhash/banding/jaccard/components
    kernels), this module's producer functions (_doc_toks .. _verified_pairs
    — the inline 9/10 verify threshold and the two-level candidate
    composition live there), the tokenize rule in functions/text.py that
    defines what a token unit IS, and the LSH/banding constants."""
    import hashlib
    import inspect
    import os as _os

    from gmall_flink_spark.functions.text import tokenize as _tokenize
    from gmall_flink_spark.llm import dedup as _dedup_mod

    try:
        st = _os.stat(f"{sf_dir.rstrip('/')}/documents.parquet")
        data = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        data = "0:0"
    consts = repr(
        (
            MINHASH_K,
            ROWS_PER_BAND,
            FINE_ROWS_PER_BAND,
            LSH_MAX_BUCKET,
            VERIFY_J_NUM,
            VERIFY_J_DEN,
        )
    )
    producers = "".join(
        inspect.getsource(fn)
        for fn in (
            _doc_toks,
            _doc_units,
            _doc_stats,
            _minhash_mx,
            _lsh_cands,
            _exact_pairs,
            _verified_pairs,
        )
    )
    code = inspect.getsource(_dedup_mod) + producers + inspect.getsource(_tokenize) + consts
    return hashlib.md5(f"{data}|{code}".encode()).hexdigest()[:12]


def _components_artifact_path(sf_dir: str) -> str:
    from gmall_flink_spark.sources.materialize import CACHE_ROOT, cache_key

    return os.path.join(
        CACHE_ROOT, cache_key(sf_dir), f"neardup_components-{_components_stamp(sf_dir)}"
    )


def _components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup component mapping, as a WRITE-ONCE bucketed table
    artifact (VERDICT r09 task 8): the iterative connected-components run
    (multi-round, 30+ cold shuffles) executes once per (corpus content,
    producer code) and lands under CACHE_ROOT as a doc_id-bucketed parquet
    state dir; every later consumer — six queries share this mapping —
    cold-reads the table instead of re-running the iteration, across
    sessions, not just within one. The session memo stays as an L1 over
    the artifact read. Invalidation is content-stamped
    (_components_stamp), never manual."""
    import shutil
    import uuid as _uuid

    from gmall_flink_spark.sinks._bucketed import read_state, with_bucket
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _COMPONENTS)
    if key not in _COMPONENTS:
        path = _components_artifact_path(sf_dir)
        empty_marker = os.path.join(path, "_EMPTY")
        if not os.path.exists(path):
            edges = _verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
            mapping = connected_components(edges)
            tmp = f"{path}.__build_{_uuid.uuid4().hex[:8]}__"
            # cluster by bucket before the partitionBy write (guide §6):
            # without it every upstream task writes a file into every
            # bucket directory (measured 496 files for a 1.8k-row mapping
            # at sf0.1, 2-6 s to write, 0.4-0.8 s to read); one hash
            # exchange on __bucket makes it one file per bucket (16),
            # 0.6 s to write, half the read — and the compact layout is
            # what the incremental merger and every later cold read scan.
            with_bucket(mapping, ["doc_id"], COMPONENTS_N_BUCKETS).repartition(
                F.col("__bucket")
            ).write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
            if not any(n.startswith("__bucket=") for n in os.listdir(tmp)):
                open(os.path.join(tmp, "_EMPTY"), "w").close()
            with open(os.path.join(tmp, "_N_BUCKETS"), "w") as fh:
                fh.write(str(COMPONENTS_N_BUCKETS))
            try:
                os.rename(tmp, path)  # losers of a build race read the winner
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(empty_marker):
            df = spark.createDataFrame([], "doc_id bigint, component bigint")
        else:
            df = read_state(spark, path)
        _COMPONENTS[key] = df
    return _COMPONENTS[key]


def merge_components_artifact(
    spark: SparkSession,
    path: str,
    new_edges: DataFrame,
    n_buckets: int = COMPONENTS_N_BUCKETS,
) -> None:
    """Incrementally maintain a PERSISTED component-mapping table (the
    production layout of ``_components``' artifact) under a corpus-version
    delta: fold ``new_edges`` (pairs touching added/changed docs — e.g.
    the verified pairs of a corpus_version_diff 'added' slice against the
    index) into the bucketed table via llm.dedup.merge_components,
    rewriting ONLY the doc_id buckets that hold changed or new rows
    (VERDICT r10 task 2).

    Equality with a full rebuild on the merged graph is pinned by
    test_merge_components_artifact_equals_rebuild; the measured
    delta-vs-rebuild cost lives in SCALE.md. The session-stamped artifact
    (_components) stays write-once — a testdata regen changes the content
    stamp and rebuilds — this maintainer is for the governed-table
    deployment where the mapping outlives any one corpus scan and deltas
    arrive from the ingest pipeline."""
    from gmall_flink_spark.llm.dedup import merge_components
    from gmall_flink_spark.sinks._bucketed import (
        check_buckets,
        pin_batch,
        read_prior,
        read_state,
        swap_buckets,
        touched_buckets,
        unpin_batch,
        with_bucket,
    )

    check_buckets(path, n_buckets)
    empty_marker = os.path.join(path, "_EMPTY")
    has_buckets = os.path.exists(path) and any(
        n.startswith("__bucket=") for n in os.listdir(path)
    )
    if os.path.exists(empty_marker) or not has_buckets:
        # fresh or empty-marked state: the first delta seeds the table
        old = spark.createDataFrame([], "doc_id bigint, component bigint")
    else:
        old = read_state(spark, path)
    # pin the batch edges once (merge_components consumes them from three
    # joins and checkpoints NOTHING itself — caller-owned materialization,
    # freed deterministically below, the pin_batch discipline); the
    # mapping side stays a plain columnar re-scan per consumer
    edges = pin_batch(new_edges.select("doc_a", "doc_b"))
    try:
        full = merge_components(old, edges)
        # delta = rows the merge changed or added; (doc_id, component) rows
        # the old table already holds survive untouched in their buckets
        delta = full.join(old, ["doc_id", "component"], "left_anti")
        pinned = pin_batch(with_bucket(delta, ["doc_id"], n_buckets))
        try:
            buckets = touched_buckets(pinned)
            if not buckets:
                return
            prior = read_prior(spark, path, buckets)
            merged = pinned
            if prior is not None:
                merged = prior.join(
                    pinned.select("doc_id"), "doc_id", "left_anti"
                ).select(*pinned.columns).unionAll(pinned)
            swap_buckets(merged, path, buckets, n_buckets)
            if os.path.exists(empty_marker):
                os.remove(empty_marker)
        finally:
            unpin_batch(pinned)
    finally:
        unpin_batch(edges)


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the verified LSH pair
    graph (j >= 0.9) — the step that turns pairs into dedup decisions
    (component id = the kept representative, everything else drops). Output
    is the per-doc component mapping for docs in any cluster (computed once
    per session via ``_components``, shared with dedup_rep_select).

    Recall caveat (measured, r6): the LSH graph is the bounded-cost path
    and on low-entropy corpora its pair recall collapses (this testdata:
    see lsh_recall_audit); the exact decision ledger is
    dedup_components_exact (prefix-filtered, sampled), and SCALE.md's r6
    section states when to reach for which."""
    return _components(spark, sf_dir).orderBy("doc_id")


#: fixed-point scale of the LSH sensitivity curve (probabilities ×1e6)
LSH_CURVE_Q = 1_000_000


def lsh_sensitivity_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PLAN step of the dedup governance story (detect → verify →
    audit → plan): the banded-MinHash S-curve P(candidate) =
    1 − (1 − t^r)^b for the PRODUCTION constants — the coarse banding
    (b = MINHASH_K/ROWS_PER_BAND bands of r = ROWS_PER_BAND rows) and the
    fine re-band (r = FINE_ROWS_PER_BAND) — evaluated at jaccard t = 5%..
    95% in 5% steps. This is the table that justifies (k, r) choices
    before a corpus run: where each curve crosses ~50% is its effective
    similarity threshold (Leskovec et al., MMDS ch.3 — public).

    INTEGER-EXACT fixed point (the oracle-determinism rule: no float pow,
    whose last-ulp rounding could differ across engines — here not even
    exact-double POW is used, only bigint multiply/div): with Q = 1e6 and
    t = pct/100, s = (Q · pct^r) div 100^r (pct^r ≤ 95^6 ≈ 7.4e11 and
    Q·pct^r ≈ 7.4e17 both fit bigint), then miss-all-bands folds one band
    at a time, acc ← (acc · (Q − s)) div Q — bounded by Q at every step.
    The oracle unrolls the identical fold (same Python loop builds both
    sides). Input is a generated 19-row frame; sf_dir is unused (the curve
    depends only on the constants) but kept for the registry signature."""
    q = LSH_CURVE_Q
    out = spark.range(1, 20).select((F.col("id") * 5).cast("bigint").alias("pct"))
    for tag, r in (("coarse", ROWS_PER_BAND), ("fine", FINE_ROWS_PER_BAND)):
        b = MINHASH_K // r
        mul = " * ".join(["pct"] * r)
        out = out.withColumn(
            f"__s", F.expr(f"CAST(({q} * ({mul})) DIV {100 ** r} AS BIGINT)")
        )
        out = out.withColumn(f"__m", F.lit(q).cast("bigint"))
        for _ in range(b):
            out = out.withColumn("__m", F.expr(f"(__m * ({q} - __s)) DIV {q}"))
        out = out.withColumn(
            f"p_cand_{tag}_q", F.expr(f"CAST({q} - __m AS BIGINT)")
        ).drop("__s", "__m")
    return out.select("pct", "p_cand_coarse_q", "p_cand_fine_q").orderBy("pct")


def components_writer(path: str, n_buckets: int = COMPONENTS_N_BUCKETS):
    """foreachBatch form of merge_components_artifact: a STREAM of new
    verified near-dup edges (doc_a, doc_b) continuously maintains the
    persisted component mapping — the governed dedup table stays current
    as the ingest pipeline discovers pairs, instead of being re-clustered
    per session. Idempotent by construction: re-merging a delivered
    batch's edges is a no-op (the contracted graph collapses to
    self-loops and the delta is empty), so checkpoint replay after a
    crash needs no marker — the same argument as the keyed MERGE sinks.
    Stream == full batch rebuild is pinned by
    test_components_writer_stream_equals_rebuild."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        merge_components_artifact(
            batch_df.sparkSession, path, batch_df, n_buckets
        )

    return write


def dedup_components_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental maintenance path AS a mapping producer, oracle-
    checked end-to-end (VERDICT r10 task 2): build the v1 mapping on the
    verified pair graph EXCLUDING docs with doc_id % 5 == 0 (the
    corpus-version-delta stand-in), then llm.dedup.merge_components folds
    the held-out delta edges in — contracted-graph CC, cost ∝ the delta's
    cluster overlap. The result must equal connected components of the
    FULL graph, so the oracle is dedup_components' from-scratch
    recursive-CTE closure verbatim: an incremental engine path agreeing
    with a from-scratch oracle is exactly the maintenance guarantee a
    governed dedup table needs."""
    from gmall_flink_spark.llm.dedup import connected_components, merge_components

    pairs = _verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    is_delta = (F.col("doc_a") % 5 == 0) | (F.col("doc_b") % 5 == 0)
    v1 = connected_components(pairs.where(~is_delta))
    return merge_components(v1, pairs.where(is_delta)).orderBy("doc_id")


def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the corpus-governance view of the
    verified near-dup pairs: per unordered source pair, how many near-dup
    document pairs span it (within-source duplication on the diagonal,
    cross-source contamination off it). The report that decides which
    source to drop when two feeds overlap, and the provenance check run
    before mixing scraped corpora.

    Consumes the EXACT sampled pair graph (_sample_exact_jac — prefix
    filtering, zero false negatives at j >= 0.9) rather than the LSH
    graph, so its oracle is a genuinely independent unrestricted join
    (VERDICT r06 #9): a governance matrix built on a recall-lossy index
    would under-report contamination exactly where it matters. The LSH
    path stays oracle-checked by minhash_lsh_pairs / dedup_components
    (whose oracles must mirror the banding rule by construction).

    SAMPLED SCOPE (declared in the column names): the exact graph is
    built on the deterministic 1-in-AUDIT_MOD document sample, so a pair
    survives only when BOTH endpoints sample in — counts here are
    ~1/AUDIT_MOD² (1/16) of the full-corpus pair counts, and a dup family
    with no doc_id % AUDIT_MOD == 0 member is invisible. The matrix is a
    contamination-RATE estimator (relative source-pair comparisons,
    which-feed-to-drop decisions); for absolute full-corpus counts either
    scale by ~AUDIT_MOD² or consume the recall-lossy full LSH graph via
    minhash_lsh_pairs.

    Scale: the memoized sampled graph is shared with dedup_allpairs_exact
    and the leakage audit; two doc_id-keyed joins attach sources; the
    matrix aggregate is |sources|²-bounded — tiny at any corpus size."""
    pairs = _sample_exact_jac(spark, sf_dir).select("doc_a", "doc_b")
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    attached = (
        pairs.join(src.select(F.col("doc_id").alias("doc_a"),
                              F.col("source").alias("sa")), "doc_a")
        .join(src.select(F.col("doc_id").alias("doc_b"),
                         F.col("source").alias("sb")), "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "doc_a",
            "doc_b",
        )
    )
    return (
        attached.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("sampled_pair_ct"),
            F.sum("doc_a").alias("sampled_a_id_sum"),
            F.sum("doc_b").alias("sampled_b_id_sum"),
        )
        .orderBy("source_a", "source_b")
    )


#: duplicated-gram index (gram_key, keeper), memoized like _doc_toks: the
#: corpus-wide W-gram aggregation feeds all three substr_* queries; one
#: eager localCheckpoint pays the dominant shuffle once per session.
_SUBSTR_IDX: dict[tuple, DataFrame] = {}


def _substr_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.llm.substring import gram_index, position_grams
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _SUBSTR_IDX)
    if key not in _SUBSTR_IDX:
        pg = position_grams(_doc_toks(spark, sf_dir), w=SUBSTR_W)
        _SUBSTR_IDX[key] = gram_index(
            pg, min_occ=SUBSTR_MIN_OCC
        ).localCheckpoint(eager=True)
    return _SUBSTR_IDX[key]


def substr_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup report (ExactSubstr, Lee et al. 2022):
    per document owning >= 1 duplicated SUBSTR_W-token span, the merged
    duplicated intervals — positions, span count, covered tokens, and the
    fraction of the doc ExactSubstr dedup would cut. See
    llm/substring.py's module docstring for the suffix-array → W-gram
    inversion re-expression and the exactness contract.

    Scale: rides the shared _doc_toks stage; 1 corpus-wide gram hash-agg
    (map-side partials, 8-byte xxhash64 keys) + 1 semi join + 1 doc_id
    agg. The oracle groups the gram STRINGS, so gate parity also
    certifies hash-collision-freedom at gate SF."""
    stats = dup_span_stats(
        _doc_toks(spark, sf_dir), w=SUBSTR_W, index=_substr_index(spark, sf_dir)
    )
    return (
        stats.withColumn(
            "dup_frac",
            F.col("dup_token_ct").cast("double") / F.col("n_toks"),
        )
        .orderBy("doc_id")
    )


def substr_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-governance rollup of substr_dup_spans: per source, how much
    of the feed is duplicated substring mass (doc counts, affected docs,
    duplicated tokens vs total tokens). The report that prices what
    ExactSubstr dedup would remove per feed before a training run.

    Scale: the per-doc span stats (bounded by docs with dups) left-join
    back to the full doc list — token totals count EVERY doc of the
    source, not just affected ones; the final matrix is |sources|-bounded."""
    toked = _doc_toks(spark, sf_dir)
    stats = dup_span_stats(toked, w=SUBSTR_W, index=_substr_index(spark, sf_dir))
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .join(toked.select("doc_id", F.size("toks").cast("long").alias("n_toks")),
              "doc_id")
        .join(stats.select("doc_id", "dup_token_ct", "span_ct"), "doc_id", "left")
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.count("span_ct").alias("dup_doc_ct"),
            F.sum("n_toks").alias("token_ct"),
            F.coalesce(F.sum("dup_token_ct"), F.lit(0)).alias("dup_token_ct"),
            (
                F.coalesce(F.sum("dup_token_ct"), F.lit(0)).cast("double")
                / F.sum("n_toks")
            ).alias("dup_token_frac"),
        )
        .orderBy("source")
    )


def web_domain_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain near-dup contamination — the which-domains-to-drop
    refinement of dedup_components: for each registrable domain (derived
    through the full URL synth → normalize → registered_domain path, so
    this query also exercises the canonicalizer), how many docs sit in
    any near-dup component, and how many of those duplicate content that
    ALSO exists on a DIFFERENT domain (component spanning >= 2 domains —
    imported duplication, the scraped-mirror signature).

    Scale: rides the session-memoized LSH component mapping (shared with
    dedup_components/dedup_rep_select); domains are scan-stage regexp;
    the component-domain matrix is |components| rows, two small keyed
    joins."""
    from gmall_flink_spark.functions.web import normalize_url, registered_domain
    from gmall_flink_spark.queries.llm_pipeline import _raw_url

    dom = table(spark, sf_dir, "documents").select(
        "doc_id", registered_domain(normalize_url(_raw_url())).alias("domain")
    )
    j = _components(spark, sf_dir).join(dom, "doc_id")
    ndom = j.groupBy("component").agg(
        F.countDistinct("domain").alias("ndom")
    )
    dup = (
        j.join(ndom, "component")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("dup_doc_ct"),
            F.sum((F.col("ndom") >= 2).cast("bigint")).alias(
                "cross_domain_dup_ct"
            ),
        )
    )
    return (
        dom.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("doc_ct"))
        .join(dup, "domain", "left")
        .select(
            "domain",
            "doc_ct",
            F.coalesce("dup_doc_ct", F.lit(0)).alias("dup_doc_ct"),
            F.coalesce("cross_domain_dup_ct", F.lit(0)).alias(
                "cross_domain_dup_ct"
            ),
            (
                F.coalesce("dup_doc_ct", F.lit(0)).cast("double")
                / F.col("doc_ct")
            ).alias("dup_frac"),
        )
        .orderBy("domain")
    )


#: domain-blocklist rule: block when near-dup docs reach half the domain
#: (dup_doc_ct * BLOCK_DUP_DEN >= doc_ct * BLOCK_DUP_NUM … NUM/DEN = the
#: dup_frac threshold 1/2) OR the mean heuristic quality score (basis-point
#: units, doc_quality_scores) falls below BLOCK_QUALITY_MIN. Integer-only
#: comparisons; both oracles mirror the constants.
BLOCK_DUP_NUM = 1
BLOCK_DUP_DEN = 2
BLOCK_QUALITY_MIN = 5000


def domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level governance DECISION (the RefinedWeb/CCNet blocklist step,
    Penedo et al. 2023 arXiv:2306.01116 §3.1): combine the two per-domain
    evidence streams this engine already produces — near-dup contamination
    (the component ledger under web_domain_dup_rate) and mean heuristic
    quality (doc_quality_scores) — into a per-domain keep/block verdict a
    crawler config consumes. Blocked = majority-duplicated OR
    below-quality-floor; ``blocked_doc_ct`` is the cost column (docs the
    block removes), the number a governance review reads first.

    Scale: rides the session-memoized LSH component mapping; the quality
    scan is token-explode + per-doc agg (map-side partials); everything
    after is |domains|-bounded."""
    from gmall_flink_spark.functions.web import normalize_url, registered_domain
    from gmall_flink_spark.queries.llm_pipeline import _raw_url
    from gmall_flink_spark.queries.text import doc_quality_scores

    docs = table(spark, sf_dir, "documents")
    dom = docs.select(
        "doc_id", registered_domain(normalize_url(_raw_url())).alias("domain")
    )
    scored = doc_quality_scores(docs).select("doc_id", "score")
    dup = (
        _components(spark, sf_dir)
        .join(dom, "doc_id")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("dup_doc_ct"))
    )
    per = (
        dom.join(scored, "doc_id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum("score").alias("score_sum"),
        )
    )
    j = per.join(dup, "domain", "left").select(
        "domain",
        "doc_ct",
        F.coalesce("dup_doc_ct", F.lit(0)).alias("dup_doc_ct"),
        "score_sum",
    )
    blocked = (
        (F.col("dup_doc_ct") * BLOCK_DUP_DEN >= F.col("doc_ct") * BLOCK_DUP_NUM)
        | (F.col("score_sum") < F.col("doc_ct") * BLOCK_QUALITY_MIN)
    ).cast("bigint")
    return (
        j.select(
            "domain",
            "doc_ct",
            "dup_doc_ct",
            "score_sum",
            blocked.alias("blocked"),
            (blocked * F.col("doc_ct")).alias("blocked_doc_ct"),
        )
        .orderBy("domain")
    )


def dedup_loss_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup — the loss-weighting alternative to dropping duplicates
    (keep every copy, downweight each by its duplicate-family size, so a
    family contributes ~one document of gradient mass; the counting
    argument behind dedup-aware training-loss reweighting): per document
    family f, weight = 10000 div |f| basis points; singletons keep 10000.
    Reported per source: docs, near-dup members, the exact effective mass
    after reweighting (weight_bp_sum — divide by 10000 for "effective
    docs"), and the harshest downweight applied. The table a loader joins
    to scale per-example loss instead of filtering.

    Scale: rides the memoized component mapping; the size table is
    |components| rows; everything else is doc-grain map work + one
    source aggregate."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    comp = _components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("fam_sz"))
    weighted = (
        docs.join(comp, "doc_id", "left")
        .join(sizes, "component", "left")
        .select(
            "source",
            "doc_id",
            F.expr("10000 div coalesce(fam_sz, 1)").alias("weight_bp"),
            F.col("component").isNotNull().cast("bigint").alias("is_member"),
        )
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum("is_member").alias("dup_member_ct"),
            F.sum("weight_bp").alias("weight_bp_sum"),
            F.min("weight_bp").alias("min_weight_bp"),
        )
        .orderBy("source")
    )


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source DATASET CARD (after Gebru et al. 2021, "Datasheets
    for Datasets", arXiv:1803.09010 — the one-frame summary a corpus
    release publishes): volume (docs, tokens), language spread, mean
    heuristic quality and LM-surprisal mass (exact integer sums — divide
    by doc_ct for means), and near-dup contamination, one row per source.
    The single artifact a data consumer reads before mixing a source in —
    every column is a checksum over a stage this engine also exposes as a
    full query (text_quality_deciles, text_bigram_lm_score,
    dedup_components), so the card is cross-checkable against its
    detailed views.

    Scale: one doc-grain scan for volume/langs, the two shared scoring
    stages (token- and bigram-keyed aggs with map-side partials), the
    memoized component mapping; four |sources|-row joins stitch the
    card."""
    from gmall_flink_spark.functions.text import token_count
    from gmall_flink_spark.queries.text import _bigram_doc_mean10x, doc_quality_scores

    docs = table(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("doc_ct"),
        F.sum(token_count("text").cast("bigint")).alias("token_ct"),
        F.countDistinct("lang").alias("lang_ct"),
    )
    q = (
        doc_quality_scores(docs)
        .groupBy("source")
        .agg(F.sum("score").alias("score_sum"))
    )
    ppl = (
        _bigram_doc_mean10x(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("mean10x").alias("ppl10x_sum"))
    )
    dup = (
        _components(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("dup_doc_ct"))
    )
    return (
        base.join(q, "source", "left")
        .join(ppl, "source", "left")
        .join(dup, "source", "left")
        .select(
            "source",
            "doc_ct",
            "token_ct",
            "lang_ct",
            F.coalesce("score_sum", F.lit(0)).alias("score_sum"),
            F.coalesce("ppl10x_sum", F.lit(0)).alias("ppl10x_sum"),
            F.coalesce("dup_doc_ct", F.lit(0)).alias("dup_doc_ct"),
        )
        .orderBy("source")
    )


def substr_cut_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr ACTION (keep-one-copy): per document, the merged
    intervals the cut rule removes — every occurrence of a duplicated
    SUBSTR_W-gram except its globally first (doc_id, pos) copy — with the
    kept-token remainder. The plan a training-data build executes after
    substr_dup_spans priced the duplication (llm/substring.py::cut_plan).

    Scale: same two-shuffle shape as substr_dup_spans plus a 16-byte
    keeper struct on the gram agg already being paid."""
    from gmall_flink_spark.llm.substring import cut_plan

    return cut_plan(
        _doc_toks(spark, sf_dir), w=SUBSTR_W, index=_substr_index(spark, sf_dir)
    ).orderBy("doc_id")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document. Deliberately NOT routed
    through the memoized unit stage: standalone, its own tokenize fuses
    onto the scan in one map stage, which is cheaper than building the
    shared token/unit checkpoints it would never reuse (measured r15 —
    +0.7-1.4 s when pointed at _doc_units cold)."""
    docs = table(spark, sf_dir, "documents")
    return simhash(docs, bits=16).orderBy("doc_id")


#: simhash pairing: 4 bands x 4 bits (a hamming<=3 pair shares >= 1 exact
#: band by pigeonhole, so the band index has no false negatives at the
#: verify threshold below); buckets larger than the cap are degenerate
#: template mass and are dropped, same contract as LSH_MAX_BUCKET.
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 4
SIMHASH_MAX_BUCKET = 100
SIMHASH_HAM_MAX = 2


def _simhash_verified_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SimHash pair set: banded hamming-ball candidates
    (capped buckets) UNIONed with the exact token-set-fingerprint pre-pass
    (VERDICT r09 weak #2 fix). Identical documents share every band value,
    so the cap was structurally blind to exactly the heaviest duplicates
    — the pre-pass routes them through one hash aggregation instead
    (llm/dedup.py::exact_fingerprint_pairs; hamming 0 by construction
    since identical token sets hash to identical signatures). DISTINCT
    collapses pairs both paths find. The signature votes ride the
    memoized distinct-unit stage (_doc_units), so the banded path never
    re-pays the tokenize scan; the fingerprint is a MAP-ONLY projection
    of the token arrays (_doc_stats — optimization r15), so the exact
    path pays no aggregation at all and the vote exchange ships only the
    16 integer tallies, never the distinct-token payload the r14 fused
    form carried (guide §2.3). The banded path skips its internal
    candidate DISTINCT (dedup=False): the terminal union DISTINCT
    collapses multi-band and cross-path duplicates in one exchange
    instead of three."""
    from gmall_flink_spark.llm.dedup import simhash_pairs

    units = _doc_units(spark, sf_dir)
    sig = simhash(None, bits=16, units=units)
    banded = simhash_pairs(
        sig,
        "doc_id",
        "simhash",
        bands=SIMHASH_BANDS,
        band_bits=SIMHASH_BAND_BITS,
        max_bucket=SIMHASH_MAX_BUCKET,
        ham_max=SIMHASH_HAM_MAX,
        dedup=False,
    )
    exact = exact_fingerprint_pairs(None, fp=_doc_stats(spark, sf_dir)).select(
        "a_id", "b_id", F.lit(0).cast("bigint").alias("hamming")
    )
    return banded.unionByName(exact).distinct()


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRING — the hamming-ball lookup that turns the
    signature table into dedup candidates: band each 16-bit signature into
    4 x 4-bit values, bucket-join on (band, value), verify candidates at
    exact hamming <= 2 (bit_count of xor), PLUS the exact-fingerprint
    pre-pass for identical documents the bucket cap drops
    (_simhash_verified_frame), reported per hamming distance with pair
    count and id checksums. Pigeonhole gives the band index zero false
    negatives at this threshold: hamming <= 3 < 4 bands forces at least
    one untouched band. The signature-domain complement of MinHash-LSH
    (set similarity) and SRP (embedding cosine).

    Scale: the per-band self-join is the only approximate pair-generating
    step and every bucket is capped (SIMHASH_MAX_BUCKET — this synthetic
    vocab concentrates signatures, the adversarial case); the exact
    pre-pass is one fingerprint aggregation with group-bounded pairing;
    verification touches only colliding pairs and the xor/bit_count check
    is a per-row integer op. Candidate volume ∝ shared signature mass +
    true duplicate mass, never corpus²."""
    verified = _simhash_verified_frame(spark, sf_dir)
    return (
        verified.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("pair_ct"),
            F.sum("a_id").alias("a_id_sum"),
            F.sum("b_id").alias("b_id_sum"),
        )
        .orderBy("hamming")
    )


def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup PRE-FILTER — the constant-memory membership
    sketch run before exact dedup at ingest (the classic pattern: a new
    crawl batch probes the filter built from the indexed corpus; only
    ``maybe_dup`` rows pay the exact fingerprint join, everything else
    streams through untouched). Keys are token-SET fingerprints (exact
    family semantics); the prior half of the corpus (even doc_id — the
    stand-in for "already ingested") builds the filter, the odd half
    probes it. The ledger reports per probe source: probes, bloom flags,
    TRUE duplicates (exact fingerprint membership — the no-false-negative
    contract demands flagged >= true, pinned in pytest), and the measured
    false-positive count, the number that sizes m/k for a real corpus.

    Scale: the filter is <= BLOOM_M distinct bit positions — always
    broadcastable no matter the corpus; build is one map-side-combining
    distinct, probe is a broadcast join + per-key hit count. The exact
    verification join the filter EXISTS to avoid runs here only to
    measure the FP rate (on the probe half, not corpus²)."""
    from gmall_flink_spark.functions.text import tokenize
    from gmall_flink_spark.operators.sketch import bloom_build, bloom_probe

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize("text"))))
        ).alias("f"),
    )
    prior = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    probe = docs.where(F.pmod("doc_id", F.lit(2)) == 1)
    bloom = bloom_build(prior, "f")
    verdicts = bloom_probe(probe, "f", bloom)
    seen = prior.select("f").distinct().withColumn("seen", F.lit(1))
    return (
        probe.join(verdicts, "f")
        .join(F.broadcast(seen), "f", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("probe_ct"),
            F.sum("maybe_dup").cast("bigint").alias("flagged_ct"),
            F.sum(F.coalesce("seen", F.lit(0))).cast("bigint").alias("true_dup_ct"),
            F.sum(F.col("maybe_dup") * (1 - F.coalesce("seen", F.lit(0))))
            .cast("bigint")
            .alias("false_pos_ct"),
        )
        .orderBy("source")
    )


def dedup_rep_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection — the step after clustering that actually
    decides which document survives dedup: within each near-dup component
    (connected components over the verified LSH pair graph, as
    dedup_components) keep the HIGHEST-quality member (integer basis-point
    quality score from text_quality_deciles; ties break to the smallest
    doc_id). Production pipelines keep the best copy, not the first one
    seen. One row per component: representative, member/drop counts, and
    the quality spread inside the cluster.

    Scale: components and scores are both per-doc tables keyed on doc_id
    (one co-partitioned join); the argmax is a window over component —
    clusters are small (LSH_MAX_BUCKET-bounded candidate generation), so
    no window partition can degenerate."""
    from pyspark.sql import Window

    from gmall_flink_spark.queries.text import doc_quality_scores

    comp = _components(spark, sf_dir)
    scored = doc_quality_scores(table(spark, sf_dir, "documents")).select(
        "doc_id", "score"
    )
    members = comp.join(scored, "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("score"), "doc_id")
    return (
        members.withColumn("rk", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("rep_doc"),
            F.count(F.lit(1)).alias("member_ct"),
            (F.count(F.lit(1)) - 1).alias("drop_ct"),
            F.max("score").alias("score_best"),
            F.min("score").alias("score_worst"),
        )
        .orderBy("component")
    )


#: recall-audit sample: every 4th doc (25%). The audit's ground truth is
#: brute-force over SAMPLE pairs only, so its cost is (n/4)² id pairs
#: before the lossless ratio prune — bounded by construction, never by luck.
AUDIT_MOD = 4


def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit — the measurement that tells you whether the
    MinHash-LSH parameters (k, rows-per-band, bucket cap) are actually
    catching the near-dups before you trust the index at corpus scale:
    on a deterministic 1-in-AUDIT_MOD document sample, compute the exact
    ground-truth j >= 0.9 pairs by brute force (all sample id pairs,
    length-ratio-pruned losslessly, scored exactly) and count how many the
    production PAIR-GENERATION RULE — two-level banding + bucket cap,
    still-over-cap fine buckets starred to their hub, UNION the exact
    token-set-fingerprint pre-pass; the same rule the verified pair
    graph uses — recalls. (A true pair surfaced as a
    candidate always survives the j >= 0.9 verify, so candidate-level and
    verified-level recall coincide on the truth rows.) One row per pair
    class (exact j=1 vs near 0.9<=j<1): true_ct / hit_ct / miss_ct + id
    checksums — recall is hit/true, read exactly from integers. This
    audit is what exposed flat drop-mode capping losing whole over-cap
    families (5/450 recalled on this corpus) and motivated the two-level
    refinement and the exact prefix-filter path; the r13 sf1 run of the
    same audit (RECALL_SF1_r13.json: 27/22,450 exact pairs recalled)
    motivated unioning the fingerprint pre-pass in — exact-class recall
    is now total by construction, while on THIS low-entropy testdata the
    NEAR class stays poorly recalled (fine 6-row buckets stay mega and
    heterogeneous) — the honest number that tells an operator to reach
    for dedup_allpairs_exact here (SCALE.md r6/r14 sections).

    Cap nuance (review r14): above EXACT_FP_MAX_GROUP the production
    pre-pass emits the STAR encoding (hub→member edges, linear in group
    size) whose component closure still contains every exact pair — the
    dedup DECISION is unchanged — but the edge list alone no longer
    enumerates hub-less member pairs. The audit therefore measures the
    RULE (fingerprint-group co-membership, realized here as the
    sample-scoped UNCAPPED fingerprint pairs — bounded by the truth set
    the audit already materializes), not the star edge encoding, so the
    exact-class row stays total at any group size instead of silently
    degrading past the cap.

    Scale: ground truth is the memoized exact prefix-filter pair graph of
    the same sample (_sample_exact_jac — provably complete at j >= 0.9 per
    the PPJoin length/prefix bounds, and itself verified against an
    unrestricted-join oracle by dedup_allpairs_exact), so the audit pays
    no second quadratic sample join (VERDICT r06 #8): one shared stage
    feeds the recall audit, the AllPairs stats, and the exact components.
    The candidate side reuses the full corpus' band pipeline from the
    shared token checkpoint. This is how LSH recall is audited in
    production — sampled ground truth, never corpus²."""
    true_pairs = _sample_exact_jac(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        (F.col("inter") == F.col("uni")).cast("int").alias("is_exact"),
    )
    # sample-scoped UNCAPPED fingerprint pairs: the rule's group
    # co-membership, not its star encoding — identical to _exact_pairs
    # while every sampled group is <= EXACT_FP_MAX_GROUP, and the only
    # part that keeps the exact row total beyond the cap
    fp_sample = exact_fingerprint_pairs(
        None,
        fp=_doc_stats(spark, sf_dir).where(
            F.pmod(F.col("doc_id"), F.lit(AUDIT_MOD)) == 0
        ),
        max_group=1 << 62,
    ).select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
    cands = (
        _lsh_cands(spark, sf_dir)
        .select("doc_a", "doc_b")
        .unionByName(_exact_pairs(spark, sf_dir))
        .where(
            (F.pmod(F.col("doc_a"), F.lit(AUDIT_MOD)) == 0)
            & (F.pmod(F.col("doc_b"), F.lit(AUDIT_MOD)) == 0)
        )
        .unionByName(fp_sample)
        .distinct()  # a pair two paths surface must hit ONCE in the left join
        .withColumn("hit", F.lit(1))
    )
    flagged = true_pairs.join(cands, ["doc_a", "doc_b"], "left")
    return (
        flagged.groupBy("is_exact")
        .agg(
            F.count(F.lit(1)).alias("true_ct"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("hit_ct"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias("miss_ct"),
            F.sum("doc_a").alias("a_id_sum"),
            F.sum("doc_b").alias("b_id_sum"),
        )
        .orderBy("is_exact")
    )


def simhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit for the SIMHASH family — the same sampled
    ground-truth measurement as lsh_recall_audit, pointed at the
    hamming-banded signature index: on the 1-in-AUDIT_MOD sample, how
    many exact j >= 0.9 pairs does the production simhash pairing (same
    bands/cap/hamming threshold as dedup_simhash_pairs) recall? SimHash
    answers a DIFFERENT question than MinHash (weighted-feature cosine,
    not set jaccard), so its jaccard recall is expected to be partial —
    this audit puts the exact number on that expectation per pair class
    (exact j=1 vs near), completing the detect→verify triple
    (dedup_simhash_pairs → this audit → dedup_allpairs_exact as the exact
    fallback) that the MinHash family already has. History on this
    synthetic corpus (sf0.01): the capped banded index alone read 0/21
    exact and 37/429 near — identical documents share signatures, the
    tiny vocab concentrates signature mass into over-cap buckets, and
    the cap (correctly) drops them. The exact-fingerprint pre-pass
    (_simhash_verified_frame) now routes identical documents around the
    cap, so the audit reads 21/21 exact; the near class stays partial by
    design (SimHash measures weighted-feature cosine, not set jaccard),
    which is why the exact prefix-filter path exists.

    Scale: truth rides the memoized sampled exact graph (one shared
    stage, never corpus²); the candidate side is the full-corpus banded
    signature join with capped buckets + the group-bounded fingerprint
    pre-pass — verification is per-row integer xor/bit_count."""
    true_pairs = _sample_exact_jac(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        (F.col("inter") == F.col("uni")).cast("int").alias("is_exact"),
    )
    # same cap nuance as lsh_recall_audit (review r14): audit the
    # fingerprint RULE via sample-scoped uncapped pairs so the exact row
    # stays total when a duplicate group exceeds EXACT_FP_MAX_GROUP and
    # the production pre-pass switches to its star encoding
    fp_sample = exact_fingerprint_pairs(
        None,
        fp=_doc_stats(spark, sf_dir).where(
            F.pmod(F.col("doc_id"), F.lit(AUDIT_MOD)) == 0
        ),
        max_group=1 << 62,
    ).select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
    cands = (
        _simhash_verified_frame(spark, sf_dir)
        .where(
            (F.pmod(F.col("a_id"), F.lit(AUDIT_MOD)) == 0)
            & (F.pmod(F.col("b_id"), F.lit(AUDIT_MOD)) == 0)
        )
        .select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
        .unionByName(fp_sample)
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    flagged = true_pairs.join(cands, ["doc_a", "doc_b"], "left")
    return (
        flagged.groupBy("is_exact")
        .agg(
            F.count(F.lit(1)).alias("true_ct"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("hit_ct"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias("miss_ct"),
            F.sum("doc_a").alias("a_id_sum"),
            F.sum("doc_b").alias("b_id_sum"),
        )
        .orderBy("is_exact")
    )


#: verified j >= 0.9 pairs of the AUDIT_MOD sample via exact prefix
#: filtering, memoized like the other shared stages: dedup_allpairs_exact
#: reports the graph's statistics and dedup_components_exact clusters it —
#: the sampled exact pipeline runs once per (session, sf_dir, stamp).
_SAMPLE_EXACT: dict[tuple, DataFrame] = {}


def _sample_exact_jac(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _SAMPLE_EXACT)
    if key not in _SAMPLE_EXACT:
        sampled = F.pmod(F.col("doc_id"), F.lit(AUDIT_MOD)) == 0
        units = _doc_units(spark, sf_dir).where(sampled)
        cands = prefix_filter_candidates(units, 9, 10)
        # per-doc sizes are the map-only token-array stats (optimization
        # r15): the sample filter only drops DOCS, so each surviving doc's
        # distinct-unit count is unchanged — no sampled-units groupBy
        sizes = _doc_stats(spark, sf_dir).where(sampled).select("doc_id", "n")
        jac = jaccard_pairs(units, cands, ratio=(9, 10), sizes=sizes).where(
            10 * F.col("inter") >= 9 * F.col("uni")
        )
        _SAMPLE_EXACT[key] = jac.localCheckpoint(eager=True)
    return _SAMPLE_EXACT[key]


def dedup_allpairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pair graph via prefix filtering (AllPairs,
    llm/dedup.py::prefix_filter_candidates) on the deterministic
    1-in-AUDIT_MOD sample: candidates = docs sharing a token in their
    rarest-(n-ceil(0.9n)+1)-token prefixes (provably complete at
    j >= 0.9), verified by exact integer jaccard. One summary row: pair
    count, exact-duplicate count, and checksums — the zero-false-negative
    complement of the banded LSH path, at inverted-index (not corpus²)
    cost.

    Sampled for the same reason as lsh_recall_audit: this synthetic
    corpus is ~7.7%% true dup-pairs (965k pairs at sf0.1), so FULL exact
    pair listing is inherently ~quadratic in family sizes; the sampled
    graph bounds the work by construction while exercising the full
    operator (measured: full-corpus run is exact too — recall FULL vs the
    unrestricted join at both SFs — just not bench-shaped)."""
    jac = _sample_exact_jac(spark, sf_dir)
    return jac.agg(
        F.count(F.lit(1)).alias("pair_ct"),
        F.sum((F.col("inter") == F.col("uni")).cast("bigint")).alias("exact_ct"),
        F.sum("inter").alias("inter_sum"),
        F.sum("uni").alias("uni_sum"),
        F.sum("doc_a").alias("a_id_sum"),
        F.sum("doc_b").alias("b_id_sum"),
    )


#: components of the sampled exact graph, memoized: the decision ledger
#: and the cluster-aware split fix both cluster the same sampled edges.
_SAMPLE_COMPONENTS: dict[tuple, DataFrame] = {}


def _sample_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _SAMPLE_COMPONENTS)
    if key not in _SAMPLE_COMPONENTS:
        edges = _sample_exact_jac(spark, sf_dir).select("doc_a", "doc_b")
        _SAMPLE_COMPONENTS[key] = connected_components(edges).localCheckpoint(
            eager=True
        )
    return _SAMPLE_COMPONENTS[key]


def dedup_components_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup DECISION ledger on the audit sample: connected
    components over the complete prefix-filtered j >= 0.9 pair graph
    (dedup_allpairs_exact's edges), summarized as the numbers a corpus
    owner acts on — cluster count, docs inside clusters, the largest
    cluster, and how many docs exact dedup would drop (keep one per
    cluster). On this corpus the ledger quantifies what the LSH recall
    audit implies: the sampled corpus collapses into few large families,
    so the drop fraction is the real dedup yield, far beyond what the
    capped LSH graph suggests.

    Scale: edges are the sampled exact graph (bounded by construction);
    components is the same iterative min-label propagation every dedup
    decision path uses (rounds = family diameter; families are near-
    cliques, so 2-3; memoized and shared with llm_split_by_cluster)."""
    comp = _sample_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.count(F.lit(1)).alias("component_ct"),
        F.sum("sz").alias("clustered_doc_ct"),
        F.max("sz").alias("max_size"),
        (F.sum("sz") - F.count(F.lit(1))).alias("drop_ct"),
        F.sum(F.col("component")).alias("rep_id_sum"),
    )


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test SPLIT-LEAKAGE audit — the eval-integrity check run
    before a benchmark split ships: near-duplicate document pairs whose
    two ends landed in DIFFERENT splits of llm_split_assign's
    deterministic hash rule mean the eval split is contaminated by
    training data (the within-corpus complement of llm_decontaminate's
    external-benchmark check). Per unordered split pair: verified j >= 0.9
    pair count, how many are exact duplicates, and id checksums —
    off-diagonal rows are the leaks; their fix is split-by-cluster
    (assign dedup_components_exact components, not raw docs, to splits).

    Scale: consumes the SAME memoized sampled exact pair graph as
    dedup_allpairs_exact plus two map-side hash-split expressions; the
    matrix aggregate is splits²-bounded."""
    from gmall_flink_spark.queries.llm_pipeline import split_expr

    pairs = _sample_exact_jac(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        (F.col("inter") == F.col("uni")).cast("bigint").alias("is_exact"),
        split_expr(F.col("doc_a")).alias("sa"),
        split_expr(F.col("doc_b")).alias("sb"),
    )
    # canonicalize the pair so side a IS the split_a side: checksums then
    # read side-accurately ("a_id_sum = ids on the split_a side")
    keep = F.col("sa") <= F.col("sb")
    return (
        pairs.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
            F.when(keep, F.col("doc_a")).otherwise(F.col("doc_b")).alias("side_a"),
            F.when(keep, F.col("doc_b")).otherwise(F.col("doc_a")).alias("side_b"),
            "is_exact",
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("pair_ct"),
            F.sum("is_exact").alias("exact_ct"),
            F.sum("side_a").alias("a_id_sum"),
            F.sum("side_b").alias("b_id_sum"),
        )
        .orderBy("split_a", "split_b")
    )


def llm_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-leakage FIX: assign train/val/test by the near-dup
    CLUSTER's representative instead of the raw doc_id — every member of a
    component hashes through its component id, so a dup family can never
    straddle splits. Output is the same leakage matrix as
    split_leakage_audit evaluated under the cluster-aware rule: only
    diagonal (same-split) rows can exist, and the correctness gate hashes
    that this holds on the sampled exact graph (detect -> fix -> verify,
    all three oracle-checked).

    Scale: the component mapping is the sampled exact graph's (bounded);
    unclustered docs fall back to their own id, so the assignment is one
    left join + the same map-side hash rule as llm_split_assign."""
    from gmall_flink_spark.queries.llm_pipeline import split_expr

    comp = _sample_components(spark, sf_dir)
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component").alias("comp_a"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component").alias("comp_b"))
    pairs = (
        _sample_exact_jac(spark, sf_dir)
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter") == F.col("uni")).cast("bigint").alias("is_exact"),
        )
        .join(ca, "doc_a", "left")
        .join(cb, "doc_b", "left")
        .select(
            split_expr(F.coalesce("comp_a", F.col("doc_a"))).alias("sa"),
            split_expr(F.coalesce("comp_b", F.col("doc_b"))).alias("sb"),
            "doc_a",
            "doc_b",
            "is_exact",
        )
    )
    # canonicalize the pair so side a IS the split_a side: checksums then
    # read side-accurately ("a_id_sum = ids on the split_a side")
    keep = F.col("sa") <= F.col("sb")
    return (
        pairs.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
            F.when(keep, F.col("doc_a")).otherwise(F.col("doc_b")).alias("side_a"),
            F.when(keep, F.col("doc_b")).otherwise(F.col("doc_a")).alias("side_b"),
            "is_exact",
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("pair_ct"),
            F.sum("is_exact").alias("exact_ct"),
            F.sum("side_a").alias("a_id_sum"),
            F.sum("side_b").alias("b_id_sum"),
        )
        .orderBy("split_a", "split_b")
    )


def dedup_rep_select_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection over the EXACT sampled dedup graph: within
    each component of the complete prefix-filtered j >= 0.9 pair graph,
    keep the highest-quality member (same integer basis-point score and
    smallest-doc_id tie-break as dedup_rep_select, which makes the same
    decision over the bounded LSH graph). Together with
    dedup_components_exact this is the full exact decision path —
    cluster, then keep the best copy — and on this corpus it surfaces the
    big families the capped LSH graph cannot (largest sampled cluster:
    40 members at sf0.01).

    Scale: the component mapping is the memoized sampled one; scores join
    on doc_id; the per-component argmax window is bounded by the sample
    contract."""
    from pyspark.sql import Window

    from gmall_flink_spark.queries.text import doc_quality_scores

    comp = _sample_components(spark, sf_dir)
    scored = doc_quality_scores(table(spark, sf_dir, "documents")).select(
        "doc_id", "score"
    )
    members = comp.join(scored, "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("score"), "doc_id")
    return (
        members.withColumn("rk", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("rep_doc"),
            F.count(F.lit(1)).alias("member_ct"),
            (F.count(F.lit(1)) - 1).alias("drop_ct"),
            F.max("score").alias("score_best"),
            F.min("score").alias("score_worst"),
        )
        .orderBy("component")
    )


QUERIES = {
    "lsh_recall_audit": lsh_recall_audit,
    "simhash_recall_audit": simhash_recall_audit,
    "dedup_rep_select_exact": dedup_rep_select_exact,
    "dedup_allpairs_exact": dedup_allpairs_exact,
    "dedup_containment_stats": dedup_containment_stats,
    "dedup_components_exact": dedup_components_exact,
    "split_leakage_audit": split_leakage_audit,
    "llm_split_by_cluster": llm_split_by_cluster,
    "dedup_exact_prefix": dedup_exact_prefix,
    "minhash_band_buckets": minhash_band_buckets,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "ngram_jaccard_stats": ngram_jaccard_stats,
    "dedup_simhash": dedup_simhash,
    "dedup_cross_source": dedup_cross_source,
    "substr_dup_spans": substr_dup_spans,
    "substr_dedup_stats": substr_dedup_stats,
    "substr_cut_plan": substr_cut_plan,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_components": dedup_components,
    "dedup_components_incremental": dedup_components_incremental,
    "lsh_sensitivity_curve": lsh_sensitivity_curve,
    "dedup_rep_select": dedup_rep_select,
    "dedup_bloom_prefilter": dedup_bloom_prefilter,
    "web_domain_dup_rate": web_domain_dup_rate,
    "domain_blocklist": domain_blocklist,
    "corpus_datasheet": corpus_datasheet,
    "dedup_loss_weights": dedup_loss_weights,
}

_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"

# shared quality-score SQL (the DuckDB twin of queries.text.doc_quality_scores)
from gmall_flink_spark.queries.text import SCORED_DOCS_SQL  # noqa: E402

_UNITS = f"SELECT doc_id, unnest(list_distinct({_TOKS})) AS shingle FROM documents"

# affine minhash family over ONE base md5 per shingle (mirror of
# llm/dedup.minhash_seed_hash): h_s = ((2s+1)·h + s² + 7) mod P
_P = 1_000_000_007
_BASE = f"('0x' || substr(md5('0|' || shingle), 1, 15))::BIGINT % {_P}"

_SIGS = f"""
    SELECT doc_id, seed, MIN(((2 * seed + 1) * h + seed * seed + 7) % {_P}) AS mh
    FROM (SELECT doc_id, {_BASE} AS h FROM ({_UNITS})) u,
         (SELECT unnest(range({MINHASH_K})) AS seed) s
    GROUP BY doc_id, seed
"""

def _bands_sql(rows: int) -> str:
    return f"""
    SELECT doc_id, seed // {rows} AS band,
           string_agg(mh::VARCHAR, ',' ORDER BY seed) AS band_sig
    FROM ({_SIGS}) GROUP BY doc_id, band
"""


_BANDS = _bands_sql(ROWS_PER_BAND)
_FBANDS = _bands_sql(FINE_ROWS_PER_BAND)

# mirror of llm/dedup.lsh_candidates_two_level: sub-cap coarse buckets
# pair all-vs-all; over-cap bucket MEMBERS are re-banded at the fine width
# and pair within sub-cap fine buckets
_BSTATS = f"""
    SELECT band, band_sig, COUNT(*) AS n
    FROM ({_BANDS}) GROUP BY 1, 2
"""

_REFINED = f"""
    SELECT DISTINCT m.doc_id FROM ({_BANDS}) m
    JOIN ({_BSTATS}) k ON m.band = k.band AND m.band_sig = k.band_sig
    WHERE k.n > {LSH_MAX_BUCKET}
"""

_FINE_R = f"""
    SELECT f.* FROM ({_FBANDS}) f JOIN ({_REFINED}) r ON f.doc_id = r.doc_id
"""

_FSTATS = f"""
    SELECT band, band_sig, COUNT(*) AS n FROM ({_FINE_R}) GROUP BY 1, 2
"""

# exact token-set-fingerprint pre-pass twin (mirror of
# llm/dedup.exact_fingerprint_pairs and the engine's _exact_pairs):
# sorted-distinct-token fingerprint groups pair all-vs-all up to
# EXACT_FP_MAX_GROUP, star form (min_id hub) above the cap
_SETFP = f"""
    SELECT doc_id, md5(string_agg(shingle, ' ' ORDER BY shingle)) AS fp
    FROM ({_UNITS}) GROUP BY doc_id
"""

_FPG = f"""
    SELECT fp, COUNT(*) AS n, MIN(doc_id) AS min_id
    FROM ({_SETFP}) GROUP BY fp HAVING COUNT(*) >= 2
"""

_EXACT_FP_PAIRS = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ({_SETFP}) a
    JOIN ({_SETFP}) b ON a.fp = b.fp AND a.doc_id < b.doc_id
    JOIN ({_FPG}) g ON a.fp = g.fp
    WHERE g.n <= {EXACT_FP_MAX_GROUP}
    UNION ALL
    SELECT g.min_id AS doc_a, s.doc_id AS doc_b
    FROM ({_SETFP}) s JOIN ({_FPG}) g ON s.fp = g.fp
    WHERE g.n > {EXACT_FP_MAX_GROUP} AND s.doc_id != g.min_id
"""

# still-over-cap fine buckets: B-1 star edges to the bucket's min doc_id
# (mirror of lsh_candidates_two_level(oversize_fine="star"); doc_a < doc_b
# holds because the hub is the bucket minimum)
_FSTAR = f"""
    SELECT k.min_id AS doc_a, f.doc_id AS doc_b
    FROM ({_FINE_R}) f
    JOIN (SELECT band, band_sig, MIN(doc_id) AS min_id
          FROM ({_FINE_R}) GROUP BY band, band_sig
          HAVING COUNT(*) > {LSH_MAX_BUCKET}) k
      ON f.band = k.band AND f.band_sig = k.band_sig
    WHERE f.doc_id != k.min_id
"""

# the production pair-generation rule: two-level capped banding (sub-cap
# buckets all-pair, still-over-cap fine buckets starred to their hub)
# UNION the exact-fingerprint pre-pass (VERDICT r13 weak #1 + task 2 —
# mirrors the engine's _lsh_cands ∪ _exact_pairs; the verify the
# consumers apply passes every fingerprint pair at jaccard 1, so
# verify(cands ∪ exact) on this side equals the engine's
# verify(cands) ∪ exact)
_CANDS = f"""
    SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS}) a
        JOIN ({_BANDS}) b
          ON a.band = b.band AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
        JOIN ({_BSTATS}) k
          ON a.band = k.band AND a.band_sig = k.band_sig
        WHERE k.n <= {LSH_MAX_BUCKET}
        UNION ALL
        SELECT fa.doc_id AS doc_a, fb.doc_id AS doc_b
        FROM ({_FINE_R}) fa
        JOIN ({_FINE_R}) fb
          ON fa.band = fb.band AND fa.band_sig = fb.band_sig
         AND fa.doc_id < fb.doc_id
        JOIN ({_FSTATS}) k
          ON fa.band = k.band AND fa.band_sig = k.band_sig
        WHERE k.n <= {LSH_MAX_BUCKET}
        UNION ALL
        SELECT doc_a, doc_b FROM ({_FSTAR})
        UNION ALL
        SELECT doc_a, doc_b FROM ({_EXACT_FP_PAIRS})
    )
"""


def _jaccard(units_sql: str, max_df: int | None = None) -> str:
    df_filter = (
        f"""
        raw_units AS ({units_sql}),
        keep AS (SELECT shingle FROM raw_units GROUP BY shingle
                 HAVING COUNT(*) <= {max_df}),
        units AS (SELECT doc_id, u.shingle FROM raw_units u
                  JOIN keep k ON u.shingle = k.shingle)"""
        if max_df is not None
        else f"units AS ({units_sql})"
    )
    return f"""
        WITH {df_filter},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM units GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM units a JOIN units b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS uni
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    """


_SHINGLES3 = f"""
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest([array_to_string(toks[i + 1 : i + 3], ' ')
                       for i in range(0, len(toks) - 3 + 1)]) AS shingle
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
    )
"""

_SAMPLE_UNITS = f"SELECT * FROM ({_UNITS}) WHERE doc_id % {AUDIT_MOD} = 0"

# Shared verified-pair -> closure CTE body for the components oracles,
# restructured for SCALE (the sf1 spot-sweep lesson): the original form
# computed _jaccard over ALL pairs sharing any shingle and then filtered
# to candidates — quadratic in docs-per-shingle (hours + tens of GB at
# ~sf1); this form counts intersections ONLY for candidate pairs (the
# same restriction the engine applies) and MATERIALIZEs every
# multiply-referenced stage so DuckDB's default CTE inlining cannot
# re-expand the minhash chain per reference (the _wp_rounds_cte lesson).
# Candidate pairs with zero shared shingles drop out of `inter`; they
# could never pass the 9/10 verify, so `edges` is unchanged.
_COMP_CTES = f"""
        units AS MATERIALIZED ({_UNITS}),
        sigs AS MATERIALIZED (
            SELECT doc_id, seed,
                   MIN(((2 * seed + 1) * h + seed * seed + 7) % {_P}) AS mh
            FROM (SELECT doc_id, {_BASE} AS h FROM units) u,
                 (SELECT unnest(range({MINHASH_K})) AS seed) s
            GROUP BY doc_id, seed
        ),
        bands AS MATERIALIZED (
            SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
                   string_agg(mh::VARCHAR, ',' ORDER BY seed) AS band_sig
            FROM sigs GROUP BY doc_id, band
        ),
        bstats AS MATERIALIZED (
            SELECT band, band_sig, COUNT(*) AS n FROM bands GROUP BY 1, 2
        ),
        refined AS MATERIALIZED (
            SELECT DISTINCT m.doc_id FROM bands m
            JOIN bstats k ON m.band = k.band AND m.band_sig = k.band_sig
            WHERE k.n > {LSH_MAX_BUCKET}
        ),
        fine_r AS MATERIALIZED (
            SELECT f.doc_id, f.band, f.band_sig FROM (
                SELECT doc_id, seed // {FINE_ROWS_PER_BAND} AS band,
                       string_agg(mh::VARCHAR, ',' ORDER BY seed) AS band_sig
                FROM sigs GROUP BY doc_id, band
            ) f JOIN refined r ON f.doc_id = r.doc_id
        ),
        fstats AS MATERIALIZED (
            SELECT band, band_sig, COUNT(*) AS n FROM fine_r GROUP BY 1, 2
        ),
        fstar_hubs AS MATERIALIZED (
            SELECT band, band_sig, MIN(doc_id) AS min_id
            FROM fine_r GROUP BY band, band_sig
            HAVING COUNT(*) > {LSH_MAX_BUCKET}
        ),
        setfp AS MATERIALIZED (
            SELECT doc_id, md5(string_agg(shingle, ' ' ORDER BY shingle)) AS fp
            FROM units GROUP BY doc_id
        ),
        fpg AS MATERIALIZED (
            SELECT fp, COUNT(*) AS n, MIN(doc_id) AS min_id
            FROM setfp GROUP BY fp HAVING COUNT(*) >= 2
        ),
        cands AS MATERIALIZED (
            SELECT DISTINCT doc_a, doc_b FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a
                JOIN bands b
                  ON a.band = b.band AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id
                JOIN bstats k
                  ON a.band = k.band AND a.band_sig = k.band_sig
                WHERE k.n <= {LSH_MAX_BUCKET}
                UNION ALL
                SELECT fa.doc_id AS doc_a, fb.doc_id AS doc_b
                FROM fine_r fa
                JOIN fine_r fb
                  ON fa.band = fb.band AND fa.band_sig = fb.band_sig
                 AND fa.doc_id < fb.doc_id
                JOIN fstats k
                  ON fa.band = k.band AND fa.band_sig = k.band_sig
                WHERE k.n <= {LSH_MAX_BUCKET}
                UNION ALL
                SELECT k.min_id AS doc_a, f.doc_id AS doc_b
                FROM fine_r f
                JOIN fstar_hubs k
                  ON f.band = k.band AND f.band_sig = k.band_sig
                WHERE f.doc_id != k.min_id
                UNION ALL
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM setfp a
                JOIN setfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
                JOIN fpg g ON a.fp = g.fp
                WHERE g.n <= {EXACT_FP_MAX_GROUP}
                UNION ALL
                SELECT g.min_id AS doc_a, s.doc_id AS doc_b
                FROM setfp s JOIN fpg g ON s.fp = g.fp
                WHERE g.n > {EXACT_FP_MAX_GROUP} AND s.doc_id != g.min_id
            )
        ),
        sizes AS MATERIALIZED (
            SELECT doc_id, COUNT(*) AS n FROM units GROUP BY doc_id
        ),
        inter AS MATERIALIZED (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
            FROM cands c
            JOIN units a ON a.doc_id = c.doc_a
            JOIN units b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
            GROUP BY 1, 2
        ),
        edges AS MATERIALIZED (
            SELECT i.doc_a, i.doc_b
            FROM inter i
            JOIN sizes sa ON i.doc_a = sa.doc_id
            JOIN sizes sb ON i.doc_b = sb.doc_id
            WHERE 10 * i.inter >= 9 * (sa.n + sb.n - i.inter)
        ),
        sym AS (
            SELECT doc_a AS s, doc_b AS d FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges
        ),
        nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        )"""

from gmall_flink_spark.queries.llm_pipeline import SPLIT_TRAIN as _ST, SPLIT_VAL as _SV

ORACLE = {
    "lsh_recall_audit": f"""
        WITH jac AS ({_jaccard(_SAMPLE_UNITS)}),
        truth AS (
            SELECT doc_a, doc_b,
                   CASE WHEN inter = uni THEN 1 ELSE 0 END AS is_exact
            FROM jac WHERE 10 * inter >= 9 * uni
        ),
        -- sample-scoped UNCAPPED fingerprint pairs (review r14): mirror of
        -- the engine's fp_sample — the rule's group co-membership, which
        -- keeps the exact row total past EXACT_FP_MAX_GROUP where the
        -- production edge list switches to its star encoding
        fp_s AS (
            SELECT doc_id, md5(string_agg(shingle, ' ' ORDER BY shingle)) AS fp
            FROM ({_SAMPLE_UNITS}) GROUP BY doc_id
        ),
        cands AS (
            SELECT doc_a, doc_b, 1 AS hit FROM (
                SELECT doc_a, doc_b FROM ({_CANDS})
                WHERE doc_a % {AUDIT_MOD} = 0 AND doc_b % {AUDIT_MOD} = 0
                UNION
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM fp_s a JOIN fp_s b ON a.fp = b.fp AND a.doc_id < b.doc_id
            )
        )
        SELECT t.is_exact,
               CAST(COUNT(*) AS BIGINT) AS true_ct,
               CAST(SUM(COALESCE(c.hit, 0)) AS BIGINT) AS hit_ct,
               CAST(SUM(CASE WHEN c.hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS miss_ct,
               CAST(SUM(t.doc_a) AS BIGINT) AS a_id_sum,
               CAST(SUM(t.doc_b) AS BIGINT) AS b_id_sum
        FROM truth t LEFT JOIN cands c
          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
        GROUP BY t.is_exact ORDER BY t.is_exact
    """,
    # containment twin: BRUTE FORCE over all shingle-sharing sample pairs
    # (no prefix-filter mirroring) — parity with the engine's one-sided
    # prefix candidates is a completeness proof of the prefix bound.
    # nb = uni + inter - na, same derivation as the engine.
    "dedup_containment_stats": f"""
        WITH jac AS ({_jaccard(_SAMPLE_UNITS)}),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM ({_SAMPLE_UNITS}) GROUP BY doc_id),
        f AS (
            SELECT j.doc_a, j.doc_b, j.inter, j.uni, sa.n AS na,
                   j.uni + j.inter - sa.n AS nb
            FROM jac j JOIN sz sa ON j.doc_a = sa.doc_id
        ),
        flags AS (
            SELECT *,
                CASE WHEN 10 * inter >= 9 * na THEN 1 ELSE 0 END AS ain,
                CASE WHEN 10 * inter >= 9 * nb THEN 1 ELSE 0 END AS bin,
                CASE WHEN 10 * inter >= 9 * uni THEN 1 ELSE 0 END AS j9
            FROM f
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS pair_ct,
               CAST(COALESCE(SUM(CASE WHEN ain = 1 AND bin = 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS mutual_ct,
               CAST(COALESCE(SUM(CASE WHEN ain + bin = 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS oneway_ct,
               CAST(COALESCE(SUM(CASE WHEN j9 = 0 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS beyond_jaccard_ct,
               CAST(COALESCE(SUM(inter), 0) AS BIGINT) AS inter_sum,
               CAST(COALESCE(SUM(doc_a), 0) AS BIGINT) AS a_id_sum,
               CAST(COALESCE(SUM(doc_b), 0) AS BIGINT) AS b_id_sum
        FROM flags WHERE ain = 1 OR bin = 1
    """,
    "dedup_allpairs_exact": f"""
        WITH jac AS ({_jaccard(_SAMPLE_UNITS)})
        SELECT CAST(COUNT(*) AS BIGINT) AS pair_ct,
               CAST(SUM(CASE WHEN inter = uni THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_ct,
               CAST(SUM(inter) AS BIGINT) AS inter_sum,
               CAST(SUM(uni) AS BIGINT) AS uni_sum,
               CAST(SUM(doc_a) AS BIGINT) AS a_id_sum,
               CAST(SUM(doc_b) AS BIGINT) AS b_id_sum
        FROM jac WHERE 10 * inter >= 9 * uni
    """,
    "split_leakage_audit": f"""
        WITH jac AS ({_jaccard(_SAMPLE_UNITS)}),
        verified AS (
            SELECT doc_a, doc_b,
                   CASE WHEN inter = uni THEN 1 ELSE 0 END AS is_exact
            FROM jac WHERE 10 * inter >= 9 * uni
        ),
        sp AS (
            SELECT doc_a, doc_b, is_exact,
                   CASE WHEN ha < {_ST} THEN 'train'
                        WHEN ha < {_SV} THEN 'val' ELSE 'test' END AS sa,
                   CASE WHEN hb < {_ST} THEN 'train'
                        WHEN hb < {_SV} THEN 'val' ELSE 'test' END AS sb
            FROM (
                SELECT *,
                       ('0x' || substr(md5('0|' || doc_a::VARCHAR), 1, 15))::BIGINT
                           % 100 AS ha,
                       ('0x' || substr(md5('0|' || doc_b::VARCHAR), 1, 15))::BIGINT
                           % 100 AS hb
                FROM verified
            )
        )
        SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
               CAST(COUNT(*) AS BIGINT) AS pair_ct,
               CAST(SUM(is_exact) AS BIGINT) AS exact_ct,
               CAST(SUM(CASE WHEN sa <= sb THEN doc_a ELSE doc_b END) AS BIGINT)
                   AS a_id_sum,
               CAST(SUM(CASE WHEN sa <= sb THEN doc_b ELSE doc_a END) AS BIGINT)
                   AS b_id_sum
        FROM sp GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "llm_split_by_cluster": f"""
        WITH RECURSIVE
        jac AS ({_jaccard(_SAMPLE_UNITS)}),
        verified AS (
            SELECT doc_a, doc_b,
                   CASE WHEN inter = uni THEN 1 ELSE 0 END AS is_exact
            FROM jac WHERE 10 * inter >= 9 * uni
        ),
        sym AS (
            SELECT doc_a AS s, doc_b AS d FROM verified
            UNION ALL SELECT doc_b, doc_a FROM verified
        ),
        nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        ),
        comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
        hashed AS (
            SELECT v.doc_a, v.doc_b, v.is_exact,
                   ('0x' || substr(md5('0|' ||
                       COALESCE(ca.component, v.doc_a)::VARCHAR), 1, 15))::BIGINT
                       % 100 AS ha,
                   ('0x' || substr(md5('0|' ||
                       COALESCE(cb.component, v.doc_b)::VARCHAR), 1, 15))::BIGINT
                       % 100 AS hb
            FROM verified v
            LEFT JOIN comp ca ON v.doc_a = ca.doc_id
            LEFT JOIN comp cb ON v.doc_b = cb.doc_id
        ),
        sp AS (
            SELECT doc_a, doc_b, is_exact,
                   CASE WHEN ha < {_ST} THEN 'train'
                        WHEN ha < {_SV} THEN 'val' ELSE 'test' END AS sa,
                   CASE WHEN hb < {_ST} THEN 'train'
                        WHEN hb < {_SV} THEN 'val' ELSE 'test' END AS sb
            FROM hashed
        )
        SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
               CAST(COUNT(*) AS BIGINT) AS pair_ct,
               CAST(SUM(is_exact) AS BIGINT) AS exact_ct,
               CAST(SUM(CASE WHEN sa <= sb THEN doc_a ELSE doc_b END) AS BIGINT)
                   AS a_id_sum,
               CAST(SUM(CASE WHEN sa <= sb THEN doc_b ELSE doc_a END) AS BIGINT)
                   AS b_id_sum
        FROM sp GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dedup_rep_select_exact": f"""
        WITH RECURSIVE
        jac AS ({_jaccard(_SAMPLE_UNITS)}),
        edges AS (SELECT doc_a, doc_b FROM jac WHERE 10 * inter >= 9 * uni),
        sym AS (
            SELECT doc_a AS s, doc_b AS d FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges
        ),
        nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        ),
        comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
        scored AS ({SCORED_DOCS_SQL}),
        ranked AS (
            SELECT c.component, c.doc_id, s.score,
                   row_number() OVER (PARTITION BY c.component
                                      ORDER BY s.score DESC, c.doc_id) AS rk
            FROM comp c JOIN scored s ON c.doc_id = s.doc_id
        )
        SELECT component,
               MAX(CASE WHEN rk = 1 THEN doc_id END) AS rep_doc,
               COUNT(*) AS member_ct,
               COUNT(*) - 1 AS drop_ct,
               MAX(score) AS score_best,
               MIN(score) AS score_worst
        FROM ranked GROUP BY component ORDER BY component
    """,
    "dedup_components_exact": f"""
        WITH RECURSIVE
        jac AS ({_jaccard(_SAMPLE_UNITS)}),
        edges AS (SELECT doc_a, doc_b FROM jac WHERE 10 * inter >= 9 * uni),
        sym AS (
            SELECT doc_a AS s, doc_b AS d FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges
        ),
        nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
        ),
        comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
        sizes AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
        SELECT CAST(COUNT(*) AS BIGINT) AS component_ct,
               CAST(SUM(sz) AS BIGINT) AS clustered_doc_ct,
               CAST(MAX(sz) AS BIGINT) AS max_size,
               CAST(SUM(sz) - COUNT(*) AS BIGINT) AS drop_ct,
               CAST(SUM(component) AS BIGINT) AS rep_id_sum
        FROM sizes
    """,
    "dedup_exact_prefix": f"""
        WITH t AS (SELECT doc_id, md5(array_to_string(({_TOKS})[1:2], ' ')) AS fp2
                   FROM documents)
        SELECT fp2, COUNT(*) AS dup_ct, MIN(doc_id) AS keep_doc
        FROM t GROUP BY fp2 HAVING COUNT(*) > 1 ORDER BY fp2
    """,
    "minhash_band_buckets": f"""
        SELECT band, band_sig, COUNT(*) AS member_ct, CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        FROM ({_BANDS}) GROUP BY band, band_sig HAVING COUNT(*) > 1
        ORDER BY band, band_sig
    """,
    "minhash_lsh_pairs": f"""
        WITH cands AS ({_CANDS}),
        jac AS ({_jaccard(_UNITS)})
        SELECT j.doc_a, j.doc_b, j.inter, j.uni
        FROM jac j JOIN cands c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE 10 * j.inter >= 9 * j.uni
        ORDER BY j.doc_a, j.doc_b
    """,
    "ngram_jaccard_stats": f"""
        WITH jac AS ({_jaccard(_SHINGLES3, max_df=NGRAM_MAX_DF)})
        SELECT COUNT(*) AS pair_ct,
               CAST(SUM(CASE WHEN 5 * inter >= uni THEN 1 ELSE 0 END) AS BIGINT) AS j02_ct,
               CAST(SUM(CASE WHEN 2 * inter >= uni THEN 1 ELSE 0 END) AS BIGINT) AS j05_ct,
               MAX(inter) AS max_inter
        FROM jac
    """,
    "dedup_components": f"""
        WITH RECURSIVE
        {_COMP_CTES}
        SELECT doc_id, MIN(r) AS component
        FROM reach GROUP BY doc_id ORDER BY doc_id
    """,
    "dedup_rep_select": f"""
        WITH RECURSIVE
        {_COMP_CTES},
        comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
        scored AS ({SCORED_DOCS_SQL}),
        ranked AS (
            SELECT c.component, c.doc_id, s.score,
                   row_number() OVER (PARTITION BY c.component
                                      ORDER BY s.score DESC, c.doc_id) AS rk
            FROM comp c JOIN scored s ON c.doc_id = s.doc_id
        )
        SELECT component,
               MAX(CASE WHEN rk = 1 THEN doc_id END) AS rep_doc,
               COUNT(*) AS member_ct,
               COUNT(*) - 1 AS drop_ct,
               MAX(score) AS score_best,
               MIN(score) AS score_worst
        FROM ranked GROUP BY component ORDER BY component
    """,
    "dedup_simhash": f"""
        WITH hashed AS (
            SELECT doc_id, ('0x' || substr(md5('0|' || shingle), 1, 15))::BIGINT AS h
            FROM ({_UNITS})
        ),
        votes AS (
            SELECT doc_id, b,
                   SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS tally
            FROM hashed, (SELECT unnest(range(16)) AS b) bits
            GROUP BY doc_id, b
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN tally > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id ORDER BY doc_id
    """,
}

# the simhash sign-vote → banding → capped bucket join → hamming verify
# chain UNIONed with the exact token-set-fingerprint pre-pass (mirrors
# _simhash_verified_frame), shared by the pairing oracle and the recall
# audit
_SIMHASH_VERIFIED = f"""
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5('0|' || shingle), 1, 15))::BIGINT AS h
        FROM ({_UNITS})
    ),
    votes AS (
        SELECT doc_id, b,
               SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS tally
        FROM hashed, (SELECT unnest(range(16)) AS b) bits
        GROUP BY doc_id, b
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN tally > 0 THEN CAST(pow(2, b) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, simhash, band,
               (simhash >> (band * {SIMHASH_BAND_BITS}))
                   & {(1 << SIMHASH_BAND_BITS) - 1} AS bval
        FROM sig, (SELECT unnest(range({SIMHASH_BANDS})) AS band)
    ),
    keep AS (
        SELECT band, bval FROM bands GROUP BY band, bval
        HAVING COUNT(*) <= {SIMHASH_MAX_BUCKET}
    ),
    capped AS (
        SELECT b.* FROM bands b JOIN keep k
          ON b.band = k.band AND b.bval = k.bval
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                        a.simhash AS a_sig, b.simhash AS b_sig
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    ),
    banded_verified AS (
        SELECT a_id, b_id,
               CAST(bit_count(xor(a_sig, b_sig)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(a_sig, b_sig)) <= {SIMHASH_HAM_MAX}
    ),
    setfp AS (
        SELECT doc_id, md5(string_agg(shingle, ' ' ORDER BY shingle)) AS fp
        FROM ({_UNITS}) GROUP BY doc_id
    ),
    fpg AS (
        SELECT fp, COUNT(*) AS n, MIN(doc_id) AS min_id
        FROM setfp GROUP BY fp HAVING COUNT(*) >= 2
    ),
    exact_pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(0 AS BIGINT) AS hamming
        FROM setfp a
        JOIN setfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN fpg g ON a.fp = g.fp
        WHERE g.n <= {EXACT_FP_MAX_GROUP}
        UNION ALL
        SELECT g.min_id, s.doc_id, CAST(0 AS BIGINT)
        FROM setfp s JOIN fpg g ON s.fp = g.fp
        WHERE g.n > {EXACT_FP_MAX_GROUP} AND s.doc_id != g.min_id
    ),
    verified AS (
        SELECT DISTINCT a_id, b_id, hamming FROM (
            SELECT * FROM banded_verified UNION ALL SELECT * FROM exact_pairs
        )
    )
"""

ORACLE["dedup_simhash_pairs"] = f"""
    WITH {_SIMHASH_VERIFIED}
    SELECT hamming, CAST(COUNT(*) AS BIGINT) AS pair_ct,
           CAST(SUM(a_id) AS BIGINT) AS a_id_sum,
           CAST(SUM(b_id) AS BIGINT) AS b_id_sum
    FROM verified GROUP BY hamming ORDER BY hamming
"""

ORACLE["simhash_recall_audit"] = f"""
    WITH {_SIMHASH_VERIFIED},
    jac AS ({_jaccard(_SAMPLE_UNITS)}),
    truth AS (
        SELECT doc_a, doc_b,
               CASE WHEN inter = uni THEN 1 ELSE 0 END AS is_exact
        FROM jac WHERE 10 * inter >= 9 * uni
    ),
    -- sample-scoped UNCAPPED fingerprint pairs (review r14): same cap
    -- nuance as the lsh audit — audit the rule, not its star encoding
    fp_s AS (
        SELECT doc_id, md5(string_agg(shingle, ' ' ORDER BY shingle)) AS fp
        FROM ({_SAMPLE_UNITS}) GROUP BY doc_id
    ),
    cands AS (
        SELECT doc_a, doc_b, 1 AS hit FROM (
            SELECT a_id AS doc_a, b_id AS doc_b FROM verified
            WHERE a_id % {AUDIT_MOD} = 0 AND b_id % {AUDIT_MOD} = 0
            UNION
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM fp_s a JOIN fp_s b ON a.fp = b.fp AND a.doc_id < b.doc_id
        )
    )
    SELECT t.is_exact,
           CAST(COUNT(*) AS BIGINT) AS true_ct,
           CAST(SUM(COALESCE(c.hit, 0)) AS BIGINT) AS hit_ct,
           CAST(SUM(CASE WHEN c.hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS miss_ct,
           CAST(SUM(t.doc_a) AS BIGINT) AS a_id_sum,
           CAST(SUM(t.doc_b) AS BIGINT) AS b_id_sum
    FROM truth t LEFT JOIN cands c
      ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    GROUP BY t.is_exact ORDER BY t.is_exact
"""

# bloom pre-filter twin: same token-set fingerprint, same affine position
# family ((2s+1)h + s²+7 mod P mod m — multiplier <= 7 × h < 2^60 stays
# inside int64 in both engines), duplicate positions kept on the probe
# side (the engine explodes the raw array, so a key with colliding
# positions needs every ELEMENT lit, counted per element here too)
ORACLE["dedup_bloom_prefilter"] = f"""
    WITH keyed AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS f
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, source, f,
               ('0x' || substr(md5('0|' || f), 1, 15))::BIGINT AS h
        FROM keyed
    ),
    bits AS (
        SELECT DISTINCT ((2 * s + 1) * h + s * s + 7) % 1000000007 % 16384 AS pos
        FROM hashed, (SELECT unnest(range(4)) AS s)
        WHERE doc_id % 2 = 0
    ),
    probe AS (SELECT * FROM hashed WHERE doc_id % 2 = 1),
    pkeys AS (SELECT DISTINCT f, h FROM probe),
    ppos AS (
        SELECT f, ((2 * s + 1) * h + s * s + 7) % 1000000007 % 16384 AS pos
        FROM pkeys, (SELECT unnest(range(4)) AS s)
    ),
    verdict AS (
        SELECT p.f, CASE WHEN COUNT(b.pos) = 4 THEN 1 ELSE 0 END AS maybe_dup
        FROM ppos p LEFT JOIN bits b ON p.pos = b.pos
        GROUP BY p.f
    ),
    seen AS (SELECT DISTINCT f FROM hashed WHERE doc_id % 2 = 0)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS probe_ct,
           CAST(SUM(v.maybe_dup) AS BIGINT) AS flagged_ct,
           CAST(SUM(CASE WHEN s.f IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS true_dup_ct,
           CAST(SUM(v.maybe_dup * CASE WHEN s.f IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS false_pos_ct
    FROM probe pr
    JOIN verdict v ON pr.f = v.f
    LEFT JOIN seen s ON pr.f = s.f
    GROUP BY source ORDER BY source
"""

ORACLE["dedup_cross_source"] = f"""
    WITH jac AS ({_jaccard(_SAMPLE_UNITS)}),
    edges AS (
        SELECT doc_a, doc_b FROM jac WHERE 10 * inter >= 9 * uni
    ),
    attached AS (
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               e.doc_a, e.doc_b
        FROM edges e
        JOIN documents da ON e.doc_a = da.doc_id
        JOIN documents db ON e.doc_b = db.doc_id
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS sampled_pair_ct,
           CAST(SUM(doc_a) AS BIGINT) AS sampled_a_id_sum,
           CAST(SUM(doc_b) AS BIGINT) AS sampled_b_id_sum
    FROM attached GROUP BY 1, 2 ORDER BY 1, 2
"""

# ExactSubstr twin: positions of every SUBSTR_W-gram (the grams GROUPed as
# STRINGS — the engine's xxhash64 keys must agree or the gate fails),
# duplicated = corpus occurrence >= SUBSTR_MIN_OCC, then the same
# equal-width interval-merge rule as llm/substring.py (new span iff
# pos - prev_pos > W; per-span coverage = max - min + W).
_SUBSTR_FLAT = f"""
    posu AS (
        SELECT doc_id, len(toks) AS n_toks,
               unnest([{{'p': i,
                         'g': array_to_string(toks[i + 1 : i + {SUBSTR_W}], ' ')}}
                       for i in range(0, len(toks) - {SUBSTR_W} + 1)]) AS s
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
        WHERE len(toks) >= {SUBSTR_W}
    ),
    flat AS (SELECT doc_id, n_toks, s.p AS pos, s.g AS gram FROM posu)
"""


def _substr_merge(src: str) -> str:
    """The interval-merge CTE chain over a (doc_id, n_toks, pos) source —
    the SQL twin of llm/substring.merged_intervals."""
    return f"""
    flagged AS (
        SELECT doc_id, n_toks, pos,
               CASE WHEN pos - LAG(pos) OVER w > {SUBSTR_W}
                    OR LAG(pos) OVER w IS NULL THEN 1 ELSE 0 END AS new_span
        FROM {src} WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    numbered AS (
        SELECT doc_id, n_toks, pos,
               SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        FROM flagged
    ),
    per_span AS (
        SELECT doc_id, n_toks, span_id, COUNT(*) AS pos_ct,
               MAX(pos) + {SUBSTR_W} - MIN(pos) AS covered
        FROM numbered GROUP BY doc_id, n_toks, span_id
    ),
    per_doc AS (
        SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
               CAST(SUM(pos_ct) AS BIGINT) AS pos_ct,
               CAST(COUNT(*) AS BIGINT) AS span_ct,
               CAST(SUM(covered) AS BIGINT) AS covered_ct
        FROM per_span GROUP BY doc_id, n_toks
    )"""


_SUBSTR_PER_DOC = f"""
    {_SUBSTR_FLAT},
    dup AS (
        SELECT gram FROM flat GROUP BY gram
        HAVING COUNT(*) >= {SUBSTR_MIN_OCC}
    ),
    dpos AS (SELECT doc_id, n_toks, pos FROM flat JOIN dup USING (gram)),
    {_substr_merge("dpos")}
"""

ORACLE["substr_dup_spans"] = f"""
    WITH {_SUBSTR_PER_DOC}
    SELECT doc_id, n_toks, pos_ct AS dup_pos_ct, span_ct,
           covered_ct AS dup_token_ct,
           CAST(covered_ct AS DOUBLE) / n_toks AS dup_frac
    FROM per_doc ORDER BY doc_id
"""

ORACLE["substr_dedup_stats"] = f"""
    WITH {_SUBSTR_PER_DOC},
    all_docs AS (
        SELECT d.source, d.doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_toks,
               p.covered_ct AS dup_token_ct, p.span_ct
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS doc_ct,
           CAST(COUNT(span_ct) AS BIGINT) AS dup_doc_ct,
           CAST(SUM(n_toks) AS BIGINT) AS token_ct,
           CAST(COALESCE(SUM(dup_token_ct), 0) AS BIGINT) AS dup_token_ct,
           CAST(COALESCE(SUM(dup_token_ct), 0) AS DOUBLE) / SUM(n_toks)
               AS dup_token_frac
    FROM all_docs GROUP BY source ORDER BY source
"""

# per-domain near-dup contamination twin: the dedup_components recursive
# closure + the CANONICAL domain straight from the URL synthesis formulas
# (independent of the engine's normalize/registered_domain path)
ORACLE["web_domain_dup_rate"] = f"""
    WITH RECURSIVE
    cands AS ({_CANDS}),
    jac AS ({_jaccard(_UNITS)}),
    edges AS (
        SELECT j.doc_a, j.doc_b
        FROM jac j JOIN cands c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE 10 * j.inter >= 9 * j.uni
    ),
    sym AS (
        SELECT doc_a AS s, doc_b AS d FROM edges
        UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
    reach(doc_id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
    ),
    comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
    dom AS (
        SELECT doc_id,
               source || '.' || (['com','org','net'])[(doc_id % 3) + 1]
                   AS domain
        FROM documents
    ),
    cj AS (
        SELECT c.component, c.doc_id, d.domain
        FROM comp c JOIN dom d USING (doc_id)
    ),
    nd AS (SELECT component, COUNT(DISTINCT domain) AS ndom
           FROM cj GROUP BY component),
    dup AS (
        SELECT cj.domain,
               CAST(COUNT(*) AS BIGINT) AS dup_doc_ct,
               CAST(SUM(CASE WHEN nd.ndom >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cross_domain_dup_ct
        FROM cj JOIN nd USING (component) GROUP BY cj.domain
    ),
    alls AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS doc_ct
             FROM dom GROUP BY domain)
    SELECT a.domain, a.doc_ct,
           CAST(COALESCE(p.dup_doc_ct, 0) AS BIGINT) AS dup_doc_ct,
           CAST(COALESCE(p.cross_domain_dup_ct, 0) AS BIGINT)
               AS cross_domain_dup_ct,
           CAST(COALESCE(p.dup_doc_ct, 0) AS DOUBLE) / a.doc_ct AS dup_frac
    FROM alls a LEFT JOIN dup p USING (domain) ORDER BY domain
"""

# blocklist twin: the same recursive component closure + synthesis-formula
# domain as web_domain_dup_rate, joined against the shared quality-score
# relation; the block rule repeats the integer constants verbatim
ORACLE["domain_blocklist"] = f"""
    WITH RECURSIVE
    cands AS ({_CANDS}),
    jac AS ({_jaccard(_UNITS)}),
    edges AS (
        SELECT j.doc_a, j.doc_b
        FROM jac j JOIN cands c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE 10 * j.inter >= 9 * j.uni
    ),
    sym AS (
        SELECT doc_a AS s, doc_b AS d FROM edges
        UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
    reach(doc_id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
    ),
    comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
    dom AS (
        SELECT doc_id,
               source || '.' || (['com','org','net'])[(doc_id % 3) + 1]
                   AS domain
        FROM documents
    ),
    scored AS ({SCORED_DOCS_SQL}),
    dup AS (
        SELECT domain, COUNT(*) AS dup_doc_ct
        FROM comp JOIN dom USING (doc_id) GROUP BY domain
    ),
    per AS (
        SELECT domain, COUNT(*) AS doc_ct, SUM(score) AS score_sum
        FROM dom JOIN scored USING (doc_id) GROUP BY domain
    ),
    j AS (
        SELECT per.domain, doc_ct, COALESCE(dup_doc_ct, 0) AS dup_doc_ct,
               score_sum,
               CASE WHEN COALESCE(dup_doc_ct, 0) * {BLOCK_DUP_DEN}
                         >= doc_ct * {BLOCK_DUP_NUM}
                         OR score_sum < doc_ct * {BLOCK_QUALITY_MIN}
                    THEN 1 ELSE 0 END AS blocked
        FROM per LEFT JOIN dup ON per.domain = dup.domain
    )
    SELECT domain, CAST(doc_ct AS BIGINT) AS doc_ct,
           CAST(dup_doc_ct AS BIGINT) AS dup_doc_ct,
           CAST(score_sum AS BIGINT) AS score_sum,
           CAST(blocked AS BIGINT) AS blocked,
           CAST(blocked * doc_ct AS BIGINT) AS blocked_doc_ct
    FROM j ORDER BY domain
"""


# datasheet twin: volume/lang scan + the shared quality relation + the
# bigram surprisal chain + the recursive component closure, stitched per
# source with the same left-join/coalesce rules
ORACLE["corpus_datasheet"] = f"""
    WITH RECURSIVE
    cands AS ({_CANDS}),
    jac AS ({_jaccard(_UNITS)}),
    edges AS (
        SELECT j.doc_a, j.doc_b
        FROM jac j JOIN cands c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE 10 * j.inter >= 9 * j.uni
    ),
    sym AS (
        SELECT doc_a AS s, doc_b AS d FROM edges
        UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
    reach(doc_id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
    ),
    comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
    scored AS ({SCORED_DOCS_SQL}),
    base AS (
        SELECT source, COUNT(*) AS doc_ct,
               SUM(len(list_filter(string_split(text, ' '), x -> x != '')))
                   AS token_ct,
               COUNT(DISTINCT lang) AS lang_ct
        FROM documents GROUP BY source
    ),
    q AS (SELECT source, SUM(score) AS score_sum FROM scored GROUP BY source),
    t AS (
        SELECT source, doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS l
        FROM documents
    ),
    bg AS (
        SELECT source, doc_id, l[i] AS a, l[i + 1] AS b
        FROM (SELECT source, doc_id, l, unnest(range(1, len(l))) AS i
              FROM t WHERE len(l) >= 2)
    ),
    ctx AS (SELECT a, COUNT(*) AS cn FROM bg GROUP BY a),
    bc AS (SELECT a, b, COUNT(*) AS bn FROM bg GROUP BY a, b),
    cls AS (
        SELECT a, b, CAST(floor(log2(CAST(cn // bn AS DOUBLE))) AS BIGINT) AS r
        FROM bc JOIN ctx USING (a)
    ),
    ppl_doc AS (
        SELECT source, doc_id, CAST((10 * SUM(r)) // COUNT(*) AS BIGINT) AS mean10x
        FROM bg JOIN cls USING (a, b)
        GROUP BY source, doc_id
    ),
    ppl AS (SELECT source, SUM(mean10x) AS ppl10x_sum FROM ppl_doc GROUP BY source),
    dup AS (
        SELECT d.source, COUNT(*) AS dup_doc_ct
        FROM comp JOIN documents d USING (doc_id) GROUP BY d.source
    )
    SELECT base.source,
           CAST(doc_ct AS BIGINT) AS doc_ct,
           CAST(token_ct AS BIGINT) AS token_ct,
           CAST(lang_ct AS BIGINT) AS lang_ct,
           CAST(COALESCE(q.score_sum, 0) AS BIGINT) AS score_sum,
           CAST(COALESCE(ppl.ppl10x_sum, 0) AS BIGINT) AS ppl10x_sum,
           CAST(COALESCE(dup.dup_doc_ct, 0) AS BIGINT) AS dup_doc_ct
    FROM base
    LEFT JOIN q ON base.source = q.source
    LEFT JOIN ppl ON base.source = ppl.source
    LEFT JOIN dup ON base.source = dup.source
    ORDER BY base.source
"""


# soft-dedup twin: the recursive closure + 10000 div family-size weights
ORACLE["dedup_loss_weights"] = f"""
    WITH RECURSIVE
    cands AS ({_CANDS}),
    jac AS ({_jaccard(_UNITS)}),
    edges AS (
        SELECT j.doc_a, j.doc_b
        FROM jac j JOIN cands c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
        WHERE 10 * j.inter >= 9 * j.uni
    ),
    sym AS (
        SELECT doc_a AS s, doc_b AS d FROM edges
        UNION ALL SELECT doc_b, doc_a FROM edges
    ),
    nodes AS (SELECT DISTINCT s AS doc_id FROM sym),
    reach(doc_id, r) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT reach.doc_id, sym.d FROM reach JOIN sym ON reach.r = sym.s
    ),
    comp AS (SELECT doc_id, MIN(r) AS component FROM reach GROUP BY doc_id),
    sizes AS (SELECT component, COUNT(*) AS fam_sz FROM comp GROUP BY component),
    weighted AS (
        SELECT d.source,
               10000 // COALESCE(s.fam_sz, 1) AS weight_bp,
               CASE WHEN c.component IS NULL THEN 0 ELSE 1 END AS is_member
        FROM documents d
        LEFT JOIN comp c ON d.doc_id = c.doc_id
        LEFT JOIN sizes s ON c.component = s.component
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS doc_ct,
           CAST(SUM(is_member) AS BIGINT) AS dup_member_ct,
           CAST(SUM(weight_bp) AS BIGINT) AS weight_bp_sum,
           CAST(MIN(weight_bp) AS BIGINT) AS min_weight_bp
    FROM weighted GROUP BY source ORDER BY source
"""

# keep-one-copy twin: a position is cut iff it is NOT the globally first
# (doc_id, pos) occurrence of its gram — rn >= 2 both selects duplicated
# grams and drops the canonical copy (rn = 2 exists only at occ >= 2),
# mirroring llm/substring.cut_positions' min-struct rule at min_occ = 2.
ORACLE["substr_cut_plan"] = f"""
    WITH {_SUBSTR_FLAT},
    ranked AS (
        SELECT doc_id, n_toks, pos,
               ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM flat
    ),
    cuts AS (SELECT doc_id, n_toks, pos FROM ranked WHERE rn >= 2),
    {_substr_merge("cuts")}
    SELECT doc_id, n_toks, pos_ct AS cut_pos_ct, span_ct AS cut_span_ct,
           covered_ct AS cut_token_ct,
           n_toks - covered_ct AS kept_token_ct
    FROM per_doc ORDER BY doc_id
"""

# the incremental maintenance path must equal the from-scratch closure —
# its oracle IS dedup_components' recursive-CTE oracle, verbatim
ORACLE["dedup_components_incremental"] = ORACLE["dedup_components"]


def _lsh_curve_oracle() -> str:
    """Unrolls the IDENTICAL integer fold as lsh_sensitivity_curve (same
    constants, same per-band acc·(Q−s) div Q steps) — the two sides are
    generated from one loop shape, so the lockstep is structural."""
    q = LSH_CURVE_Q
    cols = []
    for tag, r in (("coarse", ROWS_PER_BAND), ("fine", FINE_ROWS_PER_BAND)):
        b = MINHASH_K // r
        mul = " * ".join(["pct"] * r)
        s = f"(({q} * ({mul})) // {100 ** r})"
        acc = str(q)
        for _ in range(b):
            acc = f"(({acc} * ({q} - {s})) // {q})"
        cols.append(f"CAST({q} - {acc} AS BIGINT) AS p_cand_{tag}_q")
    return f"""
        SELECT CAST(x * 5 AS BIGINT) AS pct,
               {", ".join(cols)}
        FROM generate_series(1, 19) t(x)
        ORDER BY pct
    """


ORACLE["lsh_sensitivity_curve"] = _lsh_curve_oracle()


#: candidate bucket caps the plan table evaluates (the production value
#: LSH_MAX_BUCKET sits mid-grid so the operator sees both directions)
LSH_CAP_GRID = (10, 25, 50, 100, 200)


def lsh_bucket_cap_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-cap PLANNING table — the measured-data complement to
    lsh_sensitivity_curve (which is pure theory): from the ACTUAL coarse
    band-bucket size distribution of this corpus, what each candidate cap
    in LSH_CAP_GRID would cost and drop. Per cap: total buckets, buckets
    over the cap (sent to fine re-banding), doc slots inside over-cap
    buckets (the re-banding workload), the all-pairs candidate volume the
    sub-cap buckets generate (Σ n·(n−1)/2 — THE number that explodes when
    a cap is too loose), and the largest bucket. Together with the
    S-curve this is how LSH_MAX_BUCKET is chosen before a 100 TB run:
    theory gives the jaccard net, this gives the join volume at each cap.

    Scale: reads the memoized signature matrix (one shuffle, shared with
    every banding consumer); bucket sizes are one bounded-key aggregate;
    the cap grid is a 5-row broadcast crossJoin over the bucket-size
    frame — bytes, not data."""
    from gmall_flink_spark.llm.dedup import matrix_bands

    bands = matrix_bands(_minhash_mx(spark, sf_dir), ROWS_PER_BAND)
    sizes = bands.groupBy("band", "band_sig").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    caps = spark.createDataFrame([(c,) for c in LSH_CAP_GRID], "cap int")
    over = F.col("n") > F.col("cap")
    return (
        sizes.crossJoin(F.broadcast(caps))
        .groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("bucket_ct"),
            F.sum(over.cast("bigint")).cast("bigint").alias("over_bucket_ct"),
            F.sum(F.when(over, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("over_doc_slots"),
            # integer div, not /: n·(n−1) is always even, and float
            # division would lose exactness past 2^53 at corpus scale
            F.sum(
                F.when(~over, F.expr("(n * (n - 1)) DIV 2")).otherwise(0)
            )
            .cast("bigint")
            .alias("subcap_pair_ct"),
            F.max("n").cast("bigint").alias("max_bucket"),
        )
        .orderBy("cap")
    )


QUERIES["lsh_bucket_cap_plan"] = lsh_bucket_cap_plan

ORACLE["lsh_bucket_cap_plan"] = f"""
    WITH units AS MATERIALIZED ({_UNITS}),
    sigs AS MATERIALIZED (
        SELECT doc_id, seed,
               MIN(((2 * seed + 1) * h + seed * seed + 7) % {_P}) AS mh
        FROM (SELECT doc_id, {_BASE} AS h FROM units) u,
             (SELECT unnest(range({MINHASH_K})) AS seed) s
        GROUP BY doc_id, seed
    ),
    bands AS MATERIALIZED (
        SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
               string_agg(mh::VARCHAR, ',' ORDER BY seed) AS band_sig
        FROM sigs GROUP BY doc_id, band
    ),
    bstats AS MATERIALIZED (
        SELECT band, band_sig, CAST(COUNT(*) AS BIGINT) AS n
        FROM bands GROUP BY 1, 2
    ),
    caps AS (SELECT unnest([{", ".join(str(c) for c in LSH_CAP_GRID)}]) AS cap)
    SELECT CAST(cap AS INTEGER) AS cap,
           CAST(COUNT(*) AS BIGINT) AS bucket_ct,
           CAST(SUM(CASE WHEN n > cap THEN 1 ELSE 0 END) AS BIGINT)
               AS over_bucket_ct,
           CAST(SUM(CASE WHEN n > cap THEN n ELSE 0 END) AS BIGINT)
               AS over_doc_slots,
           CAST(SUM(CASE WHEN n <= cap THEN n * (n - 1) // 2 ELSE 0 END)
                AS BIGINT) AS subcap_pair_ct,
           CAST(MAX(n) AS BIGINT) AS max_bucket
    FROM bstats CROSS JOIN caps
    GROUP BY cap ORDER BY cap
"""


#: estimator-audit sample: 1-in-AUDIT_MOD² docs (the dedup_cross_source
#: precedent) so the ALL-pairs exact jaccard ground truth stays bounded
#: (~C(n/16, 2) pairs) at every SF the query runs at
MINHASH_EST_MOD = AUDIT_MOD * AUDIT_MOD


def minhash_est_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR accuracy audit — the third leg of the dedup
    audit stool: the recall audits score the candidate NET
    (lsh_recall_audit) and the sensitivity curve scores the THEORY
    (lsh_sensitivity_curve); this scores the ESTIMATE itself — for every
    pair of sampled docs sharing a shingle, how many of the K minhash
    seeds agree vs the pair's exact jaccard. Rows are exact-jaccard
    deciles ((10·inter) DIV uni) carrying pair counts, total matched
    seeds (expected value = jaccard·K per pair), and exact inter/uni
    sums — the table that says whether K=MINHASH_K seeds give enough
    resolution at the 9/10 verify threshold before trusting the banded
    index at corpus scale.

    Scale: ground truth is ALL-pairs on the 1-in-MINHASH_EST_MOD sample
    only (bounded by construction — the dedup_cross_source scope rule);
    signatures come from the shared memoized matrix, filtered to the
    sample before the self-join."""
    sampled = F.pmod(F.col("doc_id"), F.lit(MINHASH_EST_MOD)) == 0
    units = _doc_units(spark, sf_dir).where(sampled)
    sizes = units.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = units.alias("ua"), units.alias("ub")
    inter = (
        a.join(
            b,
            (F.col("ua.shingle") == F.col("ub.shingle"))
            & (F.col("ua.doc_id") < F.col("ub.doc_id")),
        )
        .groupBy(
            F.col("ua.doc_id").alias("doc_a"), F.col("ub.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    jac = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select("doc_a", "doc_b", "inter", (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"))
    )
    mx = _minhash_mx(spark, sf_dir).where(sampled)
    ma = mx.select(F.col("doc_id").alias("doc_a"), *[F.col(f"_m{s}").alias(f"a{s}") for s in range(MINHASH_K)])
    mb = mx.select(F.col("doc_id").alias("doc_b"), *[F.col(f"_m{s}").alias(f"b{s}") for s in range(MINHASH_K)])
    matched = None
    for s in range(MINHASH_K):
        term = (F.col(f"a{s}") == F.col(f"b{s}")).cast("bigint")
        matched = term if matched is None else matched + term
    return (
        jac.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select("inter", "uni", matched.alias("matched"))
        .groupBy(F.expr("(10 * inter) DIV uni").cast("bigint").alias("jac_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pair_ct"),
            F.sum("matched").cast("bigint").alias("matched_sum"),
            F.sum("inter").cast("bigint").alias("inter_sum"),
            F.sum("uni").cast("bigint").alias("uni_sum"),
        )
        .orderBy("jac_decile")
    )


QUERIES["minhash_est_accuracy"] = minhash_est_accuracy

ORACLE["minhash_est_accuracy"] = f"""
    WITH units AS MATERIALIZED (
        SELECT * FROM ({_UNITS}) WHERE doc_id % {MINHASH_EST_MOD} = 0
    ),
    sizes AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM units GROUP BY doc_id
    ),
    inter AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM units a JOIN units b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS MATERIALIZED (
        SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS uni
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
    ),
    sigs AS MATERIALIZED (
        SELECT doc_id, seed,
               MIN(((2 * seed + 1) * h + seed * seed + 7) % {_P}) AS mh
        FROM (SELECT doc_id, {_BASE} AS h FROM units) u,
             (SELECT unnest(range({MINHASH_K})) AS seed) s
        GROUP BY doc_id, seed
    ),
    matched AS MATERIALIZED (
        SELECT j.doc_a, j.doc_b,
               CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
                   AS matched
        FROM jac j
        JOIN sigs sa ON sa.doc_id = j.doc_a
        JOIN sigs sb ON sb.doc_id = j.doc_b AND sb.seed = sa.seed
        GROUP BY 1, 2
    )
    SELECT CAST((10 * j.inter) // j.uni AS BIGINT) AS jac_decile,
           CAST(COUNT(*) AS BIGINT) AS pair_ct,
           CAST(SUM(m.matched) AS BIGINT) AS matched_sum,
           CAST(SUM(j.inter) AS BIGINT) AS inter_sum,
           CAST(SUM(j.uni) AS BIGINT) AS uni_sum
    FROM jac j JOIN matched m ON j.doc_a = m.doc_a AND j.doc_b = m.doc_b
    GROUP BY 1 ORDER BY 1
"""
