"""Oracle-checked similarity-search queries over `embeddings`
(north-star ops: brute-force cosine top-k, IVF-partitioned ANN)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_flink_spark.llm.similarity import (
    broadcast_cosine_hits,
    brute_force_topk,
    cosine,
    ivf_assign,
    kmeans_refine,
    near_dup_pairs,
    prep,
    with_norm,
)
from gmall_flink_spark.sources.tables import table

N_QUERIES = 5
N_CENTROIDS = 10


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-10 cosine neighbours for query vectors
    (vec_id < 5), query set broadcast against the full table."""
    emb = prep(table(spark, sf_dir, "embeddings"))
    return brute_force_topk(emb, emb.where(F.col("vec_id") < N_QUERIES), k=10).orderBy(
        "q_id", "rk"
    )


def sim_ivf_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF stage 1: nearest-centroid assignment histogram (centroids =
    vec_id < 10). The cluster id is the scale path's partition key."""
    assigned = _ivf_assigned(spark, sf_dir)
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("member_ct"))
        .orderBy("cluster")
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF stage 2: ANN top-5 per query (vec_id < 5) searching only the
    query's own cluster — the probe touches one partition, not the table."""
    emb = prep(table(spark, sf_dir, "embeddings"))
    # session-memoized assignment (optimization r15): five queries used to
    # rebuild the identical vectors x centroids scoring per call; the memo
    # computes it once per (session, content stamp) — the first family
    # member pays the build, the rest read the checkpoint (the production
    # posture, where the assignment IS the persisted IVF index table)
    assigned = _ivf_assigned(spark, sf_dir)
    queries = with_norm(emb.where(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"),
        # a query vector is its own nearest centroid (cos=1): cluster == q_id
        F.col("vec_id").alias("q_cluster"),
    )
    scored = (
        assigned.join(F.broadcast(queries), F.col("cluster") == F.col("q_cluster"))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("q_norm"), F.col("vec"), F.col("norm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rk", "cos")
        .orderBy("q_id", "rk")
    )


#: cluster-blocked cosine near-dup pairs (cos >= 0.3), memoized per
#: (session, sf_dir, content stamp) like the LSH pair graph: embed_near_dup
#: reports the pairs and embed_semdedup_drops turns them into per-cluster
#: keep/drop decisions — one blocked pair scan serves both.
_NEARDUP_PAIRS: dict[tuple, DataFrame] = {}

#: the seed-centroid assignment frame feeding the pair scan, memoized too:
#: the semdedup ledger needs per-cluster member counts and would otherwise
#: re-run the vectors-x-centroids scoring its docstring promises it skips
_ASSIGNED_MEMO: dict[tuple, DataFrame] = {}


def _ivf_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "embeddings", _ASSIGNED_MEMO)
    if key not in _ASSIGNED_MEMO:
        emb = prep(table(spark, sf_dir, "embeddings"))
        assigned = ivf_assign(emb, emb.where(F.col("vec_id") < N_CENTROIDS))
        _ASSIGNED_MEMO[key] = assigned.localCheckpoint(eager=True)
    return _ASSIGNED_MEMO[key]


def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "embeddings", _NEARDUP_PAIRS)
    if key not in _NEARDUP_PAIRS:
        pairs = near_dup_pairs(
            _ivf_assigned(spark, sf_dir), threshold=0.3, block_col="cluster"
        )
        _NEARDUP_PAIRS[key] = pairs.localCheckpoint(eager=True)
    return _NEARDUP_PAIRS[key]


def embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked on the IVF cluster id (exact
    within blocks, cos >= 0.3, keep-lowest-id representative).

    The block key is the scale contract: clusters are high-cardinality
    (#centroids grows with the corpus), so the within-block all-pairs stays
    bounded — unlike a low-cardinality attribute block (label), which
    degenerates to O(B²) on giant blocks at 100 TB. Blocking on the same
    key IVF search shuffles on also reuses that partitioning."""
    return _neardup_pairs(spark, sf_dir).orderBy("block", "a_id", "b_id")


#: embedding-space decontamination threshold: a TRAIN vector whose max
#: cosine against the protected (val/test) split reaches this is flagged.
#: 0.35 sits at ~p90 of the max-cos distribution on the synthetic
#: embeddings (measured at sf0.01: p50 0.27, p90 0.354, max 0.48), so the
#: gate exercises both flagged and clean labels; a production threshold
#: would be calibrated against a held-out paraphrase set.
DECON_COS = 0.35

#: protected-split driver-collect bound (optimization r15 / VERDICT r14
#: item 5): the fast path collects the protected matrix into the task
#: closure, which is only safe while it is genuinely eval-suite-sized.
#: The probe is take(bound+1) — never an unbounded collect — and a split
#: over the bound routes through the EXACT distributed fold instead
#: (_decon_hits_exact; no driver collect at all). 100k rows ≈ tens of MB
#: at these dims — the same bounded-collect class as the CC driver solve.
DECON_PROTECTED_MAX = 100_000


def _decon_hits_exact(train: DataFrame, prot: DataFrame) -> DataFrame:
    """Over-bound fallback for embed_decontaminate: per-train-row hit
    stats against the protected split via an exact distributed crossJoin
    + JVM cosine fold — bit-identical to broadcast_cosine_hits (same
    6-decimal rounded cosine, hit count and max are order-independent,
    zero-hit rows dropped by the HAVING-style filter; equivalence pinned
    by tests/test_operators.py::test_decon_exact_fallback_equals_fast).
    Scale: no node ever holds the protected split whole — the nested-loop
    join streams (train-batch x protected-batch) blocks; it is the honest
    exact cost once the eval suite outgrows a task closure, and a
    deployment wanting sub-exact cost at that size would insert the SRP
    bucket index as a pre-filter IN FRONT of this verify (detect->verify,
    recall priced by sim_ivf_recall_audit's methodology)."""
    from gmall_flink_spark.llm.similarity import cosine, with_norm

    t = with_norm(train.select("vec_id", "label", "vec"))
    p = with_norm(prot.select(F.col("vec").alias("p_vec")), vec="p_vec")
    p = p.withColumnRenamed("norm", "p_norm")
    cos = cosine(F.col("vec"), F.col("norm"), F.col("p_vec"), F.col("p_norm"))
    hit = F.when(cos >= F.lit(DECON_COS), cos)
    # the threshold lives INSIDE the aggregates (conditional count/max +
    # post-agg where) rather than a pre-agg filter on the derived cosine,
    # so Catalyst cannot push a filter below the projection and evaluate
    # the fold twice per row (the events_value_corr lesson, guide §4.4)
    return (
        t.crossJoin(p)
        .select("vec_id", "label", hit.alias("_hit"))
        .groupBy("vec_id", "label")
        .agg(
            F.count("_hit").alias("hit_ct"),
            F.max("_hit").alias("max_cos"),
        )
        .where(F.col("hit_ct") > 0)
    )


def embed_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine decontamination of the training split against the
    protected (val + test) split — the SEMANTIC complement of the n-gram
    llm_decontaminate: paraphrased or lightly-edited eval leakage that
    shares no 13-gram still lands at high cosine. The split is THE shared
    hash rule (llm_pipeline.split_expr), so the protected set here is
    exactly the set the token-level decontaminator protects. Output is the
    per-label governance card: train count, flagged count + id checksum,
    eval-hit volume, max observed cosine (null when the label is clean).

    Scale contract: the PROTECTED side ships once per task (production
    eval suites are small and fixed — ~1e5 rows — while train is the
    100 TB side), and scoring is exact brute-force cosine per train Arrow
    batch as ONE numpy matmul (llm/similarity.broadcast_cosine_hits —
    the near_dup_pairs_matmul kernel swap; zero shuffle of the train
    side); the per-label card then aggregates a frame already reduced to
    one row per flagged train doc. The eval-suite premise is ENFORCED,
    not assumed (optimization r15): the collect is probed with
    take(DECON_PROTECTED_MAX+1), and a protected split over the bound
    takes the exact distributed fold (_decon_hits_exact) instead — same
    results, no driver collect. A deployment wanting detect->verify
    economics at that size would put the SRP bucket index
    (embed_srp_near_dup) in front of the exact verify."""
    from gmall_flink_spark.queries.llm_pipeline import split_expr

    b = prep(table(spark, sf_dir, "embeddings")).withColumn(
        "split", split_expr(F.col("vec_id"))
    )
    train = b.where(F.col("split") == "train")
    # the protected matrix rides the task closure so each train Arrow
    # batch scores as ONE numpy matmul (broadcast_cosine_hits) — but the
    # collect is PROBED first (take(bound+1), optimization r15): a
    # protected split that outgrows the eval-suite premise routes through
    # the exact distributed fold instead of an unbounded driver collect.
    # Results are identical on both paths (same 6-decimal cosine;
    # equivalence pinned by test_decon_exact_fallback_equals_fast).
    prot = b.where(F.col("split") != "train").select("vec")
    head = prot.take(DECON_PROTECTED_MAX + 1)
    if len(head) <= DECON_PROTECTED_MAX:
        per_doc = broadcast_cosine_hits(train, [r["vec"] for r in head], DECON_COS)
    else:
        per_doc = _decon_hits_exact(train, prot)
    # two independent label-level aggregates joined on the tiny label key —
    # NOT a per-train-row join-back of per_doc, which would shuffle the
    # full (100 TB) train side by vec_id just to re-count it. per_doc
    # shuffles only FLAGGED docs; the train count is a map-side partial
    # agg; the label join is 10 rows.
    flagged_card = per_doc.groupBy("label").agg(
        F.count(F.lit(1)).alias("contaminated_ct"),
        F.sum("vec_id").alias("contaminated_id_sum"),
        F.sum("hit_ct").alias("eval_hit_ct"),
        F.max("max_cos").alias("max_cos"),
    )
    return (
        train.groupBy("label")
        .agg(F.count(F.lit(1)).alias("train_ct"))
        .join(F.broadcast(flagged_card), "label", "left")
        .select(
            "label",
            "train_ct",
            F.coalesce("contaminated_ct", F.lit(0)).alias("contaminated_ct"),
            F.coalesce("contaminated_id_sum", F.lit(0)).alias("contaminated_id_sum"),
            F.coalesce("eval_hit_ct", F.lit(0)).alias("eval_hit_ct"),
            "max_cos",
        )
        .orderBy("label")
    )


NPROBE = 3


def sim_ivf_topk_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: top-5 per query searching the union of the
    query's 3 nearest clusters (the recall lever over single-probe
    sim_ivf_topk; recall@5 vs brute force is pinned by
    tests/test_operators.py::test_ivf_multiprobe_recall)."""
    from gmall_flink_spark.llm.similarity import ivf_topk_multiprobe

    emb = prep(table(spark, sf_dir, "embeddings"))
    cents = emb.where(F.col("vec_id") < N_CENTROIDS)
    # session-memoized assignment (optimization r15) — see sim_ivf_topk
    assigned = _ivf_assigned(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ivf_topk_multiprobe(assigned, queries, cents, nprobe=NPROBE, k=5).orderBy(
        "q_id", "rk"
    )


def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index *training*: one Lloyd iteration refining the seed centroids,
    then the re-assignment histogram. The centroid update is the
    quantized-sum mean (llm/similarity.py::kmeans_refine), which makes the
    whole iteration independent of partition/accumulation order — the
    property that lets an *iterative FP algorithm* be oracle-checked at
    all, and at 100 TB makes index training bit-reproducible across
    cluster layouts."""
    emb = prep(table(spark, sf_dir, "embeddings"))
    seeds = emb.where(F.col("vec_id") < N_CENTROIDS)
    refined = kmeans_refine(emb, seeds, iterations=1)
    assigned = ivf_assign(emb, refined.select(F.col("cluster").alias("vec_id"), "vec"))
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("member_ct"))
        .orderBy("cluster")
    )


#: kNN label-vote parameters: neighbor count and the deterministic query
#: slice (every 20th vector) that keeps the audit a sample, not n².
KNN_K = 5
KNN_QUERY_MOD = 20


def sim_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classifier audit — the standard embedding-quality check a
    training pipeline runs on a labeled slice: each sampled query vector is
    classified by majority label of its top-KNN_K exact cosine neighbors
    (ties broken to the smallest label), and accuracy is reported per true
    label. Measures whether the embedding space separates the labels —
    a low-accuracy label flags embedding or labeling problems before the
    corpus ships.

    Scale: the query slice broadcasts against the vector table (the
    brute-force scoring path); the vote and accuracy aggregates are tiny.
    At production scale the scoring side swaps for the IVF probe — the
    audit shape is unchanged."""
    from pyspark.sql import Window

    emb = prep(table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(KNN_QUERY_MOD)) == 0)
    topk = brute_force_topk(emb, queries, k=KNN_K)
    labeled = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")),
        "neighbor_id",
    )
    votes = labeled.groupBy("q_id", "n_label").agg(
        F.count(F.lit(1)).alias("vote_ct")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("vote_ct"), "n_label")
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("q_id", F.col("n_label").alias("pred_label"))
    )
    return (
        pred.join(
            queries.select(F.col("vec_id").alias("q_id"), F.col("label").alias("true_label")),
            "q_id",
        )
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("q_ct"),
            F.sum((F.col("pred_label") == F.col("true_label")).cast("bigint")).alias(
                "correct_ct"
            ),
        )
        .orderBy("true_label")
    )


#: filtered-search parameters: the query slice (every 20th vector, the
#: same audit-sample convention as kNN) and the per-tenant k
FILTERED_K = 3


def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search — the multi-tenant serving shape
    (every production vector store's "search within my namespace"): each
    sampled query retrieves top-FILTERED_K cosine neighbours among vectors
    sharing its ``label`` (the tenant/namespace key), never seeing other
    shards' vectors.

    Scale: the label equality is part of the JOIN key, so the filter is
    applied by partition routing, not post-scoring — at production scale
    label is the index's physical partition (per-tenant IVF lists) and a
    query touches only its shard; the query slice broadcasts. Exact within
    the shard, so fully oracle-checkable. One scoring/tie-break contract
    with the unfiltered search (brute_force_topk(match_on=...))."""
    emb = prep(table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(KNN_QUERY_MOD)) == 0)
    return (
        brute_force_topk(emb, queries, k=FILTERED_K, match_on="label")
        .select(
            "q_id", F.col("label").alias("tenant"), "neighbor_id", "rk", "cos"
        )
        .orderBy("q_id", "rk")
    )


#: SemDeDup cosine threshold — shares embed_near_dup's verify threshold so
#: the two views describe the same pair graph
SEMDEDUP_COS = 0.3


def embed_semdedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup DECISIONS (cluster-then-prune over
    embeddings, after Abbas et al. 2023, arXiv:2303.09540): within each
    IVF cluster, a vector is DROPPED when a smaller-id vector in the same
    cluster sits at cosine >= SEMDEDUP_COS (keep-lowest-id rule — the
    deterministic form of SemDeDup's keep-one-per-dup-set). Reports the
    per-cluster dedup ledger: members, drops, kept count, and the dropped
    id checksum — the decision table a corpus build joins against to
    filter, where embed_near_dup only reports the raw pair evidence.

    Scale: consumes the SAME cluster-blocked pair scan as embed_near_dup
    (session-memoized `_neardup_pairs` — within-block all-pairs, cluster
    count grows with the corpus), one distinct over the pair's larger
    side, one per-cluster aggregate. Nothing rescans the vectors after
    blocking."""
    assigned = _ivf_assigned(spark, sf_dir)
    pairs = _neardup_pairs(spark, sf_dir)
    drops = pairs.select(F.col("block").alias("cluster"), F.col("b_id").alias("vec_id")).distinct()
    members = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("member_ct"))
    per_cluster = (
        drops.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("drop_ct"),
            F.sum("vec_id").alias("drop_id_sum"),
        )
    )
    return (
        members.join(per_cluster, "cluster", "left")
        .select(
            "cluster",
            "member_ct",
            F.coalesce("drop_ct", F.lit(0)).alias("drop_ct"),
            (F.col("member_ct") - F.coalesce("drop_ct", F.lit(0))).alias("keep_ct"),
            F.coalesce("drop_id_sum", F.lit(0)).alias("drop_id_sum"),
        )
        .orderBy("cluster")
    )


HN_K = 5


def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training data: per
    sampled anchor (vec_id % KNN_QUERY_MOD == 0), the top-HN_K
    highest-cosine DIFFERENT-label vectors plus the triplet margin against
    the anchor's nearest same-label positive (margin <= 0 rows are the
    anchor's actively-confusing negatives). The mining pass that builds
    training pairs for embedding models — the inverse consumer of
    sim_knn_label_vote's evaluation view.

    Scale: anchors broadcast, candidates stream (one scan scores positive
    and negative branches); at corpus scale the candidate side becomes the
    IVF-probed cluster union under the same scoring contract (see
    llm/similarity.py::hard_negatives)."""
    from gmall_flink_spark.llm.similarity import hard_negatives

    emb = prep(table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(KNN_QUERY_MOD)) == 0)
    return hard_negatives(emb, queries, k=HN_K).orderBy("q_id", "rk")


def sim_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining, IVF-probed (the 100 TB form of
    sim_hard_negatives): positives and negatives come from the anchor's
    NPROBE nearest clusters instead of a full scan — the partition-pruned
    plan a billion-vector corpus runs, oracle-checked against the same
    triplet contract restricted to the probed set. Anchors whose probed
    union misses their label produce no rows (the recall cost of probing;
    compare row counts with sim_hard_negatives to read it)."""
    from gmall_flink_spark.llm.similarity import hard_negatives_probed

    emb = prep(table(spark, sf_dir, "embeddings"))
    cents = emb.where(F.col("vec_id") < N_CENTROIDS)
    # session-memoized assignment (optimization r15) — see sim_ivf_topk
    assigned_l = _ivf_assigned(spark, sf_dir).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    queries = emb.where(F.pmod(F.col("vec_id"), F.lit(KNN_QUERY_MOD)) == 0)
    return hard_negatives_probed(assigned_l, queries, cents, nprobe=NPROBE, k=HN_K).orderBy(
        "q_id", "rk"
    )


#: per-cluster quota for the cluster-balanced sample
CB_SAMPLE_K = 20


def sim_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced (diversity-flattening) sampling — the topic-balance
    stage run after clustering a corpus's embeddings (the sampling move in
    SemDeDup-style pipelines and cluster-stratified data selection): every
    IVF cluster contributes at most CB_SAMPLE_K members, chosen as the
    bottom-K by deterministic hash (reproducible without RNG state), so
    dominant topics are downsampled and rare topics survive whole. The
    ledger reports per cluster the population, the quota taken, a sampled
    id checksum (membership-verified), and the sampled label spread.

    Scale: rides the session-memoized assignment; the quota cut is one
    rank window partitioned by cluster — cluster count grows with the
    corpus, so partitions stay bounded; no global sort. The label join
    is an ordinary equi-join on vec_id (labels is corpus-sized — a
    broadcast hint here would hit the broadcast limit at scale; AQE may
    still choose broadcast when the scan is actually small)."""
    from gmall_flink_spark.functions.text import md5_long

    assigned = _ivf_assigned(spark, sf_dir)
    labels = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    keyed = assigned.select(
        "cluster", "vec_id", md5_long(F.col("vec_id").cast("string")).alias("h")
    ).join(labels, "vec_id")
    w = Window.partitionBy("cluster").orderBy("h", "vec_id")
    ranked = keyed.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("member_ct"),
            F.sum((F.col("rn") <= CB_SAMPLE_K).cast("bigint")).alias("sampled_ct"),
            F.sum(
                F.when(F.col("rn") <= CB_SAMPLE_K, F.col("vec_id")).otherwise(0)
            ).alias("sampled_id_sum"),
            F.countDistinct(
                F.when(F.col("rn") <= CB_SAMPLE_K, F.col("label"))
            ).alias("sampled_label_ct"),
        )
        .orderBy("cluster")
    )


def sim_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality audit — recall@5 of the multi-probe IVF search
    vs exact brute force, per query, as integers (the registry-visible
    form of the recall the test suite pins): for each query's true top-5
    neighbours, how many does the NPROBE-cluster probe recover? The
    number an operator reads before trusting the partition-pruned path
    at corpus scale, and the lever check for raising nprobe. Same
    detect→verify shape as lsh_recall_audit / simhash_recall_audit,
    pointed at the vector index.

    Scale: truth is brute force over the SAMPLED query set only (queries
    broadcast, one scan — the standard sampled-ground-truth recall
    methodology); the probed side is the production partition-pruned
    plan."""
    from gmall_flink_spark.llm.similarity import ivf_topk_multiprobe

    emb = prep(table(spark, sf_dir, "embeddings"))
    cents = emb.where(F.col("vec_id") < N_CENTROIDS)
    # session-memoized assignment (optimization r15) — see sim_ivf_topk
    assigned = _ivf_assigned(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    probed = ivf_topk_multiprobe(assigned, queries, cents, nprobe=NPROBE, k=5).select(
        "q_id", "neighbor_id", F.lit(1).alias("hit")
    )
    truth = brute_force_topk(emb, queries, k=5).select("q_id", "neighbor_id")
    flagged = truth.join(probed, ["q_id", "neighbor_id"], "left")
    return (
        flagged.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("true_ct"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("hit_ct"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias("miss_ct"),
            F.sum("neighbor_id").alias("neighbor_id_sum"),
        )
        .orderBy("q_id")
    )


QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_hard_negatives": sim_hard_negatives,
    "sim_hard_negatives_ivf": sim_hard_negatives_ivf,
    "sim_ivf_recall_audit": sim_ivf_recall_audit,
    "sim_cluster_balanced_sample": sim_cluster_balanced_sample,
    "sim_filtered_topk": sim_filtered_topk,
    "embed_semdedup_drops": embed_semdedup_drops,
    "embed_near_dup": embed_near_dup,
    "embed_decontaminate": embed_decontaminate,
    "sim_ivf_clusters": sim_ivf_clusters,
    "sim_kmeans_clusters": sim_kmeans_clusters,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_ivf_topk_probes": sim_ivf_topk_probes,
    "sim_knn_label_vote": sim_knn_label_vote,
}

_NORMED = """
    SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
"""

_ASSIGNED = f"""
    SELECT vec_id, v, norm, c_id AS cluster FROM (
        SELECT n.vec_id, n.v, n.norm, c.vec_id AS c_id,
               row_number() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY round(list_dot_product(n.v, c.v) / (n.norm * c.norm), 6) DESC,
                            c.vec_id
               ) AS rk
        FROM ({_NORMED}) n
        CROSS JOIN (SELECT * FROM ({_NORMED}) WHERE vec_id < {N_CENTROIDS}) c
    ) WHERE rk = 1
"""

_NORMED_L = """
    SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS norm
    FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
"""

ORACLE = {
    "sim_hard_negatives": f"""
        WITH n AS ({_NORMED_L}),
        q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec, norm AS q_norm
              FROM n WHERE vec_id % {KNN_QUERY_MOD} = 0),
        scored AS (
            SELECT q_id, q_label, n.vec_id AS n_id, n.label AS n_label,
                   round(list_dot_product(q_vec, n.v) / (q_norm * n.norm), 6) AS cos
            FROM q JOIN n ON n.vec_id != q.q_id
        ),
        pos AS (
            SELECT q_id, cos AS pos_cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
            FROM scored WHERE n_label = q_label
            QUALIFY rk = 1
        ),
        negs AS (
            SELECT q_id, q_label, n_id AS neighbor_id, n_label AS neighbor_label, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
            FROM scored WHERE n_label != q_label
            QUALIFY rk <= {HN_K}
        )
        SELECT negs.q_id, q_label, neighbor_id, neighbor_label, negs.rk AS rk,
               cos, round(pos_cos - cos, 6) AS margin
        FROM negs JOIN pos ON negs.q_id = pos.q_id
        ORDER BY negs.q_id, negs.rk
    """,
    "sim_cluster_balanced_sample": f"""
        WITH a AS ({_ASSIGNED}),
        keyed AS (
            SELECT a.cluster, a.vec_id, e.label,
                   ('0x' || substr(md5('0|' || a.vec_id::VARCHAR), 1, 15))::BIGINT
                       AS h
            FROM a JOIN embeddings e USING (vec_id)
        ),
        ranked AS (
            SELECT cluster, vec_id, label,
                   row_number() OVER (PARTITION BY cluster ORDER BY h, vec_id)
                       AS rn
            FROM keyed
        )
        SELECT cluster,
               CAST(COUNT(*) AS BIGINT) AS member_ct,
               CAST(SUM(CASE WHEN rn <= {CB_SAMPLE_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS sampled_ct,
               CAST(SUM(CASE WHEN rn <= {CB_SAMPLE_K} THEN vec_id ELSE 0 END)
                    AS BIGINT) AS sampled_id_sum,
               CAST(COUNT(DISTINCT CASE WHEN rn <= {CB_SAMPLE_K} THEN label END)
                    AS BIGINT) AS sampled_label_ct
        FROM ranked GROUP BY cluster ORDER BY cluster
    """,
    "sim_ivf_recall_audit": f"""
        WITH a AS ({_ASSIGNED}),
        q AS (SELECT vec_id AS q_id, v AS q_vec, norm AS q_norm
              FROM ({_NORMED}) WHERE vec_id < {N_QUERIES}),
        probes AS (
            SELECT q_id, q_vec, q_norm, c_id AS probe_cluster FROM (
                SELECT q.q_id, q.q_vec, q.q_norm, c.vec_id AS c_id,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_dot_product(q.q_vec, c.v)
                                          / (q.q_norm * c.norm), 6) DESC,
                                    c.vec_id
                       ) AS rk
                FROM q CROSS JOIN (SELECT * FROM ({_NORMED})
                                   WHERE vec_id < {N_CENTROIDS}) c
            ) WHERE rk <= {NPROBE}
        ),
        probed AS (
            SELECT q_id, neighbor_id, 1 AS hit FROM (
                SELECT q_id, a.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q_id
                           ORDER BY round(list_dot_product(q_vec, a.v)
                                          / (q_norm * a.norm), 6) DESC, a.vec_id
                       ) AS rk
                FROM probes JOIN a ON a.cluster = probes.probe_cluster
                                 AND a.vec_id != probes.q_id
            ) WHERE rk <= 5
        ),
        truth AS (
            SELECT q_id, neighbor_id FROM (
                SELECT q_id, n.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q_id
                           ORDER BY round(list_dot_product(q_vec, n.v)
                                          / (q_norm * n.norm), 6) DESC, n.vec_id
                       ) AS rk
                FROM q JOIN ({_NORMED}) n ON n.vec_id != q.q_id
            ) WHERE rk <= 5
        )
        SELECT t.q_id,
               CAST(COUNT(*) AS BIGINT) AS true_ct,
               CAST(SUM(COALESCE(p.hit, 0)) AS BIGINT) AS hit_ct,
               CAST(SUM(CASE WHEN p.hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS miss_ct,
               CAST(SUM(t.neighbor_id) AS BIGINT) AS neighbor_id_sum
        FROM truth t LEFT JOIN probed p
          ON t.q_id = p.q_id AND t.neighbor_id = p.neighbor_id
        GROUP BY t.q_id ORDER BY t.q_id
    """,
    "sim_hard_negatives_ivf": f"""
        WITH a AS ({_ASSIGNED}),
        al AS (SELECT a.vec_id, a.v, a.norm, a.cluster, e.label
               FROM a JOIN embeddings e USING (vec_id)),
        q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec, norm AS q_norm
              FROM ({_NORMED_L}) WHERE vec_id % {KNN_QUERY_MOD} = 0),
        probes AS (
            SELECT q_id, q_label, q_vec, q_norm, c_id AS probe_cluster FROM (
                SELECT q.q_id, q.q_label, q.q_vec, q.q_norm, c.vec_id AS c_id,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_dot_product(q.q_vec, c.v)
                                          / (q.q_norm * c.norm), 6) DESC,
                                    c.vec_id
                       ) AS rk
                FROM q CROSS JOIN (SELECT * FROM ({_NORMED})
                                   WHERE vec_id < {N_CENTROIDS}) c
            ) WHERE rk <= {NPROBE}
        ),
        scored AS (
            SELECT q_id, q_label, al.vec_id AS n_id, al.label AS n_label,
                   round(list_dot_product(q_vec, al.v) / (q_norm * al.norm), 6) AS cos
            FROM probes JOIN al ON al.cluster = probes.probe_cluster
                              AND al.vec_id != probes.q_id
        ),
        pos AS (
            SELECT q_id, cos AS pos_cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
            FROM scored WHERE n_label = q_label
            QUALIFY rk = 1
        ),
        negs AS (
            SELECT q_id, q_label, n_id AS neighbor_id, n_label AS neighbor_label, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
            FROM scored WHERE n_label != q_label
            QUALIFY rk <= {HN_K}
        )
        SELECT negs.q_id, q_label, neighbor_id, neighbor_label, negs.rk AS rk,
               cos, round(pos_cos - cos, 6) AS margin
        FROM negs JOIN pos ON negs.q_id = pos.q_id
        ORDER BY negs.q_id, negs.rk
    """,
    "sim_filtered_topk": f"""
        WITH n AS ({_NORMED_L}),
        q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec, norm AS q_norm
              FROM n WHERE vec_id % {KNN_QUERY_MOD} = 0),
        scored AS (
            SELECT q_id, q_label AS tenant, n.vec_id AS neighbor_id,
                   round(list_dot_product(q_vec, n.v) / (q_norm * n.norm), 6) AS cos
            FROM q JOIN n ON n.label = q.q_label AND n.vec_id != q.q_id
        )
        SELECT q_id, tenant, neighbor_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk,
               cos
        FROM scored
        QUALIFY rk <= {FILTERED_K}
        ORDER BY q_id, rk
    """,
    "embed_semdedup_drops": f"""
        WITH n AS ({_ASSIGNED}),
        drops AS (
            SELECT DISTINCT a.cluster, b.vec_id AS b_id
            FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6)
                  >= {SEMDEDUP_COS}
        ),
        members AS (SELECT cluster, COUNT(*) AS member_ct FROM n GROUP BY cluster),
        d AS (SELECT cluster, COUNT(*) AS drop_ct, SUM(b_id) AS drop_id_sum
              FROM drops GROUP BY cluster)
        SELECT m.cluster,
               CAST(m.member_ct AS BIGINT) AS member_ct,
               CAST(COALESCE(d.drop_ct, 0) AS BIGINT) AS drop_ct,
               CAST(m.member_ct - COALESCE(d.drop_ct, 0) AS BIGINT) AS keep_ct,
               CAST(COALESCE(d.drop_id_sum, 0) AS BIGINT) AS drop_id_sum
        FROM members m LEFT JOIN d ON m.cluster = d.cluster
        ORDER BY m.cluster
    """,
    "embed_near_dup": f"""
        WITH n AS ({_ASSIGNED})
        SELECT a.cluster AS block, a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cos
        FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.3
        ORDER BY block, a_id, b_id
    """,
    "sim_cosine_topk": f"""
        WITH n AS ({_NORMED}),
        q AS (SELECT vec_id AS q_id, v AS q_vec, norm AS q_norm FROM n
              WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q_id, n.vec_id AS neighbor_id,
                   round(list_dot_product(q_vec, n.v) / (q_norm * n.norm), 6) AS cos
            FROM q JOIN n ON n.vec_id != q.q_id
        )
        SELECT q_id, neighbor_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk,
               cos
        FROM scored
        QUALIFY rk <= 10
        ORDER BY q_id, rk
    """,
    "sim_ivf_clusters": f"""
        SELECT cluster, COUNT(*) AS member_ct
        FROM ({_ASSIGNED}) GROUP BY cluster ORDER BY cluster
    """,
    # one quantized-mean Lloyd iteration (mirror of kmeans_refine Q=1e6),
    # then the re-assignment histogram
    "sim_kmeans_clusters": f"""
        WITH n AS ({_NORMED}),
        a0 AS ({_ASSIGNED}),
        dims AS (
            SELECT cluster, i AS pos,
                   CAST(round(v[i + 1] * 1000000) AS BIGINT) AS xq
            FROM a0, (SELECT unnest(range(64)) AS i) idx
            WHERE i < len(v)
        ),
        refined AS (
            SELECT cluster, list(m ORDER BY pos) AS v
            FROM (SELECT cluster, pos,
                         floor(CAST(SUM(xq) AS BIGINT) * 1.0 / COUNT(*))
                             / 1000000.0 AS m
                  FROM dims GROUP BY 1, 2)
            GROUP BY cluster
        ),
        rc AS (SELECT cluster AS c_id, v,
                      sqrt(list_dot_product(v, v)) AS norm
               FROM refined),
        a1 AS (
            SELECT vec_id, c_id AS cluster FROM (
                SELECT n.vec_id, rc.c_id,
                       row_number() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY round(list_dot_product(n.v, rc.v)
                                          / (n.norm * rc.norm), 6) DESC,
                                    rc.c_id
                       ) AS rk
                FROM n CROSS JOIN rc
            ) WHERE rk = 1
        )
        SELECT cluster, COUNT(*) AS member_ct
        FROM a1 GROUP BY cluster ORDER BY cluster
    """,
    "sim_ivf_topk_probes": f"""
        WITH a AS ({_ASSIGNED}),
        q AS (SELECT vec_id AS q_id, v AS q_vec, norm AS q_norm
              FROM ({_NORMED}) WHERE vec_id < {N_QUERIES}),
        probes AS (
            SELECT q_id, q_vec, q_norm, c_id AS probe_cluster FROM (
                SELECT q.q_id, q.q_vec, q.q_norm, c.vec_id AS c_id,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY round(list_dot_product(q.q_vec, c.v)
                                          / (q.q_norm * c.norm), 6) DESC,
                                    c.vec_id
                       ) AS rk
                FROM q CROSS JOIN (SELECT * FROM ({_NORMED})
                                   WHERE vec_id < {N_CENTROIDS}) c
            ) WHERE rk <= {NPROBE}
        ),
        scored AS (
            SELECT q_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(q_vec, a.v) / (q_norm * a.norm), 6) AS cos
            FROM probes JOIN a ON a.cluster = probes.probe_cluster
                             AND a.vec_id != probes.q_id
        )
        SELECT q_id, neighbor_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk,
               cos
        FROM scored
        QUALIFY rk <= 5
        ORDER BY q_id, rk
    """,
    "sim_ivf_topk": f"""
        WITH a AS ({_ASSIGNED}),
        q AS (SELECT vec_id AS q_id, v AS q_vec, norm AS q_norm, vec_id AS q_cluster
              FROM ({_NORMED}) WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(q_vec, a.v) / (q_norm * a.norm), 6) AS cos
            FROM q JOIN a ON a.cluster = q.q_cluster AND a.vec_id != q.q_id
        )
        SELECT q_id, neighbor_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk,
               cos
        FROM scored
        QUALIFY rk <= 5
        ORDER BY q_id, rk
    """,
}


# ---------------------------------------------------------------- SRP-LSH

SRP_PLANES = 96
#: the band width the STATIC DuckDB oracles are generated with. The Spark
#: queries self-size via srp_auto_band_bits(corpus count) — at both gate SFs
#: (500 vectors at sf0.01, 2000 at sf0.1) the formula lands exactly here, so
#: the twins agree; test_srp_auto_bits_match_oracle_pin guards the identity
#: against a testdata regen (if embeddings ever exceeds 2048 rows at the
#: correctness SF, bump this constant so the oracles follow the formula).
SRP_BAND_BITS = 12
SRP_DIM = 64
SRP_THRESHOLD = 0.3


def _srp_bits(emb: DataFrame) -> int:
    from gmall_flink_spark.llm.similarity import srp_auto_band_bits

    return srp_auto_band_bits(emb.count(), SRP_PLANES)


def embed_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH stage 1: bucket histogram over (band, packed sign bits).
    The bucket key is the blocking/partition key of the centroid-free
    near-dup scale path (complement of the IVF cluster id). Uses the
    matmul signature kernel; bucket equality with the portable fold the
    oracle mirrors is pinned by test_srp_fast_matches_portable."""
    from gmall_flink_spark.llm.similarity import srp_signature_fast

    emb = prep(table(spark, sf_dir, "embeddings"))
    sig = srp_signature_fast(emb, SRP_PLANES, _srp_bits(emb), SRP_DIM)
    return (
        sig.groupBy("band", "bval")
        .agg(F.count(F.lit(1)).alias("member_ct"))
        .orderBy("band", "bval")
    )


def embed_srp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH stage 2: banded candidate pairs verified at exact
    cos >= 0.3 — embedding near-dup without trained centroids."""
    from gmall_flink_spark.llm.similarity import srp_near_dup

    emb = prep(table(spark, sf_dir, "embeddings"))
    return srp_near_dup(
        emb, SRP_THRESHOLD, SRP_PLANES, _srp_bits(emb), SRP_DIM
    ).orderBy("a_id", "b_id")


QUERIES["embed_srp_buckets"] = embed_srp_buckets
QUERIES["embed_srp_near_dup"] = embed_srp_near_dup


def _srp_oracle_sig() -> str:
    """DuckDB twin of llm.similarity.srp_signature: same md5-derived
    hyperplanes; each projection is list_dot_product against the same
    literal ±1 array (bit-identical left fold to the Spark _dot)."""
    from gmall_flink_spark.llm.similarity import srp_planes

    planes = srp_planes(SRP_PLANES, SRP_DIM)
    bits = ",\n               ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(f"{float(w)}" for w in pl)
        + "]) > 0 THEN 1 ELSE 0 END AS bit" + str(p)
        for p, pl in enumerate(planes)
    )
    n_bands = SRP_PLANES // SRP_BAND_BITS
    band_val = " ".join(
        "WHEN {b} THEN {expr}".format(
            b=b,
            expr=" + ".join(
                f"bit{b * SRP_BAND_BITS + i} * {2 ** (SRP_BAND_BITS - 1 - i)}"
                for i in range(SRP_BAND_BITS)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
        SELECT vec_id, v, norm, band, CASE band {band_val} END AS bval
        FROM (SELECT vec_id, v, norm, {bits} FROM ({_NORMED})),
             (SELECT unnest(range({n_bands})) AS band)
    """


ORACLE["sim_knn_label_vote"] = f"""
    WITH n AS ({_NORMED}),
    lab AS (SELECT vec_id, label FROM embeddings),
    q AS (SELECT n.vec_id AS q_id, n.v AS q_vec, n.norm AS q_norm, lab.label AS true_label
          FROM n JOIN lab ON n.vec_id = lab.vec_id
          WHERE n.vec_id % {KNN_QUERY_MOD} = 0),
    scored AS (
        SELECT q_id, n.vec_id AS neighbor_id, true_label,
               round(list_dot_product(q_vec, n.v) / (q_norm * n.norm), 6) AS cos
        FROM q JOIN n ON n.vec_id != q.q_id
    ),
    topk AS (
        SELECT q_id, neighbor_id, true_label,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored QUALIFY rk <= {KNN_K}
    ),
    votes AS (
        SELECT t.q_id, t.true_label, lab.label AS n_label, COUNT(*) AS vote_ct
        FROM topk t JOIN lab ON t.neighbor_id = lab.vec_id
        GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT q_id, true_label, n_label AS pred_label,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY vote_ct DESC, n_label) AS rk
        FROM votes QUALIFY rk = 1
    )
    SELECT true_label, COUNT(*) AS q_ct,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS correct_ct
    FROM pred GROUP BY true_label ORDER BY true_label
"""

ORACLE["embed_srp_buckets"] = f"""
    SELECT band, bval, COUNT(*) AS member_ct
    FROM ({_srp_oracle_sig()})
    GROUP BY band, bval ORDER BY band, bval
"""

ORACLE["embed_srp_near_dup"] = f"""
    WITH sig AS ({_srp_oracle_sig()}),
    cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    ),
    n AS ({_NORMED})
    SELECT a_id, b_id,
           round(list_dot_product(na.v, nb.v) / (na.norm * nb.norm), 6) AS cos
    FROM cand JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id
    WHERE round(list_dot_product(na.v, nb.v) / (na.norm * nb.norm), 6)
          >= {SRP_THRESHOLD}
    ORDER BY a_id, b_id
"""


# ------------------------------------------------------------------ PQ/ADC

#: product-quantization geometry: 8 subspaces x 8 dims, 16 codes each ->
#: a 64-dim float vector (256 bytes) serves from 8 codes (m*log2(ksub) =
#: 32 bits, 64x smaller). One Lloyd iteration refines the deterministic
#: seed codebooks. Geometry note: this synthetic table is near-uniform on
#: the sphere — PQ's worst case — and 8x8 measured ~2.5x the shortlist
#: recall of 4x16 here (0.88 vs 0.68 @ shortlist 50); real embedding
#: corpora cluster and fare far better at the same bit budget.
PQ_M = 8
PQ_DSUB = 8
PQ_KSUB = 16
PQ_TOPK = 5
#: ADC shortlist width for the rerank pipeline (sim_pq_rerank)
PQ_SHORTLIST = 50

_PQ_BOOKS_MEMO: dict[tuple, DataFrame] = {}


def _pq_books(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained PQ codebooks, eagerly pinned and session-memoized: the
    (sub, code, cvec) table is m*ksub rows, but its lineage is the whole
    training iteration — encode and LUT would each re-train without the
    checkpoint, and the three PQ queries share one build per (session,
    sf_dir, content stamp). At production scale this is the persisted
    codebook table an index build writes once."""
    from gmall_flink_spark.llm.similarity import pq_train
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "embeddings", _PQ_BOOKS_MEMO)
    if key not in _PQ_BOOKS_MEMO:
        emb = prep(table(spark, sf_dir, "embeddings"))
        _PQ_BOOKS_MEMO[key] = pq_train(
            emb, PQ_M, PQ_DSUB, PQ_KSUB, iterations=1
        ).localCheckpoint(eager=True)
    return _PQ_BOOKS_MEMO[key]


def sim_pq_code_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index *layout* audit: code-usage histogram per subspace after
    training + encoding. Skewed code usage means wasted codebook capacity
    (the PQ analogue of IVF's cluster-balance check); at scale this is the
    dashboard query a serving team runs after each index build."""
    from gmall_flink_spark.llm.similarity import pq_encode

    emb = prep(table(spark, sf_dir, "embeddings"))
    codes = pq_encode(emb, _pq_books(spark, sf_dir), PQ_M, PQ_DSUB)
    return (
        codes.groupBy("sub", "code")
        .agg(F.count(F.lit(1)).alias("member_ct"))
        .orderBy("sub", "code")
    )


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: ADC top-5 per query (vec_id < 5) over the
    encoded table — the third leg of the index toolbox (IVF = partition
    pruning, SRP-LSH = centroid-free blocking, PQ = in-partition
    compression; IVF-PQ composes the first and third). The scan side
    touches only (vec_id, sub, code) rows and the per-candidate score is
    an exact integer sum of m quantized LUT partials, so ranking is
    engine- and partitioning-independent end to end — codebook training
    included (quantized-sum Lloyd update)."""
    from gmall_flink_spark.llm.similarity import pq_adc_topk

    emb = prep(table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return pq_adc_topk(
        emb, queries, _pq_books(spark, sf_dir), PQ_M, PQ_DSUB, k=PQ_TOPK
    ).orderBy("q_id", "rk")


def sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PQ serving pipeline: ADC shortlist (top-PQ_SHORTLIST
    by quantized score, raw vectors untouched) → exact inner-product
    re-rank of just the shortlist → top-5. Recall comes from the cheap
    wide shortlist, precision from exact scoring of PQ_SHORTLIST rows per
    query — the standard two-stage shape (recall@5 vs exact search pinned
    by test_pq_rerank_recall). At 100 TB the re-rank gather is a point
    lookup per (query, candidate), k·shortlist rows total."""
    from gmall_flink_spark.llm.similarity import _dot, pq_adc_topk

    emb = prep(table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    cand = pq_adc_topk(
        emb, queries, _pq_books(spark, sf_dir), PQ_M, PQ_DSUB, k=PQ_SHORTLIST
    ).select("q_id", "neighbor_id")
    q = queries.select(F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec"))
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("n_vec"))
    exact = (
        cand.join(n, "neighbor_id")
        .join(F.broadcast(q), "q_id")
        .withColumn("ip", F.round(_dot(F.col("q_vec"), F.col("n_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("ip"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PQ_TOPK)
        .select("q_id", "neighbor_id", "rk", "ip")
        .orderBy("q_id", "rk")
    )


QUERIES["sim_pq_code_hist"] = sim_pq_code_hist
QUERIES["sim_pq_topk"] = sim_pq_topk
QUERIES["sim_pq_rerank"] = sim_pq_rerank


#: (vec_id, sub, svec) subvector split — DuckDB twin of pq_subvectors
_PQ_SUBV = f"""
    SELECT vec_id, s AS sub,
           v[s * {PQ_DSUB} + 1 : s * {PQ_DSUB} + {PQ_DSUB}] AS svec
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         (SELECT unnest(range({PQ_M})) AS s)
"""


def _pq_dist(a: str, b: str) -> str:
    """Squared L2 rounded to 6 dp — same fixed-order expression as _l2sq."""
    return (
        f"round(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}), 6)"
    )


def _pq_assign(subv: str, books: str) -> str:
    """Nearest code per (vec_id, sub): dist asc, code asc — the SQL twin of
    pq_assign's min(struct(dist, code))."""
    return f"""
        SELECT vec_id, sub, code, svec FROM (
            SELECT sv.vec_id, sv.sub, b.code, sv.svec,
                   row_number() OVER (
                       PARTITION BY sv.vec_id, sv.sub
                       ORDER BY {_pq_dist('sv.svec', 'b.cvec')}, b.code
                   ) AS rk
            FROM ({subv}) sv JOIN ({books}) b ON sv.sub = b.sub
        ) WHERE rk = 1
    """


#: trained codebooks: seed from vec_id < ksub, one quantized-mean Lloyd
#: iteration (mirror of pq_train with KMEANS_Q = 1e6)
_PQ_BOOKS = f"""
    WITH subv AS ({_PQ_SUBV}),
    seed AS (SELECT sub, vec_id AS code, svec AS cvec FROM subv
             WHERE vec_id < {PQ_KSUB}),
    a0 AS ({_pq_assign('SELECT * FROM subv', 'SELECT * FROM seed')}),
    dims AS (
        SELECT sub, code, pos,
               CAST(round(svec[pos + 1] * 1000000) AS BIGINT) AS xq
        FROM a0, (SELECT unnest(range({PQ_DSUB})) AS pos)
    )
    SELECT sub, code, list(mv ORDER BY pos) AS cvec
    FROM (SELECT sub, code, pos,
                 floor(CAST(SUM(xq) AS BIGINT) * 1.0 / COUNT(*))
                     / 1000000.0 AS mv
          FROM dims GROUP BY 1, 2, 3)
    GROUP BY 1, 2
"""

ORACLE["sim_pq_code_hist"] = f"""
    WITH books AS ({_PQ_BOOKS}),
    enc AS ({_pq_assign(_PQ_SUBV, 'SELECT * FROM books')})
    SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS member_ct
    FROM enc GROUP BY sub, code ORDER BY sub, code
"""

ORACLE["sim_pq_topk"] = f"""
    WITH books AS ({_PQ_BOOKS}),
    enc AS ({_pq_assign(_PQ_SUBV, 'SELECT * FROM books')}),
    qsub AS (SELECT vec_id AS q_id, sub, svec FROM ({_PQ_SUBV})
             WHERE vec_id < {N_QUERIES}),
    lut AS (
        SELECT q.q_id, q.sub, b.code,
               CAST(round(list_dot_product(q.svec, b.cvec) * 1000000)
                    AS BIGINT) AS part_e6
        FROM qsub q JOIN books b ON q.sub = b.sub
    ),
    scored AS (
        SELECT l.q_id, e.vec_id, CAST(SUM(part_e6) AS BIGINT) AS adc_e6
        FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
                             AND e.vec_id != l.q_id
        GROUP BY 1, 2 HAVING COUNT(*) = {PQ_M}
    )
    SELECT q_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adc_e6 DESC, vec_id) AS rk,
           adc_e6
    FROM scored QUALIFY rk <= {PQ_TOPK}
    ORDER BY q_id, rk
"""

ORACLE["sim_pq_rerank"] = f"""
    WITH books AS ({_PQ_BOOKS}),
    enc AS ({_pq_assign(_PQ_SUBV, 'SELECT * FROM books')}),
    qsub AS (SELECT vec_id AS q_id, sub, svec FROM ({_PQ_SUBV})
             WHERE vec_id < {N_QUERIES}),
    lut AS (
        SELECT q.q_id, q.sub, b.code,
               CAST(round(list_dot_product(q.svec, b.cvec) * 1000000)
                    AS BIGINT) AS part_e6
        FROM qsub q JOIN books b ON q.sub = b.sub
    ),
    scored AS (
        SELECT l.q_id, e.vec_id, CAST(SUM(part_e6) AS BIGINT) AS adc_e6
        FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
                             AND e.vec_id != l.q_id
        GROUP BY 1, 2 HAVING COUNT(*) = {PQ_M}
    ),
    cand AS (
        SELECT q_id, vec_id AS neighbor_id FROM (
            SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adc_e6 DESC, vec_id) AS srk
            FROM scored
        ) WHERE srk <= {PQ_SHORTLIST}
    ),
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT q_id, neighbor_id,
           row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, neighbor_id) AS rk,
           ip
    FROM (
        SELECT c.q_id, c.neighbor_id,
               round(list_dot_product(qv.v, nv.v), 6) AS ip
        FROM cand c
        JOIN vecs qv ON qv.vec_id = c.q_id
        JOIN vecs nv ON nv.vec_id = c.neighbor_id
    )
    QUALIFY rk <= {PQ_TOPK}
    ORDER BY q_id, rk
"""


def sim_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor — the check a pipeline runs between corpus
    snapshots: split the table into two deterministic halves (even/odd
    vec_id standing in for old/new snapshot), compute each label's
    quantized-mean centroid per half (the shared order-independent
    quantized_mean, so both halves are bit-reproducible), and report per
    label the halves' sizes and the centroid shift (squared L2, rounded).
    A label whose centroid moves is drifting — retrain/re-embed before it
    poisons retrieval.

    A label present in only ONE half (vanished from, or new in, the
    latest snapshot) is the strongest signal of all, so the halves FULL
    OUTER join: such labels surface with the missing side's count at 0
    and a NULL drift instead of silently dropping out.

    Scale: one (label, half, pos) shuffle with map-side int64 partials —
    quantized_mean carries the member count, so no second scan — and a
    |labels|-sized self-join; no pairwise work anywhere."""
    from gmall_flink_spark.llm.similarity import _l2sq, quantized_mean

    emb = prep(table(spark, sf_dir, "embeddings")).withColumn(
        "half", (F.col("vec_id") % 2).cast("int")
    )
    dims = emb.select("label", "half", F.posexplode("vec").alias("pos", "x"))
    cents = quantized_mean(dims, ["label", "half"], out_col="cvec", count_col="n")
    a = cents.where(F.col("half") == 0).select(
        "label", F.col("cvec").alias("c0"), F.col("n").alias("n0")
    )
    b = cents.where(F.col("half") == 1).select(
        "label", F.col("cvec").alias("c1"), F.col("n").alias("n1")
    )
    return (
        a.join(b, "label", "full_outer")
        .select(
            "label",
            F.coalesce("n0", F.lit(0)).alias("n0"),
            F.coalesce("n1", F.lit(0)).alias("n1"),
            _l2sq(F.col("c0"), F.col("c1")).alias("drift_l2sq"),
        )
        .orderBy("label")
    )


QUERIES["sim_label_drift"] = sim_label_drift

ORACLE["sim_label_drift"] = f"""
    WITH v AS (
        SELECT vec_id, label, vec_id % 2 AS half, embedding::DOUBLE[] AS v
        FROM embeddings
    ),
    dims AS (
        SELECT label, half, pos,
               CAST(round(v[pos + 1] * 1000000) AS BIGINT) AS xq
        FROM v, (SELECT unnest(range(64)) AS pos)
    ),
    cents AS (
        SELECT label, half, list(mv ORDER BY pos) AS cvec
        FROM (SELECT label, half, pos,
                     floor(CAST(SUM(xq) AS BIGINT) * 1.0 / COUNT(*))
                         / 1000000.0 AS mv
              FROM dims GROUP BY 1, 2, 3)
        GROUP BY 1, 2
    ),
    counts AS (
        SELECT label, half, CAST(COUNT(*) AS BIGINT) AS ct
        FROM v GROUP BY 1, 2
    ),
    sides AS (
        SELECT c.label, c.half, c.cvec, k.ct
        FROM cents c JOIN counts k ON c.label = k.label AND c.half = k.half
    )
    SELECT COALESCE(a.label, b.label) AS label,
           CAST(COALESCE(a.ct, 0) AS BIGINT) AS n0,
           CAST(COALESCE(b.ct, 0) AS BIGINT) AS n1,
           round(list_dot_product(a.cvec, a.cvec)
                 - 2 * list_dot_product(a.cvec, b.cvec)
                 + list_dot_product(b.cvec, b.cvec), 6) AS drift_l2sq
    FROM (SELECT * FROM sides WHERE half = 0) a
    FULL JOIN (SELECT * FROM sides WHERE half = 1) b ON a.label = b.label
    ORDER BY label
"""


def sim_sq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization (int8) index-quality audit — recall@5 of
    integer-dot search over round(127·x/‖x‖) codes vs exact float cosine,
    per query (the missing member of the recall-audit family next to
    lsh / simhash / IVF: llm_embed_quantize checksums the CODES, this
    measures what the codes COST in ranking quality — the number an
    operator reads before switching the fleet to 8-bit vectors, a 4x
    memory/bandwidth cut). The quantized side is ALL-INTEGER arithmetic
    (products ≤ 127²·dim « 2⁵³), so its ranking is bit-identical across
    engines with no rounding guard; the float truth side reuses the
    shared brute-force contract.

    Scale: queries broadcast; both sides are one scan over the corpus
    (truth is sampled-ground-truth methodology, same as the IVF audit);
    the int8 codes are what a deployed store would hold, computed here
    map-side from the same scan."""
    emb = with_norm(prep(table(spark, sf_dir, "embeddings")))
    q127 = F.lit(127).cast("double")
    qz = emb.select(
        "vec_id",
        F.transform(
            F.col("vec"),
            lambda x: F.round(q127 * x / F.col("norm")).cast("bigint"),
        ).alias("qv"),
    )
    queries = qz.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("q_qv")
    )
    zero = F.lit(0).cast("bigint")
    qdot = F.aggregate(
        F.zip_with(F.col("q_qv"), F.col("qv"), lambda a, b: a * b),
        zero,
        lambda acc, x: acc + x,
    )
    scored = (
        qz.join(F.broadcast(queries), F.col("q_id") != F.col("vec_id"))
        .withColumn("qdot", qdot)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    quant = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), F.lit(1).alias("hit"))
    )
    truth = brute_force_topk(
        emb, emb.where(F.col("vec_id") < N_QUERIES), k=5
    ).select("q_id", "neighbor_id")
    flagged = truth.join(quant, ["q_id", "neighbor_id"], "left")
    return (
        flagged.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("true_ct"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("hit_ct"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias("miss_ct"),
            F.sum("neighbor_id").alias("neighbor_id_sum"),
        )
        .orderBy("q_id")
    )


QUERIES["sim_sq_recall_audit"] = sim_sq_recall_audit

ORACLE["sim_sq_recall_audit"] = f"""
    WITH n AS ({_NORMED}),
    qz AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(127.0 * x / norm) AS BIGINT))
                   AS qv
        FROM n
    ),
    qq AS (SELECT vec_id AS q_id, qv AS q_qv FROM qz
           WHERE vec_id < {N_QUERIES}),
    quant AS (
        SELECT q_id, neighbor_id, 1 AS hit FROM (
            SELECT qq.q_id, z.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY qq.q_id
                       ORDER BY list_dot_product(qq.q_qv, z.qv) DESC, z.vec_id
                   ) AS rk
            FROM qq JOIN qz z ON z.vec_id != qq.q_id
        ) WHERE rk <= 5
    ),
    q AS (SELECT vec_id AS q_id, v AS q_vec, norm AS q_norm
          FROM ({_NORMED}) WHERE vec_id < {N_QUERIES}),
    truth AS (
        SELECT q_id, neighbor_id FROM (
            SELECT q_id, nn.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q_id
                       ORDER BY round(list_dot_product(q_vec, nn.v)
                                      / (q_norm * nn.norm), 6) DESC, nn.vec_id
                   ) AS rk
            FROM q JOIN ({_NORMED}) nn ON nn.vec_id != q.q_id
        ) WHERE rk <= 5
    )
    SELECT t.q_id,
           CAST(COUNT(*) AS BIGINT) AS true_ct,
           CAST(SUM(COALESCE(p.hit, 0)) AS BIGINT) AS hit_ct,
           CAST(SUM(CASE WHEN p.hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS miss_ct,
           CAST(SUM(t.neighbor_id) AS BIGINT) AS neighbor_id_sum
    FROM truth t LEFT JOIN quant p
      ON t.q_id = p.q_id AND t.neighbor_id = p.neighbor_id
    GROUP BY t.q_id ORDER BY t.q_id
"""


# embed_decontaminate twin: split rule mirrors llm_split_assign's md5
# bucket (split_expr — THE one hash-split rule), threshold + round-6
# cosine mirror the engine's cosine(); max_cos stays NULL for clean labels
# on both sides.
from gmall_flink_spark.queries.llm_pipeline import SPLIT_TRAIN as _SPLIT_TRAIN

ORACLE["embed_decontaminate"] = f"""
    WITH n AS ({_NORMED_L}),
    b AS (
        SELECT *, ('0x' || substr(md5('0|' || vec_id::VARCHAR), 1, 15))::BIGINT
                  % 100 AS bucket
        FROM n
    ),
    train AS (SELECT vec_id, label, v, norm FROM b WHERE bucket < {_SPLIT_TRAIN}),
    ev AS (SELECT vec_id AS e_id, v AS e_vec, norm AS e_norm
           FROM b WHERE bucket >= {_SPLIT_TRAIN}),
    per_doc AS (
        SELECT t.vec_id, COUNT(*) AS hit_ct,
               MAX(round(list_dot_product(t.v, e.e_vec)
                         / (t.norm * e.e_norm), 6)) AS max_cos
        FROM train t JOIN ev e
          ON round(list_dot_product(t.v, e.e_vec)
                   / (t.norm * e.e_norm), 6) >= {DECON_COS}
        GROUP BY 1
    )
    SELECT t.label,
           CAST(COUNT(*) AS BIGINT) AS train_ct,
           CAST(COUNT(p.vec_id) AS BIGINT) AS contaminated_ct,
           CAST(COALESCE(SUM(CASE WHEN p.vec_id IS NOT NULL THEN t.vec_id END), 0)
                AS BIGINT) AS contaminated_id_sum,
           CAST(COALESCE(SUM(p.hit_ct), 0) AS BIGINT) AS eval_hit_ct,
           MAX(p.max_cos) AS max_cos
    FROM train t LEFT JOIN per_doc p ON t.vec_id = p.vec_id
    GROUP BY 1 ORDER BY 1
"""
