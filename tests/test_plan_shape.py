"""Plan-shape guards (SURVEY §4 / 100 TB posture): these assert the
*physical strategy*, not results — a regression that silently turns a
broadcast into a cross join or loses scan pushdown fails here long before
it shows up as a 100 TB incident."""

from __future__ import annotations

import pytest

from bench import explain_str
from gmall_flink_spark.registry import all_queries

SF = "/root/testdata/sf0.001"
_Q = all_queries()


def plan(spark, name: str) -> str:
    return explain_str(_Q[name](spark, SF))


def test_dim_enrichment_broadcasts(spark):
    p = plan(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_q6_filters_reach_scan(spark):
    p = plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in p
    assert "l_shipdate" in p.split("PushedFilters")[1][:400]


def test_q6_prunes_columns(spark):
    p = plan(spark, "q6_forecast_revenue")
    read = p.split("ReadSchema")[1][:400]
    assert "l_orderkey" not in read and "l_extendedprice" in read


def test_range_join_is_not_a_cross_product(spark):
    p = plan(spark, "range_join_bands")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_wide_fact_joins_are_hash_joins(spark):
    p = plan(spark, "cdc_order_detail_wide")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set must broadcast (corpus side stays map-only
    until the per-doc aggregate) — the decontamination scale contract."""
    p = plan(spark, "llm_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_source_topk_has_no_global_sort_before_window(spark):
    """Per-group top-k must window on the group key, not globally sort the
    corpus: the only global Sort allowed is the terminal output ordering
    (after the rn filter)."""
    p = plan(spark, "llm_source_topk")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_scalar_aggregate_queries_broadcast_the_scalar(spark):
    """q11/q15/q22 compare groups against a 1-row global aggregate: the
    scalar side must broadcast (never a shuffled join against one row)."""
    for name in ("q11_important_parts", "q15_top_supplier", "q22_idle_rich_customers"):
        p = plan(spark, name)
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name


def test_correlated_min_has_no_cartesian(spark):
    """q2/q17/q20 express correlated subqueries as per-group aggregates
    joined back on the group key — equi-joins, never cross products."""
    for name in ("q2_min_cost_supplier", "q17_small_quantity_revenue", "q20_excess_shippers"):
        p = plan(spark, name)
        assert "CartesianProduct" not in p, name


def test_hot_path_is_whole_stage_codegen(spark):
    """The scan-agg hot path must sit inside WholeStageCodegen spans (no
    interpreted expression islands) — the stay-JVM-side contract."""
    from gmall_flink_spark.queries.relational import q1_pricing_summary, q6_forecast_revenue
    from gmall_flink_spark.queries.text import text_gopher_flags

    # raw query fns (the registry wrapper would re-pin AQE, which hides
    # codegen spans in the pre-execution plan string)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for fn in (q1_pricing_summary, q6_forecast_revenue, text_gopher_flags):
            p = explain_str(fn(spark, SF))
            # "*(n) Op" prefix = the operator sits in WholeStageCodegen stage n
            assert "*(" in p, fn.__name__
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, fn.__name__
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_routed_sink_readback_prunes_partitions(spark):
    """K2 routed output is partitioned by sink_table; a reader filtering on
    it must hit PartitionFilters (directory pruning), not scan all topics —
    the layout contract that makes per-topic consumers cheap at scale."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from gmall_flink_spark.sinks.upsert import topic_router
    from gmall_flink_spark.sources.tables import table

    out = "/tmp/gmall_plan_route"
    if os.path.exists(out):
        shutil.rmtree(out)
    ev = table(spark, SF, "events").withColumn(
        "sink_table", F.concat(F.lit("t"), (F.col("event_id") % 3).cast("string"))
    )
    topic_router(out)(ev, 0)
    rd = spark.read.parquet(out).where(F.col("sink_table") == "t1")
    p = explain_str(rd)
    assert "PartitionFilters" in p and "sink_table" in p.split("PartitionFilters")[1][:200]


def test_broadcast_disabled_falls_back_to_shuffle_join(spark):
    """Resilience: with auto-broadcast disabled (a side outgrowing the
    threshold), the unhinted fact join replans as a shuffle join (SMJ or
    shuffle-hash) and returns identical results. Explicitly hinted dim
    broadcasts (F.broadcast) are unaffected by design."""
    base = _Q["q18_large_orders"](spark, SF).collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan(spark, "q18_large_orders")
        got = _Q["q18_large_orders"](spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert sorted(map(tuple, got)) == sorted(map(tuple, base))


@pytest.mark.slow
def test_no_rowwise_python_or_cartesian_in_any_registry_plan(spark):
    """Global guard over the WHOLE registry: no query's physical plan may
    contain a row-at-a-time Python UDF (BatchEvalPython — Arrow-batched
    MapInPandas/ArrowEval are fine) or an unbounded CartesianProduct.
    Catches the two worst 100 TB regressions wherever they sneak in."""
    bad: dict[str, list[str]] = {}
    for name in sorted(_Q):
        p = plan(spark, name)
        hits = [m for m in ("BatchEvalPython", "CartesianProduct") if m in p]
        if hits:
            bad[name] = hits
    assert not bad, f"forbidden plan nodes: {bad}"


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed the same way on the join key must sort-merge
    join with ZERO Exchange nodes — the shuffle was paid once at write
    time. This is the batch-layout lever for repeated 100 TB fact joins:
    without it every query re-shuffles both sides."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.sinks.bucketed_tables import write_bucketed
    from gmall_flink_spark.sources.tables import table

    write_bucketed(
        table(spark, SF, "orders"), "b_orders", ["o_orderkey"], 8,
        str(tmp_path / "orders"), sort=["o_orderkey"],
    )
    write_bucketed(
        table(spark, SF, "lineitem"), "b_lineitem", ["l_orderkey"], 8,
        str(tmp_path / "lineitem"), sort=["l_orderkey"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        p = explain_str(j)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p


def test_vocab_topk_is_take_ordered_not_global_sort(spark):
    """llm_vocab_topk's cut must execute as TakeOrderedAndProject (local
    top-k per partition) — a global Sort before the limit would serialize
    the whole vocabulary through one ordering at scale."""
    from gmall_flink_spark.registry import all_queries

    df = all_queries()["llm_vocab_topk"](spark, SF)
    p = explain_str(df)
    assert "TakeOrderedAndProject" in p, p


def test_chunk_split_has_no_generate(spark):
    """llm_chunk_split accounts spans with array higher-order functions —
    the plan must contain no Generate (explode): chunk fan-out is the
    consumer's explicit cost, never the audit's."""
    from gmall_flink_spark.registry import all_queries

    df = all_queries()["llm_chunk_split"](spark, SF)
    p = explain_str(df)
    assert "Generate" not in p, p


def test_mix_rebalance_broadcasts_rate_table(spark):
    """llm_mix_rebalance's per-source rate table must reach the corpus as
    a broadcast (map-side keep predicate) — and the global-total window
    must never see corpus rows (a single-partition window over the corpus
    would serialize it)."""
    from gmall_flink_spark.registry import all_queries

    df = all_queries()["llm_mix_rebalance"](spark, SF)
    p = explain_str(df)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p


def test_anomaly_mad_broadcasts_medians(spark):
    """events_anomaly_mad joins the tiny per-type median/MAD tables back
    onto events — both joins must be broadcasts, the outlier test map-side."""
    from gmall_flink_spark.registry import all_queries

    df = all_queries()["events_anomaly_mad"](spark, SF)
    p = explain_str(df)
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_bpe_pairs_is_take_ordered_not_global_sort(spark):
    """llm_bpe_pairs' merge-candidate cut must execute as
    TakeOrderedAndProject (local top-k per partition) and build bigrams
    with zip_with — exactly one Generate (the pair explode), never a
    positional self-join of the token stream."""
    p = plan(spark, "llm_bpe_pairs")
    assert "TakeOrderedAndProject" in p, p
    assert p.count("Generate") == 1, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_boilerplate_joins_on_equi_keys_only(spark):
    """text_boilerplate's dictionary membership and per-doc stitch are
    hash equi-joins (no cartesian/BNLJ fallback), and nothing in the plan
    sorts the corpus — the only orderBy is the tiny per-source result."""
    p = plan(spark, "text_boilerplate")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # the single Sort belongs to the <=n_sources-row final orderBy
    assert p.count("Sort ") <= 1, p


def test_pq_adc_scan_joins_lut_as_broadcast(spark):
    """sim_pq_topk's scan side must meet the per-query lookup table as a
    broadcast hash join on (sub, code) — the ADC contract is m integer
    lookups per candidate, never a shuffled or nested-loop join against
    the code table."""
    p = plan(spark, "sim_pq_topk")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_cms_counters_broadcast_for_estimation(spark):
    """events_cms_topk's counter table (d*w rows regardless of key
    cardinality) must reach the candidate lookups as a broadcast, and the
    sketch build must be a plain hash aggregate — no window, no
    cartesian."""
    p = plan(spark, "events_cms_topk")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_filtered_topk_broadcasts_query_slice(spark):
    """sim_filtered_topk's tenant filter must ride the join key (broadcast
    hash join on label) — never a cartesian with a post-filter, which
    would defeat the per-shard scan contract."""
    p = plan(spark, "sim_filtered_topk")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_semdedup_has_no_cartesian(spark):
    """embed_semdedup_drops' pair generation stays cluster-blocked: an
    equi-join on the block key, never an unbounded cross product. (The
    plan's BroadcastNestedLoopJoin is ivf_assign's deliberate
    vectors-x-broadcast-centroids scoring — small side bounded by the
    centroid count, same as every IVF query.)"""
    p = plan(spark, "embed_semdedup_drops")
    assert "CartesianProduct" not in p, p
    # the pair self-join itself must be an equi (hash/sort-merge) join
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p, p


@pytest.mark.slow
def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling must actually fire in this engine's session
    config (session.py pins spark.sql.adaptive.skewJoin.enabled): a join
    with one hot key, under test-sized skew thresholds, finalizes with the
    skewed partition split (skew=true in the final plan) instead of one
    straggler task — the runtime half of the salting strategy SCALE.md
    documents for keys too hot for AQE."""
    from pyspark.sql import functions as F

    thresholds = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    try:
        for k, v in thresholds.items():
            spark.conf.set(k, v)
        # 25% of rows land on key 0; both sides big enough to shuffle.
        # The join must stay TERMINAL: a downstream aggregation would
        # require hash partitioning on k, and AQE (correctly) declines to
        # split skewed partitions whose partitioning is reused.
        hot = spark.range(0, 100_000).select(
            F.when(F.col("id") % 4 != 0, F.col("id") % 997).otherwise(0).alias("k"),
            F.col("id").alias("v"),
        )
        big = spark.range(0, 100_000).select(
            (F.col("id") % 997).alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = hot.join(big, "k")
        # run THIS DataFrame's own query execution (a write or .count()
        # would execute a cloned plan and leave this one un-finalized):
        # toLocalIterator executes the same Dataset's queryExecution, and
        # AQE finalizes every shuffle stage before yielding the first row,
        # so one next() is enough to materialize the final plan.
        assert next(joined.toLocalIterator()) is not None
        p = explain_str(joined)
        assert "isFinalPlan=true" in p, p
        assert "skew=true" in p, p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's runtime bloom-filter join pruning must inject for a
    selective-dim x fact shuffle join in this engine's session: the
    optimized plan carries a bloom_filter_agg on the filtered side and a
    might_contain probe on the fact scan side. Thresholds are lowered for
    test-sized data — at the default 10 GB application-side threshold the
    feature self-activates exactly at the scan sizes the 100 TB posture
    targets, with zero query changes."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.sources.tables import table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        li = table(spark, SF, "lineitem")
        orders = table(spark, SF, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        p = explain_str(j, "extended")
        assert "bloom_filter_agg" in p, p
        assert "might_contain" in p, p
    finally:
        # restore the PRE-TEST values (not a hardcoded copy of session.py's
        # pin, which would silently leak config if the pin ever changes)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pagerank_iterations_broadcast_rank_vector(spark):
    """Every power iteration must join the rank vector into the edge list
    as a broadcast (the host graph is tiny next to the corpus; a shuffle
    join per round would add an edge-sized exchange per iteration), and
    the contribution join must never degrade to a cartesian."""
    from gmall_flink_spark.llm.graph import PR_ITERS

    p = plan(spark, "web_domain_pagerank")
    assert p.count("BroadcastHashJoin") >= PR_ITERS, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_shard_manifest_sorts_within_shards_only(spark):
    """The epoch shuffle must never globally sort the corpus: position is
    derived per shard (window over hashpartitioning), so the only range
    partitioning allowed is the terminal presentation ORDER BY on the
    16-row manifest itself."""
    p = plan(spark, "llm_shard_manifest")
    assert p.count("rangepartitioning") <= 1, p
    assert "hashpartitioning(shard" in p, p


def test_dsir_lambda_table_broadcasts(spark):
    """llm_dsir_weights' per-bucket log-ratio table is DSIR_BUCKETS rows —
    it must broadcast onto the token scan, never shuffle the corpus side
    (the 1-row totals ride in as scalar broadcast nested loops — the
    accepted scalar pattern; a CartesianProduct is not)."""
    p = plan(spark, "llm_dsir_weights")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
