"""Link-graph analytics for web-corpus governance — integer-exact
PageRank (Page et al. 1999) over a weighted edge list. The canonical
crawl-side quality signal: rank hosts by link structure, then use the
rank as a quality prior in corpus selection (the CommonCrawl/RefinedWeb
"host reputation" stage). No gmall-flink counterpart — this extends the
LLM-pipeline surface, not SURVEY §2.

Spark-first shape: the host graph is tiny next to the corpus (millions
of registrable domains vs billions of pages at 100 TB), so each power
iteration is ONE shuffle — the rank vector broadcasts onto the edge
list (map-side contribution = rank * weight div out_weight), followed by
a single groupBy(dst) with map-side partials; nodes with no in-links
re-enter via a left join against the node universe. The edge list with
its out-degree decoration is computed once and reused by every
iteration (Catalyst keeps it a shared subplan; callers iterating many
rounds can localCheckpoint it).

Integer exactness (the suite's standard determinism contract): ranks
live in Q-scaled integer units. One iteration is

    contrib(v) = SUM over edges (u,v):  (rank(u) * w(u,v)) div out(u)
    rank'(v)   = (100 - D85)*Q div 100  +  D85 * contrib(v) div 100

— all BIGINT, so sums are exact under any partitioning/order and the
DuckDB twin (the same arithmetic unrolled per iteration) matches
hash-for-hash. Floor-division mass leakage (the classic fixed-point
trade) and dropped dangling-node mass are deliberate, documented
semantics: ranks are a *relative* quality ordering, not probabilities.

Overflow headroom: rank(u) <= total mass ~ n_nodes * Q; rank * w must
stay under 2^63, i.e. n_nodes * w_max < 2^63 / Q ~ 9.2e6 at the default
Q = 1e12. Host graphs at 100 TB (n ~ 1e7, Q = 1e9) keep the same
contract; the Q knob is exposed for exactly that sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: damping factor in percent (the classic 0.85, as an exact integer)
PR_DAMP = 85

#: rank scale: 1.0 of initial rank == PR_Q integer units
PR_Q = 10**12

#: node-count bound under which the per-round rank/contribution vectors
#: are force-broadcast (ADVICE r14 guard): 2M (node string, bigint) rows
#: is ~100-200 MB framed — inside the guide §3.1 comfort band even ×1
#: per round; past it the forced hint would pressure driver + every
#: executor 2×/round, so the joins fall back to AQE's runtime sizing.
PR_BROADCAST_MAX_NODES = 2_000_000

#: power-iteration count for the fixed-round governance report (rank
#: ORDER stabilizes long before the values converge; 5 rounds is the
#: report's pinned, oracle-unrollable depth)
PR_ITERS = 5


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damp: int = PR_DAMP,
    q: int = PR_Q,
) -> DataFrame:
    """Integer-exact weighted PageRank over ``edges(src, dst)`` (string
    node keys; parallel edges act as weights). Returns
    ``(node, rank_q)`` for every node in the universe (sources and
    sinks of any edge), rank in Q-scaled integer units.

    Self-loops are dropped (a node cannot vouch for itself); dangling
    nodes keep receiving the teleport base but their mass is not
    redistributed (dropped-dangling semantics, exact and documented).
    """
    e = edges.where(F.col("src") != F.col("dst"))
    ew = e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    return pagerank_from_weights(ew, iters=iters, damp=damp, q=q)


def pagerank_from_weights(
    ew: DataFrame,
    iters: int = PR_ITERS,
    damp: int = PR_DAMP,
    q: int = PR_Q,
) -> DataFrame:
    """The power iteration over a pre-aggregated weighted edge table
    ``(src, dst, w)`` (self-loops assumed already dropped). Split out so
    a STREAMED edge-weight table works too: per-batch (src, dst) counts
    are algebraic, so the link graph is maintainable through the rollup
    sink and the ranks recompute at read time from the maintained
    weights (test_streaming_link_graph_rollup_equals_batch_pagerank).

    Every per-round input is localCheckpointed before iterating: the
    aggregated edge table (without the cut Catalyst re-derives the
    corpus-sized edge aggregation once per reference — 11 scans at 5
    rounds), the out-degree-decorated edge list, and the node universe
    (each previously re-derived per round: a distinct + join per
    iteration; the r14 plan audit read 16 exchanges for 5 rounds). All
    three are host-graph-sized — exactly the thing that's small by
    construction here. The per-round contribution vector is broadcast
    back onto the node universe (it is at most node-count rows, the same
    bounded class as the rank vector the round already broadcasts), so
    one groupBy(dst) exchange per round is the only shuffle left.

    The broadcast hints are GUARDED by the measured node count
    (ADVICE r14): forcing a per-round broadcast is only safe while the
    rank/contribution vectors genuinely fit executor memory, so the one
    count job on the checkpointed node universe decides — host graphs
    over PR_BROADCAST_MAX_NODES leave both per-round joins to AQE, which
    still broadcasts when the runtime sizes fit."""
    ew = ew.localCheckpoint(eager=False)
    out = ew.groupBy("src").agg(F.sum("w").alias("out_w"))
    ewo = ew.join(out, "src").localCheckpoint(eager=False)
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if nodes.count() <= PR_BROADCAST_MAX_NODES:
        hint = F.broadcast
    else:  # leave join strategy to AQE's runtime sizing
        def hint(df):
            return df
    base = (100 - damp) * q // 100
    ranks = nodes.select("node", F.lit(q).cast("bigint").alias("rank_q"))
    for _ in range(iters):
        contrib = (
            ewo.join(
                hint(ranks.withColumnRenamed("node", "src")), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_q * w) DIV out_w").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(hint(contrib), "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(
                    f"({damp} * coalesce(c, 0L)) DIV 100"
                ).cast("bigint")
            ).alias("rank_q"),
        )
    return ranks
