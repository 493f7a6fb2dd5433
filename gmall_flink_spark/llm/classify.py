"""Learned document classification — the quality/domain-classifier stage
of an LLM data pipeline (the GPT-3 WebText-vs-CommonCrawl filter, CCNet's
fastText language/quality heads, RedPajama-2's classifier signals), as a
distributed multinomial Naive Bayes over token counts.

Why NB and not SGD: the train step is two token-keyed aggregations (class-
conditional counts + class totals) — pure map-side-combinable groupBys that
scale to any corpus in one shuffle each, with no iteration and no driver
state. The model itself is a (vocab × classes) weight table, small enough
to broadcast at score time; scoring is one token join + one per-doc
aggregate. That is exactly the shape fastText-style linear classifiers
reduce to at inference, and it keeps the whole train/predict loop inside
Catalyst.

Exactness contract (shared with the surprisal/bigram-LM queries): weights
are QUANTIZED to integer log2 surprisal classes —
``r(t, c) = floor(log2((tot_c + V) div (ct_{t,c} + 1)))`` (add-1 smoothing,
integer floor-division BEFORE the log) — so per-document class scores are
exact integer sums, the argmin is reproducible bit-for-bit in any engine,
and the DuckDB oracles can verify predictions, not just row counts. Ties
break on the class name ascending.

Tokens unseen in training are DROPPED at score time (the inner join against
the model grid); a held-out document with zero in-vocabulary tokens is
excluded from the prediction output — both rules are mirrored by every
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nb_token_counts(train_toks: DataFrame, label_col: str = "label") -> DataFrame:
    """The model's SUFFICIENT STATISTIC: class-conditional token counts
    (cls, t, ct) from the exploded (doc_id, <label_col>, t) relation. One
    map-side-combinable groupBy — and, being a pure count rollup, exactly
    the thing ``sinks/rollup.py`` maintains incrementally for the
    streaming form (see nb_count_partial)."""
    return train_toks.groupBy(
        F.col(label_col).alias("cls"), "t"
    ).agg(F.count(F.lit(1)).alias("ct"))


def nb_grid(cls_counts: DataFrame, materialize: bool = True) -> DataFrame:
    """Derive the quantized weight grid (t, cls, r) from the count
    statistic: one row for EVERY (vocab token, class) pair — absent pairs
    materialize through the add-1 smoothing path, so score-time joins
    never miss a trained class.

    Plan shape: the per-token class counts collapse to ONE map-valued row
    per token (a single token-keyed groupBy — also the vocab, so no
    separate distinct), then fan out |classes| ways against the broadcast
    class totals — the grid never runs a (t, cls)-keyed join. The scalar
    vocab size rides a 1-row broadcast. try_element_at (not element_at /
    [] access) keeps the absent-pair lookup NULL-returning under ANSI
    mode instead of throwing MAP_KEY_DOES_NOT_EXIST.

    ``materialize`` eagerly localCheckpoints the statistic before the
    fan-out: its three consumers (map collapse, class totals, vocab size)
    are unshared subtrees to Catalyst, so an unmaterialized plan re-runs
    the corpus token scan per consumer — the checkpoint pins the
    vocab × classes-bounded frame and the corpus is scanned ONCE per
    train. Pass False when the input is already materialized (the
    streaming state table)."""
    if materialize:
        cls_counts = cls_counts.localCheckpoint(eager=True)
    per_t = cls_counts.groupBy("t").agg(
        F.map_from_entries(F.collect_list(F.struct("cls", "ct"))).alias("cts")
    )
    cls_tot = cls_counts.groupBy("cls").agg(F.sum("ct").alias("tot"))
    vsize = per_t.agg(F.count(F.lit(1)).alias("v"))
    return (
        per_t.crossJoin(F.broadcast(cls_tot))
        .crossJoin(F.broadcast(vsize))
        .select(
            "t",
            "cls",
            F.floor(
                F.log2(
                    F.expr(
                        "(tot + v) div (coalesce(try_element_at(cts, cls), 0) + 1)"
                    ).cast("double")
                )
            )
            .cast("bigint")
            .alias("r"),
        )
    )


def nb_train(train_toks: DataFrame, label_col: str = "label") -> DataFrame:
    """Train the quantized multinomial NB: ``train_toks`` is the exploded
    (doc_id, <label_col>, t) token relation; returns the model grid
    (t, cls, r) — the count statistic piped through the grid derivation
    (the streaming form maintains the counts in a rollup sink and runs
    the SAME nb_grid over the accumulated state)."""
    return nb_grid(nb_token_counts(train_toks, label_col))


def nb_priors_from_counts(doc_counts: DataFrame) -> DataFrame:
    """Quantized class priors from a (cls, dn) document-count frame:
    ``pr(c) = floor(log2(total_docs div docs_c))`` — the same integer
    surprisal units as the token weights, added once per (doc, class) at
    score time. A tiny |classes|-row frame, always broadcast."""
    tot = doc_counts.agg(F.sum("dn").alias("dt"))
    return doc_counts.crossJoin(F.broadcast(tot)).select(
        "cls",
        F.floor(F.log2(F.expr("dt div dn").cast("double")))
        .cast("bigint")
        .alias("pr"),
    )


def nb_priors(train_docs: DataFrame, label_col: str = "label") -> DataFrame:
    """Priors from the (doc_id, <label_col>) train-document relation."""
    return nb_priors_from_counts(
        train_docs.groupBy(F.col(label_col).alias("cls")).agg(
            F.count(F.lit(1)).alias("dn")
        )
    )


#: the two statistic kinds multiplexed into ONE rollup state table (single
#: merge + single replay marker per batch — two tables would double-count
#: one of them if a crash landed between their merges).
NB_KIND_TOK = "tok"
NB_KIND_DOC = "doc"


def nb_count_partial(label_col: str = "label", text_col: str = "text"):
    """Per-micro-batch partial for the INCREMENTAL NB trainer: the model's
    sufficient statistic is pure counts, so streaming training is a rollup
    merge (sinks/rollup.py) — no gradients, no replays of old data. Rows
    are (kind, cls, t, nb_ct): kind='tok' carries class-conditional token
    counts, kind='doc' (t='') class document counts; a whitespace token
    can never be '' (tokenize drops empties), so the kinds can't collide.

    Use with ``rollup_writer(state, keys=["kind", "cls", "t"],
    agg_fn=nb_count_partial(...))``; derive the model from the
    accumulated state with ``nb_state_model``. Exactness: counts merge
    associatively, so state-after-replay == batch counts, and the grid
    arithmetic downstream is the quantized-integer form — stream model
    == batch model bit-for-bit."""
    from gmall_flink_spark.functions.text import tokenize

    def partial(batch_df: DataFrame) -> DataFrame:
        toks = batch_df.select(
            F.col(label_col).alias("cls"), F.explode(tokenize(text_col)).alias("t")
        )
        tok = toks.groupBy("cls", "t").agg(F.count(F.lit(1)).alias("nb_ct")).select(
            F.lit(NB_KIND_TOK).alias("kind"), "cls", "t", "nb_ct"
        )
        doc = batch_df.groupBy(F.col(label_col).alias("cls")).agg(
            F.count(F.lit(1)).alias("nb_ct")
        ).select(F.lit(NB_KIND_DOC).alias("kind"), "cls", F.lit("").alias("t"), "nb_ct")
        return tok.unionAll(doc)

    return partial


def nb_state_model(spark, state_path: str) -> tuple[DataFrame, DataFrame]:
    """(grid, priors) derived from the accumulated rollup state — the SAME
    nb_grid / nb_priors_from_counts arithmetic as the batch trainer, so a
    stream-trained model scores identically to its batch twin."""
    from gmall_flink_spark.sinks._bucketed import read_state

    st = read_state(spark, state_path)
    cls_ct = st.where(F.col("kind") == NB_KIND_TOK).select(
        "cls", "t", F.col("nb_ct").alias("ct")
    )
    doc_ct = st.where(F.col("kind") == NB_KIND_DOC).select(
        "cls", F.col("nb_ct").alias("dn")
    )
    return nb_grid(cls_ct, materialize=False), nb_priors_from_counts(doc_ct)


def nb_score(
    score_toks: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score documents against a trained grid: ``score_toks`` is the
    exploded (doc_id, *keep_cols, t) relation; returns one row per
    (doc, trained class) with the exact integer score
    ``total = pr(c) + Σ_t r(t, c)`` plus ``rk`` — the class rank per doc
    (1 = predicted; order (total ASC, cls ASC) so ties are stable).

    Scale: the token→grid join fans each token out |classes| ways (AQE
    broadcasts the vocab-bounded grid when it fits), then one (doc, class)
    aggregate; the rank window is |classes| rows per doc — never a big
    sort. Out-of-vocabulary tokens drop at the inner join."""
    per = (
        score_toks.join(model, "t")
        .groupBy("doc_id", *keep_cols, "cls")
        .agg(F.sum("r").alias("s"))
    )
    scored = per.join(F.broadcast(priors), "cls").select(
        "doc_id", *keep_cols, "cls", (F.col("s") + F.col("pr")).alias("total")
    )
    w = Window.partitionBy("doc_id").orderBy("total", "cls")
    return scored.withColumn("rk", F.row_number().over(w))
