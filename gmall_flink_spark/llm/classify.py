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


def nb_train(train_toks: DataFrame, label_col: str = "label") -> DataFrame:
    """Train the quantized multinomial NB: ``train_toks`` is the exploded
    (doc_id, <label_col>, t) token relation; returns the model grid
    (t, cls, r) with one row for EVERY (train-vocab token, train class)
    pair — absent pairs materialize through the add-1 smoothing path, so
    score-time joins never miss a trained class.

    Scale: two token-keyed groupBys with map-side partials (class counts,
    vocab); the grid is |vocab| × |classes| — vocab-bounded, << corpus —
    built by cross-joining the vocab against the (tiny, broadcast) class
    totals; the scalar vocab size rides a 1-row broadcast."""
    cls_ct = train_toks.groupBy(label_col, "t").agg(
        F.count(F.lit(1)).alias("ct")
    ).select(F.col("t").alias("_t"), F.col(label_col).alias("_c"), "ct")
    cls_tot = train_toks.groupBy(label_col).agg(F.count(F.lit(1)).alias("tot"))
    vocab = train_toks.select("t").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    return (
        vocab.crossJoin(F.broadcast(cls_tot))
        .join(
            cls_ct,
            (F.col("t") == F.col("_t")) & (F.col(label_col) == F.col("_c")),
            "left",
        )
        .crossJoin(F.broadcast(vsize))
        .select(
            "t",
            F.col(label_col).alias("cls"),
            F.floor(
                F.log2(
                    F.expr("(tot + v) div (coalesce(ct, 0) + 1)").cast("double")
                )
            )
            .cast("bigint")
            .alias("r"),
        )
    )


def nb_priors(train_docs: DataFrame, label_col: str = "label") -> DataFrame:
    """Quantized class priors from the train DOCUMENT counts:
    ``pr(c) = floor(log2(total_docs div docs_c))`` — the same integer
    surprisal units as the token weights, added once per (doc, class) at
    score time. A tiny |classes|-row frame, always broadcast."""
    per = train_docs.groupBy(label_col).agg(F.count(F.lit(1)).alias("dn"))
    tot = per.agg(F.sum("dn").alias("dt"))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col(label_col).alias("cls"),
        F.floor(F.log2(F.expr("dt div dn").cast("double")))
        .cast("bigint")
        .alias("pr"),
    )


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
