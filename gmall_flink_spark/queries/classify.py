"""Oracle-checked learned-classifier queries over `documents` — the
quality/domain-classifier pipeline stage (train on a hash split, predict
on the held-out split, report confusion + confidence), built on the
quantized multinomial NB in ``llm/classify.py``.

The label here is ``lang`` — the one ground-truth signal the synthetic
corpus carries — but the operator surface is label-agnostic: the same
train/score loop runs the GPT-3-style "reference source vs crawl" quality
head by swapping the label column. Complements text_langid (the heuristic
marker-word scorer) with an actually TRAINED model and a measurable
held-out confusion matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import tokenize
from gmall_flink_spark.llm.classify import nb_priors, nb_score, nb_train
from gmall_flink_spark.sources.tables import table

#: deterministic hash split: doc_id % NB_HOLDOUT_MOD == 0 is held out for
#: prediction, everything else trains. Both oracles mirror the rule.
NB_HOLDOUT_MOD = 5

#: margin histogram bucket width (integer surprisal units).
NB_MARGIN_BUCKET = 32


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokenize("text")).alias("t")
    )


#: session memo for the lang head's scored-holdout frame: TWO queries
#: (nb_lang_confusion, nb_margin_hist) consume the identical train+score
#: chain, and without the memo each re-runs the whole thing (guide §2.4).
#: Keyed like every other memo; wiped by clear_session_memos.
_NB_SCORED_MEMO: dict[tuple, DataFrame] = {}


def _scored_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on doc_id % MOD != 0, score the held-out split; returns the
    per-(doc, class) ranked score frame with the true label attached.
    Session-memoized (two consumers), and the exploded token relation is
    checkpointed so one build tokenizes the corpus ONCE — its three
    consumers (token counts, priors distinct, holdout scoring) are
    unshared subtrees to Catalyst and would each re-run the corpus
    tokenize+explode otherwise."""
    from gmall_flink_spark.sources.tables import memo_key

    key = memo_key(spark, sf_dir, "documents", _NB_SCORED_MEMO)
    if key not in _NB_SCORED_MEMO:
        toks = _toks(spark, sf_dir).localCheckpoint(eager=False)
        train = toks.where(F.pmod("doc_id", F.lit(NB_HOLDOUT_MOD)) != 0)
        holdout = toks.where(F.pmod("doc_id", F.lit(NB_HOLDOUT_MOD)) == 0)
        model = nb_train(train, label_col="lang")
        priors = nb_priors(
            train.select("doc_id", "lang").distinct(), label_col="lang"
        )
        _NB_SCORED_MEMO[key] = nb_score(
            holdout.select("doc_id", F.col("lang").alias("true_lang"), "t"),
            model,
            priors,
            keep_cols=("true_lang",),
        ).localCheckpoint(eager=True)
    return _NB_SCORED_MEMO[key]


def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out confusion matrix of the trained NB language head: per
    (true_lang, predicted lang), document count and the exact integer sum
    of winning scores (a checksum proving the full score arithmetic, not
    just the argmin, matches the oracle).

    Scale: train is two map-side-combinable token groupBys; score is one
    token→grid join (grid is vocab-bounded, AQE-broadcast) + one per-doc
    agg + a |classes|-row-per-doc rank window; the matrix itself is
    |classes|²-bounded."""
    sc = _scored_holdout(spark, sf_dir)
    return (
        sc.where(F.col("rk") == 1)
        .groupBy("true_lang", F.col("cls").alias("pred_lang"))
        .agg(
            F.count(F.lit(1)).alias("doc_ct"),
            F.sum("total").alias("score_sum"),
        )
        .orderBy("true_lang", "pred_lang")
    )


def nb_margin_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-confidence view: per true class, histogram of the
    decision margin (runner-up score − winning score, integer surprisal
    units, bucketed by NB_MARGIN_BUCKET). The curve a pipeline reads to
    pick a keep-threshold for classifier-filtered data (small margin =
    low-confidence predictions that a quality filter routes to review or
    drops). Documents whose trained grid sees < 2 classes never occur
    (the grid carries every trained class for every vocab token).

    Scale: same train/score plan as nb_lang_confusion; the margin is a
    self-join-free pivot of ranks 1 and 2 via one conditional aggregate
    per doc."""
    sc = _scored_holdout(spark, sf_dir)
    per_doc = (
        sc.where(F.col("rk") <= 2)
        .groupBy("doc_id", "true_lang")
        .agg(
            (
                F.max(F.when(F.col("rk") == 2, F.col("total")))
                - F.max(F.when(F.col("rk") == 1, F.col("total")))
            ).alias("margin")
        )
    )
    return (
        per_doc.select(
            "true_lang",
            F.expr(f"margin div {NB_MARGIN_BUCKET}").alias("margin_bucket"),
        )
        .groupBy("true_lang", "margin_bucket")
        .agg(F.count(F.lit(1)).alias("doc_ct"))
        .orderBy("true_lang", "margin_bucket")
    )


#: the pinned "curated reference" sources for the binary quality head —
#: the GPT-3 recipe's WebText stand-in (positive class); everything else
#: plays the crawl. Both oracles mirror the set.
NB_REF_SOURCES = ("src0", "src1", "src2")

#: the quality head's own holdout modulus: it must be COPRIME with the
#: testdata's source period (source = src(doc_id % 20)) or the held-out
#: split collapses onto 4 of the 20 sources and the reference sources are
#: never scored (mod 5 does exactly that; 7 touches every source).
NB_QUALITY_HOLDOUT_MOD = 7


def nb_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GPT-3-style learned quality filter (Brown et al. 2020 §A,
    arXiv:2005.14165: classify docs as reference-corpus-like vs crawl,
    keep high scorers): train the SAME quantized NB binary head on
    ``ref``/``crawl`` labels derived from NB_REF_SOURCES, score the
    held-out split (doc_id % NB_QUALITY_HOLDOUT_MOD == 0), and report the
    governance view a corpus build reads — per true source, how many
    held-out docs the classifier would keep (predicted ``ref``) vs route
    to the crawl pile. On this synthetic corpus the per-source vocabulary
    signal is weak and the 17:3 crawl prior dominates, so keep rates sit
    near zero — the query's contract is the exactly-reproducible
    train/score/decide PLUMBING (oracle-verified per doc); the separable
    case is pinned by tests/test_operators.py::
    test_nb_classifier_separable_vocab.

    Scale: identical plan shape to nb_lang_confusion — two train
    groupBys, vocab-bounded grid, one score join + per-doc agg; the
    output is |sources|-bounded."""
    docs = table(spark, sf_dir, "documents")
    ref = F.col("source").isin(*NB_REF_SOURCES)
    toks = docs.select(
        "doc_id",
        "source",
        F.when(ref, F.lit("ref")).otherwise(F.lit("crawl")).alias("quality"),
        F.explode(tokenize("text")).alias("t"),
    ).localCheckpoint(eager=False)  # 3 unshared consumers: tokenize once
    # (eager=False — ADVICE r14: materialize at first action, not at plan build)
    train = toks.where(F.pmod("doc_id", F.lit(NB_QUALITY_HOLDOUT_MOD)) != 0)
    holdout = toks.where(F.pmod("doc_id", F.lit(NB_QUALITY_HOLDOUT_MOD)) == 0)
    model = nb_train(train.select("doc_id", "quality", "t"), label_col="quality")
    priors = nb_priors(
        train.select("doc_id", "quality").distinct(), label_col="quality"
    )
    scored = nb_score(
        holdout.select("doc_id", "source", "t"), model, priors, keep_cols=("source",)
    )
    return (
        scored.where(F.col("rk") == 1)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("scored_ct"),
            F.sum(F.when(F.col("cls") == "ref", 1).otherwise(0)).alias("keep_ct"),
            F.sum("total").alias("score_sum"),
        )
        .orderBy("source")
    )


QUERIES = {
    "nb_lang_confusion": nb_lang_confusion,
    "nb_margin_hist": nb_margin_hist,
    "nb_source_quality": nb_source_quality,
}

_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"

#: shared train/score CTE chain — the DuckDB twin of
#: llm/classify.py::nb_train + nb_priors + nb_score over the lang label.
_NB_SCORED = f"""
    toks AS (
        SELECT doc_id, lang, unnest({_TOKS}) AS t FROM documents
    ),
    tr AS (SELECT * FROM toks WHERE doc_id % {NB_HOLDOUT_MOD} != 0),
    ho AS (SELECT * FROM toks WHERE doc_id % {NB_HOLDOUT_MOD} = 0),
    cls_ct AS (SELECT lang AS cls, t, COUNT(*) AS ct FROM tr GROUP BY 1, 2),
    cls_tot AS (SELECT lang AS cls, COUNT(*) AS tot FROM tr GROUP BY 1),
    vocab AS (SELECT DISTINCT t FROM tr),
    vs AS (SELECT COUNT(*) AS v FROM vocab),
    grid AS (
        SELECT vocab.t, cls_tot.cls,
               CAST(floor(log2(CAST((tot + v) // (COALESCE(ct, 0) + 1)
                                    AS DOUBLE))) AS BIGINT) AS r
        FROM vocab CROSS JOIN cls_tot CROSS JOIN vs
        LEFT JOIN cls_ct ON cls_ct.t = vocab.t AND cls_ct.cls = cls_tot.cls
    ),
    tr_docs AS (SELECT DISTINCT doc_id, lang FROM tr),
    pri AS (
        SELECT lang AS cls,
               CAST(floor(log2(CAST((SELECT COUNT(*) FROM tr_docs) // COUNT(*)
                                    AS DOUBLE))) AS BIGINT) AS pr
        FROM tr_docs GROUP BY 1
    ),
    per AS (
        SELECT ho.doc_id, ho.lang AS true_lang, g.cls, SUM(g.r) AS s
        FROM ho JOIN grid g USING (t) GROUP BY 1, 2, 3
    ),
    sc AS (
        SELECT per.doc_id, per.true_lang, per.cls, s + pr AS total,
               row_number() OVER (PARTITION BY per.doc_id
                                  ORDER BY s + pr, per.cls) AS rk
        FROM per JOIN pri USING (cls)
    )
"""

ORACLE = {
    "nb_lang_confusion": f"""
        WITH {_NB_SCORED}
        SELECT true_lang, cls AS pred_lang,
               CAST(COUNT(*) AS BIGINT) AS doc_ct,
               CAST(SUM(total) AS BIGINT) AS score_sum
        FROM sc WHERE rk = 1
        GROUP BY true_lang, pred_lang
        ORDER BY true_lang, pred_lang
    """,
    "nb_source_quality": f"""
        WITH toks AS (
            SELECT doc_id, source,
                   CASE WHEN source IN {NB_REF_SOURCES!r} THEN 'ref'
                        ELSE 'crawl' END AS quality,
                   unnest({_TOKS}) AS t
            FROM documents
        ),
        tr AS (SELECT * FROM toks WHERE doc_id % {NB_QUALITY_HOLDOUT_MOD} != 0),
        ho AS (SELECT * FROM toks WHERE doc_id % {NB_QUALITY_HOLDOUT_MOD} = 0),
        cls_ct AS (SELECT quality AS cls, t, COUNT(*) AS ct FROM tr GROUP BY 1, 2),
        cls_tot AS (SELECT quality AS cls, COUNT(*) AS tot FROM tr GROUP BY 1),
        vocab AS (SELECT DISTINCT t FROM tr),
        vs AS (SELECT COUNT(*) AS v FROM vocab),
        grid AS (
            SELECT vocab.t, cls_tot.cls,
                   CAST(floor(log2(CAST((tot + v) // (COALESCE(ct, 0) + 1)
                                        AS DOUBLE))) AS BIGINT) AS r
            FROM vocab CROSS JOIN cls_tot CROSS JOIN vs
            LEFT JOIN cls_ct ON cls_ct.t = vocab.t AND cls_ct.cls = cls_tot.cls
        ),
        tr_docs AS (SELECT DISTINCT doc_id, quality FROM tr),
        pri AS (
            SELECT quality AS cls,
                   CAST(floor(log2(CAST((SELECT COUNT(*) FROM tr_docs) // COUNT(*)
                                        AS DOUBLE))) AS BIGINT) AS pr
            FROM tr_docs GROUP BY 1
        ),
        per AS (
            SELECT ho.doc_id, ho.source, g.cls, SUM(g.r) AS s
            FROM ho JOIN grid g USING (t) GROUP BY 1, 2, 3
        ),
        sc AS (
            SELECT per.doc_id, per.source, per.cls, s + pr AS total,
                   row_number() OVER (PARTITION BY per.doc_id
                                      ORDER BY s + pr, per.cls) AS rk
            FROM per JOIN pri USING (cls)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS scored_ct,
               CAST(SUM(CASE WHEN cls = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
                   AS keep_ct,
               CAST(SUM(total) AS BIGINT) AS score_sum
        FROM sc WHERE rk = 1
        GROUP BY source ORDER BY source
    """,
    "nb_margin_hist": f"""
        WITH {_NB_SCORED},
        per_doc AS (
            SELECT doc_id, true_lang,
                   MAX(CASE WHEN rk = 2 THEN total END)
                   - MAX(CASE WHEN rk = 1 THEN total END) AS margin
            FROM sc WHERE rk <= 2
            GROUP BY doc_id, true_lang
        )
        SELECT true_lang,
               CAST(margin // {NB_MARGIN_BUCKET} AS BIGINT) AS margin_bucket,
               CAST(COUNT(*) AS BIGINT) AS doc_ct
        FROM per_doc
        GROUP BY true_lang, margin_bucket
        ORDER BY true_lang, margin_bucket
    """,
}
