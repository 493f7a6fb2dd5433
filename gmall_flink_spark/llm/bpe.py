"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the full
K-round merge-learning loop, not just one round's statistic
(queries/llm_pipeline's ``llm_bpe_pairs`` / ``llm_bpe_merge_round`` are
the single-round pieces; this module iterates real sequence rewriting).
No gmall-flink counterpart — extends the LLM training-data surface.

The trick that keeps every round inside JVM built-ins (and makes the
whole trainer SQL-twinnable): token sequences live as ONE delimited
string per document,

    SEP + tok1 + SEP SEP + tok2 + SEP SEP + ... + tokN + SEP

— a single separator at both ends, a double separator between adjacent
tokens. Greedy left-to-right non-overlapping BPE merge application of
pair (a, b) is then EXACTLY the built-in ``replace``:

    replace(s,  SEP+a+SEP+SEP+b+SEP,  SEP+a+JOIN+b+SEP)

``replace`` scans left to right and never overlaps matches; adjacent
matches (…``·a··b··a··b·``…) don't collide because each consumes only
ONE of the two separators it shares with a neighbor, and the
replacement re-emits single end separators, restoring the invariant.
Repeated-token runs get textbook greedy behavior for free ("a a a" with
pair (a,a) → "a·a a": the merged token no longer equals "a", so the
overlap can't re-fire). SEP (0x1f) and JOIN (0x1e) are control chars
that whitespace tokenization can never emit inside a token.

Per round the plan is: split → zip_with bigrams → explode →
groupBy(a, b) with map-side partials → a deterministic top-1
(TakeOrdered, never a global sort) → 1-row broadcast crossJoin → the
map-only ``replace`` rewrite. The rewritten corpus is localCheckpointed
per round, so round i+1 reads materialized strings instead of replaying
i rounds of lineage — at 100 TB each round is one bounded-key shuffle
plus a map pass, the same cost class as the reference statistic, times
the K you train.

Tie-break contract (mirrored by the SQL twin): most frequent pair
first, then lexicographically smallest (a, b) AS SEPARATE COLUMNS —
ordering the joined "a b" string instead would disagree with the tuple
order once merged tokens contain JOIN (0x1e sorts below space).

Coverage contract (the length-cap question, VERDICT r12 task 3): this
family has NO word-length cap and therefore no UNK/fallback path — the
delimited-string form covers every token of every document regardless
of length (the ``replace`` rewrite is length-oblivious), which is the
string-form analogue of byte-level BPE's total coverage. The
representation caps (and their honest UNK accounting) belong to the
char-level families only: llm/wordpiece.py and llm/unigram.py, whose
unrolled per-position DPs are what a cap bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: inter-token delimiter in the packed-sequence string form
BPE_SEP = "\x1f"
#: internal joiner of a merged token's two halves
BPE_JOIN = "\x1e"
#: merge rounds the flagship training query runs
BPE_TRAIN_ROUNDS = 6


def delimited(toks: Column) -> Column:
    """Pack a token array into the delimited-string sequence form."""
    return F.concat(
        F.lit(BPE_SEP), F.concat_ws(BPE_SEP + BPE_SEP, toks), F.lit(BPE_SEP)
    )


def _seq_tokens(col_name: str) -> Column:
    """Unpack the delimited string column back to a token array."""
    return F.split(
        F.expr(f"substring({col_name}, 2, length({col_name}) - 2)"),
        BPE_SEP + BPE_SEP,
    )


def seq_token_count(col_name: str) -> Column:
    """Token count of a delimited sequence string (0 for the empty
    sequence, whose packed form is the bare two-separator string — split
    would otherwise report one phantom empty token)."""
    return (
        F.when(F.length(col_name) <= 2, F.lit(0))
        .otherwise(F.size(_seq_tokens(col_name)))
        .cast("bigint")
    )


def bpe_train(docs: DataFrame, text_arr: str, rounds: int = BPE_TRAIN_ROUNDS) -> DataFrame:
    """Learn ``rounds`` BPE merges over ``docs[text_arr]`` (an
    array<string> token column). Returns the ordered merge table
    ``(round, pair_a, pair_b, pair_ct)`` — the trained tokenizer's merge
    list, which IS the artifact a BPE tokenizer ships."""
    return bpe_train_state(docs, text_arr, rounds=rounds)[0]


def bpe_train_state(
    docs: DataFrame,
    text_arr: str,
    rounds: int = BPE_TRAIN_ROUNDS,
    carry: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """The full trainer state: ``(merges, encoded)`` where ``merges`` is
    the ordered merge table and ``encoded`` is the corpus with ALL
    ``rounds`` merges applied (columns ``carry`` + the delimited string
    ``s``) — i.e. the corpus ENCODED by the tokenizer it just trained,
    which is what the train→apply loop ships to packing/budget stages.

    Each round's winning pair is chosen deterministically (max count,
    then smallest (a, b)); the corpus is rewritten with the delimited-
    string ``replace`` form and checkpointed before the next round.

    A round whose corpus has no remaining bigram (every doc is down to
    0/1 tokens) yields an EMPTY top-1 frame; crossJoining it would wipe
    ``seqs`` to zero rows, so the loop breaks there instead — the merge
    table stops early and ``encoded`` keeps the fully-merged corpus.
    The SQL twin mirrors this with a LEFT JOIN + CASE fallback, which
    reaches the same fixpoint (no bigrams ⇒ every later round's top-1
    is empty too, so the corpus stays fixed)."""
    seqs = docs.select(*carry, delimited(F.col(text_arr)).alias("s"))
    merges: DataFrame | None = None
    empty_merges = docs.sparkSession.createDataFrame(
        [], "round int, pair_a string, pair_b string, pair_ct bigint"
    )
    for i in range(1, rounds + 1):
        toks = seqs.select(_seq_tokens("s").alias("l")).where(F.size("l") >= 2)
        pairs = toks.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("l"), F.lit(1), F.size("l") - 1),
                    F.slice(F.col("l"), F.lit(2), F.size("l") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        ).select("p.a", "p.b")
        top = (
            pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("pair_ct"))
            .orderBy(F.desc("pair_ct"), "a", "b")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        if top.isEmpty():  # no bigram left anywhere — further rounds are no-ops
            break
        row = top.select(
            F.lit(i).alias("round"),
            F.col("a").alias("pair_a"),
            F.col("b").alias("pair_b"),
            "pair_ct",
        )
        merges = row if merges is None else merges.unionByName(row)
        seqs = (
            seqs.crossJoin(F.broadcast(top))
            .select(
                *carry,
                F.replace(
                    F.col("s"),
                    F.concat(
                        F.lit(BPE_SEP), F.col("a"),
                        F.lit(BPE_SEP + BPE_SEP),
                        F.col("b"), F.lit(BPE_SEP),
                    ),
                    F.concat(
                        F.lit(BPE_SEP), F.col("a"),
                        F.lit(BPE_JOIN),
                        F.col("b"), F.lit(BPE_SEP),
                    ),
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return (merges if merges is not None else empty_merges), seqs


def bpe_apply_merges(
    docs: DataFrame,
    text_arr: str,
    merges: list[tuple[str, str]],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """ENCODE a corpus with an already-trained ordered merge list — the
    apply half of the train-on-sample / encode-everything split a real
    100 TB tokenizer run uses (training reads a sample; encoding reads
    everything ONCE per merge, map-only, no shuffles at all). ``merges``
    is the driver-side artifact bpe_train produces — K (pair_a, pair_b)
    tuples, bounded by the round count, exactly what a tokenizer ships.
    Each merge is one literal delimited-string ``replace`` (greedy
    left-to-right, same invariant as the trainer's rewrite), applied in
    training order; Catalyst fuses all K replaces into the scan projection.
    Returns ``carry`` + the encoded delimited string ``s``."""
    seqs = docs.select(*carry, delimited(F.col(text_arr)).alias("s"))
    col = F.col("s")
    for a, b in merges:
        col = F.replace(
            col,
            F.concat(
                F.lit(BPE_SEP + a + BPE_SEP + BPE_SEP + b + BPE_SEP)
            ),
            F.concat(F.lit(BPE_SEP + a + BPE_JOIN + b + BPE_SEP)),
        )
    return seqs.select(*carry, col.alias("s"))
