"""Unigram-LM (SentencePiece-style) tokenizer TRAINING — the second half
of the tokenizer family next to BPE (llm/bpe.py): where BPE grows a vocab
bottom-up by merging, the unigram model starts from an over-complete seed
vocabulary and learns which pieces to keep by re-estimating piece usage
under the model's own best segmentation (Kudo 2018, "Subword
Regularization"). No gmall-flink counterpart — extends the LLM
training-data surface (VERDICT r10 task 4).

Algorithm (hard-EM / Viterbi-EM, the oracle-checkable variant):

  1. SEED: every substring (length 1..UNIGRAM_MAX_PIECE) of every corpus
     word, weighted by word frequency; all single characters are kept
     unconditionally (coverage), plus the top UNIGRAM_SEED_MULTI
     multi-char pieces by (count desc, piece asc).
  2. SCORE: pieces are ranked by (count desc, piece asc); the integer
     cost of a piece is ``length(bin(rank))`` = floor(log2(rank)) + 1 —
     a Zipfian surrogate for -log p (under Zipf's law log(1/p) grows
     like log(rank)) chosen because it is INTEGER-EXACT on both engines:
     no transcendental whose last-ulp rounding could differ between the
     JVM and DuckDB ever enters the oracle-checked arithmetic (the same
     reasoning as the quantized integer-log2 weights in llm/classify.py).
  3. E-STEP: each word takes its CANONICAL minimal segmentation — the
     argmin over segmentations of (total cost, piece count, path string)
     — computed by an unrolled Viterbi DP that is a pure column
     expression: zero shuffles, the map-only posture encoding needs at
     100 TB (the bpe_apply_merges pattern; the vocab is the bounded
     collected artifact, like BPE's K merge rows).
  4. M-STEP: piece counts are re-estimated from the chosen segmentations
     (one bounded-key shuffle); single chars are re-counted but never
     dropped, multi-char pieces are pruned to the top UNIGRAM_KEEP_MULTI.
  5. Repeat 3-4 for UNIGRAM_EM_ROUNDS rounds; the final ranked vocab IS
     the tokenizer artifact.

Tie-break contract (mirrored by the SQL twin): a segmentation beats
another by smaller total cost, then fewer pieces, then lexicographically
smaller path string, where path = SEP + piece + SEP + piece + ... with
SEP = 0x1f (binary-collation string compare on both engines). Unknown
single characters (absent from the trained vocab — possible when
encoding the full corpus with a sample-trained vocab) cost
UNIGRAM_UNK_COST; unknown multi-char pieces are not segmentable.

The DuckDB oracle verifies the DP by BRUTE-FORCE ENUMERATION of every
segmentation per word (a recursive CTE — exponential in word length,
fine at the gate SFs, and a genuinely independent method: the engine
optimizes, the oracle enumerates — the dedup_allpairs_exact pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: longest multi-char piece considered
UNIGRAM_MAX_PIECE = 4
#: words longer than this cannot be REPRESENTED by the unrolled DP (one
#: expression level per position; raising it is a constant change
#: mirrored in the oracle's enumeration bound). A representation limit,
#: not a coverage limit: over-cap words are excluded from training but
#: COUNT AS UNK in encode/roundtrip statistics (VERDICT r12 task 3).
UNIGRAM_MAX_WORD_LEN = 8
#: multi-char seed pieces kept after the substring explosion
UNIGRAM_SEED_MULTI = 48
#: multi-char pieces kept after each M-step prune
UNIGRAM_KEEP_MULTI = 32
#: hard-EM rounds
UNIGRAM_EM_ROUNDS = 2
#: cost of an out-of-vocab single character (greater than any ranked
#: cost: rank < 2^29 keeps length(bin(rank)) < 30)
UNIGRAM_UNK_COST = 30
#: path separator in the canonical-segmentation string (below any
#: token character in binary collation, like BPE_SEP)
USEP = "\x1f"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) over tokenize(text), capped at UNIGRAM_MAX_WORD_LEN
    — the distinct-word frame every trainer stage shares (at corpus scale
    this is the word-frequency table, one shuffle)."""
    from gmall_flink_spark.functions.text import tokenize

    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .where(F.length("word") <= UNIGRAM_MAX_WORD_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wcount"))
    )


def seed_vocab(words: DataFrame) -> DataFrame:
    """Over-complete seed: every substring of length 1..UNIGRAM_MAX_PIECE
    of every word, weighted by word frequency (multiple occurrences in
    one word each count); all single chars + top UNIGRAM_SEED_MULTI
    multi-char pieces. The substring explosion is a map-side expression —
    one shuffle on the piece key."""
    subs = (
        words.select(
            "wcount",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(word)), i -> "
                    f"transform(sequence(i, least(length(word), i + {UNIGRAM_MAX_PIECE} - 1)), "
                    "j -> substring(word, i, j - i + 1))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("wcount").cast("bigint").alias("cnt"))
    )
    chars = subs.where(F.length("piece") == 1)
    multi = (
        subs.where(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(UNIGRAM_SEED_MULTI)
    )
    return chars.unionAll(multi)


def ranked(vocab: DataFrame) -> DataFrame:
    """Attach (rank, cost_q): rank = row_number over (cnt desc, piece asc),
    cost_q = length(bin(rank)) (the integer Zipf surrogate — module
    docstring). The unpartitioned window is safe: the vocab is bounded by
    construction (chars + UNIGRAM_KEEP/SEED_MULTI rows)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    return vocab.select(
        "piece",
        "cnt",
        F.row_number().over(w).cast("bigint").alias("rank"),
    ).withColumn("cost_q", F.length(F.bin(F.col("rank"))).cast("bigint"))


def collect_costs(vocab_ranked: DataFrame) -> dict[str, int]:
    """The bounded tokenizer artifact: piece -> integer cost (like BPE's
    collected K-row merge list — the one driver-side collect the family
    performs, bounded by the vocab caps, never by the corpus)."""
    return {
        r["piece"]: int(r["cost_q"])
        for r in vocab_ranked.select("piece", "cost_q").collect()
    }


def with_viterbi(
    df: DataFrame, word_col: str, costs: dict[str, int], out_col: str = "st"
) -> DataFrame:
    """Append the (cost, pct, path) struct of ``word_col``'s canonical
    minimal segmentation: an unrolled Viterbi DP, one chained withColumn
    per position (UNIGRAM_MAX_WORD_LEN levels x UNIGRAM_MAX_PIECE
    candidates, ties resolved by the struct ordering cost -> pct -> path).
    The per-position states are NAMED COLUMNS, not nested expressions —
    inlining them would copy each state's subtree into every consumer and
    the expression tree would grow tetranacci-fast (the first form of this
    function hung analysis at depth 8); Catalyst keeps multi-consumer
    non-cheap aliases as separate projections, so the plan stays linear in
    depth and the whole DP is still ONE map stage. The piece costs bind
    once as a map-literal column. Zero shuffles — encoding the full corpus
    is a map pass, the 100 TB posture."""
    if costs:
        cost_map = F.create_map(
            *[F.lit(x) for kv in sorted(costs.items()) for x in kv]
        )
    else:
        cost_map = F.create_map().cast("map<string,bigint>")
    df = df.withColumn("__ucosts", cost_map)
    df = df.withColumn(
        "__us0",
        F.struct(
            F.lit(0).cast("bigint").alias("cost"),
            F.lit(0).cast("bigint").alias("pct"),
            F.lit("").alias("path"),
        ),
    )
    word = F.col(word_col)
    for pos in range(1, UNIGRAM_MAX_WORD_LEN + 1):
        cands = []
        for plen in range(1, min(UNIGRAM_MAX_PIECE, pos) + 1):
            start = pos - plen
            piece = F.substring(word, start + 1, plen)
            c = F.try_element_at(F.col("__ucosts"), piece).cast("bigint")
            if plen == 1:
                c = F.coalesce(c, F.lit(UNIGRAM_UNK_COST).cast("bigint"))
            prev = F.col(f"__us{start}")
            cands.append(
                F.when(
                    c.isNotNull(),
                    F.struct(
                        (prev["cost"] + c).alias("cost"),
                        (prev["pct"] + F.lit(1).cast("bigint")).alias("pct"),
                        F.concat(prev["path"], F.lit(USEP), piece).alias("path"),
                    ),
                )
            )
        df = df.withColumn(
            f"__us{pos}", F.least(*cands) if len(cands) > 1 else cands[0]
        )
    # the word's final state; length(word) is in [1, UNIGRAM_MAX_WORD_LEN]
    # by the word_counts filter, so the ANSI array index never overflows
    arr = F.array(*[F.col(f"__us{p}") for p in range(1, UNIGRAM_MAX_WORD_LEN + 1)])
    df = df.withColumn(out_col, F.element_at(arr, F.length(word).cast("int")))
    return df.drop("__ucosts", *[f"__us{p}" for p in range(UNIGRAM_MAX_WORD_LEN + 1)])


def unigram_train(words: DataFrame, rounds: int = UNIGRAM_EM_ROUNDS) -> DataFrame:
    """Run the hard-EM loop over a (word, wcount) frame; returns the final
    ranked vocab (piece, cnt, rank, cost_q). Per round: one driver-side
    collect of the bounded vocab, one map-only segmentation pass, one
    piece-key shuffle for the recount."""
    words = words.localCheckpoint(eager=True)
    # one materialization of the substring-explosion aggregate: `chars`
    # and the round-0 ranking both read it (unmaterialized, Catalyst
    # re-runs the explode+groupBy per consumer — the llm_corpus_build
    # plan lesson)
    seed = seed_vocab(words).localCheckpoint(eager=True)
    chars = seed.where(F.length("piece") == 1).select("piece")
    vocab = ranked(seed).localCheckpoint(eager=True)
    for _ in range(rounds):
        costs = collect_costs(vocab)
        seg = with_viterbi(words, "word", costs).select("wcount", "st")
        pieces = (
            seg.select(
                "wcount",
                F.explode(
                    F.split(F.expr("substring(st.path, 2)"), USEP)
                ).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("wcount").cast("bigint").alias("cnt"))
        )
        char_rows = chars.join(pieces, "piece", "left").select(
            "piece", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")
        )
        multi = (
            pieces.where(F.length("piece") > 1)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(UNIGRAM_KEEP_MULTI)
        )
        vocab = ranked(char_rows.unionAll(multi)).localCheckpoint(eager=True)
    return vocab


def unigram_encode_stats(
    docs: DataFrame,
    costs: dict[str, int],
    group_col: str = "source",
    wc: DataFrame | None = None,
) -> DataFrame:
    """Encode the FULL corpus with a trained vocab (its collected cost
    artifact) and report per-group compression stats: ALL word
    occurrences, UNK occurrences (words past UNIGRAM_MAX_WORD_LEN — the
    unrolled DP cannot REPRESENT them; a representation limit, never a
    coverage limit, so they are counted as UNK rather than dropped —
    VERDICT r12 task 3), total pieces, total quantized cost, total chars
    over encoded words, and fertility (pieces per encoded word, x100
    integer).

    DICTIONARY-ENCODE posture: the Viterbi expression is ~50 µs/row (8
    chained struct projections x map-literal probes), so it runs once per
    DISTINCT in-cap word — occurrences reduce to (group, word) counts
    first (one narrow-key shuffle with map-side partials) and LEFT-join
    the per-word segmentation back (over-cap words miss → UNK). Measured
    at sf0.1: 15.3 s (per-occurrence DP) → ~1 s; at corpus scale the
    distinct-word dictionary is orders of magnitude smaller than the
    occurrence stream, which is the whole point of unigram tokenization's
    word-level cache.

    ``wc``: a precomputed (group_col, word, occ) frame — e.g. the
    session-shared word-occurrence dictionary — skips the tokenize scan
    entirely (guide §2.4; the jaccard_pairs(sizes=...) pattern)."""
    from gmall_flink_spark.functions.text import tokenize

    if wc is None:
        wc = (
            docs.select(F.col(group_col), F.explode(tokenize("text")).alias("word"))
            .groupBy(group_col, "word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
        )
    else:
        wc = wc.select(group_col, "word", "occ")
    seg = with_viterbi(
        wc.select("word")
        .where(F.length("word") <= UNIGRAM_MAX_WORD_LEN)
        .distinct(),
        "word",
        costs,
    ).select(
        "word",
        F.lit(1).cast("bigint").alias("enc"),
        F.col("st")["pct"].alias("pct"),
        F.col("st")["cost"].alias("cost"),
        F.length("word").cast("bigint").alias("chars"),
    )
    j = wc.join(seg, "word", "left").select(
        group_col,
        "occ",
        F.coalesce("enc", F.lit(0).cast("bigint")).alias("enc"),
        F.coalesce("pct", F.lit(0).cast("bigint")).alias("pct"),
        F.coalesce("cost", F.lit(0).cast("bigint")).alias("cost"),
        F.coalesce("chars", F.lit(0).cast("bigint")).alias("chars"),
    )
    return j.groupBy(group_col).agg(
        F.sum("occ").cast("bigint").alias("word_ct"),
        F.sum(F.col("occ") * (F.lit(1) - F.col("enc"))).cast("bigint").alias("unk_ct"),
        F.sum(F.col("occ") * F.col("pct")).cast("bigint").alias("piece_ct"),
        F.sum(F.col("occ") * F.col("cost")).cast("bigint").alias("cost_total"),
        F.sum(F.col("occ") * F.col("chars")).cast("bigint").alias("char_ct"),
        F.when(F.sum(F.col("occ") * F.col("enc")) == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr("CAST(100 * sum(occ * pct) DIV sum(occ * enc) AS BIGINT)")
        )
        .alias("fertility_x100"),
    )
