"""WordPiece tokenizer TRAINING + greedy ENCODE (Schuster & Nakajima
2012; the BERT tokenizer) — the third tokenizer family next to BPE
(llm/bpe.py, frequency-scored merges) and unigram-LM (llm/unigram.py,
global-likelihood pruning). No gmall-flink counterpart — extends the LLM
training-data surface.

What makes WordPiece distinct, and what this module implements:

  TRAIN — BPE's merge loop with a LIKELIHOOD pair score: each round
  merges the pair (a, b) maximizing  count(ab) / (count(a)·count(b))
  (the pair whose merge most increases a unigram LM's corpus
  likelihood), not the raw most-frequent pair. Merged tokens are PLAIN
  CONCATENATIONS (a||b), so every vocab entry is a real substring of
  corpus words — which is exactly what the encode side's
  substring-matching needs.

  ENCODE — greedy LONGEST-MATCH-FIRST: each word is consumed left to
  right, always taking the longest vocab piece that prefixes the
  remaining suffix; a position with no matching piece makes the whole
  word UNK (the BERT [UNK] contract). Note this is NOT merge-order
  application (BPE) and NOT minimal-cost segmentation (unigram
  Viterbi): the three families genuinely differ on the same corpus.

Representation reuses llm/bpe.py's delimited-string form over the
CHARACTERS of each distinct word (the unigram family's word-level
dictionary posture: train/encode cost scales with DISTINCT words, not
occurrences; occurrence weights ride along as counts):

    SEP + c1 + SEP SEP + c2 + SEP ... + cN + SEP        (SEP = 0x1f)

so one merge round is one built-in ``replace`` per the invariant proof
in llm/bpe.py — except the replacement re-emits ``a || b`` with no
internal marker.

Score determinism (mirrored by the SQL twin): the score is computed as
CAST(pair_ct AS DOUBLE) / (CAST(cnt_a AS DOUBLE) * CAST(cnt_b AS
DOUBLE)). Both operands are exact integers; the product is exact in
IEEE-754 while cnt_a*cnt_b < 2^53 and the division is correctly rounded
on both engines, so the comparison order is bit-identical JVM vs
DuckDB. At the gate SFs weighted char counts are « 2^26 so the bound
holds with orders of magnitude to spare; at true corpus scale switch
the comparison to DECIMAL cross-multiplication (documented, not needed
here). Tie-break: score desc, then pair_ct desc, then (a, b) asc.

The greedy encode DP is an unrolled chained-named-column expression
(the llm/unigram.py::with_viterbi plan lesson: named per-level columns,
never nested subtrees): WP_MAX_WORD_LEN levels, each consuming >=1
char, each probing piece lengths longest-first against a broadcast
vocab map literal. Zero shuffles — encoding is a map pass, the 100 TB
posture; the vocab is the bounded collected artifact (alphabet chars +
one piece per merge round).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gmall_flink_spark.llm.bpe import BPE_SEP, delimited, _seq_tokens

#: merge rounds the flagship training query runs
WP_TRAIN_ROUNDS = 6
#: words longer than this are excluded from training AND encode stats
#: (the greedy DP unrolls one level per consumed piece; same cap and
#: same rationale as llm/unigram.py's UNIGRAM_MAX_WORD_LEN)
WP_MAX_WORD_LEN = 8


def word_char_seqs(words: DataFrame) -> DataFrame:
    """(word, wcount, s) over a (word, wcount) frame: the word's
    characters in the delimited-string sequence form. Map-only."""
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return words.select("word", "wcount", delimited(chars).alias("s"))


def wordpiece_train_state(
    words: DataFrame, rounds: int = WP_TRAIN_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """The full trainer state over a (word, wcount) frame:
    ``(merges, encoded)`` where ``merges`` is the ordered merge table
    ``(round, pair_a, pair_b, pair_ct, cnt_a, cnt_b)`` — counts weighted
    by word frequency — and ``encoded`` is the terminal
    (word, wcount, s) corpus with all merges applied.

    Per round: ONE bounded-key (a, b) shuffle for weighted bigram
    counts, one bounded-key token shuffle for weighted unigram counts,
    two broadcast joins to attach cnt_a/cnt_b, a deterministic top-1 by
    the likelihood score, and the map-only ``replace`` rewrite over
    localCheckpointed strings — the llm/bpe.py cost class plus one
    bounded shuffle. Early-stops like the BPE trainer when no bigram
    remains (the SQL twin mirrors with LEFT JOIN + CASE)."""
    seqs = word_char_seqs(words).localCheckpoint(eager=False)
    merges: DataFrame | None = None
    empty = words.sparkSession.createDataFrame(
        [],
        "round int, pair_a string, pair_b string, pair_ct bigint,"
        " cnt_a bigint, cnt_b bigint",
    )
    for i in range(1, rounds + 1):
        toks = seqs.select("wcount", _seq_tokens("s").alias("l"))
        singles = (
            toks.select("wcount", F.explode("l").alias("t"))
            .groupBy("t")
            .agg(F.sum("wcount").cast("bigint").alias("cnt"))
        )
        pairs = (
            toks.where(F.size("l") >= 2)
            .select(
                "wcount",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("l"), F.lit(1), F.size("l") - 1),
                        F.slice(F.col("l"), F.lit(2), F.size("l") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wcount").cast("bigint").alias("pair_ct"))
        )
        scored = (
            pairs.join(
                F.broadcast(singles.select(F.col("t").alias("a"), F.col("cnt").alias("cnt_a"))),
                "a",
            )
            .join(
                F.broadcast(singles.select(F.col("t").alias("b"), F.col("cnt").alias("cnt_b"))),
                "b",
            )
            .withColumn(
                "score",
                F.col("pair_ct").cast("double")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double")),
            )
        )
        top = (
            scored.orderBy(F.desc("score"), F.desc("pair_ct"), "a", "b")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        if top.isEmpty():  # no bigram left anywhere — further rounds are no-ops
            break
        merges_row = top.select(
            F.lit(i).alias("round"),
            F.col("a").alias("pair_a"),
            F.col("b").alias("pair_b"),
            "pair_ct",
            "cnt_a",
            "cnt_b",
        )
        merges = merges_row if merges is None else merges.unionByName(merges_row)
        seqs = (
            seqs.crossJoin(F.broadcast(top.select("a", "b")))
            .select(
                "word",
                "wcount",
                F.replace(
                    F.col("s"),
                    F.concat(
                        F.lit(BPE_SEP), F.col("a"),
                        F.lit(BPE_SEP + BPE_SEP),
                        F.col("b"), F.lit(BPE_SEP),
                    ),
                    # plain concat: the merged token IS the substring a||b
                    F.concat(F.lit(BPE_SEP), F.col("a"), F.col("b"), F.lit(BPE_SEP)),
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return (merges if merges is not None else empty), seqs


def collect_vocab(words: DataFrame, merges: DataFrame) -> dict[str, int]:
    """The bounded tokenizer artifact: vocab piece -> piece length.
    Alphabet = every distinct character of the in-cap training words
    (bounded by the character set, like llm/unigram.py's char floor);
    plus one ``pair_a || pair_b`` product per merge round. The ONE
    driver-side collect of the family — vocab-sized, never corpus-sized."""
    chars = (
        words.select(
            F.explode(
                F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
            ).alias("piece")
        )
        .distinct()
        .collect()
    )
    vocab = {r["piece"]: 1 for r in chars}
    for r in merges.select("pair_a", "pair_b").collect():
        piece = r["pair_a"] + r["pair_b"]
        vocab[piece] = len(piece)
    return vocab


def with_greedy_pieces(
    df: DataFrame, word_col: str, vocab: dict[str, int], out_col: str = "wp"
) -> DataFrame:
    """Append the struct (ok, pct, path) of ``word_col``'s greedy
    longest-match-first WordPiece segmentation: up to WP_MAX_WORD_LEN
    unrolled levels, each probing piece lengths longest-first via a
    map-literal membership test; a position with no matching piece makes
    the word UNK (ok = 0). path = SEP + piece + SEP + ... (0x1f), so the
    roundtrip proof replace(path, SEP, '') == word is one expression.
    Named per-level state columns (the with_viterbi plan lesson); zero
    shuffles — a pure map pass."""
    max_piece = max((len(p) for p in vocab), default=1)
    if vocab:
        vmap = F.create_map(
            *[F.lit(x) for k in sorted(vocab) for x in (k, len(k))]
        )
    else:
        vmap = F.create_map().cast("map<string,int>")
    df = df.withColumn("__wpv", vmap)
    word = F.col(word_col)
    df = df.withColumn(
        "__wp0",
        F.struct(
            F.lit(1).alias("pos"),  # next unconsumed position (1-based)
            F.lit(1).alias("ok"),
            F.lit(0).cast("bigint").alias("pct"),
            F.lit("").alias("path"),
        ),
    )
    for lvl in range(1, WP_MAX_WORD_LEN + 1):
        prev = F.col(f"__wp{lvl - 1}")
        remaining = F.length(word) - prev["pos"] + 1
        # longest-first: the first WHEN that fires is the greedy step
        step = F.lit(None).cast("int")
        for plen in range(1, min(max_piece, WP_MAX_WORD_LEN) + 1):
            probe = F.substring(word, prev["pos"], plen)
            hit = F.try_element_at(F.col("__wpv"), probe).isNotNull()
            step = F.when((remaining >= plen) & hit, F.lit(plen)).otherwise(step)
        df = df.withColumn(f"__wstep{lvl}", step)
        stepc = F.col(f"__wstep{lvl}")
        done_or_dead = (prev["ok"] == 0) | (prev["pos"] > F.length(word))
        piece = F.substring(word, prev["pos"], stepc)
        df = df.withColumn(
            f"__wp{lvl}",
            F.when(done_or_dead, prev)
            .when(
                stepc.isNull(),
                F.struct(
                    prev["pos"].alias("pos"),
                    F.lit(0).alias("ok"),
                    prev["pct"].alias("pct"),
                    prev["path"].alias("path"),
                ),
            )
            .otherwise(
                F.struct(
                    (prev["pos"] + stepc).alias("pos"),
                    F.lit(1).alias("ok"),
                    (prev["pct"] + F.lit(1).cast("bigint")).alias("pct"),
                    F.concat(prev["path"], F.lit(BPE_SEP), piece).alias("path"),
                )
            ),
        )
    last = F.col(f"__wp{WP_MAX_WORD_LEN}")
    # a word is OK only if every position was consumed
    out = F.struct(
        F.when((last["ok"] == 1) & (last["pos"] > F.length(word)), 1)
        .otherwise(0)
        .alias("ok"),
        last["pct"].alias("pct"),
        last["path"].alias("path"),
    )
    df = df.withColumn(out_col, out)
    drop = ["__wpv"] + [f"__wp{i}" for i in range(WP_MAX_WORD_LEN + 1)]
    drop += [f"__wstep{i}" for i in range(1, WP_MAX_WORD_LEN + 1)]
    return df.drop(*drop)
