"""Exact substring-span deduplication — the ExactSubstr family of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"): find every token span of >= W tokens whose text occurs more
than once in the corpus and report the merged duplicated intervals per
document. The remaining canonical training-data dedup mode next to the
suite's exact-hash / MinHash-LSH / SimHash / n-gram-Jaccard / embedding
families (no gmall-flink counterpart — this extends the LLM pipeline
surface, not SURVEY §2).

Spark-first re-expression: the paper's single-node algorithm builds a
suffix array over the concatenated corpus — at 100 TB that is a global
sort of every suffix, which no cluster materializes. The distributed
equivalent is fixed-width W-gram inversion: every duplicated span of
length >= W is exactly a run of duplicated W-grams, so

1. explode each doc into (pos, W-gram) rows — map-only JVM
   ``transform``/``slice``/``explode``, no Python;
2. hash-aggregate grams with occurrence >= min_occ — ONE shuffle with
   map-side partials (the corpus-sized stage);
3. left-semi join positions to the duplicated gram set — AQE broadcasts
   it when small (real corpora: dup grams are a thin tail);
4. per-doc sort + equal-width interval merge in one ``aggregate`` fold —
   ONE shuffle on doc_id; the fold is a JVM higher-order function.

Exactness: grams are compared exactly, so there are no false-positive
spans (with ``hashed=True`` a 64-bit xxhash collision could over-mark at
probability ~n²/2^65 — the production trade for 8-byte shuffle keys
instead of ~W-token strings; the DuckDB oracle groups the strings
themselves, so gate parity also certifies collision-freedom at gate SF).
Spans shorter than W are out of scope by definition: W IS the minimum
duplicated-span threshold, the paper's 50-token knob.

Streaming posture: gram occurrence counts are algebraic, so the corpus
index is maintainable per micro-batch through the bucketed rollup sink
(sinks/rollup.py) as docs stream in — pinned by
test_streaming_substr_gram_index_equals_batch; the per-doc span merge is
then a map-side pass over each new batch against the maintained
duplicated-gram set.

Interval semantics (mirrored bit-for-bit by the SQL twin): positions are
sorted per doc; all intervals are [pos, pos+W) of equal width, so the
running merged end is prev_pos + W and a NEW span starts exactly when
pos - prev_pos > W (touching intervals merge). Per-span coverage is
max(pos) + W - min(pos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: minimum duplicated-span width in tokens (Lee et al. use 50 BPE tokens
#: on real corpora; testdata docs are 10-100 whitespace tokens, so the
#: gate pins a width that can actually fire there)
SUBSTR_W = 8

#: a gram is "duplicated" at >= this many corpus-wide occurrences
#: (2 = the paper's any-second-occurrence rule; within-doc repeats count)
SUBSTR_MIN_OCC = 2


def position_grams(
    toked: DataFrame, w: int = SUBSTR_W, hashed: bool = True
) -> DataFrame:
    """(doc_id, n_toks, pos, gram_key) for every token position
    0..len-w of a pre-tokenized ``(doc_id, toks)`` frame. Map-only: the
    per-position slice+join and (optionally) xxhash64 fuse onto the
    token scan inside whole-stage codegen."""
    pg = F.transform(
        F.sequence(F.lit(0), F.size("toks") - w),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.array_join(F.slice("toks", i + 1, w), " ").alias("gram"),
        ),
    )
    out = (
        toked.where(F.size("toks") >= w)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            F.explode(pg).alias("pg"),
        )
    )
    key = F.xxhash64("pg.gram") if hashed else F.col("pg.gram")
    return out.select(
        "doc_id", "n_toks", F.col("pg.pos").alias("pos"), key.alias("gram_key")
    )


def gram_index(pg: DataFrame, min_occ: int = SUBSTR_MIN_OCC) -> DataFrame:
    """(gram_key, keeper) for every duplicated gram: the occurrence count
    gate plus the globally minimal (doc_id, pos) occurrence, in ONE hash
    aggregation (map-side combine) — membership serves the span report,
    the keeper serves the cut plan. At 100 TB this is the dominant
    shuffle and it moves (key, partial count+min) pairs, never the
    positions; callers running several substring queries in one session
    memoize it (queries/llm_dedup._substr_index) so the corpus-wide agg
    is paid once."""
    return (
        pg.groupBy("gram_key")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.min(F.struct("doc_id", "pos")).alias("keeper"),
        )
        .where(F.col("occ") >= min_occ)
        .select("gram_key", "keeper")
    )


def duplicated_keys(pg: DataFrame, min_occ: int = SUBSTR_MIN_OCC) -> DataFrame:
    """Gram keys occurring >= min_occ times corpus-wide — the inverted
    index's duplicated tail (membership projection of ``gram_index``)."""
    return gram_index(pg, min_occ=min_occ).select("gram_key")


def merged_intervals(positions: DataFrame, w: int) -> DataFrame:
    """Merge a per-doc position set into maximal [pos, pos+w) intervals —
    one doc_id shuffle, then the equal-width merge as a JVM ``aggregate``
    fold over the sorted positions (docstring contract: running end is
    prev pos + w, a new span starts iff pos clears it).

    Input (doc_id, n_toks, pos); returns (doc_id, n_toks, pos_ct,
    span_ct, covered_ct). Per-doc arrays are bounded by doc length — the
    same everything-about-one-doc-fits-in-memory contract every
    tokenizer in the suite already assumes."""
    per_doc = positions.groupBy("doc_id").agg(
        F.max("n_toks").alias("n_toks"),
        F.count(F.lit(1)).alias("pos_ct"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    zero = F.lit(0).cast("long")
    merged = F.aggregate(
        "ps",
        F.struct(
            F.lit(-1).cast("long").alias("end"),
            zero.alias("spans"),
            zero.alias("covered"),
        ),
        lambda acc, p: F.struct(
            F.greatest(acc["end"], p + w).alias("end"),
            (
                acc["spans"]
                + F.when(p > acc["end"], F.lit(1)).otherwise(F.lit(0))
            ).alias("spans"),
            (
                acc["covered"]
                + F.least(F.lit(w).cast("long"), p + w - acc["end"])
            ).alias("covered"),
        ),
    )
    return (
        per_doc.withColumn("_m", merged)
        .select(
            "doc_id",
            "n_toks",
            "pos_ct",
            F.col("_m.spans").alias("span_ct"),
            F.col("_m.covered").alias("covered_ct"),
        )
    )


def dup_span_stats(
    toked: DataFrame,
    w: int = SUBSTR_W,
    min_occ: int = SUBSTR_MIN_OCC,
    hashed: bool = True,
    index: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-span report: docs owning >= 1 duplicated
    W-gram, with their duplicated positions merged into maximal intervals.

    Returns (doc_id, n_toks, dup_pos_ct, span_ct, dup_token_ct):
    dup_pos_ct = duplicated gram positions, span_ct = merged intervals,
    dup_token_ct = tokens covered by the union of intervals — the mass
    ExactSubstr would touch (every occurrence counted; see
    ``cut_plan`` for the keep-one-copy action).

    ``index`` injects a pre-built (usually memoized) ``gram_index`` frame
    so sibling queries share the corpus-wide gram aggregation; it must
    have been built with the same (w, min_occ, hashed) contract."""
    pg = position_grams(toked, w=w, hashed=hashed)
    idx = index if index is not None else gram_index(pg, min_occ=min_occ)
    dpos = pg.join(idx.select("gram_key"), "gram_key", "leftsemi")
    return merged_intervals(dpos, w).select(
        "doc_id",
        "n_toks",
        F.col("pos_ct").alias("dup_pos_ct"),
        "span_ct",
        F.col("covered_ct").alias("dup_token_ct"),
    )


def cut_positions(pg: DataFrame, index: DataFrame) -> DataFrame:
    """Non-canonical occurrences of duplicated grams — the keep-one-copy
    rule: per duplicated gram, ``index``'s keeper (the globally minimal
    (doc_id, pos) occurrence) is the kept canonical copy; every other
    occurrence is a cut position. Same (usually broadcast) join shape as
    the span report plus the 16-byte keeper struct per dup gram."""
    return (
        pg.join(index, "gram_key")
        .where(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
        .select("doc_id", "n_toks", "pos")
    )


def cut_plan(
    toked: DataFrame,
    w: int = SUBSTR_W,
    min_occ: int = SUBSTR_MIN_OCC,
    hashed: bool = True,
    index: DataFrame | None = None,
) -> DataFrame:
    """The ExactSubstr ACTION: per document, the merged intervals the
    keep-one-copy rule would cut (``cut_positions`` → interval merge).
    Returns (doc_id, n_toks, cut_pos_ct, cut_span_ct, cut_token_ct,
    kept_token_ct) for docs with >= 1 cut position. The canonical copy
    of every duplicated span survives somewhere in the corpus by
    construction; a keeper doc may still lose OVERLAPPING positions
    whose own grams are canonical elsewhere — inherent to span-level
    keep-one-copy (the paper cuts exact ranges the same way).

    ``index`` as in ``dup_span_stats``: inject the memoized
    ``gram_index`` so siblings share the corpus-wide aggregation."""
    pg = position_grams(toked, w=w, hashed=hashed)
    idx = index if index is not None else gram_index(pg, min_occ=min_occ)
    return merged_intervals(cut_positions(pg, idx), w).select(
        "doc_id",
        "n_toks",
        F.col("pos_ct").alias("cut_pos_ct"),
        F.col("span_ct").alias("cut_span_ct"),
        F.col("covered_ct").alias("cut_token_ct"),
        (F.col("n_toks") - F.col("covered_ct")).alias("kept_token_ct"),
    )
