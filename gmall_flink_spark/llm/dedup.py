"""Large-scale document deduplication (BASELINE north-star ops).

Four families, all built from declarative DataFrame ops with the portable
md5-based hash (functions/text.md5_long), so every stage is oracle-checkable
and shuffle-aware:

  exact        hash-groupBy on a fingerprint (one shuffle on the hash)
  minhash-LSH  shingle→minhash→band→bucket-join: candidate generation is
               a groupBy on (band, signature) — near-dup search without a
               quadratic cross join; the classic MMDS ch.3 construction
  ngram        inverted-index join on shingles; exact jaccard via integer
               arithmetic (no FP thresholds)
  simhash      per-bit signed tally from the bits of one token hash →
               16-bit signature in a single groupBy pass

Scale posture: everything is groupBy/join on hash keys. At 100 TB the
minhash path is the one that matters: its cost is O(docs × shingles × k)
map-side plus one shuffle per stage; candidate verification touches only
bucket-colliding pairs. No stage collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.functions.text import md5_long, tokenize


def doc_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    spread_input: bool = True,
) -> DataFrame:
    # spread first: the shingle/token explodes and their md5 hashing fuse
    # onto the scan stage, and the single-row-group test parquet plans that
    # scan as ONE task (sources/tables.py::spread — no-op on wide scans).
    # ``spread_input=False`` opts out for latency-sensitive callers whose
    # input is small by construction (streaming micro-batches: an exchange
    # per batch buys nothing when the batch is a few files of text).
    if spread_input:
        from gmall_flink_spark.sources.tables import spread

        docs = spread(docs, id_col)
    return docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks"))


def shingles_from_tokens(toked: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles from a pre-tokenized ``(doc_id, toks)``
    frame — the map-side half of ``word_shingles``, split out so callers
    holding a shared/checkpointed token stage (queries/llm_dedup._doc_toks)
    can derive shingles without re-scanning and re-tokenizing the corpus."""
    sh = F.transform(
        F.sequence(F.lit(0), F.size("toks") - n),
        lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
    )
    return (
        toked.where(F.size("toks") >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (exploded)."""
    return shingles_from_tokens(doc_tokens(docs), n)


def distinct_tokens(docs: DataFrame, spread_input: bool = True) -> DataFrame:
    return doc_tokens(docs, spread_input=spread_input).select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("shingle")
    )


#: modulus for the affine minhash family (prime, < 2^31 so every affine
#: product stays far inside int64 in both engines)
MINHASH_P = 1_000_000_007


def minhash_seed_hash(base: F.Column, seed: int) -> F.Column:
    """Universal-hash family member: h_s(x) = ((2s+1)·h(x) + s² + 7) mod P.
    One md5 per shingle feeds all k minhashes (the standard affine trick —
    k independent hashes without k hash computations)."""
    return ((2 * seed + 1) * base + (seed * seed + 7)) % MINHASH_P


def minhash_signatures(units: DataFrame, k: int = 12) -> DataFrame:
    """One minhash value per (doc, seed): min over the doc's shingles of the
    seeded hash. ``units`` = (doc_id, shingle) exploded frame.

    One-pass form: the shingle is md5-hashed ONCE, the k seeded variants are
    affine transforms of that base (minhash_seed_hash), and all k mins are
    aggregates of a single groupBy(doc_id) (map-side partials, ONE shuffle
    of k-column doc rows); the tiny wide row then explodes to the
    (doc_id, seed, mh) long format."""
    hashed = units.select(
        "doc_id", (md5_long(F.col("shingle")) % MINHASH_P).alias("_h")
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(minhash_seed_hash(F.col("_h"), s)).alias(f"_m{s}") for s in range(k)]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(s).cast("int").alias("seed"), F.col(f"_m{s}").alias("mh"))
            for s in range(k)
        ]
    )
    return mins.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.seed").alias("seed"), F.col("p.mh").alias("mh")
    )


def lsh_bands(signatures: DataFrame, rows_per_band: int) -> DataFrame:
    """Band the signature matrix: band signature = the band's minhashes in
    seed order, joined into one string key."""
    banded = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("bigint"))
    sig = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "mh"))),
            lambda s: s["mh"].cast("string"),
        ),
        ",",
    )
    return banded.groupBy("doc_id", "band").agg(sig.alias("band_sig"))


def lsh_candidates(
    bands: DataFrame, max_bucket: int | None = None, oversize: str = "drop"
) -> DataFrame:
    """Distinct candidate pairs: docs sharing any band bucket.

    ``max_bucket`` is the degenerate-bucket guard (essential at 100 TB): a
    band signature shared by B docs yields B²/2 pairs — at sf0.1 sixteen
    >200-member buckets hold 15.2M of 15.3M raw pairs. ``oversize`` picks
    what happens to buckets above the cap:

    * ``"drop"`` — skip them entirely (classic LSH practice when oversized
      buckets are stop-vocabulary collisions). CAVEAT this corpus exposed
      (see lsh_recall_audit): when a genuine near-dup FAMILY is larger
      than the cap, every one of its band buckets is oversized, so drop
      mode loses the whole family (pair recall collapses to the sub-cap
      clusters).
    * ``"star"`` — replace the B²/2 within-bucket pairs with B star edges
      to the bucket's smallest doc_id. Linear in bucket size, still
      verified downstream, and it preserves CONNECTIVITY: a homogeneous
      family stays one connected component through its representative, so
      clustering-grade dedup recovers the family at O(B) cost. Pair-level
      listings remain a subset of the true pair set (documented).
    """
    if oversize not in ("drop", "star"):
        raise ValueError(f"unknown oversize mode {oversize!r}")
    if max_bucket is not None:
        stats = bands.groupBy("band", "band_sig").agg(
            F.count(F.lit(1)).alias("_n"), F.min("doc_id").alias("_rep")
        )
        small = bands.join(
            stats.where(F.col("_n") <= max_bucket).select("band", "band_sig"),
            ["band", "band_sig"],
        )
        star = None
        if oversize == "star":
            big = stats.where(F.col("_n") > max_bucket).select(
                "band", "band_sig", "_rep"
            )
            star = (
                bands.join(big, ["band", "band_sig"])
                .where(F.col("doc_id") != F.col("_rep"))
                .select(
                    F.col("_rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
                )
            )
        bands = small
    else:
        star = None
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    if star is not None:
        # star reps are bucket minima, so doc_a < doc_b holds there too
        pairs = pairs.unionAll(star)
    return pairs.distinct()


def lsh_candidates_two_level(
    signatures: DataFrame,
    rows_per_band: int,
    fine_rows_per_band: int,
    max_bucket: int,
) -> DataFrame:
    """Two-level LSH candidate generation — the bounded-cost answer to
    heterogeneous mega-buckets (the regime lsh_recall_audit exposed:
    low-entropy vocabularies collapse most docs into a few giant coarse
    buckets, and a flat cap then loses every family buried inside them).

    Level 1: band at ``rows_per_band``; buckets <= ``max_bucket`` pair
    all-vs-all as usual. Level 2: docs from OVER-cap coarse buckets are
    re-banded at ``fine_rows_per_band`` (more rows per band = higher
    signature entropy = smaller buckets) using the SAME signature matrix
    (no re-hashing), and pair within fine buckets under the same cap;
    fine buckets still over the cap are dropped (documented residual).

    Recall at j: per coarse band j^rows, per fine band j^fine_rows — at
    j=0.9 with 3-row coarse / 6-row fine bands, a family in a mega-bucket
    retains 1-(1-0.9^6)^bands_fine ≈ 0.78 pair recall instead of 0.
    Cost stays bounded: level 2 touches only mega-bucket members, and
    every pairing join is capped."""
    coarse = lsh_bands(signatures, rows_per_band)
    stats = coarse.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("_n"))
    small = coarse.join(
        stats.where(F.col("_n") <= max_bucket).select("band", "band_sig"),
        ["band", "band_sig"],
    )
    refined_docs = (
        coarse.join(
            stats.where(F.col("_n") > max_bucket).select("band", "band_sig"),
            ["band", "band_sig"],
        )
        .select("doc_id")
        .distinct()
    )
    fine = lsh_bands(signatures, fine_rows_per_band).join(refined_docs, "doc_id")
    fstats = fine.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("_n"))
    fsmall = fine.join(
        fstats.where(F.col("_n") <= max_bucket).select("band", "band_sig"),
        ["band", "band_sig"],
    )

    def _pairs(banded: DataFrame) -> DataFrame:
        a, b = banded.alias("a"), banded.alias("b")
        return a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))

    return _pairs(small).unionAll(_pairs(fsmall)).distinct()


def prefix_filter_candidates(
    units: DataFrame, q: int, scale: int
) -> DataFrame:
    """EXACT set-similarity candidate generation by prefix filtering (the
    AllPairs construction, Bayardo/Ma/Srikant WWW'07): order the token
    universe globally by (document frequency asc, token asc) and index
    only each doc's PREFIX — its ``n - ceil(q*n/scale) + 1`` rarest
    tokens. Any pair with jaccard >= q/scale must share a prefix token
    (j >= t forces |A∩B| >= t*max(|A|,|B|), which cannot fit in either
    suffix), so the inverted-index join over prefixes alone has 100%
    recall at the threshold — no probabilistic misses, unlike MinHash
    banding (lsh_recall_audit measures exactly that gap on low-entropy
    corpora where minhash signatures collapse).

    Two further LOSSLESS prunes run inside the index join (the PPJoin
    refinements, Xiao et al. WWW'08, applied per shared-token occurrence
    before the distinct):

    * length filter — ``scale*min(na,nb) >= q*max(na,nb)`` (j <= min/max);
    * positional filter — a shared token at ranks (ra, rb) bounds the
      overlap by ``min(na-ra, nb-rb) + 1``, which must reach the required
      overlap ``alpha = ceil(q*(na+nb)/(q+scale))`` (from
      ``i*(q+scale) >= q*(na+nb)``). Both bounds are upper bounds on the
      true overlap, so every true pair survives every occurrence.

    Scale: each doc contributes ~n/scale*(scale-q)+1 prefix tokens (4 of
    30 at t=0.9); buckets are keyed by each doc's RAREST tokens, so the
    frequency ordering itself is the bucket-size guard (a token appears
    in prefix position only for docs where few rarer tokens exist — the
    classic AllPairs cost argument), and the two prunes cut the pair
    stream before the distinct using only per-row metadata. The rank
    window is per-doc (partitioned, never global); the df table rides a
    shingle-keyed shuffle the verify join needs anyway."""
    from pyspark.sql import Window

    df_tab = units.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    u = units.join(df_tab, "shingle")
    w = Window.partitionBy("doc_id").orderBy("_df", "shingle")
    wn = Window.partitionBy("doc_id")
    ranked = u.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    p = F.col("_n") - F.expr(f"(_n * {q} + {scale - 1}) div {scale}") + 1
    prefix = ranked.where(F.col("_rn") <= p).select("doc_id", "shingle", "_rn", "_n")
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "shingle",
        F.col("_rn").alias("_ra"), F.col("_n").alias("_na"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "shingle",
        F.col("_rn").alias("_rb"), F.col("_n").alias("_nb"),
    )
    alpha = F.expr(f"({q} * (_na + _nb) + {q + scale - 1}) div {q + scale}")
    pos_ub = F.least(F.col("_na") - F.col("_ra"), F.col("_nb") - F.col("_rb")) + 1
    return (
        a.join(b, "shingle")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (scale * F.least("_na", "_nb") >= q * F.greatest("_na", "_nb"))
            & (pos_ub >= alpha)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    units: DataFrame,
    pairs: DataFrame | None = None,
    max_df: int | None = None,
    ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact jaccard for doc pairs sharing >= 1 shingle (inverted-index
    join); optionally restricted to given candidate pairs. Counts stay
    integers — thresholds compare ``scale*inter >= q*union`` exactly.

    Scale guards (both essential at 100 TB):

    * ``max_df`` caps shingle document frequency before the join: one
      stop-phrase shingle shared by millions of docs makes the unrestricted
      inverted-index self-join quadratic in that bucket. With the cap, the
      result is jaccard over *discriminative* shingles (df <= max_df) —
      both sizes and intersections use the capped shingle set, so the
      measure stays a true jaccard of the filtered sets.
    * with ``pairs``, the index join drives off the candidate list (LSH
      buckets) instead of self-joining the full index, so the cost is
      O(candidate pairs x shingles-per-doc), not O(index²).
    * ``ratio=(q, scale)`` is the LOSSLESS length-ratio prune for callers
      that will threshold at ``scale*inter >= q*union``: since
      j(a,b) <= min(|a|,|b|) / max(|a|,|b|), a candidate pair failing
      ``scale*min >= q*max`` can never reach the threshold, so it is
      dropped BEFORE the expensive unit join using only the tiny per-doc
      size table. A provable no-false-negative prune (the standard MinHash
      verify optimization); pairs that survive are scored exactly, so
      thresholded output is identical with or without it.
    """
    if max_df is not None:
        keep = (
            units.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        units = units.join(keep, "shingle")
    sizes = units.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if pairs is not None:
        if ratio is not None:
            q, scale = ratio
            pa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("_na"))
            pb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("_nb"))
            pairs = (
                pairs.join(pa, "doc_a")
                .join(pb, "doc_b")
                .where(
                    scale * F.least("_na", "_nb") >= q * F.greatest("_na", "_nb")
                )
                .select("doc_a", "doc_b")
            )
        a_units = units.select(F.col("doc_id").alias("doc_a"), "shingle").join(
            pairs, "doc_a"
        )
        b_units = units.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            a_units.join(b_units, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        a, b = units.alias("a"), units.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .select("doc_a", "doc_b", "inter", "uni")
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 20,
    shortcut: bool = False,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the final
    step of near-dup dedup (pair graph → clusters → keep one representative
    per cluster). Pure DataFrame iteration: each round every node adopts the
    minimum label among itself and its neighbours; converged when no label
    changes (checked with one count per round — driver control flow only,
    data never leaves executors; same shape as k-means Lloyd iteration).

    Rounds needed = graph diameter (near-dup clusters are shallow: dup
    groups are cliques or short chains). One shuffle per round on the node
    id. Returns (doc_id, component) with component = min doc_id reachable.

    ``shortcut=True`` adds pointer shortcutting (path halving: after the
    neighbour step each node also adopts ITS LABEL'S label — labels are
    node ids, so the label table doubles as a parent-pointer table) at the
    cost of one extra labels⋈labels join per round. Reach doubles per
    round, so convergence needs O(log diameter) rounds instead of
    O(diameter) — the right mode for chain-shaped graphs (sequential-id
    entity matching), while plain propagation stays cheapest for the
    shallow clique-ish graphs near-dup dedup produces. Same result either
    way (pinned by test_connected_components_shortcut_equivalence).

    ``edges`` = (doc_a, doc_b) undirected; ``nodes`` defaults to the docs
    appearing in any edge (derived WITHOUT re-running the edge pipeline).
    """
    # materialize the edge list once: the loop joins it every round, and a
    # separately-derived nodes frame would re-execute the whole upstream
    # pipeline (LSH + jaccard) a second time
    e = edges.localCheckpoint(eager=True)
    sym = e.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionAll(
        e.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    if nodes is None:
        nodes = sym.select(F.col("src").alias("doc_id")).distinct()
    labels = nodes.select("doc_id", F.col("doc_id").alias("component")).localCheckpoint(
        eager=True
    )
    converged = False
    for _ in range(max_rounds):  # diameter bound; near-dup graphs converge in 2-3
        nbr_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component").alias("nbr"))
        )
        updated = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.col("component").alias("_old"),
                F.least(F.col("component"), F.coalesce("nbr", F.col("component"))).alias(
                    "component"
                ),
            )
        )
        if shortcut:
            m = labels.select(
                F.col("doc_id").alias("_k"), F.col("component").alias("_v")
            )
            updated = updated.join(
                m, updated.component == m._k, "left"
            ).select(
                "doc_id",
                "_old",
                # L(L(v)) <= L(v) always (labels only decrease and L(x) <= x)
                F.coalesce("_v", "component").alias("component"),
            )
        updated = updated.select(
            "doc_id",
            "component",
            (F.col("component") < F.col("_old")).alias("_chg"),
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.where(F.col("_chg")).limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        # silent fall-through would return WRONG labels (a chain longer
        # than max_rounds splits into multiple components and dedup keeps
        # extra "representatives") — fail loudly; callers raise the bound
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; the graph has a component with larger diameter — "
            "raise max_rounds"
        )
    return labels


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Per-doc simhash, one-pass: each distinct token is hashed ONCE
    (md5_long) and every bit-b vote (±1) is derived from bit b of that hash
    by shift/mask, so the whole signature is a single groupBy(doc_id) with
    ``bits`` sum aggregates — one shuffle with map-side partials, no ×bits
    row expansion (the classic Charikar construction, vectorized)."""
    toks = distinct_tokens(docs).select("doc_id", md5_long(F.col("shingle")).alias("_h"))
    votes = [
        F.sum(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_t{b}")
        for b in range(bits)
    ]
    tallies = toks.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.col(f"_t{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
    return tallies.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int,
    band_bits: int,
    max_bucket: int,
    ham_max: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Banded hamming-ball pairing over any signature table: split each
    signature into ``bands`` x ``band_bits`` values, bucket-join on
    (keys..., band, value) with degenerate buckets above ``max_bucket``
    dropped, verify candidates at exact hamming <= ``ham_max`` (bit_count
    of xor). Pigeonhole: a pair within hamming < bands shares at least one
    exact band, so the index has no false negatives while ham_max < bands.
    ``keys`` scope the pairing (e.g. per media kind). The ONE banding/
    verify implementation behind text SimHash pairing and media
    perceptual-hash pairing. Returns (keys..., a_id, b_id, hamming)."""
    mask = (1 << band_bits) - 1
    band_vals = F.array(
        *[
            F.shiftright(sig_col, b * band_bits).bitwiseAND(F.lit(mask)).cast("bigint")
            for b in range(bands)
        ]
    )
    k = list(keys)
    exploded = sig.select(
        *k, id_col, sig_col, F.posexplode(band_vals).alias("band", "bval")
    )
    bucket_key = [*k, "band", "bval"]
    keep = (
        exploded.groupBy(*bucket_key)
        .agg(F.count(F.lit(1)).alias("sz"))
        .where(F.col("sz") <= max_bucket)
        .select(*bucket_key)
    )
    capped = exploded.join(keep, bucket_key)
    a = capped.select(
        *bucket_key, F.col(id_col).alias("a_id"), F.col(sig_col).alias("a_sig")
    )
    b = capped.select(
        *bucket_key, F.col(id_col).alias("b_id"), F.col(sig_col).alias("b_sig")
    )
    cand = (
        a.join(b, bucket_key)
        .where(F.col("a_id") < F.col("b_id"))
        .select(*k, "a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.expr("a_sig ^ b_sig")).cast("bigint")
    ).where(F.col("hamming") <= ham_max).select(*k, "a_id", "b_id", "hamming")
