"""Property-based equivalence (hypothesis): the custom operators vs a naive
in-Python oracle on generated inputs. The oracle-parity suite pins behavior
on the fixed testdata; these pin the operator *semantics* across the input
space — ties, empty sides, boundary values, duplicate keys."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gmall_flink_spark.operators.asof import asof_join
from gmall_flink_spark.operators.dedup import keep_first, keep_last
from gmall_flink_spark.operators.range_join import range_join

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_keys = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=20)


@given(
    rows=st.lists(st.tuples(_keys, _ts, st.integers(0, 99)), min_size=0, max_size=25)
)
@pytest.mark.slow
@_SETTINGS
def test_keep_first_last_match_python(spark, rows):
    df = spark.createDataFrame(rows or [(0, 0, 0)], "k long, ts long, v long")
    if not rows:
        df = df.limit(0)
    first = {r[0]: r for r in sorted(rows, key=lambda r: (r[1], r[2]), reverse=True)}
    last = {r[0]: r for r in sorted(rows, key=lambda r: (r[1], r[2]))}
    got_first = sorted(map(tuple, keep_first(df, ["k"], ["ts", "v"]).collect()))
    got_last = sorted(map(tuple, keep_last(df, ["k"], ["ts", "v"]).collect()))
    assert got_first == sorted(first.values())
    assert got_last == sorted(last.values())


@given(
    left=st.lists(st.tuples(_keys, _ts), min_size=0, max_size=15),
    right=st.lists(st.tuples(_keys, _ts, st.integers(0, 99)), min_size=0, max_size=15),
)
@pytest.mark.slow
@_SETTINGS
def test_asof_join_matches_python(spark, left, right):
    ldf = spark.createDataFrame(left or [(0, 0)], "k long, lts long")
    rdf = spark.createDataFrame(right or [(0, 0, 0)], "k long, rts long, pay long")
    if not left:
        ldf = ldf.limit(0)
    if not right:
        rdf = rdf.limit(0)
    out = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts", payload=["pay"])
    got = sorted(
        ((r["k"], r["lts"], r["pay"]) for r in out.select("k", "lts", "pay").collect()),
        key=repr,
    )
    expect = []
    for k, lts in left:
        cands = [(rts, pay) for rk, rts, pay in right if rk == k and rts <= lts]
        # operator contract: latest rts wins; among equal rts, max payload
        expect.append((k, lts, max(cands)[1] if cands else None))
    assert got == sorted(expect, key=repr)


@given(
    points=st.lists(st.integers(-30, 30), min_size=0, max_size=15),
    ranges=st.lists(
        st.tuples(st.integers(-30, 30), st.integers(0, 12)), min_size=0, max_size=8
    ),
)
@pytest.mark.slow
@_SETTINGS
def test_range_join_matches_cross_filter(spark, points, ranges):
    pdf = spark.createDataFrame([(float(p),) for p in points] or [(0.0,)], "x double")
    bands = [(i, float(lo), float(lo + w)) for i, (lo, w) in enumerate(ranges)]
    rdf = spark.createDataFrame(bands or [(0, 0.0, 0.0)], "band_id long, lo double, hi double")
    if not points:
        pdf = pdf.limit(0)
    if not ranges:
        rdf = rdf.limit(0)
    out = range_join(pdf, rdf, "x", "lo", "hi", bucket_width=5.0)
    got = sorted((r["x"], r["band_id"]) for r in out.select("x", "band_id").collect())
    expect = sorted(
        (float(p), i)
        for p in points
        for i, lo, hi in bands
        if lo <= p < hi
    )
    assert got == expect


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30
    )
)
@pytest.mark.slow
@_SETTINGS
def test_decimal_sum_is_partition_order_independent(spark, vals):
    """The money contract: decimal sums are exact regardless of partition
    count/order (the property FP doubles lack)."""
    cents = [(v,) for v in vals]
    one = spark.createDataFrame(cents, "c long").coalesce(1)
    many = spark.createDataFrame(cents, "c long").repartition(7)
    agg = lambda df: df.select(  # noqa: E731
        F.sum((F.col("c") / 100).cast("decimal(18,2)")).alias("s")
    ).collect()[0]["s"]
    assert agg(one) == agg(many)


@given(
    raws=st.lists(
        st.one_of(
            st.text(max_size=40),
            st.sampled_from(
                [
                    '{"database":"g","table":"t","type":"insert","ts":1,"data":{"a":"1"}}',
                    '{"table":null}',
                    '{"table":"t"}',
                    "[1,2,3]",
                    '{"table":"t","data":{"a":null}}',
                    "",
                ]
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
@pytest.mark.slow
@_SETTINGS
def test_envelope_parse_split_partitions_every_row(spark, raws):
    """P1 totality: for ANY input strings, parse_envelope_split never throws
    and every row lands in exactly one of (parsed, dead)."""
    from gmall_flink_spark.operators.cdc import parse_envelope_split

    df = spark.createDataFrame([(r,) for r in raws], "value string")
    ok, dead = parse_envelope_split(df)
    assert ok.count() + dead.count() == len(raws)


@pytest.mark.slow
@given(ns=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=20))
@_SETTINGS
def test_chunk_spans_cover_exactly_once_per_stride_window(spark, ns):
    """chunk_spans invariants across the input space: spans start at 0 and
    every stride boundary; each covers >=1 token within [0, n); the union
    of spans covers every token; consecutive spans overlap by exactly
    size - stride (except a truncated tail); no span is a subspan of its
    predecessor."""
    from gmall_flink_spark.llm.corpus import chunk_spans

    size, stride = 16, 12
    df = spark.createDataFrame([(n,) for n in ns], "n bigint")
    got = df.select(
        "n", chunk_spans(F.col("n"), size, stride).alias("spans")
    ).collect()
    for row in got:
        n, spans = row.n, [(sp["start"], sp["len"]) for sp in row.spans]
        if n == 0:
            assert spans == []
            continue
        assert spans[0][0] == 0
        covered = set()
        prev_end = None
        for start, ln in spans:
            assert 1 <= ln <= size
            assert start + ln <= n
            assert start % stride == 0
            if prev_end is not None:
                assert start + ln > prev_end  # never a strict subspan
            prev_end = start + ln
            covered.update(range(start, start + ln))
        assert covered == set(range(n))


# --- r6: exact set-similarity machinery -----------------------------------

_vocab = st.integers(min_value=0, max_value=9)


@given(
    docs=st.lists(
        st.sets(_vocab, min_size=1, max_size=8), min_size=2, max_size=12
    )
)
@pytest.mark.slow
@_SETTINGS
def test_prefix_filter_is_complete_at_threshold(spark, docs):
    """prefix_filter_candidates must contain EVERY pair at j >= 0.9 for
    arbitrary token sets (the AllPairs prefix lemma) — and the lossless
    ratio prune must keep exactly the thresholded pairs."""
    from gmall_flink_spark.llm.dedup import jaccard_pairs, prefix_filter_candidates

    rows = [
        (i, f"t{t}") for i, toks in enumerate(docs) for t in toks
    ]
    units = spark.createDataFrame(rows, "doc_id long, shingle string")
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_candidates(units, 9, 10).collect()
    }
    truth = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(docs[a] & docs[b])
            uni = len(docs[a] | docs[b])
            if 10 * inter >= 9 * uni:
                truth.add((a, b))
    assert truth <= cands, f"missed true pairs: {truth - cands}"
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(units, prefix_filter_candidates(units, 9, 10), ratio=(9, 10))
        .where(10 * F.col("inter") >= 9 * F.col("uni"))
        .collect()
    }
    assert verified == truth


@given(n=st.integers(min_value=1, max_value=10**15))
@_SETTINGS
def test_srp_auto_band_bits_contract(spark, n):
    """Self-sized SRP width: always a divisor of n_planes, >= 2 bands, and
    bucket-key space >= 2x the corpus whenever a valid divisor allows it."""
    from gmall_flink_spark.llm.similarity import srp_auto_band_bits

    bits = srp_auto_band_bits(n, 96)
    assert 96 % bits == 0 and bits <= 48
    if bits < 48:
        assert 2 ** bits >= 2 * n or bits == 48
        # minimality: the next-smaller divisor would under-size the space
        smaller = max(d for d in range(1, bits) if 96 % d == 0) if bits > 1 else None
        if smaller is not None:
            assert 2 ** smaller < 2 * n


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),           # doc_id
            st.sampled_from(["en", "fr", "zh"]),               # label
            st.lists(st.sampled_from(list("abcdefg")), min_size=1, max_size=6),
        ),
        min_size=2,
        max_size=18,
        unique_by=lambda d: d[0],
    )
)
@pytest.mark.slow
@_SETTINGS
def test_nb_quantized_scores_match_python(spark, docs):
    """The quantized-NB train/score loop vs an FP-FREE Python reference:
    floor(log2(n)) is computed as n.bit_length()-1 (pure integer), so any
    engine/reference disagreement would expose the one FP step the design
    claims is safe (log2 of an exact int off power boundaries). Verifies
    the full per-(doc, class) score table, not just the argmin."""
    from gmall_flink_spark.llm.classify import nb_priors, nb_score, nb_train

    train = [d for d in docs if d[0] % 2 == 1]
    score = [d for d in docs if d[0] % 2 == 0]
    if not train or not score:
        return

    # pure-integer reference
    cls_ct, cls_tot, doc_ct, vocab = {}, {}, {}, set()
    for _, lang, toks in train:
        doc_ct[lang] = doc_ct.get(lang, 0) + 1
        for t in toks:
            cls_ct[(lang, t)] = cls_ct.get((lang, t), 0) + 1
            cls_tot[lang] = cls_tot.get(lang, 0) + 1
            vocab.add(t)
    v = len(vocab)
    flog2 = lambda n: n.bit_length() - 1
    pr = {
        c: flog2(sum(doc_ct.values()) // doc_ct[c]) for c in doc_ct
    }
    expect = {}
    for doc_id, _, toks in score:
        for c in cls_tot:
            s, seen = 0, 0
            for t in toks:
                if t in vocab:
                    seen += 1
                    s += flog2((cls_tot[c] + v) // (cls_ct.get((c, t), 0) + 1))
            if seen:
                expect[(doc_id, c)] = s + pr[c]

    rows_ = [(i, lang, t) for i, lang, toks in docs for t in toks]
    toks_df = spark.createDataFrame(rows_, "doc_id long, label string, t string")
    tr = toks_df.where("doc_id % 2 = 1")
    ho = toks_df.where("doc_id % 2 = 0").drop("label")
    model = nb_train(tr, label_col="label")
    priors = nb_priors(
        spark.createDataFrame(
            [(i, l) for i, l, _ in train], "doc_id long, label string"
        ),
        label_col="label",
    )
    got = {
        (r["doc_id"], r["cls"]): r["total"]
        for r in nb_score(ho, model, priors).collect()
    }
    assert got == expect


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=5),
        min_size=0,
        max_size=14,
    ),
    max_group=st.sampled_from([2, 1000]),
)
@pytest.mark.slow
@_SETTINGS
def test_exact_fingerprint_pairs_match_python(spark, docs, max_group):
    """exact_fingerprint_pairs vs a naive oracle over the input space:
    token-SET identity (order/multiplicity ignored), full clique pairing
    at/under the cap, star-to-minimum above it, single-doc groups, and
    the documented empty-doc exclusion (no tokens → no fingerprint — the
    set-similarity families' shared convention, jaccard being 0/0
    there)."""
    from gmall_flink_spark.llm.dedup import exact_fingerprint_pairs

    df = spark.createDataFrame(
        list(enumerate(" ".join(d) for d in docs)) or [(0, "")],
        "doc_id long, text string",
    )
    if not docs:
        df = df.limit(0)
    groups: dict[frozenset, list[int]] = {}
    for i, d in enumerate(docs):
        if d:  # token-less docs carry no fingerprint (documented exclusion)
            groups.setdefault(frozenset(d), []).append(i)
    expect = set()
    for members in groups.values():
        if len(members) < 2:
            continue
        if len(members) <= max_group:
            expect |= {
                (a, b) for a in members for b in members if a < b
            }
        else:
            m0 = min(members)
            expect |= {(m0, b) for b in members if b != m0}
    got = {
        (r["a_id"], r["b_id"])
        for r in exact_fingerprint_pairs(df, max_group=max_group).collect()
    }
    assert got == expect


@given(
    prior=st.lists(st.text(alphabet="xyz", min_size=1, max_size=4), max_size=12),
    probe=st.lists(st.text(alphabet="xyz", min_size=1, max_size=4), max_size=12),
    m=st.sampled_from([16, 16384]),
)
@pytest.mark.slow
@_SETTINGS
def test_bloom_never_false_negative(spark, prior, probe, m):
    """The bloom membership contract over the input space, at both a
    saturating and a production geometry: every probed key that WAS
    inserted must read maybe_dup=1 — false positives are allowed (and
    expected at m=16), false negatives never."""
    from gmall_flink_spark.operators.sketch import bloom_build, bloom_probe

    pdf = spark.createDataFrame([(x,) for x in prior] or [("_",)], "f string")
    if not prior:
        pdf = pdf.limit(0)
    qdf = spark.createDataFrame([(x,) for x in probe] or [("_",)], "f string")
    if not probe:
        qdf = qdf.limit(0)
    bloom = bloom_build(pdf, "f", m=m)
    got = {r["f"]: r["maybe_dup"] for r in bloom_probe(qdf, "f", bloom, m=m).collect()}
    inserted = set(prior)
    for f in set(probe):
        if f in inserted:
            assert got[f] == 1, (f, m)
