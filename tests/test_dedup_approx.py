"""HLL bound check for the approx-UV mode (not oracle-checkable: an
approximation has no deterministic SQL twin, so it lives here instead of
the driver registry)."""

from __future__ import annotations

from gmall_flink_spark.queries.dedup import uv_daily_approx
from tests.conftest import SF_ORACLE


def test_uv_daily_approx_within_rsd_bound(spark):
    rows = uv_daily_approx(spark, SF_ORACLE).collect()
    assert rows, "expected at least one day of UV"
    for r in rows:
        # approx_count_distinct(rsd=0.01); allow 5x slack on the standard
        # deviation — HLL++ error is probabilistic, not a hard cap.
        assert abs(r.uv_approx - r.uv_exact) <= max(5, 0.05 * r.uv_exact), (
            f"{r.cur_date}: approx {r.uv_approx} vs exact {r.uv_exact}"
        )


def test_uv_daily_kmv_within_error_bound(spark):
    """Unlike HLL, the KMV sketch (uv_daily_kmv, oracle-checked in the
    registry) is deterministic — pin its relative error at ~2 sigma of the
    1/sqrt(k) KMV bound (k=64 -> 12.5% sigma, cap 30%)."""
    from gmall_flink_spark.queries.dedup import uv_daily_kmv

    rows = uv_daily_kmv(spark, SF_ORACLE).collect()
    assert rows, "expected at least one day of UV"
    for r in rows:
        assert abs(r.kmv_ct - r.exact_ct) <= max(5, 0.30 * r.exact_ct), (
            f"{r.cur_date}: kmv {r.kmv_ct} vs exact {r.exact_ct}"
        )


def test_length_ratio_prune_is_lossless_at_threshold(spark):
    """jaccard_pairs(ratio=(9,10)) must keep EXACTLY the pairs that clear
    j >= 0.9 — the prune's no-false-negative proof (j <= min/max sizes)
    checked against the unpruned verify on real candidates, plus evidence
    the prune actually removes candidate work before the unit join."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.llm.dedup import (
        jaccard_pairs,
        lsh_bands,
        lsh_candidates,
        minhash_signatures,
    )
    from gmall_flink_spark.queries.llm_dedup import (
        LSH_MAX_BUCKET,
        MINHASH_K,
        ROWS_PER_BAND,
        _doc_toks,
    )

    units = _doc_toks(spark, "/root/testdata/sf0.01").select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("shingle")
    )
    cands = lsh_candidates(
        lsh_bands(minhash_signatures(units, MINHASH_K), ROWS_PER_BAND),
        max_bucket=LSH_MAX_BUCKET,
    ).localCheckpoint(eager=True)

    def verified(jac):
        return sorted(
            map(
                tuple,
                jac.where(10 * F.col("inter") >= 9 * F.col("uni"))
                .select("doc_a", "doc_b", "inter", "uni")
                .collect(),
            )
        )

    full = jaccard_pairs(units, cands)
    pruned = jaccard_pairs(units, cands, ratio=(9, 10))
    assert verified(pruned) == verified(full)
    # the prune must actually drop scored candidates (not be a no-op here)
    assert pruned.count() < full.count()
