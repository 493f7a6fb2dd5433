#!/usr/bin/env python3
"""sf1-scale DEDUP RECALL + component-agreement evidence (VERDICT r12
task 1): the sampled-exact pair-graph audits — lsh_recall_audit,
dedup_allpairs_exact, dedup_components_exact — run against the SAME
~sf1 construction as scripts/sf1_correctness_sample.py (10 id-distinct
token-salted document replicas, ~600k docs), each with the
driver-identical DuckDB oracle comparison, and their VALUES recorded:
this is the round's independent evidence that the LSH index quality and
the exact-graph closure measured at sf0.01 hold a decade up.

On top of the three parity rows, the script computes the
exact-vs-engine COMPONENT AGREEMENT on the audit sample — a pair-level
Rand-style statistic between the production LSH->verify->components
clustering (queries/llm_dedup._components) and the exact prefix-filter
closure (_sample_components), restricted to the deterministic
1-in-AUDIT_MOD sample:

  - co-membership pair counts are computed ARITHMETICALLY from group
    sizes (sum of C(n,2) over components, and over the (engine, exact)
    contingency cells) — never by materializing pairs, so the stat is
    computable at any scale;
  - docs absent from a mapping count as singletons (coalesce to their
    own doc_id), contributing zero pairs;
  - reported: engine_pairs, exact_pairs, both_pairs (intersection),
    jaccard_x10000 of the two co-membership relations, and the
    engine-side recall of exact co-membership
    (both_pairs / exact_pairs, x10000).

Round 14 additions: the production pair rule now unions the
exact-fingerprint pre-pass (VERDICT r13 weak #1), so the lsh_recall_audit
row is expected to read exact-class recall = total; and the script
additionally MEASURES the candidate-rule ALTERNATIVE the near-class
posture decision needs (VERDICT r13 task 2) — the star fallback for
still-over-cap fine buckets (lsh_candidates_two_level(oversize_fine=
"star")): verified-pair recall per class, wall cost, and component-level
agreement with the exact closure, all at the same 10× construction.

Usage: python scripts/sf1_recall_audit.py [K] [round_tag]  (default 10 r14)
Writes RECALL_SF1_{round_tag}.json (referenced from SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))

AUDITS = ["lsh_recall_audit", "dedup_allpairs_exact", "dedup_components_exact"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tag = sys.argv[2] if len(sys.argv) > 2 else "r14"
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import duckdb
    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as entry
    from oracle_harness import _norm_pdf
    from scaling_probe import build_distinct_documents, build_scaled_dir

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sf1-recall-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    scaled = build_scaled_dir(base, k)
    build_distinct_documents(spark, scaled, base, k)

    def run_oracle_scaled(sql: str):
        con = duckdb.connect()
        p = os.path.join(scaled, "documents.parquet")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'"
        )
        try:
            return con.execute(sql).df()
        finally:
            con.close()

    queries, oracle = entry.queries(), entry.oracle_sql()
    results: dict[str, dict] = {}
    fails = 0
    t_start = time.time()
    for i, name in enumerate(AUDITS):
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "values": None, "err": None, "spark_sec": None, "oracle_sec": None}
        try:
            t0 = time.time()
            s_pdf = queries[name](spark, scaled).toPandas()
            rec["spark_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            o_pdf = run_oracle_scaled(oracle[name])
            rec["oracle_sec"] = round(time.time() - t0, 1)
            rec["rows_match"] = len(s_pdf) == len(o_pdf)
            rec["schema_match"] = sorted(s_pdf.columns) == sorted(o_pdf.columns)
            rec["hash_match"] = (
                rec["rows_match"]
                and rec["schema_match"]
                and _norm_pdf(s_pdf) == _norm_pdf(o_pdf)
            )
            # the evidence itself: the audit's value rows, committed
            rec["values"] = json.loads(s_pdf.to_json(orient="records"))
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
        ok = rec["err"] is None and bool(rec["hash_match"])
        fails += 0 if ok else 1
        print(f"[{i + 1}/{len(AUDITS)}] {name}: "
              f"{'ok' if ok else 'FAIL ' + str(rec)} "
              f"(spark {rec['spark_sec']}s, oracle {rec['oracle_sec']}s)",
              flush=True)
        results[name] = rec

    # --- component agreement helper (pair counts from contingency sizes,
    # never materialized pairs; docs absent from a mapping are singletons)
    def co_membership(sample, eng, exa) -> dict:
        m = (
            sample.join(eng.withColumnRenamed("component", "ec"), "doc_id", "left")
            .join(exa.withColumnRenamed("component", "xc"), "doc_id", "left")
            .select(
                F.coalesce("ec", F.col("doc_id")).alias("ec"),
                F.coalesce("xc", F.col("doc_id")).alias("xc"),
            )
        )
        pairs = F.expr("CAST(sum(n * (n - 1) DIV 2) AS BIGINT)")
        eng_pairs = (
            m.groupBy("ec").agg(F.count(F.lit(1)).alias("n"))
            .agg(pairs.alias("p")).first()["p"]
        )
        exa_pairs = (
            m.groupBy("xc").agg(F.count(F.lit(1)).alias("n"))
            .agg(pairs.alias("p")).first()["p"]
        )
        both_pairs = (
            m.groupBy("ec", "xc").agg(F.count(F.lit(1)).alias("n"))
            .agg(pairs.alias("p")).first()["p"]
        )
        union = eng_pairs + exa_pairs - both_pairs
        return dict(
            sample_doc_ct=m.count(),
            engine_pairs=int(eng_pairs),
            exact_pairs=int(exa_pairs),
            both_pairs=int(both_pairs),
            jaccard_x10000=int(10000 * both_pairs // union) if union else 10000,
            engine_recall_of_exact_x10000=(
                int(10000 * both_pairs // exa_pairs) if exa_pairs else 10000
            ),
        )

    from gmall_flink_spark.queries.llm_dedup import (
        AUDIT_MOD,
        FINE_ROWS_PER_BAND,
        LSH_MAX_BUCKET,
        ROWS_PER_BAND,
        VERIFY_J_DEN,
        VERIFY_J_NUM,
        _components,
        _doc_units,
        _exact_pairs,
        _minhash_mx,
        _sample_components,
        _sample_exact_jac,
    )
    from gmall_flink_spark.sources.tables import table

    sample = (
        table(spark, scaled, "documents")
        .select("doc_id")
        .where(F.pmod(F.col("doc_id"), F.lit(AUDIT_MOD)) == 0)
    )

    # --- exact-vs-engine component agreement on the audit sample ---
    agreement: dict = {"err": None}
    try:
        t0 = time.time()
        agreement.update(
            co_membership(
                sample,
                _components(spark, scaled),
                _sample_components(spark, scaled),
            ),
            sec=round(time.time() - t0, 1),
        )
        print(f"agreement: {agreement}", flush=True)
    except Exception:
        agreement["err"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
        print(f"agreement FAILED: {agreement['err']}", flush=True)

    # --- star-variant evaluation (VERDICT r13 task 2): the same verified
    # pair graph but with still-over-cap fine buckets STARRED to their
    # min-id hub instead of dropped. Measured: verified-pair recall per
    # truth class on the sample, wall cost of the candidate+verify build
    # and the components build (the shared token/minhash stages are warm
    # for BOTH rules by this point, so costs compare rule-to-rule), and
    # the component-level agreement with the exact closure.
    star: dict = {"err": None}
    try:
        from gmall_flink_spark.llm.dedup import (
            connected_components,
            jaccard_pairs,
            lsh_candidates_two_level,
        )

        t0 = time.time()
        units = _doc_units(spark, scaled)
        cands = lsh_candidates_two_level(
            _minhash_mx(spark, scaled),
            ROWS_PER_BAND,
            FINE_ROWS_PER_BAND,
            max_bucket=LSH_MAX_BUCKET,
            oversize_fine="star",
        )
        jac = jaccard_pairs(units, cands, ratio=(VERIFY_J_NUM, VERIFY_J_DEN))
        verified = (
            jac.where(VERIFY_J_DEN * F.col("inter") >= VERIFY_J_NUM * F.col("uni"))
            .select("doc_a", "doc_b")
            .unionByName(_exact_pairs(spark, scaled))
            .distinct()
            .localCheckpoint(eager=True)
        )
        verified_ct = verified.count()
        build_sec = round(time.time() - t0, 1)

        truth = _sample_exact_jac(spark, scaled).select(
            "doc_a",
            "doc_b",
            (F.col("inter") == F.col("uni")).cast("int").alias("is_exact"),
        )
        hits = verified.where(
            (F.pmod(F.col("doc_a"), F.lit(AUDIT_MOD)) == 0)
            & (F.pmod(F.col("doc_b"), F.lit(AUDIT_MOD)) == 0)
        ).withColumn("hit", F.lit(1))
        recall_rows = (
            truth.join(hits, ["doc_a", "doc_b"], "left")
            .groupBy("is_exact")
            .agg(
                F.count(F.lit(1)).alias("true_ct"),
                F.sum(F.coalesce("hit", F.lit(0))).alias("hit_ct"),
            )
            .orderBy("is_exact")
            .collect()
        )

        t1 = time.time()
        mapping = connected_components(
            verified.select("doc_a", "doc_b")
        ).localCheckpoint(eager=True)
        comp_sec = round(time.time() - t1, 1)
        star_agree = co_membership(
            sample, mapping, _sample_components(spark, scaled)
        )
        star.update(
            verified_pair_ct=int(verified_ct),
            build_sec=build_sec,
            components_sec=comp_sec,
            recall=[
                {"is_exact": int(r["is_exact"]), "true_ct": int(r["true_ct"]),
                 "hit_ct": int(r["hit_ct"])}
                for r in recall_rows
            ],
            component_agreement=star_agree,
        )
        print(f"star variant: {star}", flush=True)
    except Exception:
        star["err"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
        print(f"star variant FAILED: {star['err']}", flush=True)

    out = os.path.join(REPO, f"RECALL_SF1_{tag}.json")
    with open(out, "w") as fh:
        json.dump(
            {"k": k, "base": base, "audit_mod": "AUDIT_MOD sample (1-in-4)",
             "results": results, "component_agreement": agreement,
             "star_variant": star},
            fh, indent=2,
        )
    n = len(AUDITS)
    # agreement status reported separately: fails counts PARITY audits
    # only, so the evidence line can never misattribute an agreement
    # error to an audit (review r13)
    agree_ok = agreement["err"] is None and star["err"] is None
    print(f"wrote {out}: {n - fails}/{n} audits green, "
          f"agreement+star {'ok' if agree_ok else 'FAILED'} "
          f"in {time.time() - t_start:.0f}s")
    spark.stop()
    sys.exit(1 if fails or not agree_ok else 0)


if __name__ == "__main__":
    main()
