#!/usr/bin/env python3
"""Driver-identical local correctness sweep (VERDICT r05 task 1).

Reproduces the grading driver's conditions exactly — a fresh process, a
PLAIN SparkSession (none of session.py's builder configs; every registry
query re-pins what it needs via pin_oracle_conf), raw DuckDB views over
the same parquet — and runs EVERY registered query against its oracle,
writing CORRECTNESS_LOCAL_r{N}.json in the driver's row/schema/hash
format. The committed artifact is the proof that the 90+ queries the
driver has never sampled are green under driver-identical conditions, so
any future sampling rotation is safe by construction.

Comparison is the type-strict normalization of tests/oracle_harness
(pandas-path typing on both sides — the exact coercions the real gate
applies).

Usage: python scripts/local_correctness.py [round_tag] [sf_dir]
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


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r6"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from oracle_harness import _norm_pdf, run_oracle

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("local-correctness")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries, oracle = entry.queries(), entry.oracle_sql()
    results: dict[str, dict] = {}
    t_start = time.time()
    fails = 0
    for i, name in enumerate(sorted(queries)):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            s_pdf = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(s_pdf)
            if name not in oracle:
                # no oracle: the only thing gated is "the query ran" —
                # record that honestly instead of a tautological rows_match
                rec.update(
                    checked="ran-only",
                    rows_match=None,
                    schema_match=None,
                    hash_match=None,
                    oracle_rows=None,
                    err=None,
                )
            else:
                o_pdf = run_oracle(oracle[name], sf_dir)
                rec["oracle_rows"] = len(o_pdf)
                rec["rows_match"] = len(s_pdf) == len(o_pdf)
                rec["schema_match"] = sorted(s_pdf.columns) == sorted(o_pdf.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _norm_pdf(s_pdf) == _norm_pdf(o_pdf)
                )
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
        if rec["err"] is not None:
            ok = False
        elif rec.get("checked") == "ran-only":
            ok = True
        else:
            ok = bool(rec["rows_match"] and rec["schema_match"] and rec["hash_match"])
        fails += 0 if ok else 1
        print(f"[{i + 1}/{len(queries)}] {name}: {'ok' if ok else 'FAIL ' + str(rec)}", flush=True)
        results[name] = rec

    out = os.path.join(REPO, f"CORRECTNESS_LOCAL_{tag}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    n = len(results)
    print(f"wrote {out}: {n - fails}/{n} green in {time.time() - t_start:.0f}s")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
