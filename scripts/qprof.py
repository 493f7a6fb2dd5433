#!/usr/bin/env python3
"""Per-query isolated profiler (optimization round 1 tooling, guide §1).

For each named registry query: clear every session memo (and, by default,
this SF's write-once disk artifacts), time the COLD execution through the
bench's noop-sink + terminal-sort-strip methodology, then time N WARM
re-runs in the same session. Writes one JSON with cold/warm seconds plus
the calibration pair so readings normalize across host states, and
optionally dumps `explain("formatted")` of the cold-built DataFrame per
query (the consumer plan — producer stages behind eager localCheckpoint
memos do not appear in it; the explain audit's cold_shuffles column covers
those).

Usage:
  python scripts/qprof.py OUT.json q1 q2 ... [--sf DIR] [--warm N]
      [--plans DIR] [--suffix TAG] [--keep-artifacts]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for <query><suffix>.txt plans")
    ap.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    ap.add_argument(
        "--keep-artifacts",
        action="store_true",
        help="keep write-once disk artifacts (measure the consumer posture)",
    )
    args = ap.parse_args()

    import bench
    from gmall_flink_spark.registry import all_queries
    from gmall_flink_spark.session import get_spark
    from gmall_flink_spark.sources.tables import clear_session_memos

    spark = get_spark(
        app_name="qprof", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # one warm-up + the bench's untimed synth-topic materialization
    queries["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    from gmall_flink_spark.sources.cdc_synth import (
        activity_envelope,
        cart_dead_letters,
        cart_envelope,
        coupon_envelope,
        detail_envelope,
        orders_dead_letters,
        orders_envelope,
    )
    from gmall_flink_spark.sources.log_synth import page_log_parsed

    for build in (orders_envelope, cart_envelope, detail_envelope,
                  activity_envelope, coupon_envelope, page_log_parsed,
                  orders_dead_letters, cart_dead_letters):
        build(spark, args.sf)

    calib = bench.calibrate(spark)
    out: dict[str, dict] = {"_calib": calib, "_sf": args.sf}

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        with bench.track_terminal_sort():
            df = bench.unsorted_form(queries[name](spark, args.sf))
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3), df

    for name in args.names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        clear_session_memos(
            disk_artifacts=not args.keep_artifacts, sf_dir=args.sf
        )
        spark.sparkContext.setJobDescription(f"qprof cold: {name}")
        cold, df = timed(name)
        warms = []
        for i in range(args.warm):
            spark.sparkContext.setJobDescription(f"qprof warm{i}: {name}")
            w, _ = timed(name)
            warms.append(w)
        out[name] = {"cold": cold, "warm": warms}
        print(f"{name}: cold {cold}s warm {warms}", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = bench.explain_str(df, "formatted")
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
