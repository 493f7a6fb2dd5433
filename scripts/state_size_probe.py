#!/usr/bin/env python3
"""State-SIZE probe at 1x vs 10x KEY space (VERDICT r11 task 5).

The r10/r11 RocksDB probes measured THROUGHPUT under both built-in state
store providers at a fixed key space; this probe measures the other axis
the 100x posture needs: how big the keyed STATE itself gets when the key
space grows 10x, and what each provider pays for it. Inputs are the
id-distinct constructions from scaling_probe.py (symlink replication
would multiply rows but NOT keys — useless for a state-size question):

  - D4 first_per_day_stream / D6 returning_flags_stream over events with
    user_id + event_id shifted per replica → true 10x user-key state
    (reference anchor: the HashMap keyed state in
    app/dws/DwsTradeOrderWindow.java:42 grows exactly this way when the
    user base grows).
  - the deepest pipeline (order_uu_window_stream: detail dedup, three
    stream-stream joins, D5, window agg) over 10x id-distinct
    orders/lineitem envelopes → 10x JOIN-BUFFER keys (order/detail ids
    shift per replica; user_id rides o_custkey and stays 1x because dims
    stay 1x — so this row isolates join-state growth, the pipeline's
    dominant state).

Recorded per (op, scale, provider): wall sec, rows/s, the final
micro-batch's stateOperators metrics (numRowsTotal, memoryUsedBytes,
RocksDB customMetrics when present), and the on-disk checkpoint state
bytes (`du` of <ckpt>/state — the provider-comparable persistence
footprint). Provider equality of the ANSWER is asserted per (op, scale).

Usage: python scripts/state_size_probe.py [K] [base_sf_dir]
       (defaults: K=10, $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)
Writes one JSON document to stdout; results recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

TMP = "/tmp/gmall_state_size_probe"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _du_bytes(path: str) -> int:
    total = 0
    for d, _, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(d, n))
            except OSError:
                pass
    return total


def _state_metrics(progress: list[dict]) -> dict:
    """Fold the run's stateOperators metrics: final numRowsTotal and the
    MAX memoryUsedBytes across batches (the high-water mark is what sizes
    an executor), plus RocksDB's own size metrics when present."""
    out = {"num_rows_total": 0, "memory_used_bytes_max": 0}
    last = [p for p in progress if p.get("stateOperators")]
    if not last:
        return out
    for p in last:
        used = sum(op.get("memoryUsedBytes", 0) for op in p["stateOperators"])
        out["memory_used_bytes_max"] = max(out["memory_used_bytes_max"], used)
    out["num_rows_total"] = sum(
        op.get("numRowsTotal", 0) for op in last[-1]["stateOperators"]
    )
    rocks = {}
    for op in last[-1]["stateOperators"]:
        for k, v in (op.get("customMetrics") or {}).items():
            if k in ("rocksdbSstFileSize", "rocksdbTotalMemoryUsage"):
                rocks[k] = rocks.get(k, 0) + v
    out.update(rocks)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    from pyspark.sql import functions as F

    from scaling_probe import build_distinct_facts, build_scaled_dir

    from gmall_flink_spark.session import STATE_STORE_PROVIDERS, get_spark
    from gmall_flink_spark.sources.cdc_synth import (
        activity_envelope,
        coupon_envelope,
        detail_envelope,
        orders_envelope,
    )
    from gmall_flink_spark.sources.tables import clear_session_memos, table
    from gmall_flink_spark.streaming.core import split_into_files
    from gmall_flink_spark.streaming.pipelines import (
        order_uu_window_stream,
        sentinel_envelope_slices,
    )
    from gmall_flink_spark.streaming.stateful import (
        first_per_day_stream,
        returning_flags_stream,
    )

    spark = get_spark(app_name="state-size-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(TMP):
        shutil.rmtree(TMP)
    os.makedirs(TMP)

    # ---- inputs: events at 1x and Kx id-distinct keys -------------------
    ev = table(spark, base, "events").select("user_id", "ts")
    u_stride = (
        (int(ev.agg(F.max("user_id")).collect()[0][0]) // 4) + 1
    ) * 4
    ev_dirs = {}
    for scale, reps in (("1x", 1), (f"{k}x", k)):
        out = ev
        for i in range(1, reps):
            out = out.unionAll(
                ev.withColumn("user_id", F.col("user_id") + F.lit(i * u_stride))
            )
        d = os.path.join(TMP, f"events_{scale}")
        out.repartition(16).write.parquet(d)
        ev_dirs[scale] = d

    # ---- inputs: Kx id-distinct facts for the deepest pipeline ----------
    scaled = build_scaled_dir(base, k)
    build_distinct_facts(spark, scaled, base, k)

    def envelope_slices(sf_dir: str, tag: str) -> dict:
        specs = {
            "od": (detail_envelope(spark, sf_dir), "order_detail",
                   {"id": "-1", "order_id": "-9", "sku_id": "-1",
                    "sku_num": "1", "split_total_amount": "0"}),
            "oi": (orders_envelope(spark, sf_dir), "order_info",
                   {"id": "-9", "user_id": "-9"}),
            "oa": (activity_envelope(spark, sf_dir), "order_detail_activity",
                   {"order_detail_id": "-1", "activity_id": "-3"}),
            "oc": (coupon_envelope(spark, sf_dir), "order_detail_coupon",
                   {"order_detail_id": "-1", "coupon_id": "-4"}),
        }
        dirs = {}
        for name, (env, tbl, data) in specs.items():
            slices = os.path.join(TMP, f"ouw_{tag}_{name}")
            split_into_files(env, 4, "ts", slices)
            far = int(env.agg(F.max("ts")).collect()[0][0]) + 2_160_000_000
            sentinel_envelope_slices(spark, slices, tbl, data, far, n=4)
            dirs[name] = (slices, env.schema)
        return dirs

    pipe_inputs = {"1x": envelope_slices(base, "1x"),
                   f"{k}x": envelope_slices(scaled, f"{k}x")}

    # ---- the runner: known checkpoint + progress metrics ----------------
    def run(sdf, provider: str, timeout_s: int = 1800) -> dict:
        name = f"p{uuid.uuid4().hex[:10]}"
        ckpt = os.path.join(TMP, "ckpt", name)
        prior = spark.conf.get(_PROVIDER_KEY, None)
        spark.conf.set(_PROVIDER_KEY, STATE_STORE_PROVIDERS[provider])
        try:
            t0 = time.perf_counter()
            q = (
                sdf.writeStream.option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            if not q.awaitTermination(timeout_s):
                q.stop()
                raise TimeoutError(f"probe run exceeded {timeout_s}s")
            sec = round(time.perf_counter() - t0, 3)
            res = spark.table(name)
            metrics = _state_metrics(list(q.recentProgress))
            metrics.update(
                sec=sec,
                rows_out=res.count(),
                ckpt_state_bytes=_du_bytes(os.path.join(ckpt, "state")),
            )
            # answer fingerprint for cross-provider equality
            cols = sorted(res.columns)
            metrics["answer_hash"] = (
                res.select(
                    F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
                    .alias("h")
                )
                .agg(F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)")))
                .collect()[0][0]
            )
            metrics["answer_hash"] = str(metrics["answer_hash"])
            return metrics
        finally:
            if prior is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prior)

    ev_schema = spark.read.parquet(ev_dirs["1x"]).schema

    def d4(scale):
        s = spark.readStream.schema(ev_schema).parquet(ev_dirs[scale])
        return first_per_day_stream(s, "user_id")

    def d6(scale):
        s = spark.readStream.schema(ev_schema).parquet(ev_dirs[scale])
        return returning_flags_stream(s, "user_id", gap_days=7)

    def deepest(scale):
        streams = {
            name: spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(slices)
            for name, (slices, schema) in pipe_inputs[scale].items()
        }
        return order_uu_window_stream(
            streams["od"], streams["oi"], streams["oa"], streams["oc"]
        )

    ops = {"d4_first_per_day": d4, "d6_returning_flags": d6,
           "deepest_order_uu": deepest}

    # unrecorded warm-up: first streaming query pays JVM/parquet warm-up
    run(d4("1x"), "hdfs")

    rows_in = {s: spark.read.parquet(d).count() for s, d in ev_dirs.items()}
    result: dict = {"k": k, "base": base, "events_rows": rows_in, "probes": {}}
    for op_name, build in ops.items():
        result["probes"][op_name] = {}
        for scale in ("1x", f"{k}x"):
            per = {}
            base_run = None
            for provider in ("hdfs", "rocksdb"):
                r = run(build(scale), provider)
                if op_name != "deepest_order_uu":
                    r["rows_per_sec"] = round(rows_in[scale] / r["sec"])
                if provider == "hdfs":
                    base_run = r
                else:
                    assert r["answer_hash"] == base_run["answer_hash"], (
                        f"{op_name}/{scale}: provider changed the ANSWER"
                    )
                    per["rocksdb_vs_hdfs_sec"] = round(
                        r["sec"] / base_run["sec"], 2
                    )
                per[provider] = r
            result["probes"][op_name][scale] = per
        # in-memory memos only: the streaming probes never read the
        # persisted components artifact, and an unscoped disk wipe races
        # any concurrent job on the host (r13 lesson)
        clear_session_memos(disk_artifacts=False)

    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
