#!/usr/bin/env python3
"""State-SIZE probe, next decade: 100x KEY space, RocksDB-family only
(VERDICT r12 task 5).

The r12 probe (scripts/state_size_probe.py) measured 1x vs 10x keys
under on-heap vs RocksDB and found the provider cost INVERTS once keyed
state reaches GB (on-heap GC-walls). This probe takes the next decade —
150k user keys for D4/D6, 100x id-distinct order/detail keys for the
deepest pipeline — and drops on-heap entirely (the r12 reading says it
would GC-wall; measuring a known wall wastes the box). What it measures
instead is the FIRST changelog-cost datapoint at scale:

  rocksdb            — per-commit SNAPSHOT upload (each version a .zip)
  rocksdb_changelog  — snapshot + .changelog deltas; per-commit upload
                       is delta-sized (the r12 knob claim, unmeasured
                       until now)

Recorded per (op, provider): wall sec, rows/s, final stateOperators
metrics (numRowsTotal, memory high-water, RocksDB sst size), the
on-disk checkpoint state bytes, and the checkpoint's file breakdown —
snapshot (.zip) bytes vs .changelog bytes and bytes/changelog-commit.
Answer equality across the two providers is asserted per op (same
contract as the r12 probe).

Usage: python scripts/state_size_probe_100x.py [K] [base_sf_dir]
       (defaults: K=100, $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)
Writes one JSON document to stdout; results recorded in SCALE.md.
Run with SPARK_GRAFT_DRIVER_MEM=32g — the deepest pipeline's join
buffers at 100x keys need the headroom.
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

TMP = "/tmp/gmall_state_size_probe_100x"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def _ckpt_file_breakdown(state_dir: str) -> dict:
    """Snapshot vs changelog bytes under <ckpt>/state — the
    persistence-cost split the changelog knob exists to change."""
    out = {"snapshot_zip_bytes": 0, "snapshot_zip_files": 0,
           "changelog_bytes": 0, "changelog_files": 0, "other_bytes": 0}
    for d, _, names in os.walk(state_dir):
        for n in names:
            try:
                sz = os.path.getsize(os.path.join(d, n))
            except OSError:
                continue
            if n.endswith(".changelog"):
                out["changelog_bytes"] += sz
                out["changelog_files"] += 1
            elif n.endswith(".zip"):
                out["snapshot_zip_bytes"] += sz
                out["snapshot_zip_files"] += 1
            else:
                out["other_bytes"] += sz
    if out["changelog_files"]:
        out["bytes_per_changelog_commit"] = (
            out["changelog_bytes"] // out["changelog_files"]
        )
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    from pyspark.sql import functions as F

    from scaling_probe import build_distinct_facts, build_scaled_dir
    from state_size_probe import _du_bytes, _state_metrics

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

    spark = get_spark(app_name="state-size-probe-100x")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(TMP):
        shutil.rmtree(TMP)
    os.makedirs(TMP)

    # ---- events at Kx id-distinct user keys -----------------------------
    ev = table(spark, base, "events").select("user_id", "ts")
    u_stride = ((int(ev.agg(F.max("user_id")).collect()[0][0]) // 4) + 1) * 4
    out = ev
    for i in range(1, k):
        out = out.unionAll(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * u_stride))
        )
    ev_dir = os.path.join(TMP, f"events_{k}x")
    out.repartition(32).write.parquet(ev_dir)
    ev_rows = spark.read.parquet(ev_dir).count()

    # ---- Kx id-distinct facts for the deepest pipeline ------------------
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

    pipe_inputs = envelope_slices(scaled, f"{k}x")

    def run(sdf, provider: str, timeout_s: int) -> dict:
        name = f"p{uuid.uuid4().hex[:10]}"
        ckpt = os.path.join(TMP, "ckpt", name)
        prior = spark.conf.get(_PROVIDER_KEY, None)
        prior_cl = spark.conf.get(_CHANGELOG_KEY, None)
        changelog = provider == "rocksdb_changelog"
        spark.conf.set(_PROVIDER_KEY, STATE_STORE_PROVIDERS["rocksdb"])
        spark.conf.set(_CHANGELOG_KEY, "true" if changelog else "false")
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
            state_dir = os.path.join(ckpt, "state")
            metrics.update(
                sec=sec,
                rows_out=res.count(),
                ckpt_state_bytes=_du_bytes(state_dir),
                ckpt_files=_ckpt_file_breakdown(state_dir),
            )
            cols = sorted(res.columns)
            metrics["answer_hash"] = str(
                res.select(
                    F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
                    .alias("h")
                )
                .agg(F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)")))
                .collect()[0][0]
            )
            return metrics
        finally:
            for key, val in ((_PROVIDER_KEY, prior), (_CHANGELOG_KEY, prior_cl)):
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    ev_schema = spark.read.parquet(ev_dir).schema

    def d4():
        s = spark.readStream.schema(ev_schema).parquet(ev_dir)
        return first_per_day_stream(s, "user_id")

    def d6():
        s = spark.readStream.schema(ev_schema).parquet(ev_dir)
        return returning_flags_stream(s, "user_id", gap_days=7)

    def deepest():
        streams = {
            name: spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(slices)
            for name, (slices, schema) in pipe_inputs.items()
        }
        return order_uu_window_stream(
            streams["od"], streams["oi"], streams["oa"], streams["oc"]
        )

    ops = {
        "d4_first_per_day": (d4, 3600),
        "d6_returning_flags": (d6, 3600),
        "deepest_order_uu": (deepest, 14400),
    }

    # unrecorded warm-up
    run(d4(), "rocksdb", 3600)

    result: dict = {"k": k, "base": base, "events_rows": ev_rows, "probes": {}}
    for op_name, (build, timeout_s) in ops.items():
        per: dict = {}
        base_run = None
        for provider in ("rocksdb", "rocksdb_changelog"):
            t0 = time.time()
            r = run(build(), provider, timeout_s)
            if op_name != "deepest_order_uu":
                r["rows_per_sec"] = round(ev_rows / r["sec"])
            if base_run is None:
                base_run = r
            else:
                assert r["answer_hash"] == base_run["answer_hash"], (
                    f"{op_name}: changelog checkpointing changed the ANSWER"
                )
                per["changelog_vs_snapshot_sec"] = round(
                    r["sec"] / base_run["sec"], 2
                )
            per[provider] = r
            print(f"# {op_name}/{provider}: {r['sec']}s "
                  f"(wall {round(time.time() - t0)}s)", file=sys.stderr, flush=True)
        result["probes"][op_name] = per
        # in-memory memos only (no disk artifacts in play; unscoped
        # wipes race concurrent jobs on the host — r13 lesson)
        clear_session_memos(disk_artifacts=False)

    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
