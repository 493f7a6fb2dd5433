#!/usr/bin/env python3
"""Changelog-mode KNOB pairing probe (VERDICT r13 tasks 5 + 6).

The r13 100x probe (scripts/state_size_probe_100x.py) left two open
readings on the DEEPEST pipeline (order_uu: 3 stream-stream joins + a
windowed distinct at 100x id-distinct keys) under RocksDB changelog
checkpointing:

  1. the changelog stream itself becomes the checkpoint volume at high
     commit counts — the recommendation "pair changelog with a longer
     maintenance interval" was prose, not a measurement;
  2. native memory high-watered at 23 GB (vs 4.4 GB snapshot mode) —
     unbounded-looking, with the rocksdb write-buffer/bounded-memory
     knobs unprobed.

This probe measures BOTH on the same construction the r13 numbers came
from, changelog mode only (the snapshot row is r13's, committed):

  * maintenance interval sweep — spark.sql.streaming.stateStore.
    maintenanceInterval at 15s / 60s (default) / 300s: wall sec, total
    checkpoint bytes, snapshot-zip vs changelog split, bytes/commit.
    Maintenance uploads the RocksDB snapshot; a LONGER interval means
    fewer snapshot uploads but a longer changelog replay tail on
    recovery (recovery cost is not measured here; the table is the
    volume/wall side of the trade).
  * memory-bound sweep at the default interval —
    rocksdb.boundedMemoryUsage=true + maxMemoryUsageMB, and a
    writeBufferSizeMB/maxOpenFiles variant: memoryUsedBytes high-water
    vs wall.

Answer equality across ALL runs is asserted (same md5-fold contract as
the r12/r13 probes): knobs may move cost, never the answer.

Usage: python scripts/changelog_knobs_probe.py [K] [base_sf_dir]
       (defaults: K=100, $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)
Writes one JSON document to stdout; recorded in SCALE.md and committed
as CHANGELOG_KNOBS_r14.json. Run on a QUIET host (wall times are the
measurement) with SPARK_GRAFT_DRIVER_MEM=32g.
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

TMP = "/tmp/gmall_changelog_knobs_probe"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
_MAINT_KEY = "spark.sql.streaming.stateStore.maintenanceInterval"
_ROCKS = "spark.sql.streaming.stateStore.rocksdb."


def build_deepest_inputs(spark, base: str, k: int, tmp: str) -> dict:
    """Kx id-distinct envelope slice dirs for the deepest pipeline — the
    SAME construction as state_size_probe_100x, shared by this probe and
    scripts/restore_drill.py. Returns {name: (slices_dir, schema)}."""
    from pyspark.sql import functions as F

    from scaling_probe import build_distinct_facts, build_scaled_dir

    from gmall_flink_spark.sources.cdc_synth import (
        activity_envelope,
        coupon_envelope,
        detail_envelope,
        orders_envelope,
    )
    from gmall_flink_spark.streaming.core import split_into_files
    from gmall_flink_spark.streaming.pipelines import sentinel_envelope_slices

    scaled = build_scaled_dir(base, k)
    build_distinct_facts(spark, scaled, base, k)
    specs = {
        "od": (detail_envelope(spark, scaled), "order_detail",
               {"id": "-1", "order_id": "-9", "sku_id": "-1",
                "sku_num": "1", "split_total_amount": "0"}),
        "oi": (orders_envelope(spark, scaled), "order_info",
               {"id": "-9", "user_id": "-9"}),
        "oa": (activity_envelope(spark, scaled), "order_detail_activity",
               {"order_detail_id": "-1", "activity_id": "-3"}),
        "oc": (coupon_envelope(spark, scaled), "order_detail_coupon",
               {"order_detail_id": "-1", "coupon_id": "-4"}),
    }
    pipe_inputs = {}
    for name, (env, tbl, data) in specs.items():
        slices = os.path.join(tmp, f"ouw_{name}")
        split_into_files(env, 4, "ts", slices)
        far = int(env.agg(F.max("ts")).collect()[0][0]) + 2_160_000_000
        sentinel_envelope_slices(spark, slices, tbl, data, far, n=4)
        pipe_inputs[name] = (slices, env.schema)
    return pipe_inputs


def deepest_stream(spark, pipe_inputs: dict):
    """The deepest pipeline (3 stream-stream joins + windowed distinct)
    over the slice dirs from build_deepest_inputs."""
    from gmall_flink_spark.streaming.pipelines import order_uu_window_stream

    streams = {
        name: spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(slices)
        for name, (slices, schema) in pipe_inputs.items()
    }
    return order_uu_window_stream(
        streams["od"], streams["oi"], streams["oa"], streams["oc"]
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    from pyspark.sql import functions as F

    from state_size_probe import _du_bytes, _state_metrics
    from state_size_probe_100x import _ckpt_file_breakdown

    from gmall_flink_spark.session import STATE_STORE_PROVIDERS, get_spark

    spark = get_spark(app_name="changelog-knobs-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(TMP):
        shutil.rmtree(TMP)
    os.makedirs(TMP)

    # Kx id-distinct facts, same construction as state_size_probe_100x
    pipe_inputs = build_deepest_inputs(spark, base, k, TMP)

    def deepest():
        return deepest_stream(spark, pipe_inputs)

    def run(confs: dict, timeout_s: int = 14400) -> dict:
        name = f"p{uuid.uuid4().hex[:10]}"
        ckpt = os.path.join(TMP, "ckpt", name)
        all_confs = {
            _PROVIDER_KEY: STATE_STORE_PROVIDERS["rocksdb"],
            _CHANGELOG_KEY: "true",
            **confs,
        }
        priors = {key: spark.conf.get(key, None) for key in all_confs}
        for key, val in all_confs.items():
            spark.conf.set(key, val)
        try:
            t0 = time.perf_counter()
            q = (
                deepest().writeStream.option("checkpointLocation", ckpt)
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
                confs=confs,
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
            shutil.rmtree(ckpt, ignore_errors=True)  # free the ~11 GB per run
            return metrics
        finally:
            for key, val in priors.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    runs = {
        # task 5: maintenance-interval sweep (snapshot upload cadence)
        "maint_15s": {_MAINT_KEY: "15s"},
        "maint_60s_default": {},
        "maint_300s": {_MAINT_KEY: "300s"},
        # task 6: native-memory bounds at the default interval
        "bounded_4g": {
            _ROCKS + "boundedMemoryUsage": "true",
            _ROCKS + "maxMemoryUsageMB": "4096",
        },
        "small_buffers": {
            _ROCKS + "writeBufferSizeMB": "16",
            _ROCKS + "maxWriteBufferNumber": "2",
            _ROCKS + "maxOpenFiles": "100",
        },
    }
    result: dict = {"k": k, "base": base, "mode": "rocksdb_changelog", "runs": {}}
    ref_hash = None
    for tag, confs in runs.items():
        t0 = time.time()
        r = run(confs)
        if ref_hash is None:
            ref_hash = r["answer_hash"]
        else:
            assert r["answer_hash"] == ref_hash, f"{tag}: knobs changed the ANSWER"
        result["runs"][tag] = r
        print(f"# {tag}: {r['sec']}s ckpt={r['ckpt_state_bytes']} "
              f"mem_hw={r['memory_used_bytes_max']} (wall {round(time.time() - t0)}s)",
              file=sys.stderr, flush=True)

    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
