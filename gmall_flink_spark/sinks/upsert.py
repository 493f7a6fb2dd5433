"""Changelog-consuming sinks (SURVEY §2.2 K2/K3/K4).

The reference emits retracting changelogs to upsert-Kafka with a PK
(util/FlinkSqlUtil.java:42-50) and dim upserts to HBase
(app/dim/func/DimSinkFunction.java:41-62). Our contract is "final rows
only": each micro-batch is key-compacted and MERGEd into a keyed state
table. The state table is hash-bucketed parquet (sinks/_bucketed.py): the
merge reads and rewrites only the bucket directories the batch touches, so
per-batch I/O is proportional to the batch, not to accumulated state — on
a real cluster this is a Delta/Iceberg ``MERGE INTO`` on a table
partitioned by the same key bucket; the compaction logic (keep_last on
keys) is identical.

``topic_router`` is K2: per-record dynamic sink routing — the batch file
analogue of the Kafka sink honoring a per-row ``topic`` column
(app/dwd/DwdBaseApp.java:100-106), expressed as ``partitionBy`` so each
"topic" lands in its own directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.operators.dedup import keep_last
from gmall_flink_spark.sinks._bucketed import (
    check_buckets,
    pin_batch,
    unpin_batch,
    read_prior,
    read_state,
    swap_buckets,
    touched_buckets,
    with_bucket,
)

__all__ = [
    "upsert_into",
    "upsert_writer",
    "topic_router",
    "compact_topics",
    "read_state",
]


def upsert_into(
    state_path: str,
    batch_df: DataFrame,
    keys: list[str],
    order_by: list[str],
    n_buckets: int = 16,
) -> None:
    """MERGE one (micro-)batch into the keyed parquet state table: compact
    the batch (keep-last per key), then merge it into the touched key
    buckets only. The batch twin of K3 upsert-Kafka consumption and of the
    K4 HBase dim put path."""
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    check_buckets(state_path, n_buckets)
    pinned = pin_batch(
        with_bucket(keep_last(batch_df, keys, order_by), keys, n_buckets)
    )
    try:
        compacted = pinned
        buckets = touched_buckets(compacted)
        prior = read_prior(spark, state_path, buckets)
        if prior is not None:
            # a batch row beats a prior row at an equal version (__src tiebreak):
            # a re-put of the same version overwrites, like an HBase put.
            merged = prior.select(*compacted.columns).withColumn("__src", F.lit(0)).unionAll(
                compacted.withColumn("__src", F.lit(1))
            )
            compacted = keep_last(merged, keys, [*order_by, "__src"]).drop("__src")
        swap_buckets(compacted, state_path, buckets, n_buckets)
    finally:
        unpin_batch(pinned)


def upsert_writer(state_path: str, keys: list[str], order_by: list[str], n_buckets: int = 16):
    """foreachBatch form of ``upsert_into`` for writeStream (K3)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        upsert_into(state_path, batch_df, keys, order_by, n_buckets)

    return write


def _heal_topic_asides(base_path: str, topic_col: str) -> None:
    """Recover a compaction that crashed between its two renames: an
    aside dir (`<topic>.__old__`) whose live topic is missing is restored;
    a leftover aside next to a live topic is dropped. Orphaned staging
    directories from crashed publishes/compactions (`__stage_*`,
    `__compact_read_*`, `__compact_stage_*` — hidden to Spark readers but
    each holding a batch-sized copy) are swept too, so repeated crashes
    never leak unbounded disk. Runs at the top of BOTH the writer and the
    compactor (single-writer sink discipline — the same assumption every
    foreachBatch sink here makes — so a swept stage can only be a dead
    run's leftover, never a live run's work in progress)."""
    import os
    import shutil

    if not os.path.isdir(base_path):
        return
    for d in sorted(os.listdir(base_path)):
        p = os.path.join(base_path, d)
        if d.startswith(f"{topic_col}=") and d.endswith(".__old__"):
            live = os.path.join(base_path, d[: -len(".__old__")])
            if os.path.exists(live):
                shutil.rmtree(p)
            else:
                os.replace(p, live)
        elif d.startswith(("__stage_", "__compact_read_", "__compact_stage_")):
            shutil.rmtree(p, ignore_errors=True)


def topic_router(base_path: str, topic_col: str = "sink_table"):
    """K2: route each row to its own sink directory by a per-row column.

    Append sinks are NOT naturally idempotent, so foreachBatch's
    at-least-once redelivery (a crash between the write and the offset
    commit) would duplicate a whole batch. This writer closes that hole
    with a two-phase DETERMINISTIC publish (ADVICE r10 #3): the batch is
    staged under a hidden ``__stage_*`` directory, then its files move
    into the per-topic directories under names keyed by (query lineage,
    batch id, file index). Replaying a batch first scrubs any files a
    partial publish left behind for that (lineage, batch) tag, then
    re-publishes the same checkpoint-deterministic content — so a crash
    at ANY point (mid-stage, mid-move, before the marker) converges to
    exactly one copy at rest. The lineage marker stays as the fast path
    that skips fully-published batches without re-staging them.

    Exactly-once at rest holds ONLY under this module's single-writer
    discipline plus one compactor contract (ADVICE r11): before its
    first publish, a new lineage ANNOUNCES itself in the marker (batch
    -1), so ``compact_topics`` can never mistake the live lineage's
    not-yet-marked batches for a dead query's — compacting those would
    strand the replay scrub (the merged file no longer carries the
    batch tag) and the re-publish would land a second copy. Files of a
    lineage the marker does NOT name are compacted as dead; run the
    compactor only while the writer is stopped or between its batches
    (same single-writer assumption as the MERGE sinks)."""
    import glob as _glob
    import os
    import shutil
    import uuid as _uuid

    from gmall_flink_spark.sinks._bucketed import (
        last_merged_batch,
        record_merged_batch,
        streaming_query_id,
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        qid = streaming_query_id(batch_df)
        if batch_id <= last_merged_batch(base_path, qid):
            return
        _heal_topic_asides(base_path, topic_col)
        if last_merged_batch(base_path, qid) == -1:
            os.makedirs(base_path, exist_ok=True)  # first write creates the sink
            # lineage ANNOUNCE (ADVICE r11): claim the marker with batch -1
            # BEFORE the first publish, so a compactor running in the
            # crash window between publish and the real marker write sees
            # this lineage as live (unpublished passthrough), never dead.
            # One extra marker write per lineage, not per batch.
            record_merged_batch(base_path, -1, qid)
        tag = f"pub-{qid or 'nolineage'}-{batch_id}"
        # scrub a partial publish of this very batch (crash mid-move /
        # crash between full publish and marker) — the re-publish below
        # then lands the batch exactly once
        for f in _glob.glob(
            os.path.join(base_path, f"{topic_col}=*", f"{tag}-*.parquet")
        ):
            os.remove(f)
        stage = os.path.join(base_path, f"__stage_{_uuid.uuid4().hex[:8]}")
        try:
            # cluster by topic before the partitionBy write (guide §6):
            # without it every batch task writes a file into every topic
            # directory it holds rows for — (tasks x topics) files per
            # batch instead of the one-file-per-(topic, batch) growth
            # this module documents and compact_topics assumes.
            batch_df.repartition(F.col(topic_col)).write.mode("overwrite").partitionBy(
                topic_col
            ).parquet(stage)
            for tdir in sorted(os.listdir(stage)):
                if not tdir.startswith(f"{topic_col}="):
                    continue
                dst = os.path.join(base_path, tdir)
                os.makedirs(dst, exist_ok=True)
                parts = sorted(
                    n
                    for n in os.listdir(os.path.join(stage, tdir))
                    if n.endswith(".parquet")
                )
                for i, name in enumerate(parts):
                    os.replace(
                        os.path.join(stage, tdir, name),
                        os.path.join(dst, f"{tag}-{i:05d}.parquet"),
                    )
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        record_merged_batch(base_path, batch_id, qid)

    return write


def compact_topics(
    spark,
    base_path: str,
    topic_col: str = "sink_table",
    max_files: int = 8,
) -> dict[str, tuple[int, int]]:
    """Compact a topic_router sink: the append path adds one file per
    (topic, batch) forever — the real file-count growth vector of the sink
    family (the MERGE sinks rewrite touched buckets per batch, so their
    counts are bounded by task parallelism, not batch count; VERDICT r10
    task 6). Any topic directory holding more than ``max_files`` parquet
    files is rewritten: files from PUBLISHED batches (lineage matches the
    marker and batch id <= the recorded high-water mark, plus earlier
    compacts) merge into one ``compact-<lineage>-<hi>-<uuid>.parquet``;
    files from unmarked batches pass through untouched, so the replay
    scrub of an in-flight batch never loses its deterministic tags (a
    marked batch's replay exits on the marker fast path and never reaches
    the scrub, which is what makes compacting it safe).

    Files from a lineage OTHER than the marker's belong to a dead query
    (the marker records only the latest lineage) and are compactable: a
    dead lineage can never replay into this sink again, so nothing will
    scrub its tags — and skipping them would freeze every pre-reset file
    out of compaction forever.

    Crash-safe like swap_buckets: stage a full replacement directory
    (compacted file + passthrough links), move the live topic dir aside,
    install, drop the aside copy; a crash between the two renames is
    healed on the next call (aside dir present + live missing -> restore),
    and orphaned staging directories from crashed runs are swept.
    Returns {topic: (files_before, files_after)} for the rewritten topics.
    """
    import os
    import shutil
    import uuid as _uuid

    from gmall_flink_spark.sinks._bucketed import _LAST_BATCH

    lineage, hi, have_marker = "nolineage", -1, False
    marker = os.path.join(base_path, _LAST_BATCH)
    if os.path.exists(marker):
        with open(marker) as fh:
            lines = fh.read().splitlines()
        if len(lines) >= 2:
            lineage, hi, have_marker = (lines[0] or "nolineage"), int(lines[1]), True
        elif len(lines) == 1:
            hi, have_marker = int(lines[0]), True

    def published(name: str) -> bool:
        if name.startswith("compact-"):
            # compacted output is at rest by construction: the replay
            # scrub only targets pub-* tags, so re-merging is always safe
            return True
        if not name.startswith("pub-"):
            return False
        if not have_marker:
            # no marker at all (ADVICE r11 medium): a crash between a
            # lineage's first publish and its marker write would make the
            # live lineage's files look dead — treat NOTHING as published
            # rather than compact files a replay scrub still needs.
            # (The writer's lineage-announce makes this window unreachable
            # going forward; this is the defense for pre-announce dirs.)
            return False
        stem = name[len("pub-") : -len(".parquet")]
        parts = stem.rsplit("-", 2)
        if len(parts) != 3:
            return False
        if parts[0] != lineage:
            # a DEAD lineage (the marker records only the latest, and the
            # live one announces itself before its first publish): its
            # query can never replay here again, so its files are safely
            # compactable — without this, one checkpoint reset would
            # freeze every older file out of compaction forever
            return True
        try:
            return int(parts[1]) <= hi
        except ValueError:
            # stray file matching the lineage but with a non-numeric batch
            # segment (ADVICE r11 low): treat as unpublished passthrough
            # instead of aborting the whole compaction mid-scan
            return False

    # heal crashed prior compactions FIRST (an aside is itself named
    # `<topic>.__old__`, so the main loop below must skip those names)
    _heal_topic_asides(base_path, topic_col)

    stats: dict[str, tuple[int, int]] = {}
    for d in sorted(os.listdir(base_path)):
        if not d.startswith(f"{topic_col}=") or d.endswith(".__old__"):
            continue
        tdir = os.path.join(base_path, d)
        old = tdir + ".__old__"
        files = sorted(n for n in os.listdir(tdir) if n.endswith(".parquet"))
        if len(files) <= max_files:
            continue
        elig = [n for n in files if published(n)]
        if len(elig) < 2:
            continue
        tag = _uuid.uuid4().hex[:8]
        tmp_out = os.path.join(base_path, f"__compact_read_{tag}")
        spark.read.parquet(*[os.path.join(tdir, n) for n in elig]).coalesce(
            1
        ).write.parquet(tmp_out)
        part = next(
            n for n in os.listdir(tmp_out) if n.endswith(".parquet")
        )
        stage = os.path.join(base_path, f"__compact_stage_{tag}")
        os.makedirs(stage)
        os.replace(
            os.path.join(tmp_out, part),
            os.path.join(stage, f"compact-{lineage}-{hi}-{tag}.parquet"),
        )
        shutil.rmtree(tmp_out)
        for n in files:
            if n not in elig:
                os.link(os.path.join(tdir, n), os.path.join(stage, n))
        os.replace(tdir, old)
        os.replace(stage, tdir)
        shutil.rmtree(old)
        stats[d] = (len(files), len(files) - len(elig) + 1)
    return stats


def dim_store_writer(base_path: str, pk: str = "pk", order_by: tuple[str, ...] = ("ts",)):
    """K4: the DimApp sink loop (app/dim/DimApp.java:94-109 writing
    HBase via the rowkeyed put) — each micro-batch MERGEs per sink_table
    into that dim table's own keyed parquet state (`base_path/<table>/`),
    keep-last per PK. The per-batch table list is a collect of the
    DISTINCT sink_table values — bounded by the routing config's row
    count (the reference iterates the same config), never by data.
    Idempotent by construction (a re-put of the same version overwrites),
    so checkpoint replay after a crash is safe without markers."""
    import os

    def write(batch_df: DataFrame, batch_id: int) -> None:
        tables = [r[0] for r in batch_df.select("sink_table").distinct().collect()]
        for t in sorted(tables):
            upsert_into(
                os.path.join(base_path, t),
                batch_df.where(F.col("sink_table") == t).drop("sink_table"),
                [pk],
                list(order_by),
            )

    return write
