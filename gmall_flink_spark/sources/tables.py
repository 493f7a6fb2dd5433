"""Batch table readers over the driver-generated parquet testdata.

Stand-in roles per FIXTURES.md §6: orders/lineitem = order facts,
customer = user dim, part/supplier = product dims, nation/region =
geo dims, events = stream table, documents/embeddings = LLM-pipeline
tables.

Reads are plain ``spark.read.parquet`` so Catalyst gets native column
pruning + predicate pushdown into the scan (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``); no eager caching — at 100 TB the scan
must stream, and AQE handles partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: session memo of the RAW ``spark.read.parquet`` DataFrames (optimization
#: r15, the per-query session floor): every ``spark.read.parquet`` call is
#: a driver-side file-listing + schema-inference round trip (~120-180 ms
#: measured), and a suite run issues hundreds of them for the same ten
#: immutable paths. The memo holds an UNEXECUTED plan object — never data;
#: scans still stream and re-list files at execution — keyed on the same
#: (appId, path, content stamp) rule as every other memo (memo_key), so an
#: in-session rewrite is picked up and a fresh session never sees a dead
#: frame. The timestamp normalization below stays per-call: it reads the
#: live session timezone, which must keep failing loudly if a caller
#: un-pins UTC mid-session. Registered in clear_session_memos.
_TABLE_MEMO: dict[tuple, DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    key = memo_key(spark, sf_dir, name, _TABLE_MEMO)
    if key not in _TABLE_MEMO:
        _TABLE_MEMO[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = _TABLE_MEMO[key]
    if name == "events":
        # Older testdata stored ts as parquet TIMESTAMP(NANOS), read as long
        # nanos (spark.sql.legacy.parquet.nanosAsLong); truncate to micros —
        # exactly what DuckDB does when it loads TIMESTAMP_NS.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division: float `/1000` loses µs precision above 2^53
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Current testdata stores naive timestamp[us] (isAdjustedToUTC=false),
    # which Spark 4 reads as TIMESTAMP_NTZ. Epoch functions (unix_micros,
    # window RANGE frames over epoch) require TIMESTAMP; with the session
    # timezone pinned to UTC (pin_oracle_conf) the cast keeps the wall clock
    # and makes epoch math identical to DuckDB's naive-as-UTC semantics.
    # Under any OTHER session timezone the cast would silently shift epoch
    # math by the zone offset — and no expression can preserve both the
    # wall clock (date_format groupings) and the epoch (RANGE frames) at
    # once outside UTC — so a non-UTC session fails loudly instead.
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        tz = spark.conf.get("spark.sql.session.timeZone")
        # fixed zero-offset spellings only — a named zone with DST (e.g.
        # Europe/London) is NOT equivalent even when its current offset is 0
        if tz not in ("UTC", "Etc/UTC", "GMT", "Etc/GMT", "GMT0", "UTC0",
                      "Z", "+00:00", "GMT+00:00", "UTC+00:00"):
            raise ValueError(
                f"table({name!r}) carries naive-timestamp columns {ntz_cols} whose "
                f"TIMESTAMP cast is only wall-clock- and epoch-faithful under a UTC "
                f"session (got {tz!r}); pin spark.sql.session.timeZone='UTC' "
                f"(session.pin_oracle_conf) before reading"
            )
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def memo_key(spark: SparkSession, sf_dir: str, name: str, memo: dict) -> tuple:
    """Key for session-scoped DataFrame/value memos, safe against the two
    staleness hazards of a bare (appId, sf_dir) key: the table's parquet
    being REWRITTEN in-session under the same path (content stamp:
    mtime_ns + size, one os.stat), and dead-session entries accumulating
    forever (entries keyed by a different applicationId are evicted here,
    so the memo only ever holds the live context's data)."""
    import os as _os

    app_id = spark.sparkContext.applicationId
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        st = _os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = (0, 0)
    # evict foreign-session entries AND same-session entries for this
    # (sf_dir, name) whose stamp no longer matches — otherwise an
    # in-session rewrite leaves the superseded entry (and its pinned
    # localCheckpoint blocks) referenced for the session's lifetime
    for k in [
        k
        for k in memo
        if k[0] != app_id or (k[1:3] == (sf_dir, name) and k[3] != stamp)
    ]:
        del memo[k]
    return (app_id, sf_dir, name, stamp)


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Rebalance a narrow scan before heavy per-row compute.

    The testdata tables are single parquet files with ONE row group, so
    their scans plan as a single task no matter what
    ``spark.sql.files.maxPartitionBytes`` says (a row group is the atomic
    split unit) — and any expensive map stage fused onto that scan (md5
    gram hashing, shingle explodes, Arrow-batched Python kernels) runs on
    one core. When the source has fewer partitions than the session's
    default parallelism, repartition up (hash-partitioned by ``cols`` if
    given); when the scan is already at least that wide — every
    production-scale table — return the plan unchanged, because there the
    exchange would be pure cost. Measured at sf0.1: the winnow gram stream
    drops 3.5-7.9s -> 0.7-1.3s for a ~5 MB text shuffle.

    Width is probed with ``inputFiles()`` — leaf-scan metadata, no job and
    no physical planning (``df.rdd`` would re-plan the query on every call
    and, under AQE, can eagerly execute upstream shuffle stages). A file
    count understates multi-row-group files, erring toward a harmless
    repartition; non-file sources (in-memory test frames) report 0 files
    and likewise just repartition."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def clear_session_memos(
    disk_artifacts: bool = True, sf_dir: str | None = None
) -> None:
    """Reset every session-memoized shared stage (winnow fingerprints,
    tokenized docs, LSH candidates, near-dup components, IVF assignment,
    PQ codebooks, ...). Callers that must observe or time a COLD pipeline
    (scripts/scaling_probe.py, scripts/explain_audit.py) use this so a
    warm memo can't turn a measured run into a cache read. Single source
    of truth: adding a new memo means adding it here, and only here.

    ``disk_artifacts=False`` keeps the write-once CROSS-SESSION artifacts
    (the persisted component mapping) while still dropping the in-memory
    memos — the mode for measuring a CONSUMER's cost under the production
    posture, where the artifact exists by construction; the default wipes
    them too, attributing the full build to whoever runs next.

    ``sf_dir`` scopes the disk wipe to ONE corpus's artifacts. Pass it
    from any probe/audit that runs alongside other jobs on the host: the
    unscoped wipe deletes every SF's artifact, and a concurrent reader of
    another SF's mapping then dies mid-scan with FILE_NOT_EXIST (this
    raced the r13 sweep against the explain audit)."""
    from gmall_flink_spark.queries.llm_dedup import (
        _COMPONENTS,
        _DOC_STATS,
        _DOC_TOKS,
        _DOC_UNITS,
        _EXACT_PAIRS,
        _LSH_CANDS,
        _MINHASH_MX,
        _SAMPLE_COMPONENTS,
        _SAMPLE_EXACT,
        _SUBSTR_IDX,
        _VERIFIED,
    )
    from gmall_flink_spark.queries.datasel import (
        _BPE_SAMPLED,
        _BPE_STATE,
        _UNIGRAM_VOCAB,
        _WORD_OCC,
        _WP_STATE,
    )
    from gmall_flink_spark.queries.classify import _NB_SCORED_MEMO
    from gmall_flink_spark.queries.llm_pipeline import _CLEAN_RANKED, _PACK_TOTALS
    from gmall_flink_spark.queries.similarity import (
        _ASSIGNED_MEMO,
        _NEARDUP_PAIRS,
        _PQ_BOOKS_MEMO,
    )
    from gmall_flink_spark.queries.text import _WINNOW_DOCS

    for memo in (
        _BPE_SAMPLED,
        _BPE_STATE,
        _CLEAN_RANKED,
        _UNIGRAM_VOCAB,
        _WORD_OCC,
        _WP_STATE,
        _WINNOW_DOCS,
        _COMPONENTS,
        _DOC_STATS,
        _DOC_TOKS,
        _DOC_UNITS,
        _EXACT_PAIRS,
        _LSH_CANDS,
        _MINHASH_MX,
        _SAMPLE_COMPONENTS,
        _SAMPLE_EXACT,
        _SUBSTR_IDX,
        _ASSIGNED_MEMO,
        _NB_SCORED_MEMO,
        _NEARDUP_PAIRS,
        _PACK_TOTALS,
        _PQ_BOOKS_MEMO,
        _TABLE_MEMO,
        _VERIFIED,
    ):
        memo.clear()
    if not disk_artifacts:
        return
    # the component mapping also persists as a cross-session disk artifact
    # (queries/llm_dedup._components); a cold-cost measurement must wipe it
    # too or the "cold" run is a parquet read of the artifact
    import glob
    import os as _os
    import shutil

    from gmall_flink_spark.sources.materialize import CACHE_ROOT, cache_key

    key = cache_key(sf_dir) if sf_dir else "*"
    for p in glob.glob(_os.path.join(CACHE_ROOT, key, "neardup_components-*")):
        shutil.rmtree(p, ignore_errors=True)
