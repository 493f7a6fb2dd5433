"""Materialized synthetic-source cache.

The CDC/log synthesizers (cdc_synth.py / log_synth.py) *compute* their JSON
envelopes from the base parquet tables. Left lazy, Catalyst inlines that
synthesis into every downstream filter/projection — each consumer gets a
schema-pruned `from_json(to_json(...))` copy, so one query re-synthesizes
the topic many times per row. No real pipeline does that: the topic exists
at rest (Kafka), and each micro-batch parses it **once**.

This cache is that topic-at-rest: each synthesized source is written to
parquet once per scale factor (parse included, so P1 malformed-row drops
happen at build), and queries scan the parsed envelope. Top-level envelope
columns (table/type/ts) then benefit from parquet predicate pushdown —
which is exactly the production layout a Kafka→bronze landing step yields.

Raw-JSON parsing stays covered: cache *builds* run the full
json→parse_envelope path, and the operator tests exercise raw strings
directly at sf0.001.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

CACHE_ROOT = "/tmp/gmall_synth_cache"


def _build_version(build) -> str:
    """Content-version the cache on the builder's source module: editing a
    synthesizer derivation then silently serving the stale cache cost a
    debugging session (the manual '_env_v2' rename it replaces). Hashing
    the whole defining module catches edits to the helpers the builder
    closure calls, not just the closure body."""
    import hashlib
    import inspect

    try:
        mod = inspect.getmodule(build)
        src = inspect.getsource(build) + (inspect.getsource(mod) if mod else "")
    except (OSError, TypeError):
        return "v0"
    return hashlib.md5(src.encode()).hexdigest()[:10]


def cache_key(sf_dir: str) -> str:
    """THE directory key under CACHE_ROOT for one corpus dir — shared by
    every artifact producer (materialized(), the component mapping) AND
    every scoped invalidator (tables.clear_session_memos), so a
    relative-vs-absolute caller or a future keying change can never make
    a disk wipe miss the artifact it was asked to clear (ADVICE r13 #2).
    realpath-normalized: '/root/testdata/sf0.01', 'testdata/sf0.01' (from
    /root) and a symlinked alias all key the same artifact directory."""
    return os.path.realpath(sf_dir).strip("/").replace("/", "_")


#: per-process memo of the full-walk stamp, keyed by realpath(sf_dir):
#: (cheap signature of the dir's immediate entries, full stamp). The full
#: walk is O(all parquet files) and _data_stamp runs on EVERY materialized()
#: access (it is part of the cache path), so r12 paid the walk ~8x per
#: bench query; the memo drops cache-hit access to one os.scandir.
_STAMP_MEMO: dict[str, tuple[tuple, str]] = {}


#: recursion bound for _dir_signature — far above any real corpus layout
#: (flat files, <table>.parquet/part-*, or a few partitionBy levels); a
#: tree deeper than this raises instead of silently truncating the
#: signature (ADVICE r13 #1: truncation is a silent wrong-answer path)
_SIG_MAX_DEPTH = 16


def _dir_signature(sf_dir: str) -> tuple:
    """Freshness signature: (relpath, mtime_ns, size, is_file) of EVERY
    entry under sf_dir at EVERY depth (bounded by _SIG_MAX_DEPTH — beyond
    it the scan raises rather than serve a truncated signature), following
    symlinks, with a realpath cycle guard. Every rewrite shape — file
    replaced, part file rewritten IN PLACE (same name; only its own mtime
    moves), parts added/removed, replica unlinked, and (ADVICE r13 #1) a
    parquet file ≥2 directory levels down (partitionBy layouts) — lands
    inside the signature and busts the memo. The is_file flag lets
    _data_stamp distinguish `orders.parquet` the Spark OUTPUT DIRECTORY
    from parquet data files: only files feed the stamp, so non-parquet
    churn inside a table dir (a _SUCCESS rewrite, a .crc cleanup) moves
    the dir's mtime and busts this memo but does NOT change the stamp —
    no spurious cache rebuild. Same O(files) cost class as the stamp walk
    it replaces; scandir's cached stat keeps the constant small."""
    ents = []
    seen_dirs: set[str] = set()
    try:
        st = os.stat(sf_dir)
    except OSError:
        return tuple(ents)
    ents.append(("", st.st_mtime_ns, st.st_size, False))
    seen_dirs.add(os.path.realpath(sf_dir))
    stack = [(sf_dir, "", 0)]
    while stack:
        path, rel, depth = stack.pop()
        if depth >= _SIG_MAX_DEPTH:
            raise RuntimeError(
                f"_dir_signature: {path!r} exceeds depth {_SIG_MAX_DEPTH} "
                "below the corpus root — extend _SIG_MAX_DEPTH deliberately "
                "rather than serving a truncated freshness signature"
            )
        try:
            it = os.scandir(path)
        except OSError:
            continue
        with it:
            for e in it:
                try:
                    est = e.stat(follow_symlinks=True)
                except OSError:
                    continue
                erel = f"{rel}/{e.name}" if rel else e.name
                is_dir = e.is_dir(follow_symlinks=True)
                ents.append((erel, est.st_mtime_ns, est.st_size, not is_dir))
                if is_dir:
                    real = os.path.realpath(e.path)
                    if real in seen_dirs:  # symlink cycle guard
                        continue
                    seen_dirs.add(real)
                    stack.append((e.path, erel, depth + 1))
    return tuple(sorted(ents))


def _data_stamp(sf_dir: str) -> str:
    """Content stamp of the SOURCE TABLES a synthesizer reads: every
    parquet file under ``sf_dir`` as (relpath, mtime_ns, size). The code
    stamp alone cannot see a data change — the r12 sf1 spot-sweep caught
    exactly that: the round-11 scaled dir was rebuilt from symlinked to
    id-distinct replicas, but the cached topics (built from the symlink
    era) kept serving, so every CDC query answered for the OLD corpus
    while the oracle read the new one. Stamping the data closes the whole
    class: a rebuilt/regenerated sf_dir can never serve a stale topic.

    Conservative by design (any table file change invalidates every topic
    of that sf_dir) — over-invalidation costs one rebuild; staleness costs
    a wrong answer. The walk follows symlinks, and relpath participates so
    '10 symlinked copies' and '1 file' stamp differently.

    Since r14 the stamp derives FROM the all-depth signature (ADVICE r13
    #1 closed the ≥2-level blind spot by making _dir_signature recursive;
    the separate os.walk became redundant): every call pays exactly one
    bounded scandir sweep, and the memo skips re-hashing on an unchanged
    dir (VERDICT r12 task 6's O(files) bound, now with zero depth
    residual)."""
    import hashlib

    memo_key = os.path.realpath(sf_dir)
    sig = _dir_signature(sf_dir)
    hit = _STAMP_MEMO.get(memo_key)
    if hit is not None and hit[0] == sig:
        return hit[1]

    ents = [
        f"{rel}:{mtime}:{size}"
        for rel, mtime, size, is_file in sig
        if is_file and rel.endswith(".parquet")
    ]
    stamp = hashlib.md5("|".join(sorted(ents)).encode()).hexdigest()[:10]
    _STAMP_MEMO[memo_key] = (sig, stamp)
    return stamp


def materialized(
    spark: SparkSession, sf_dir: str, name: str, build, n_files: int = 16
) -> DataFrame:
    """Return the cached parquet for (sf_dir, name), building it on first
    use. Concurrency-safe: built under a unique tmp dir, atomically renamed;
    losers of the race clean up and read the winner's copy. The cache key
    carries BOTH a code stamp (_build_version) and a data stamp
    (_data_stamp) — either a synthesizer edit or a source-table rewrite
    produces a fresh directory, never a stale serve.

    ``n_files`` spreads the cache over that many parquet files: the
    synthesis plans produce 1-2 output partitions, and a 1-2-file bronze
    table caps every downstream scan at 1-2 cores (a 20 MB file is a single
    row group, so ``maxPartitionBytes`` can't split it). Sizing bronze
    files for scan parallelism is the landing-step's job — at cluster scale
    the same knob is the writer's target file size."""
    path = os.path.join(
        CACHE_ROOT,
        cache_key(sf_dir),
        f"{name}-{_build_version(build)}-{_data_stamp(sf_dir)}",
    )
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.__build_{uuid.uuid4().hex[:8]}__"
        build().repartition(n_files).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
