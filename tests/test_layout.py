"""Z-order layout: multi-column file skipping, measured from parquet
row-group statistics (what a reader's min/max pruning actually uses)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from gmall_flink_spark.sinks.layout import write_zordered
from gmall_flink_spark.sources.tables import table

SF = "/root/testdata/sf0.01"


def _hit_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min, max] for ``col`` intersects
    [lo, hi] — the row groups a stats-pruning reader must scan."""
    total = hits = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                hits += 1
    assert total > 0
    return hits / total


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordering events on (user_id, value) must let a narrow predicate
    on EITHER column prune most row groups, where the unsorted layout
    prunes (almost) nothing — the multi-dimensional clustering contract.
    Bounds are loose (<= 0.5 vs >= 0.9) because Morton locality is
    statistical, not exact."""
    ev = table(spark, SF, "events").select("event_id", "user_id", "value")
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    ev.repartition(64).write.mode("overwrite").parquet(plain)
    write_zordered(ev, zord, ["user_id", "value"], n_files=64)

    # same rows either way
    assert (
        spark.read.parquet(zord).count() == spark.read.parquet(plain).count()
    )

    stats = ev.agg(
        F.expr("percentile(user_id, 0.45)").alias("u_lo"),
        F.expr("percentile(user_id, 0.55)").alias("u_hi"),
        F.expr("percentile(value, 0.45)").alias("v_lo"),
        F.expr("percentile(value, 0.55)").alias("v_hi"),
    ).collect()[0]

    for col, lo, hi in (
        ("user_id", int(stats.u_lo), int(stats.u_hi)),
        ("value", float(stats.v_lo), float(stats.v_hi)),
    ):
        z = _hit_fraction(zord, col, lo, hi)
        p = _hit_fraction(plain, col, lo, hi)
        assert z <= 0.5, f"{col}: zorder layout did not prune ({z:.2f})"
        assert p >= 0.9, f"{col}: unsorted layout unexpectedly pruned ({p:.2f})"


def test_zorder_handles_non_numeric_columns(spark, tmp_path):
    """zorder_key over a string + a date column must produce a varying
    Morton key for both dimensions (regression: the approxQuantile path
    once cast strings to double -> all-null -> constant bucket)."""
    from pyspark.sql import functions as F

    from gmall_flink_spark.sinks.layout import zorder_key

    df = spark.range(0, 2000).select(
        F.concat(F.lit("cc_"), F.lpad((F.col("id") % 97).cast("string"), 3, "0")).alias("code"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
        F.col("id").alias("v"),
    )
    keyed = zorder_key(df, ["code", "d"])
    stats = keyed.agg(
        F.countDistinct("_zkey").alias("nk"),
        F.min("_zkey").alias("lo"),
        F.max("_zkey").alias("hi"),
    ).collect()[0]
    assert stats["nk"] > 50, "z-key collapsed — a dimension contributed a constant"
    # both dimensions contribute: keys restricted to one code still vary by date
    one_code = keyed.where(F.col("code") == "cc_001")
    assert one_code.select("_zkey").distinct().count() > 1


def test_materialized_cache_invalidates_on_data_rewrite(spark, tmp_path):
    """The synth-topic cache must version on DATA, not just builder code
    (r12 sf1 lesson: a rebuilt scaled dir kept serving topics cached from
    its previous contents — every CDC query answered for the old corpus).
    Rewriting a source table under sf_dir must produce a fresh cache dir
    whose content reflects the new data; the unchanged dir keeps serving
    the same cache path (no spurious rebuilds)."""
    import time

    from pyspark.sql import functions as F

    from gmall_flink_spark.sources.materialize import materialized

    sf = str(tmp_path)
    spark.range(0, 5).write.parquet(f"{sf}/orders.parquet")

    def build():
        return spark.read.parquet(f"{sf}/orders.parquet").withColumn(
            "v", F.col("id") * 2
        )

    first = sorted(r["v"] for r in materialized(spark, sf, "t", build).collect())
    assert first == [0, 2, 4, 6, 8]
    again = sorted(r["v"] for r in materialized(spark, sf, "t", build).collect())
    assert again == first  # same stamp -> same cache, no rebuild surprise

    time.sleep(0.05)  # distinct mtime for the rewrite
    spark.range(10, 13).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    refreshed = sorted(r["v"] for r in materialized(spark, sf, "t", build).collect())
    assert refreshed == [20, 22, 24], refreshed  # new data, never the stale topic


def test_data_stamp_memoized_no_rehash_on_hit(spark, tmp_path, monkeypatch):
    """_data_stamp is on every materialized() access path: an unchanged dir
    serves the memo without re-hashing (VERDICT r12 task 6 — the scan
    itself is ONE bounded scandir sweep per call by design since r14); a
    rewrite busts the memo AND changes the stamp (staleness safety from
    test_materialized_cache_invalidates_on_data_rewrite is preserved),
    including an IN-PLACE part rewrite and — the ADVICE r13 #1 hole — a
    parquet file nested ≥2 directory levels below sf_dir (partitionBy
    layouts)."""
    import hashlib
    import os
    import time

    from gmall_flink_spark.sources import materialize as M

    sf = str(tmp_path)
    spark.range(0, 5).write.parquet(f"{sf}/orders.parquet")

    M._STAMP_MEMO.clear()
    first = M._data_stamp(sf)

    hashes = []
    real_md5 = hashlib.md5
    monkeypatch.setattr(
        hashlib, "md5", lambda *a, **k: hashes.append(1) or real_md5(*a, **k)
    )
    assert M._data_stamp(sf) == first
    assert hashes == [], "cache-hit access still recomputed the stamp"

    time.sleep(0.05)  # distinct mtime for the rewrite
    spark.range(10, 13).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    second = M._data_stamp(sf)
    assert second != first, "rewrite must change the stamp"
    assert len(hashes) == 1  # exactly one re-hash, then memoized again
    assert M._data_stamp(sf) == second and len(hashes) == 1

    # IN-PLACE part-file rewrite: only the inner file's mtime moves (the
    # parent dir's does not — no create/delete happened)
    part = next(
        os.path.join(f"{sf}/orders.parquet", n)
        for n in os.listdir(f"{sf}/orders.parquet")
        if n.endswith(".parquet")
    )
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    third = M._data_stamp(sf)
    assert third != second, "in-place rewrite must bust the memo"

    # DEEP layout (ADVICE r13 #1): a partitionBy-style parquet file three
    # levels down participates in the stamp, and its in-place rewrite
    # (parent dirs untouched) busts the memo too
    deep_dir = os.path.join(sf, "events.parquet", "p=1", "q=2")
    os.makedirs(deep_dir)
    spark.range(0, 3).coalesce(1).write.parquet(os.path.join(deep_dir, "inner"))
    fourth = M._data_stamp(sf)
    assert fourth != third, "deep parquet files must participate in the stamp"
    deep_part = next(
        os.path.join(deep_dir, "inner", n)
        for n in os.listdir(os.path.join(deep_dir, "inner"))
        if n.endswith(".parquet")
    )
    st = os.stat(deep_part)
    os.utime(deep_part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert M._data_stamp(sf) != fourth, "depth-4 in-place rewrite must bust the memo"


def test_clear_session_memos_covers_every_memo():
    """clear_session_memos is the ONE wipe the probes, the explain audit,
    and every cold-cost measurement rely on; a memo dict that exists but
    is not registered silently serves warm state to a measurement that
    believes it cleared everything (r14 finding: _WP_STATE was defined in
    r12 and never registered, so the explain audit's WordPiece rows read
    the tokenizer-compare run's warm trainer). Discover every module-level
    session-memo dict by its declaration pattern, poison each with a
    sentinel, wipe, and require all empty — a NEW memo that skips
    registration fails here the round it lands."""
    import importlib
    import pathlib
    import re

    import gmall_flink_spark

    from gmall_flink_spark.sources.tables import clear_session_memos

    pkg_root = pathlib.Path(gmall_flink_spark.__file__).parent
    found = []
    for path in pkg_root.rglob("*.py"):
        text = path.read_text()
        mod = "gmall_flink_spark." + ".".join(
            path.relative_to(pkg_root).with_suffix("").parts
        )
        for m in re.finditer(r"^(_[A-Z_0-9]+): dict\[tuple", text, re.M):
            found.append((mod, m.group(1)))
    assert len(found) >= 19, f"memo discovery broke: {found}"
    sentinel = ("__clear_session_memos_coverage_test__",)
    for modname, name in found:
        getattr(importlib.import_module(modname), name)[sentinel] = None
    clear_session_memos(disk_artifacts=False)
    missed = [
        f"{modname}.{name}"
        for modname, name in found
        if sentinel in getattr(importlib.import_module(modname), name)
    ]
    assert not missed, f"memos NOT cleared by clear_session_memos: {missed}"
