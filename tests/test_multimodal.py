"""Multimodal plumbing (llm/multimodal.py): the decode stub's checksum is
pinned against plain-Python byte math (not SQL-expressible, so the DuckDB
oracle only sees byte_len — this test owns the checksum contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_spark.llm.multimodal import decode_media, decode_stub, media_table

SF = "/root/testdata/sf0.001"


def test_decode_checksum_matches_python(spark):
    docs = (
        media_table(spark, SF)
        .orderBy("media_id")
        .limit(20)
        .select("media_id", "payload")
        .collect()
    )
    expected = {r["media_id"]: decode_stub(bytes(r["payload"])) for r in docs}
    out = {
        r["media_id"]: (r["byte_len"], r["checksum"])
        for r in decode_media(media_table(spark, SF))
        .where(F.col("media_id").isin(*expected.keys()))
        .collect()
    }
    assert out == expected


def test_media_schema_and_partitioned_decode(spark):
    m = media_table(spark, SF).repartition(8)
    out = decode_media(m)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "byte_len", "checksum", "width", "height",
    ]
    assert out.count() == m.count()
