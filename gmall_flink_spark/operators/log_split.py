"""M1: the five-way traffic-log split (SURVEY §2.8,
app/dwd/DwdTrafficBaseLogSplit.java:41-48,98-142).

The reference makes one pass over topic_log and side-outputs err / start /
action / display, keeping page as the main stream; actions and displays are
exploded JSON arrays enriched with `common` + `page_id` (+ each action's own
ts). In Spark the same pass is one parsed DataFrame and five filtered /
exploded projections — Catalyst prunes each branch's columns independently,
and in streaming the fan-out runs inside ``foreachBatch`` so the source is
read once per micro-batch (not five times).

Split semantics mirrored exactly: an err log is emitted to the err output
and *continues* through the start/page classification (the reference pops
`err` then keeps processing); start logs never produce page/action/display
rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_flink_spark.schemas import PAGE_LOG

SPLITS = ("err", "start", "page", "action", "display")


def parse_page_log(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1 for topic_log: permissive JSON parse, drop malformed rows."""
    j = F.from_json(F.col(value_col), PAGE_LOG)
    return (
        raw.select(j.alias("j"))
        .where(F.col("j").isNotNull() & F.col("j.common.mid").isNotNull())
        .select("j.*")
    )


def split_log(parsed: DataFrame) -> dict[str, DataFrame]:
    """One parsed log stream -> the five DWD outputs, all flattened to
    sink-ready columns (common.* prefixed flat, like the reference's JSON)."""
    common = [F.col(f"common.{f.name}").alias(f.name) for f in parsed.schema["common"].dataType.fields]

    err = parsed.where(F.col("err").isNotNull()).select(
        *common, F.col("err.error_code"), F.col("err.msg"), "ts"
    )
    start = parsed.where(F.col("start").isNotNull()).select(
        *common,
        F.col("start.entry"),
        F.col("start.loading_time"),
        F.col("start.open_ad_id"),
        "ts",
    )
    pages = parsed.where(F.col("start").isNull() & F.col("page").isNotNull())
    page = pages.select(
        *common,
        F.col("page.page_id"),
        F.col("page.item"),
        F.col("page.item_type"),
        F.col("page.last_page_id"),
        F.col("page.during_time"),
        "ts",
    )
    action = pages.where(F.col("actions").isNotNull()).select(
        *common,
        F.col("page.page_id"),
        F.explode("actions").alias("a"),
    ).select("*", "a.action_id", "a.item", "a.item_type", F.col("a.ts").alias("ts")).drop("a")
    display = pages.where(F.col("displays").isNotNull()).select(
        *common,
        F.col("page.page_id"),
        "ts",
        F.explode("displays").alias("d"),
    ).select("*", "d.display_type", "d.item", "d.item_type", F.col("d.order").alias("display_order"), "d.pos_id").drop("d")

    return {"err": err, "start": start, "page": page, "action": action, "display": display}


def log_split_sinks(base_dir: str):
    """Streaming fan-out (M1): one foreachBatch writer appending each split
    to its own parquet sink directory — five sinks, one source scan."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        parsed = batch_df if "common" in batch_df.columns else parse_page_log(batch_df)
        parsed.persist()
        try:
            for name, df in split_log(parsed).items():
                df.write.mode("append").parquet(os.path.join(base_dir, name))
        finally:
            parsed.unpersist()

    return write
