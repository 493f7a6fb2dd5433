"""Deduplication & per-key stateful operators (SURVEY §2.6 D1-D9).

These are the reference's signature moves — Flink keyed ValueState patterns
(keep-first filters, first-event-per-day UV detectors, first-ever "new user"
flags, 7-day returning-visitor detection). Each is defined here as its
*batch twin*: a declarative window-function transformation that is
oracle-checkable and that Structured Streaming replicates with
``dropDuplicatesWithinWatermark`` / ``applyInPandasWithState``
(see gmall_flink_spark.streaming.stateful for the streaming forms).

Scale posture: every op is a window function over a hash-partitioned key —
one shuffle on the key, no driver-side state, no per-row Python. Skewed keys
are AQE's problem (skew-join/partition splitting), not ours.

Reference citations:
  D1 keep-first filter      app/lab/DwsLeftJoinDuplication02First.java:44-71
  D2 keep-first w/ TTL      app/dws/DwsTradeSkuOrderWindow.java:112-148
  D3 keep-last (timer)      app/lab/DwsLeftJoinDuplication03Last.java:54-79
  D4 first-event-per-day    app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:79-128
  D5 first-per-day+ever     app/dws/DwsTradeOrderWindow.java:62-91
  D6 7-day returning user   app/dws/DwsUserUserLoginWindow.java:74-121
  D8 is_new repair          app/dwd/DwdTrafficBaseLogSplit.java:63-97
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def keep_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]) -> DataFrame:
    """D1/D2: keep the first row per key under a total order.

    ``order_by`` must be a total order within each key group (append a
    unique id as tie-break) or results are nondeterministic.
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    return df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) == 1).drop(_RN)


def keep_last(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]) -> DataFrame:
    """D3: keep the last row per key (reference emits on a +5s timer; the
    batch twin is simply the max under the order)."""
    w = Window.partitionBy(*_cols(keys)).orderBy(*[c.desc() for c in _cols(order_by)])
    return df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) == 1).drop(_RN)


def first_per_day(
    df: DataFrame, key: str, ts: str = "ts", order_by: Sequence[Column | str] | None = None
) -> DataFrame:
    """D4/D7: the first event of each key on each day, with a ``cur_date``
    column. This is the exact-UV detector: downstream ``groupBy(cur_date)
    .count()`` equals count-distinct-key-per-day."""
    day = F.date_format(ts, "yyyy-MM-dd")
    df = df.withColumn("cur_date", day)
    return keep_first(df, [key, "cur_date"], list(order_by or [ts]))


def with_first_seen(df: DataFrame, key: str, ts: str = "ts") -> DataFrame:
    """D5/D8 building block: attach ``first_date`` = the key's first-ever
    active day (unbounded min over the key — the batch twin of the
    reference's forever-lived ValueState<firstDate>)."""
    w = Window.partitionBy(key)
    return df.withColumn("first_date", F.min(F.date_format(ts, "yyyy-MM-dd")).over(w))


def daily_new_flags(df: DataFrame, key: str, ts: str = "ts") -> DataFrame:
    """D5: one row per key per day with ``is_first_ever`` — the
    order/payment "unique user + new user" detector.

    Plan shape (optimization r14, guide §2.4): ONE exchange on the key —
    per-key active days fold into a map-side-combined ``collect_set``,
    and the sorted set re-expands with ``posexplode`` (position 0 == the
    key's minimum day). The previous distinct-then-window form paid two
    exchanges ((key, day) hash, then key hash) plus a window sort for the
    same rows. Per-key state is bounded by the key's distinct ACTIVE days
    (the retained-days bound every D4-D7 state shares), not by volume."""
    days = (
        df.select(F.col(key), F.date_format(ts, "yyyy-MM-dd").alias("cur_date"))
        .groupBy(key)
        .agg(F.sort_array(F.collect_set("cur_date")).alias("_days"))
    )
    return days.select(
        F.col(key), F.posexplode("_days").alias("_pos", "cur_date")
    ).select(F.col(key), "cur_date", (F.col("_pos") == 0).cast("int").alias("is_first_ever"))


def returning_flags(df: DataFrame, key: str, ts: str = "ts", gap_days: int = 7) -> DataFrame:
    """D6: one row per key per active day with ``is_back`` = 1 when the
    previous active day is >= gap_days earlier (the 7-day returning-visitor
    rule; reference keeps lastVisitDate in keyed state)."""
    # ONE exchange on the key (optimization r14, guide §2.4 — the same
    # collect_set fold as daily_new_flags): the sorted per-key day array
    # re-expands with posexplode, and lag(cur_date) is just the previous
    # array element (element_at is 1-based, _pos 0-based, so
    # element_at(_days, _pos) IS the predecessor). The previous
    # distinct-then-lag-window form paid two exchanges plus a window sort.
    days = (
        df.select(F.col(key), F.to_date(ts).alias("d"))
        .groupBy(key)
        .agg(F.sort_array(F.collect_set("d")).alias("_days"))
    )
    exploded = days.select(
        F.col(key), "_days", F.posexplode("_days").alias("_pos", "cur_date")
    )
    prev = F.when(
        F.col("_pos") > 0, F.element_at("_days", F.col("_pos"))
    )
    return exploded.select(
        F.col(key),
        F.date_format("cur_date", "yyyy-MM-dd").alias("cur_date"),
        F.when(
            prev.isNotNull() & (F.datediff("cur_date", prev) >= gap_days), 1
        ).otherwise(0).alias("is_back"),
    )


def first_non_null(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str], cols: Sequence[str]
) -> DataFrame:
    """D9: delta-emission left-join compaction
    (app/lab/DwsLeftJoinDuplication01Sum.java:46-109) — one row per key
    where each column carries its first non-null value under the order (the
    reference emits each side's columns once and downstream sums deltas;
    the compacted batch twin is the summed end state)."""
    w = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    picked = [F.first(c, ignorenulls=True).over(w).alias(c) for c in cols]
    return df.select(*[F.col(k) for k in keys], *picked).distinct()


def repair_is_new(df: DataFrame, key: str, ts: str, claimed: Column) -> DataFrame:
    """D8: fix an unreliable client-sent ``is_new`` flag against the key's
    true first-seen day: a claimed 1 on a later day is rewritten to 0; the
    flag is 1 only on the key's genuine first day when claimed."""
    df = with_first_seen(df, key, ts)
    cur = F.date_format(ts, "yyyy-MM-dd")
    return df.withColumn(
        "is_new_fixed",
        F.when((claimed == 1) & (cur == F.col("first_date")), 1).otherwise(0),
    )
