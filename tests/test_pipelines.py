"""§2.11 parity index: all 20 reference pipeline apps resolve to runnable
batch compositions (the two custom ones — DimApp, log split — smoke-checked
for shape here; the rest are oracle-checked via their query mappings)."""

from __future__ import annotations

from gmall_flink_spark.plans.pipelines import PIPELINES, run

SF = "/root/testdata/sf0.001"


def test_registry_covers_all_reference_apps():
    apps = {p.app for p in PIPELINES}
    assert len(apps) == 20  # 17 distinct mains + 3 perf-variant collapses


def test_dim_app_routes_and_prunes(spark):
    out = run("DimApp", spark, SF)
    rows = out.collect()
    assert rows and all(r["sink_table"] == "dim_order_info" for r in rows)
    assert all(set(r["data_pruned"]).issubset({"id", "user_id", "total_amount"}) for r in rows)


def test_payment_window_has_uu_grain(spark):
    """DwsTradePaymentWindow maps to the payment-UU window (D5+A5+A6), not
    the upstream P7 fact stream: output must carry stt/edt decoration and
    the two UU counters, and new payers can never exceed unique payers."""
    out = run("DwsTradePaymentWindow", spark, SF)
    assert out.columns == ["stt", "edt", "payment_suc_uu_ct", "payment_suc_new_user_ct"]
    rows = out.collect()
    assert rows
    assert all(r["payment_suc_new_user_ct"] <= r["payment_suc_uu_ct"] for r in rows)
    assert all(r["stt"].endswith("00:00:00") and r["edt"].endswith("00:00:00") for r in rows)


def test_cart_uu_window_uses_w5_event_time(spark):
    """DwsTradeCartAddUuWindow maps to cart_uu_daily — the query whose event
    time is coalesce(operate_time, create_time) (W5)."""
    out = run("DwsTradeCartAddUuWindow", spark, SF)
    assert out.columns == ["cur_date", "cart_uu_ct"]
    assert out.count() > 0


def test_log_split_page_repairs_is_new(spark):
    from pyspark.sql import functions as F

    out = run("DwdTrafficBaseLogSplit", spark, SF).withColumn(
        "cur_date", F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd")
    )
    rows = out.select("mid", "is_new", "is_new_fixed", "cur_date", "first_date").collect()
    assert rows
    for r in rows:
        if r["is_new_fixed"] == 1:
            assert r["is_new"] == "1" and r["cur_date"] == r["first_date"]
