"""interval_join: binned containment join (datapipe.py).  DuckDB twin is
queries[events_interval_join]."""

import datetime as dt

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp

PT_SCHEMA = "event_id long, ts timestamp, user_id long"
IV_SCHEMA = "user_id long, start_ts timestamp, end_ts timestamp, iv_id string"


def _t(s):
    return dt.datetime.fromisoformat(s)


def _run(spark, pts, ivs, bin_s=3600):
    p = spark.createDataFrame(pts, PT_SCHEMA)
    i = spark.createDataFrame(ivs, IV_SCHEMA)
    out = dp.interval_join(p, i, bin_s=bin_s)
    return sorted((r["event_id"], r["iv_id"]) for r in out.collect())


def test_bounds_inclusive_both_ends(spark):
    s, e = _t("2024-01-01 10:00:00"), _t("2024-01-01 12:00:00")
    pts = [
        (1, s, 7),  # exactly at start
        (2, e, 7),  # exactly at end
        (3, _t("2024-01-01 12:00:00.000001"), 7),  # 1 us past end
        (4, _t("2024-01-01 09:59:59.999999"), 7),  # 1 us before start
        (5, _t("2024-01-01 11:00:00"), 8),  # wrong key
    ]
    got = _run(spark, pts, [(7, s, e, "A")])
    assert got == [(1, "A"), (2, "A")]


def test_interval_spanning_many_bins(spark):
    # 1-minute bins, 3-hour interval: the explode covers every bin
    s, e = _t("2024-01-01 00:00:00"), _t("2024-01-01 03:00:00")
    pts = [(1, _t("2024-01-01 02:59:30"), 7), (2, _t("2024-01-01 03:00:30"), 7)]
    got = _run(spark, pts, [(7, s, e, "A")], bin_s=60)
    assert got == [(1, "A")]


def test_overlapping_intervals_emit_k_rows_no_dups(spark):
    s1, e1 = _t("2024-01-01 10:00:00"), _t("2024-01-01 12:00:00")
    s2, e2 = _t("2024-01-01 11:00:00"), _t("2024-01-01 13:00:00")
    pts = [(1, _t("2024-01-01 11:30:00"), 7)]
    got = _run(spark, pts, [(7, s1, e1, "A"), (7, s2, e2, "B")])
    assert got == [(1, "A"), (1, "B")]


def test_plan_is_equijoin_not_nested_loop(spark):
    p = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = p.groupBy("user_id").agg(F.min("ts").alias("start_ts")).select(
        "user_id",
        "start_ts",
        (F.col("start_ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        F.col("user_id").cast("string").alias("iv_id"),
    )
    plan = (
        dp.interval_join(p, iv)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
