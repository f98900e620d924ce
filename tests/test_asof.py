"""asof_join: backward-inclusive as-of with tolerance (datapipe.asof_join,
union-and-carry single-window plan).  DuckDB twin is
queries[events_asof_join]; these pin the boundary semantics."""

import datetime as dt

from lightrag_spark.operators import datapipe as dp

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _run(spark, left_rows, right_rows, tolerance_s=None):
    out = dp.asof_join(
        _mk(spark, left_rows), _mk(spark, right_rows), tolerance_s=tolerance_s
    )
    return {r["event_id"]: r for r in out.collect()}


def test_picks_most_recent_at_or_before(spark):
    left = [(10, _t("2024-01-01 12:00:00"), 1, "click", 1.0)]
    right = [
        (1, _t("2024-01-01 10:00:00"), 1, "error", 5.0),
        (2, _t("2024-01-01 11:00:00"), 1, "error", 6.0),
        (3, _t("2024-01-01 13:00:00"), 1, "error", 7.0),  # after -> ignored
    ]
    got = _run(spark, left, right)
    assert got[10]["ref_event_id"] == 2 and got[10]["ref_value"] == 6.0


def test_equal_timestamp_matches_and_order_breaks_ties(spark):
    ts = _t("2024-01-01 12:00:00")
    left = [(10, ts, 1, "click", 1.0)]
    right = [(1, ts, 1, "error", 5.0), (2, ts, 1, "error", 6.0)]
    got = _run(spark, left, right)
    # backward-inclusive; among equal ts the greatest order (event_id) wins
    assert got[10]["ref_event_id"] == 2


def test_no_prior_ref_gives_nulls(spark):
    left = [(10, _t("2024-01-01 09:00:00"), 1, "click", 1.0)]
    right = [(1, _t("2024-01-01 10:00:00"), 1, "error", 5.0)]
    got = _run(spark, left, right)
    assert got[10]["ref_event_id"] is None and got[10]["ref_ts"] is None


def test_key_isolation(spark):
    left = [(10, _t("2024-01-01 12:00:00"), 1, "click", 1.0)]
    right = [(1, _t("2024-01-01 11:00:00"), 2, "error", 5.0)]  # other user
    got = _run(spark, left, right)
    assert got[10]["ref_event_id"] is None


def test_tolerance_boundary_is_inclusive_microseconds(spark):
    left = [
        (10, _t("2024-01-01 13:00:00"), 1, "click", 1.0),
        (11, _t("2024-01-01 13:00:00.000001"), 2, "click", 1.0),
    ]
    right = [
        (1, _t("2024-01-01 12:00:00"), 1, "error", 5.0),  # exactly 3600 s
        (2, _t("2024-01-01 12:00:00"), 2, "error", 6.0),  # 3600.000001 s
    ]
    got = _run(spark, left, right, tolerance_s=3600)
    assert got[10]["ref_event_id"] == 1  # <= tolerance: kept
    assert got[11]["ref_event_id"] is None  # 1 us over: dropped


def test_matches_quadratic_reference(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F

    left = ev.filter(F.col("event_type") != "error")
    right = ev.filter(F.col("event_type") == "error")
    fast = dp.asof_join(left, right, tolerance_s=3600).select(
        "event_id", "ref_event_id"
    )
    l, r = left.alias("l"), right.alias("r")
    slow = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") <= F.col("l.ts"))
            & (
                F.unix_micros(F.col("l.ts").cast("timestamp"))
                - F.unix_micros(F.col("r.ts").cast("timestamp"))
                <= 3600 * 1_000_000
            ),
            "left",
        )
        .groupBy(F.col("l.event_id").alias("event_id"))
        .agg(
            F.max_by(
                F.col("r.event_id"), F.struct(F.col("r.ts"), F.col("r.event_id"))
            ).alias("ref_event_id")
        )
    )
    assert fast.exceptAll(slow).isEmpty() and slow.exceptAll(fast).isEmpty()
