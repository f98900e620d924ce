"""funnel_counts + retention_cohorts (datapipe.py).  DuckDB twins are
queries[events_funnel, events_retention]."""

import datetime as dt

from lightrag_spark.operators import datapipe as dp

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes a -> b in order
        (1, _t("2024-01-01 10:00"), 1, "a"),
        (2, _t("2024-01-01 11:00"), 1, "b"),
        # u2 did b BEFORE a and never after: drops at step 2
        (3, _t("2024-01-01 09:00"), 2, "b"),
        (4, _t("2024-01-01 10:00"), 2, "a"),
        # u3 same-instant progression counts (>=)
        (5, _t("2024-01-01 10:00"), 3, "a"),
        (6, _t("2024-01-01 10:00"), 3, "b"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {r["step"]: r for r in dp.funnel_counts(ev, steps=("a", "b")).collect()}
    assert got["a"]["n_users"] == 3
    assert got["b"]["n_users"] == 2
    assert got["a"]["step_idx"] == 1 and got["b"]["step_idx"] == 2


def test_funnel_uses_earliest_qualifying_occurrence(spark):
    rows = [
        (1, _t("2024-01-01 10:00"), 1, "a"),
        (2, _t("2024-01-01 12:00"), 1, "b"),  # first b after a
        (3, _t("2024-01-01 13:00"), 1, "c"),  # c after the 12:00 b: counts
        (4, _t("2024-01-01 11:00"), 1, "c"),  # c before b: must not count
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {r["step"]: r["n_users"]
           for r in dp.funnel_counts(ev, steps=("a", "b", "c")).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_retention_triangle(spark):
    rows = [
        (1, _t("2024-01-01 10:00"), 1, "signup"),
        (2, _t("2024-01-01 15:00"), 1, "view"),   # day 0 (distinct day)
        (3, _t("2024-01-03 10:00"), 1, "click"),  # day 2
        (4, _t("2024-01-02 10:00"), 2, "signup"),
        (5, _t("2024-01-02 23:00"), 2, "view"),   # day 0
        # u3 never signs up: absent entirely
        (6, _t("2024-01-01 10:00"), 3, "view"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {(r["cohort_day_us"], r["day_offset"]): r["n_users"]
           for r in dp.retention_cohorts(ev).collect()}
    d1 = int(_t("2024-01-01").timestamp() * 1_000_000)
    d2 = int(_t("2024-01-02").timestamp() * 1_000_000)
    assert got[(d1, 0)] == 1 and got[(d1, 2)] == 1
    assert got[(d2, 0)] == 1
    assert all(k[0] in (d1, d2) for k in got)
