"""events_pivot + events_hourly_anomalies (datapipe.py).  Twins are
queries[events_pivot, events_anomalies]."""

import datetime as dt

from lightrag_spark.operators import datapipe as dp

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_pivot_counts_and_static_schema(spark):
    rows = [
        (1, _t("2024-01-01 10:00"), 1, "a"),
        (2, _t("2024-01-01 10:05"), 1, "a"),
        (3, _t("2024-01-01 10:10"), 1, "b"),
        (4, _t("2024-01-01 10:00"), 2, "b"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    out = dp.events_pivot(ev, types=("a", "b", "c"))
    assert out.columns == ["user_id", "n_a", "n_b", "n_c"]
    got = {r["user_id"]: r for r in out.collect()}
    assert (got[1]["n_a"], got[1]["n_b"], got[1]["n_c"]) == (2, 1, 0)
    assert (got[2]["n_a"], got[2]["n_b"], got[2]["n_c"]) == (0, 1, 0)


def test_anomaly_zscore(spark):
    # type "a": hourly counts 1, 1, 4 -> mean 2, var 2, z(4) = sqrt(2)
    rows = (
        [(1, _t("2024-01-01 10:00"), 1, "a"), (2, _t("2024-01-01 11:00"), 1, "a")]
        + [(10 + i, _t("2024-01-01 12:00") + dt.timedelta(minutes=i), 1, "a")
           for i in range(4)]
    )
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {r["hour_us"]: r for r in dp.events_hourly_anomalies(ev).collect()}
    spike = int(_t("2024-01-01 12:00").timestamp() * 1_000_000)
    assert got[spike]["n"] == 4
    assert got[spike]["zscore"] == round(2 / 2**0.5, 4)


def test_anomaly_degenerate_type_scores_zero(spark):
    ev = spark.createDataFrame([(1, _t("2024-01-01 10:00"), 1, "only")], SCHEMA)
    got = dp.events_hourly_anomalies(ev).collect()
    assert len(got) == 1 and got[0]["zscore"] == 0.0
