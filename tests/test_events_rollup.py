"""events_rollup: hypertable-style multi-granularity continuous aggregate
(datapipe.events_rollup).  DuckDB twin is queries[events_rollup]."""

import datetime as dt

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_levels_and_exact_cents(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 15)
    t1 = dt.datetime(2024, 1, 1, 11, 45)
    t2 = dt.datetime(2024, 1, 2, 10, 5)
    events = spark.createDataFrame(
        [
            (1, t0, 1, "click", 1.25),
            (2, t1, 1, "click", 2.50),
            (3, t2, 2, "view", 0.10),
        ],
        SCHEMA,
    )
    out = dp.events_rollup(events).collect()
    by_key = {(r["event_type"], r["day_us"], r["hour_us"]): r for r in out}

    # grand total
    g = by_key[(None, None, None)]
    assert g["n_events"] == 3 and g["sum_cents"] == 125 + 250 + 10
    # per-type level
    c = by_key[("click", None, None)]
    assert c["n_events"] == 2 and c["sum_cents"] == 375
    # day level for click
    day1 = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    d = by_key[("click", day1, None)]
    assert d["n_events"] == 2
    # hour level
    hour10 = int(dt.datetime(2024, 1, 1, 10).timestamp() * 1_000_000)
    h = by_key[("click", day1, hour10)]
    assert h["n_events"] == 1 and h["sum_cents"] == 125
    # level count: 4 hour rows? 3 distinct (type,day,hour) + 2 (type,day)
    # + 2 (type) + 1 grand = 8
    assert len(out) == 8


def test_single_expand_single_shuffle_plan(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = dp.events_rollup(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    # one exchange feeding the final aggregate (AQE may add reads; count
    # the shuffle exchanges only)
    assert plan.count("Exchange hashpartitioning") <= 1
