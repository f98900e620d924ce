"""group_quantiles: exact rank-selection quantiles (datapipe.py).
DuckDB twin is queries[events_quantiles]."""

from lightrag_spark.operators import datapipe as dp

SCHEMA = "event_id long, event_type string, value double"


def test_exact_ranks(spark):
    vals = [float(i) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)], SCHEMA
    )
    got = {r["q"]: r for r in dp.group_quantiles(df, qs=(0.5, 0.9, 0.99)).collect()}
    # ranks: ceil(0.5*100)=50, ceil(0.9*100)=90 (the IEEE product is
    # exactly 90.0), ceil(0.99*100)=99 (product 99.00000000000001 -> 100?
    # no: ceil of the actual IEEE product, same in both engines)
    import math

    assert got[0.5]["value_at"] == float(math.ceil(0.5 * 100))
    assert got[0.9]["value_at"] == float(math.ceil(0.9 * 100))
    assert got[0.99]["value_at"] == float(math.ceil(0.99 * 100))
    assert got[0.5]["n"] == 100


def test_single_row_group(spark):
    df = spark.createDataFrame([(1, "x", 42.0)], SCHEMA)
    got = dp.group_quantiles(df, qs=(0.5, 0.99)).collect()
    assert len(got) == 2 and all(r["value_at"] == 42.0 for r in got)


def test_groups_independent_and_duplicate_values(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0), (4, "b", 1.0), (5, "b", 9.0)],
        SCHEMA,
    )
    got = {(r["event_type"], r["q"]): r["value_at"]
           for r in dp.group_quantiles(df, qs=(0.5,)).collect()}
    assert got[("a", 0.5)] == 5.0
    assert got[("b", 0.5)] == 1.0  # ceil(0.5*2)=1 -> first value
