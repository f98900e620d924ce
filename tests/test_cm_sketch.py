"""cm_heavy_hitters: Count-Min top-k (datapipe.py).  DuckDB twin is
queries[text_cm_heavy_hitters]."""

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp


def test_overestimate_never_under(spark):
    # 3 hot values and a long tail; CM estimates are >= true counts
    rows = (
        [("hot1",)] * 500 + [("hot2",)] * 300 + [("hot3",)] * 200
        + [(f"tail{i}",) for i in range(400)]
    )
    df = spark.createDataFrame(rows, "w string")
    got = {r["value"]: r for r in dp.cm_heavy_hitters(df, col="w", k=5).collect()}
    true = {"hot1": 500, "hot2": 300, "hot3": 200}
    for v, n in true.items():
        assert got[v]["cm_estimate"] >= n
    # the hot keys own the top ranks in true-frequency order
    assert got["hot1"]["rank"] == 1
    assert got["hot2"]["rank"] == 2
    assert got["hot3"]["rank"] == 3


def test_exact_when_no_collisions_possible(spark):
    # few distinct values << width: min over depth rows kills every
    # collision, so estimates are exact
    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "w string")
    got = {r["value"]: r["cm_estimate"]
           for r in dp.cm_heavy_hitters(df, col="w", k=10).collect()}
    assert got == {"a": 7, "b": 3, "c": 1}


def test_k_truncates_deterministically(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(50)], "w string")
    out = dp.cm_heavy_hitters(df, col="w", k=10)
    rows = out.collect()
    assert len(rows) == 10
    # all counts 1 -> rank ties break by value ascending
    assert [r["value"] for r in rows] == sorted(r["value"] for r in rows)
