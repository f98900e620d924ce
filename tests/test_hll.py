"""hll_distinct: engine-replayable HyperLogLog (datapipe.py).  DuckDB
twin is queries[text_hll_tokens]; these pin the estimator's accuracy."""

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp


def test_accuracy_large_set(spark):
    # 5000 distinct values, each seen 3x — duplicates must not inflate
    n = 5000
    df = spark.range(n * 3).select(
        F.lit("g").alias("grp"), (F.col("id") % n).cast("string").alias("v")
    )
    got = dp.hll_distinct(df, group="grp", col="v").collect()[0]
    # m=256 -> standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(got["estimate"] - n) / n < 0.20, got["estimate"]


def test_small_range_linear_counting(spark):
    # 10 distinct values: the linear-counting branch is near-exact
    df = spark.range(100).select(
        F.lit("g").alias("grp"), (F.col("id") % 10).cast("string").alias("v")
    )
    got = dp.hll_distinct(df, group="grp", col="v").collect()[0]
    assert got["n_registers"] <= 10
    assert abs(got["estimate"] - 10) < 1.0, got["estimate"]


def test_groups_independent(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
        (F.col("id") % 20).cast("string").alias("v"),
    )
    got = {r["grp"]: r["estimate"] for r in
           dp.hll_distinct(df, group="grp", col="v").collect()}
    # evens see 10 distinct residues, odds the other 10
    assert abs(got["even"] - 10) < 1.5 and abs(got["odd"] - 10) < 1.5
