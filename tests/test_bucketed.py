"""Bucketed co-located joins: the join over two tables bucketed on the
same key with the same bucket count must have NO shuffle exchange on
either side (sources/bucketed.py)."""

import pytest
from pyspark.sql import functions as F

from lightrag_spark.sources.bucketed import save_kg_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    import shutil

    for t in ("kgtest_nodes_b", "kgtest_mentions_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a FRESH in-memory catalog does not know tables a previous
        # session wrote, but their warehouse directories persist on disk
        # and block re-creation (LOCATION_ALREADY_EXISTS) — clear both
        loc = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    nodes = spark.createDataFrame(
        [(f"e{i}", i % 5) for i in range(200)], "entity_name string, degree long"
    )
    mentions = spark.createDataFrame(
        [(f"e{i % 200}", f"c{i}") for i in range(1000)],
        "entity_name string, chunk_id string",
    )
    return save_kg_bucketed(nodes, mentions, prefix="kgtest", n_buckets=8)


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    nt, mt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the exchange-elision is observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(mt).join(spark.table(nt), "entity_name")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    _, mt = bucketed_pair
    agg = spark.table(mt).groupBy("entity_name").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == 200
