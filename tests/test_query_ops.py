"""Query-side operator tests (SURVEY.md §2.7)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _kg(spark):
    nodes = spark.createDataFrame(
        [
            {"entity_name": n, "entity_type": "concept", "degree": d,
             "description": f"{n} desc " + "w " * 10,
             "source_ids": [f"c{i}" for i in range(6)]}
            for n, d in [("a", 5), ("b", 4), ("c", 3), ("d", 1), ("e", 0)]
        ]
    )
    edges = spark.createDataFrame(
        [
            {"src": "a", "tgt": "b", "weight": 3.0, "rank": 9, "description": "ab"},
            {"src": "a", "tgt": "c", "weight": 2.0, "rank": 8, "description": "ac"},
            {"src": "b", "tgt": "c", "weight": 1.0, "rank": 7, "description": "bc"},
            {"src": "c", "tgt": "d", "weight": 1.0, "rank": 4, "description": "cd"},
        ]
    )
    return nodes, edges


def test_top_entities_and_onehop(spark):
    from lightrag_spark.plans.query import one_hop_edges, top_entities_by_degree

    nodes, edges = _kg(spark)
    seeds = top_entities_by_degree(nodes, k=2)
    got = [r["entity_name"] for r in seeds.orderBy("rank").collect()]
    assert got == ["a", "b"]

    hop = one_hop_edges(seeds, edges).collect()
    pairs = {(r["src"], r["tgt"]) for r in hop}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    # ordered by rank desc
    assert [r["rank"] for r in hop] == sorted([r["rank"] for r in hop], reverse=True)


def test_related_chunks_cap(spark):
    from lightrag_spark.plans.query import related_chunks_for_entities

    nodes, _ = _kg(spark)
    seeds = nodes.filter("entity_name = 'a'")
    got = related_chunks_for_entities(seeds, nodes, per_entity=3).collect()
    assert [r["chunk_id"] for r in got] == ["c0", "c1", "c2"]


def test_token_budget_truncation(spark):
    from lightrag_spark.plans.query import truncate_by_token_budget

    df = spark.createDataFrame(
        [{"i": i, "txt": "w " * 10} for i in range(10)]
    )
    kept = truncate_by_token_budget(df, "txt", [F.asc("i")], max_tokens=35).collect()
    # 10 tokens each -> exactly 3 rows fit in 35
    assert sorted(r["i"] for r in kept) == [0, 1, 2]


def test_build_local_context(spark):
    from lightrag_spark.plans.query import build_local_context

    nodes, edges = _kg(spark)
    seeds, hop = build_local_context(nodes, edges, top_k=3,
                                     max_entity_tokens=1000, max_relation_tokens=1000)
    assert seeds.count() == 3
    # seeds a,b,c -> incident edges ab, ac, bc, cd (cd touches seed c)
    assert hop.count() == 4


def test_naive_query_context(spark):
    from lightrag_spark.plans.query import naive_query_context

    chunks = spark.createDataFrame(
        [
            {"chunk_id": "c1", "content": "solar energy panels power"},
            {"chunk_id": "c2", "content": "wind turbine blades"},
            {"chunk_id": "c3", "content": "solar panels rooftop energy"},
        ]
    )
    got = naive_query_context(chunks, "solar energy", top_k=2).collect()
    assert len(got) == 2
    assert {r["chunk_id"] for r in got} <= {"c1", "c3"}
