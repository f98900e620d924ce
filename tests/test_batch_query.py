"""Batched KG query stages: crafted-graph expectations (the driver gate
differentials the real corpus against DuckDB)."""

from __future__ import annotations

import pytest

from lightrag_spark.plans.batch_query import batch_entity_seeds, batch_one_hop


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [("alpha", 3), ("beta", 2), ("gamma", 1), ("delta", 1)],
        "entity_name string, degree long",
    )
    edges = spark.createDataFrame(
        [("alpha", "beta", 2.0), ("alpha", "gamma", 1.0), ("beta", "delta", 1.0)],
        "src string, tgt string, weight double",
    )
    return nodes, edges


def test_seeds_rank_and_misses(graph, spark):
    nodes, _ = graph
    qs = spark.createDataFrame(
        [("alpha beta question",), ("gamma only",), ("nothing matches here",)],
        "question string",
    )
    rows = batch_entity_seeds(nodes, qs, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.question, []).append((r.pos, r.entity_name, r.degree))
    # ranked by degree desc then name
    assert by_q["alpha beta question"] == [(1, "alpha", 3), (2, "beta", 2)]
    assert by_q["gamma only"] == [(1, "gamma", 1)]
    # a question with no entity hits simply has no rows (callers handle
    # empty context, as kg_query does)
    assert "nothing matches here" not in by_q


def test_one_hop_order_and_dedup(graph, spark):
    nodes, edges = graph
    qs = spark.createDataFrame([("alpha beta",)], "question string")
    seeds = batch_entity_seeds(nodes, qs, k=10)
    rows = batch_one_hop(seeds, edges, nodes, k=10).collect()
    got = [(r.pos, r.src, r.tgt, r.degree_sum) for r in rows]
    # alpha-beta incident to BOTH seeds appears once; order by
    # (degree_sum desc, weight desc, pair)
    assert got == [
        (1, "alpha", "beta", 5),
        (2, "alpha", "gamma", 4),
        (3, "beta", "delta", 3),
    ]


def test_k_truncates(graph, spark):
    nodes, edges = graph
    qs = spark.createDataFrame([("alpha beta gamma delta",)], "question string")
    seeds = batch_entity_seeds(nodes, qs, k=2)
    assert {r.entity_name for r in seeds.collect()} == {"alpha", "beta"}
    hop = batch_one_hop(seeds, edges, nodes, k=1).collect()
    assert len(hop) == 1 and hop[0].pos == 1
