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


# ---------------------------------------------------------------- stage 3+4


def test_batch_related_chunks_first_seen_dedup(spark):
    from lightrag_spark.plans.batch_query import batch_related_chunks

    seeds = spark.createDataFrame(
        [("q1", "alpha", 1), ("q1", "beta", 2), ("q2", "beta", 1)],
        "question string, entity_name string, pos long",
    )
    nodes = spark.createDataFrame(
        [("alpha", ["c1", "c2", "c3"]), ("beta", ["c2", "c4", "c5", "c6"])],
        "entity_name string, source_ids array<string>",
    )
    rows = batch_related_chunks(seeds, nodes, per_entity=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r.question, []).append((r.pos, r.chunk_pos, r.chunk_id))
    # q1: alpha claims c1,c2 (cap 2); beta's c2 is claimed -> beta keeps c4,c5
    assert sorted(got["q1"]) == [(1, 1, "c1"), (1, 2, "c2"), (2, 1, "c4"), (2, 2, "c5")]
    # q2's dedup is independent of q1: beta keeps its own head incl. c2
    assert sorted(got["q2"]) == [(1, 1, "c2"), (1, 2, "c4")]


def test_batch_context_byte_equals_driver_render(spark):
    """The batched Spark-side render must be byte-identical to the
    per-question driver render (plans/context.build_context_str) when fed
    the same entity/relation/chunk lists — including JSON escaping, token
    budgeting, and reference-id assignment."""
    import __spark_entry__ as m
    from lightrag_spark.plans.batch_query import (
        batch_context,
        batch_entity_seeds,
        batch_one_hop,
        batch_related_chunks,
    )
    from lightrag_spark.plans.context import build_context_str

    r = m._build(spark, "/root/testdata/sf0.001")
    questions = [
        "network customer united_states analysis",
        "column query order filter",
    ]
    qdf = spark.createDataFrame([(q,) for q in questions], "question string")
    seeds = batch_entity_seeds(r.kg_nodes, qdf, k=8)
    rels = batch_one_hop(seeds, r.kg_edges, r.kg_nodes, k=8)
    ctx = {
        row["question"]: row["context"]
        for row in batch_context(
            seeds, rels, r.kg_nodes, r.chunks, per_entity=3
        ).collect()
    }

    picked = batch_related_chunks(seeds, r.kg_nodes, per_entity=3)
    chunk_payload = {
        row["chunk_id"]: row
        for row in r.chunks.select("chunk_id", "content", "file_path").collect()
    }
    types = {
        row["entity_name"]: row["entity_type"]
        for row in r.kg_nodes.select("entity_name", "entity_type").collect()
    }
    seed_rows = sorted(seeds.collect(), key=lambda x: (x["question"], x["pos"]))
    rel_rows = sorted(rels.collect(), key=lambda x: (x["question"], x["pos"]))
    pick_rows = sorted(
        picked.collect(), key=lambda x: (x["question"], x["pos"], x["chunk_pos"])
    )
    for q in questions:
        ents = [
            {
                "entity_name": s["entity_name"],
                "entity_type": types[s["entity_name"]],
                "degree": int(s["degree"]),
            }
            for s in seed_rows
            if s["question"] == q
        ]
        rls = [
            {"src": x["src"], "tgt": x["tgt"]} for x in rel_rows if x["question"] == q
        ]
        chs = [
            {
                "content": chunk_payload[p["chunk_id"]]["content"],
                "file_path": chunk_payload[p["chunk_id"]]["file_path"]
                or "unknown_source",
            }
            for p in pick_rows
            if p["question"] == q
        ]
        expected, _refs = build_context_str(ents, rls, chs)
        assert ctx[q] == expected, q
