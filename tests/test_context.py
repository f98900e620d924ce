"""Context assembly (plans/context.py) vs a pure-Python replay of the
reference's loops (operate.py:4880-4934 round-robin, 5164-5268 chunk merge,
5941-6140 relation->chunk selection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightrag_spark.plans import context as cx


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---- pure-Python reference replays (mirrors of the asyncio loops) ----------


def ref_round_robin(local, global_, key):
    """operate.py:4880-4934 — position i: local first, then global."""
    out, seen = [], set()
    for i in range(max(len(local), len(global_))):
        for lst, tag in ((local, "L"), (global_, "G")):
            if i < len(lst):
                k = key(lst[i])
                if k not in seen:
                    seen.add(k)
                    out.append((lst[i], tag))
    return out


def ref_merge_chunks(vector, entity, relation):
    """operate.py:5210-5258 — V, E, R per iteration, first-seen chunk_id."""
    out, seen = [], set()
    for i in range(max(len(vector), len(entity), len(relation))):
        for lst, tag in ((vector, "V"), (entity, "E"), (relation, "R")):
            if i < len(lst):
                cid = lst[i]
                if cid not in seen:
                    seen.add(cid)
                    out.append((cid, tag))
    return out


def ref_relation_chunks(rels, claimed, per_relation):
    """operate.py:6040-6100 — first-seen dedup in relation order, cap after."""
    count: dict = {}
    out = []
    for pos, (src, tgt, chunks) in enumerate(rels, start=1):
        kept = []
        for cid in chunks:
            if cid in claimed:
                continue
            count[cid] = count.get(cid, 0) + 1
            if count[cid] == 1:
                kept.append(cid)
        for j, cid in enumerate(kept[:per_relation], start=1):
            out.append((src, tgt, pos, cid, j))
    return out


# ---- tests ------------------------------------------------------------------


def test_interleave_round_robin_matches_reference(spark):
    local = [("alpha", 1), ("beta", 2), ("gamma", 3), ("delta", 4)]
    glob = [("beta", 1), ("epsilon", 2), ("alpha", 3)]
    ldf = _df(spark, local, "entity_name string, pos long")
    gdf = _df(spark, glob, "entity_name string, pos long")
    got = [
        (r.entity_name, r.origin, r.pos)
        for r in cx.interleave_round_robin(ldf, gdf, ["entity_name"]).orderBy("pos").collect()
    ]
    want = [
        (item[0], tag, i + 1)
        for i, (item, tag) in enumerate(
            ref_round_robin(local, glob, key=lambda t: t[0])
        )
    ]
    assert got == want
    # reference order: alpha(L1), beta(L2... wait beta G1 comes after alpha L1)
    assert got[0] == ("alpha", "L", 1)
    assert got[1] == ("beta", "G", 2)  # G side of iteration 1 beats L's pos-2 beta


def test_merge_all_chunks_matches_reference(spark):
    vector = ["c1", "c2", "c3"]
    entity = ["c2", "c4"]
    relation = ["c5", "c1", "c6", "c7"]
    vdf = _df(spark, [(c, i + 1) for i, c in enumerate(vector)], "chunk_id string, pos long")
    edf = _df(spark, [(c, i + 1) for i, c in enumerate(entity)], "chunk_id string, pos long")
    rdf = _df(spark, [(c, i + 1) for i, c in enumerate(relation)], "chunk_id string, pos long")
    got = [
        (r.chunk_id, r.origin, r.pos)
        for r in cx.merge_all_chunks(vdf, edf, rdf).orderBy("pos").collect()
    ]
    want = [
        (cid, tag, i + 1)
        for i, (cid, tag) in enumerate(ref_merge_chunks(vector, entity, relation))
    ]
    assert got == want


def test_merge_all_chunks_subset_inputs(spark):
    rdf = _df(spark, [("c1", 1), ("c2", 2)], "chunk_id string, pos long")
    got = cx.merge_all_chunks(None, None, rdf).orderBy("pos").collect()
    assert [(r.chunk_id, r.origin, r.pos) for r in got] == [("c1", "R", 1), ("c2", "R", 2)]
    with pytest.raises(ValueError):
        cx.merge_all_chunks(None, None, None)


def test_related_chunks_for_relations_matches_reference(spark):
    rels = [
        ("a", "b", ["c1", "c2", "c3"]),
        ("b", "c", ["c2", "c4", "c5", "c6"]),
        ("c", "d", ["c1", "c6", "c7"]),
    ]
    claimed = {"c3"}
    rdf = _df(
        spark,
        [(s, t, i + 1, ch) for i, (s, t, ch) in enumerate(rels)],
        "src string, tgt string, pos long, source_ids array<string>",
    )
    cdf = _df(spark, [(c,) for c in claimed], "chunk_id string")
    got = sorted(
        (r.src, r.tgt, r.pos, r.chunk_id, r.chunk_pos)
        for r in cx.related_chunks_for_relations(rdf, cdf, per_relation=2).collect()
    )
    want = sorted(ref_relation_chunks(rels, claimed, per_relation=2))
    assert got == want


def test_top_relations_and_entities_chain(spark):
    edges = _df(
        spark,
        [
            ("a", "b", 5.0, 10),
            ("b", "c", 5.0, 12),
            ("c", "d", 3.0, 20),
            ("a", "d", 1.0, 2),
        ],
        "src string, tgt string, weight double, rank long",
    )
    nodes = _df(
        spark,
        [("a", "person", 3), ("b", "person", 5), ("c", "event", 4), ("d", "event", 2)],
        "entity_name string, entity_type string, degree long",
    )
    rels = cx.top_relations(edges, k=2)
    got = [(r.src, r.tgt, r.pos) for r in rels.orderBy("pos").collect()]
    # weight desc first, then rank desc: (b,c,5.0,12) then (a,b,5.0,10)
    assert got == [("b", "c", 1), ("a", "b", 2)]
    ents = cx.entities_from_relations(rels, nodes).orderBy("pos").collect()
    # first-seen: b (rel1 src), c (rel1 tgt), a (rel2 src); b again skipped
    assert [(e.entity_name, e.pos) for e in ents] == [("b", 1), ("c", 2), ("a", 3)]
    assert ents[0].entity_type == "person" and ents[0].degree == 5


def test_top_relations_plan_has_no_global_window_over_input(spark):
    edges = _df(spark, [("a", "b", 1.0, 1)], "src string, tgt string, weight double, rank long")
    plan = cx.top_relations(edges, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_build_context_str_budget_and_references():
    entities = [{"entity_name": "a", "pos": 1}]
    relations = [{"src": "a", "tgt": "b", "pos": 1}]
    chunks = [
        {"chunk_id": "c1", "content": "one two three", "file_path": "f1"},
        {"chunk_id": "c2", "content": "four five", "file_path": "f2"},
        {"chunk_id": "c3", "content": "six seven eight nine", "file_path": "f1"},
    ]
    # entities_str + relations_str cost 10 ws-tokens; 216-200-10 = 6 left:
    # c1 (3 tokens) + c2 (2 tokens) admitted, c3 (4 tokens) over budget.
    ctx, refs = cx.build_context_str(
        entities, relations, chunks, max_total_tokens=216, overhead_tokens=200
    )
    assert '"reference_id": 1' in ctx and '"reference_id": 2' in ctx
    assert "six seven" not in ctx
    assert refs == [
        {"reference_id": 1, "file_path": "f1"},
        {"reference_id": 2, "file_path": "f2"},
    ]
    assert "-----Entities-----" in ctx and "-----References-----" in ctx
