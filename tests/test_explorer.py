"""Graph explorer differentials — operators/explorer.py vs the REFERENCE's
own NetworkXStorage.get_knowledge_graph (kg/networkx_impl.py:505-693),
driven through a minimal instance shim (only global_config/workspace/
_get_graph are touched by the method under test).

Determinism note: the reference breaks degree ties by queue insertion
order (neighbor iteration order), which is not portable; our operator
tie-breaks by entity_name.  Crafted graphs below either keep degrees
unique around every cut or compare node SETS per level, so both
implementations are exercised on their common deterministic core.
"""

from __future__ import annotations

import asyncio
import random

import pytest


def _ref_storage(g):
    from refshim import load_reference

    assert load_reference() is not None
    from lightrag.kg.networkx_impl import NetworkXStorage

    st = object.__new__(NetworkXStorage)
    st.global_config = {"max_graph_nodes": 1000}
    st.workspace = "test"

    async def _gg():
        return g

    st._get_graph = _gg
    return st


def _frames(spark, g):
    """nx.Graph -> (nodes_df with degree, edges_df)."""
    nodes = spark.createDataFrame(
        [(n, int(g.degree(n))) for n in g.nodes()], "entity_name string, degree long"
    )
    edges = spark.createDataFrame(
        [(u, v, 1.0) for u, v in g.edges()], "src string, tgt string, weight double"
    )
    return nodes, edges


def _ref_kg(g, label, max_depth=3, max_nodes=1000):
    st = _ref_storage(g)
    return asyncio.run(
        st.get_knowledge_graph(label, max_depth=max_depth, max_nodes=max_nodes)
    )


def _chain_plus_triangle():
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    )
    return g


def test_bfs_depth_and_truncation_parity(spark):
    from lightrag_spark.operators.explorer import bfs_subgraph

    g = _chain_plus_triangle()
    nodes, edges = _frames(spark, g)

    for max_depth, max_nodes in [(2, 4), (2, 100), (1, 100), (3, 100), (0, 100)]:
        ref = _ref_kg(g, "a", max_depth=max_depth, max_nodes=max_nodes)
        sub_nodes, sub_edges, truncated = bfs_subgraph(
            nodes, edges, "a", max_depth=max_depth, max_nodes=max_nodes
        )
        got = {r["entity_name"] for r in sub_nodes.collect()}
        want = {n.id for n in ref.nodes}
        assert got == want, (max_depth, max_nodes)
        assert truncated == ref.is_truncated, (max_depth, max_nodes)
        got_e = {
            tuple(sorted((r["src"], r["tgt"]))) for r in sub_edges.collect()
        }
        want_e = {tuple(sorted((e.source, e.target))) for e in ref.edges}
        assert got_e == want_e, (max_depth, max_nodes)


def test_bfs_degree_priority_cut():
    """Within one level the budget admits highest-degree nodes first.
    Star around 'hub' where spokes have distinct degrees via extra
    pendants: the cut must keep the high-degree spokes."""
    import networkx as nx

    g = nx.Graph()
    # hub -- s1..s4; si gets i extra pendant neighbors => degree(si) = i+1
    for i in range(1, 5):
        g.add_edge("hub", f"s{i}")
        for j in range(i):
            g.add_edge(f"s{i}", f"p{i}{j}")
    ref = _ref_kg(g, "hub", max_depth=1, max_nodes=3)
    assert {n.id for n in ref.nodes} == {"hub", "s4", "s3"}
    assert ref.is_truncated


def test_bfs_degree_priority_cut_spark(spark):
    import networkx as nx

    from lightrag_spark.operators.explorer import bfs_subgraph

    g = nx.Graph()
    for i in range(1, 5):
        g.add_edge("hub", f"s{i}")
        for j in range(i):
            g.add_edge(f"s{i}", f"p{i}{j}")
    nodes, edges = _frames(spark, g)
    sub_nodes, _, truncated = bfs_subgraph(nodes, edges, "hub", 1, 3)
    rows = {r["entity_name"]: r["depth"] for r in sub_nodes.collect()}
    assert rows == {"hub": 0, "s4": 1, "s3": 1}
    assert truncated


def test_bfs_mid_cut_prunes_deeper_frontier(spark):
    """A spoke cut away by the budget must NOT contribute depth-2 nodes —
    neighbors are only explored from admitted nodes (the reference's
    queue semantics)."""
    import networkx as nx

    from lightrag_spark.operators.explorer import bfs_subgraph

    g = nx.Graph()
    g.add_edges_from([("hub", "big"), ("hub", "small")])
    for j in range(3):
        g.add_edge("big", f"b{j}")  # degree(big)=4
    g.add_edge("small", "hidden")  # degree(small)=2; hidden only via small

    nodes, edges = _frames(spark, g)
    # budget 2: hub + big (deg 4) admitted; small cut at level 1, so
    # hidden (reachable only through small) must not appear at depth 2
    sub_nodes, _, truncated = bfs_subgraph(nodes, edges, "hub", 2, 2)
    got = {r["entity_name"] for r in sub_nodes.collect()}
    assert got == {"hub", "big"}
    assert truncated
    ref = _ref_kg(g, "hub", max_depth=2, max_nodes=2)
    assert got == {n.id for n in ref.nodes}
    assert ref.is_truncated == truncated


def test_bfs_random_graphs_uncapped_parity(spark):
    """Seeded random graphs, non-binding cap: depth-bounded reachability
    and induced edges must match the reference exactly (no tie hazard
    when the budget never cuts)."""
    import networkx as nx

    from lightrag_spark.operators.explorer import bfs_subgraph

    rng = random.Random(7)
    for trial in range(3):
        g = nx.gnm_random_graph(14, 22, seed=100 + trial)
        g = nx.relabel_nodes(g, {n: f"n{n:02d}" for n in g.nodes()})
        start = sorted(g.nodes())[rng.randrange(g.number_of_nodes())]
        depth = rng.choice([1, 2, 3])
        nodes, edges = _frames(spark, g)
        ref = _ref_kg(g, start, max_depth=depth, max_nodes=1000)
        sub_nodes, sub_edges, truncated = bfs_subgraph(
            nodes, edges, start, depth, 1000
        )
        got = {r["entity_name"]: r["depth"] for r in sub_nodes.collect()}
        assert set(got) == {n.id for n in ref.nodes}, (trial, start, depth)
        # depths are min-hop distances
        import networkx as nxmod

        dist = nxmod.single_source_shortest_path_length(g, start, cutoff=depth)
        assert got == {k: v for k, v in dist.items()}
        got_e = {tuple(sorted((r["src"], r["tgt"]))) for r in sub_edges.collect()}
        want_e = {tuple(sorted((e.source, e.target))) for e in ref.edges}
        assert got_e == want_e
        assert truncated is False and ref.is_truncated is False


def test_star_subgraph_parity(spark):
    import networkx as nx

    from lightrag_spark.operators.explorer import star_subgraph

    g = nx.Graph()
    for i in range(1, 5):
        g.add_edge("hub", f"s{i}")
        for j in range(i):
            g.add_edge(f"s{i}", f"p{i}{j}")
    nodes, edges = _frames(spark, g)
    ref = _ref_kg(g, "*", max_nodes=3)
    kept, sub_edges, truncated = star_subgraph(nodes, edges, max_nodes=3)
    got = {r["entity_name"] for r in kept.collect()}
    assert got == {n.id for n in ref.nodes}
    assert truncated == ref.is_truncated is True
    got_e = {tuple(sorted((r["src"], r["tgt"]))) for r in sub_edges.collect()}
    want_e = {tuple(sorted((e.source, e.target))) for e in ref.edges}
    assert got_e == want_e

    # non-binding cap: whole graph, not truncated
    kept2, _, truncated2 = star_subgraph(nodes, edges, max_nodes=100)
    assert kept2.count() == g.number_of_nodes() and truncated2 is False


def test_get_knowledge_graph_wrapper_shapes(spark):
    from lightrag_spark.operators.explorer import get_knowledge_graph

    g = _chain_plus_triangle()
    nodes, edges = _frames(spark, g)
    kg = get_knowledge_graph(nodes, edges, "a", max_depth=2, max_nodes=4)
    assert kg["is_truncated"] is True
    assert {n["id"] for n in kg["nodes"]} == {"a", "b", "c", "d"}
    for e in kg["edges"]:
        assert e["source"] <= e["target"]  # undirected-normalized ids
        assert e["id"] == f"{e['source']}-{e['target']}"
    # unknown start -> empty graph, reference parity
    empty = get_knowledge_graph(nodes, edges, "zzz")
    assert empty == {"nodes": [], "edges": [], "is_truncated": False}


def test_graph_labels(spark):
    from lightrag_spark.operators.explorer import graph_labels

    g = _chain_plus_triangle()
    nodes, _ = _frames(spark, g)
    labels = [r["entity_name"] for r in graph_labels(nodes).collect()]
    assert labels == sorted(g.nodes())


def test_entity_and_relation_info(spark):
    """get_entity_info / get_relation_info lookups (utils_graph.py:2043+)
    over the real KG build: stored payload round-trip, undirected edge
    symmetry, absent-key contract."""
    import __spark_entry__ as m

    from lightrag_spark.constants import GRAPH_FIELD_SEP
    from lightrag_spark.operators.explorer import entity_info, relation_info

    r = m._build(spark, "/root/testdata/sf0.001")
    name = r.kg_nodes.orderBy("entity_name").first()["entity_name"]
    info = entity_info(r.kg_nodes, name)
    assert info["entity_name"] == name
    assert info["graph_data"]["entity_name"] == name
    assert info["source_id"] == GRAPH_FIELD_SEP.join(
        info["graph_data"]["source_ids"]
    )
    missing = entity_info(r.kg_nodes, "no_such_entity")
    assert missing == {
        "entity_name": "no_such_entity", "source_id": None, "graph_data": None
    }

    e = r.kg_edges.orderBy("src", "tgt").first()
    fwd = relation_info(r.kg_edges, e["src"], e["tgt"])
    rev = relation_info(r.kg_edges, e["tgt"], e["src"])
    assert fwd["graph_data"] == rev["graph_data"]
    assert fwd["source_id"] and fwd["graph_data"]["weight"] == e["weight"]
    none = relation_info(r.kg_edges, "x", "y")
    assert none["graph_data"] is None
