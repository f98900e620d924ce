"""Manual create/edit mutations (utils_graph.py:572-1342 parity):
acreate_entity / acreate_relation append contracts, aedit_entity /
aedit_relation field-merge semantics including the rename delegation,
and the reference's validation rules (non-empty description, existence /
duplicate checks, naming contract)."""

from __future__ import annotations

import pytest

from lightrag_spark.plans.mutations import (
    create_entity,
    create_relation,
    edit_entity,
    edit_relation,
)


@pytest.fixture(scope="module")
def kg(spark):
    import __spark_entry__ as m

    r = m._build(spark, "/root/testdata/sf0.001")
    nodes = r.kg_nodes.persist()
    edges = r.kg_edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


def test_create_entity_appends_with_defaults(kg):
    nodes, edges = kg
    n0 = nodes.count()
    new_nodes, new_edges = create_entity(
        nodes, edges, "Quantum Widget", {"description": "a manual node"},
        created_at=42,
    )
    assert new_nodes.count() == n0 + 1
    row = new_nodes.filter(new_nodes.entity_name == "Quantum Widget").first()
    assert row is not None  # naming contract applied (quote/control strip)
    assert row["entity_type"] == "UNKNOWN"
    assert row["descriptions"] == ["a manual node"]
    assert row["source_ids"] == ["manual_creation"]
    assert row["created_at"] == 42
    assert row["degree"] == 0  # no incident edges
    # old rows untouched
    assert new_nodes.filter(new_nodes.entity_name == "Quantum Widget").count() == 1


def test_create_entity_validation(kg):
    nodes, edges = kg
    existing = nodes.first()["entity_name"]
    with pytest.raises(ValueError, match="already exists"):
        create_entity(nodes, edges, existing, {"description": "x"})
    with pytest.raises(ValueError, match="description"):
        create_entity(nodes, edges, "newbie", {"description": "  "})
    with pytest.raises(ValueError, match="empty after normalization"):
        create_entity(nodes, edges, "   ", {"description": "x"})


def test_create_relation_appends_ordered_pair(kg, spark):
    full_nodes, full_edges = kg
    # the sf0.001 KG is a complete graph (every pair connected), so carve a
    # crafted sub-KG with a missing pair: keep the node rows (real schema)
    # but drop every edge touching the two chosen endpoints
    names = sorted(
        r["entity_name"] for r in full_nodes.select("entity_name").collect()
    )
    a, b = names[0], names[1]
    from lightrag_spark.operators.merge import with_degrees

    edges0 = full_edges.filter(
        ~(
            ((full_edges.src == a) & (full_edges.tgt == b))
            | ((full_edges.src == b) & (full_edges.tgt == a))
        )
    )
    nodes, edges = with_degrees(
        full_nodes.drop("degree"),
        edges0.drop("src_degree", "tgt_degree", "rank"),
    )
    nodes = nodes.persist()
    edges = edges.persist()
    # create with REVERSED order: stored key must still be (lo, hi)
    new_nodes, new_edges = create_relation(
        nodes, edges, b, a,
        {"description": "manual link", "keywords": "beta, alpha", "weight": 2.5},
        created_at=7,
    )
    row = new_edges.filter((new_edges.src == a) & (new_edges.tgt == b)).first()
    assert row is not None
    assert row["weight"] == 2.5
    assert row["keywords"] == ["alpha", "beta"]
    assert row["descriptions"] == ["manual link"]
    # degree of both endpoints grew by 1
    old_deg = {
        r["entity_name"]: r["degree"]
        for r in nodes.filter(nodes.entity_name.isin([a, b])).collect()
    }
    new_deg = {
        r["entity_name"]: r["degree"]
        for r in new_nodes.filter(new_nodes.entity_name.isin([a, b])).collect()
    }
    assert new_deg[a] == old_deg[a] + 1 and new_deg[b] == old_deg[b] + 1

    with pytest.raises(ValueError, match="already exists"):
        create_relation(new_nodes, new_edges, a, b, {"description": "dup"})
    with pytest.raises(ValueError, match="does not exist"):
        create_relation(nodes, edges, a, "ghost_entity", {"description": "x"})


def test_edit_entity_fields_and_rename(kg):
    nodes, edges = kg
    name = nodes.orderBy("entity_name").first()["entity_name"]
    out_nodes, out_edges = edit_entity(
        nodes, edges, name,
        {"description": "edited desc", "entity_type": "organization"},
    )
    row = out_nodes.filter(out_nodes.entity_name == name).first()
    assert row["entity_type"] == "organization"
    assert row["descriptions"] == ["edited desc"]
    # other rows untouched
    other = (
        out_nodes.filter(out_nodes.entity_name != name)
        .orderBy("entity_name")
        .first()
    )
    orig = (
        nodes.filter(nodes.entity_name != name).orderBy("entity_name").first()
    )
    assert other["descriptions"] == orig["descriptions"]

    # rename delegation: edges re-keyed
    out2_nodes, out2_edges = edit_entity(
        nodes, edges, name, {"entity_name": "zz_renamed"}
    )
    assert out2_nodes.filter(out2_nodes.entity_name == name).count() == 0
    deg = out2_nodes.filter(out2_nodes.entity_name == "zz_renamed").first()["degree"]
    old_deg = nodes.filter(nodes.entity_name == name).first()["degree"]
    assert deg == old_deg
    assert (
        out2_edges.filter(
            (out2_edges.src == "zz_renamed") | (out2_edges.tgt == "zz_renamed")
        ).count()
        == old_deg
    )

    with pytest.raises(ValueError, match="does not exist"):
        edit_entity(nodes, edges, "ghost", {"entity_type": "x"})
    with pytest.raises(ValueError, match="unknown entity field"):
        edit_entity(nodes, edges, name, {"bogus": 1})
    with pytest.raises(ValueError, match="description"):
        edit_entity(nodes, edges, name, {"description": ""})


def test_edit_relation_fields(kg):
    nodes, edges = kg
    e = edges.orderBy("src", "tgt").first()
    # reversed endpoint order resolves the same stored edge
    _, out_edges = edit_relation(
        nodes, edges, e["tgt"], e["src"],
        {"description": "new rel desc", "keywords": "x, a", "weight": 9.0},
    )
    row = out_edges.filter(
        (out_edges.src == e["src"]) & (out_edges.tgt == e["tgt"])
    ).first()
    assert row["weight"] == 9.0
    assert row["keywords"] == ["a", "x"]
    assert row["descriptions"] == ["new rel desc"]
    # untouched edge keeps its payload
    other = out_edges.filter(
        (out_edges.src != e["src"]) | (out_edges.tgt != e["tgt"])
    ).orderBy("src", "tgt").first()
    assert other["weight"] != 9.0 or other["descriptions"] != ["new rel desc"]

    with pytest.raises(ValueError, match="does not exist"):
        edit_relation(nodes, edges, "ghost", "ghost2", {"weight": 1.0})
