"""Manual entity merge — amerge_entities strategy matrix
(utils_graph.py:1343-1560, _merge_attributes :1962-2040)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightrag_spark.plans.mutations import _merge_field, merge_entities


def _nodes(spark):
    rows = [
        # entity_name, entity_type, descriptions, source_ids, file_paths,
        # mention_count, created_at
        ("us", "category", ["US is a country"], ["c1", "c2"], ["f1"], 5, 100),
        ("usa", "location", ["USA desc"], ["c2", "c3"], ["f2"], 3, 90),
        ("america", "location", ["America desc"], ["c4"], ["f1", "f3"], 2, 110),
        ("nyc", "location", ["NYC desc"], ["c5"], ["f4"], 1, 100),
        ("paris", "location", ["Paris desc"], ["c6"], ["f5"], 1, 100),
    ]
    return spark.createDataFrame(
        rows,
        "entity_name string, entity_type string, descriptions array<string>, "
        "source_ids array<string>, file_paths array<string>, "
        "mention_count long, created_at long",
    )


def _edges(spark):
    rows = [
        # src < tgt sorted, weight, relation_count, created_at, keywords,
        # source_ids, file_paths, descriptions
        ("nyc", "usa", 2.0, 2, 100, ["in", "part_of"], ["c2"], ["f2"], ["nyc in usa"]),
        ("america", "nyc", 3.0, 1, 90, ["within"], ["c4"], ["f3"], ["nyc in america"]),
        ("nyc", "us", 1.0, 1, 110, ["in"], ["c1"], ["f1"], ["nyc in us"]),
        ("america", "usa", 9.0, 4, 80, ["same_as"], ["c9"], ["f9"], ["same"]),
        ("nyc", "paris", 1.0, 1, 100, ["twin"], ["c6"], ["f5"], ["twin cities"]),
    ]
    return spark.createDataFrame(
        rows,
        "src string, tgt string, weight double, relation_count long, "
        "created_at long, keywords array<string>, source_ids array<string>, "
        "file_paths array<string>, descriptions array<string>",
    )


def test_merge_field_strategies():
    assert _merge_field([["a"], ["b", "a"]], "concatenate") == ["a", "b", "a"]
    assert _merge_field(["x", "y"], "concatenate_str") == "x<SEP>y"
    assert _merge_field(["x", "y"], "keep_first") == "x"
    assert _merge_field(["x", "y"], "keep_last") == "y"
    assert _merge_field([["a", "b"], ["b", "c"]], "join_unique") == ["a", "b", "c"]
    assert _merge_field([["b", "a"], "c, a"], "join_unique_comma") == ["a", "b", "c"]
    assert _merge_field([2.0, 5.0, 3.0], "max") == 5.0
    assert _merge_field([2, 5], "sum") == 7
    assert _merge_field([2, 5], "min") == 2
    assert _merge_field(["x", "y"], "unknown") == "x"  # reference default


def test_merge_entities_node_payload(spark):
    nodes, edges = _nodes(spark), _edges(spark)
    new_nodes, new_edges = merge_entities(
        spark, nodes, edges, ["usa", "america"], "us"
    )
    got = {r["entity_name"]: r for r in new_nodes.collect()}
    assert set(got) == {"us", "nyc", "paris"}
    us = got["us"]
    # keep_first: first SOURCE's type wins (usa -> location), target last
    assert us["entity_type"] == "location"
    # concatenate in order: usa, america, existing target us
    assert us["descriptions"] == ["USA desc", "America desc", "US is a country"]
    # join_unique: first occurrence order across usa, america, us
    assert us["source_ids"] == ["c2", "c3", "c4", "c1"]
    assert us["file_paths"] == ["f2", "f1", "f3"]
    assert us["mention_count"] == 3 + 2 + 5
    assert us["created_at"] == 90


def test_merge_entities_edges_redirect_and_dedup(spark):
    nodes, edges = _nodes(spark), _edges(spark)
    new_nodes, new_edges = merge_entities(
        spark, nodes, edges, ["usa", "america"], "us"
    )
    e = {(r["src"], r["tgt"]): r for r in new_edges.collect()}
    # america~usa becomes a self-loop -> dropped
    assert set(e) == {("nyc", "us"), ("nyc", "paris")}
    # three parallel edges merged: nyc~usa, america~nyc, nyc~us
    m = e[("nyc", "us")]
    assert m["weight"] == 3.0                      # max
    assert m["relation_count"] == 4                # sum
    assert m["created_at"] == 90                   # min
    assert m["keywords"] == ["in", "part_of", "within"]  # sorted unique
    # merge order = original (src, tgt): (america,nyc) < (nyc,us) < (nyc,usa)
    assert m["source_ids"] == ["c4", "c1", "c2"]
    assert m["descriptions"] == ["nyc in america", "nyc in us", "nyc in usa"]
    # untouched edge unchanged
    assert e[("nyc", "paris")]["weight"] == 1.0
    # degrees recomputed
    deg = {r["entity_name"]: r["degree"] for r in new_nodes.collect()}
    assert deg == {"us": 1, "nyc": 2, "paris": 1}


def test_merge_entities_target_data_override_and_errors(spark):
    nodes, edges = _nodes(spark), _edges(spark)
    new_nodes, _ = merge_entities(
        spark, nodes, edges, ["usa"], "us",
        target_entity_data={"entity_type": "COUNTRY"},
    )
    us = new_nodes.filter(F.col("entity_name") == "us").collect()[0]
    assert us["entity_type"] == "COUNTRY"
    with pytest.raises(ValueError, match="At least one"):
        merge_entities(spark, nodes, edges, [], "us")
    with pytest.raises(ValueError, match="do not exist"):
        merge_entities(spark, nodes, edges, ["ghost"], "us")


def test_merge_entities_into_new_target(spark):
    """A missing target is intentional: spelling-repair merges consolidate
    into a new canonical name (utils_graph.py:1455-1458)."""
    nodes, edges = _nodes(spark), _edges(spark)
    new_nodes, new_edges = merge_entities(
        spark, nodes, edges, ["usa", "america"], "united_states"
    )
    names = {r["entity_name"] for r in new_nodes.collect()}
    assert "united_states" in names and "usa" not in names and "america" not in names
    us = new_nodes.filter(F.col("entity_name") == "united_states").collect()[0]
    assert us["descriptions"] == ["USA desc", "America desc"]
    pairs = {(r["src"], r["tgt"]) for r in new_edges.collect()}
    assert ("nyc", "united_states") in pairs
    # edges to the untouched 'us' node survive separately
    assert ("nyc", "us") in pairs
