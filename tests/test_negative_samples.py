"""kg_negative_samples (graphs.py).  Twin is queries[kg_negative_samples]."""

from lightrag_spark.operators.graphs import kg_negative_samples


def test_deterministic_and_collision_filtered(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, tgt string"
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "entity_name string"
    )
    a = kg_negative_samples(edges, nodes, k=3).collect()
    b = kg_negative_samples(edges, nodes, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    for r in a:
        assert r["neg_tgt"] not in (r["src"], r["tgt"])
        assert 0 <= r["sample_idx"] < 3
    # at most k negatives per edge
    from collections import Counter

    per_edge = Counter((r["src"], r["tgt"]) for r in a)
    assert all(v <= 3 for v in per_edge.values())


def test_empty_dictionary_raises(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, tgt string")
    nodes = spark.createDataFrame([], "entity_name string")
    import pytest

    with pytest.raises(ValueError):
        kg_negative_samples(edges, nodes)
