"""Mock embedder + entity-VDB retrieval tests."""

from __future__ import annotations

import math

from lightrag_spark.functions.mock_embed import embed_text


def test_embed_deterministic_unit_norm():
    a = embed_text("alpha beta gamma")
    b = embed_text("alpha beta gamma")
    assert a == b
    assert abs(math.sqrt(sum(x * x for x in a)) - 1.0) < 1e-6


def test_embed_similarity_orders_sensibly():
    base = embed_text("solar energy panels power grid")
    near = embed_text("solar energy panels")
    far = embed_text("medieval castle moat drawbridge")
    cos = lambda u, v: sum(x * y for x, y in zip(u, v))
    assert cos(base, near) > cos(base, far)


def test_vector_search_spark(spark):
    from lightrag_spark.operators.embedding import entity_vdb, vector_search

    nodes = spark.createDataFrame(
        [
            {"entity_name": "solar_power", "entity_type": "technology",
             "description": "solar energy panels and power generation"},
            {"entity_name": "wind_power", "entity_type": "technology",
             "description": "wind turbines energy generation"},
            {"entity_name": "castle", "entity_type": "location",
             "description": "medieval castle moat drawbridge"},
        ]
    )
    vdb = entity_vdb(nodes)
    hits = vector_search(vdb, "solar energy panels", k=2, min_sim=0.0).collect()
    assert hits[0]["entity_name"] == "solar_power"
    assert len(hits) == 2
