"""common_neighbor_similarity: link-prediction scoring (graphs.py).
DuckDB twin is queries[kg_node_similarity]."""

from lightrag_spark.operators.graphs import common_neighbor_similarity


def _rows(df):
    return {(r["src"], r["tgt"]): r for r in df.collect()}


def test_hand_case(spark):
    # square a-b-c-d-a: opposite corners share BOTH neighbors
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, tgt string",
    )
    got = _rows(common_neighbor_similarity(edges))
    # a and c share {b, d}: common=2, jaccard = 2/(2+2-2) = 1.0
    assert got[("a", "c")]["common_neighbors"] == 2
    assert got[("a", "c")]["jaccard"] == 1.0
    assert got[("b", "d")]["jaccard"] == 1.0
    # adjacent corners share nothing -> absent
    assert ("a", "b") not in got


def test_missing_edge_candidate_scores_high(spark):
    # near-clique with one edge removed: the removed pair scores highest
    nodes = ["a", "b", "c", "d", "e"]
    import itertools

    all_edges = list(itertools.combinations(nodes, 2))
    edges = spark.createDataFrame(
        [e for e in all_edges if e != ("a", "b")], "src string, tgt string"
    )
    got = _rows(common_neighbor_similarity(edges))
    assert got[("a", "b")]["common_neighbors"] == 3
    assert got[("a", "b")]["jaccard"] == 1.0  # 3/(3+3-3)


def test_hub_cap_drops_hub_and_its_wedges(spark):
    # star: hub h connected to x1..x5; all leaf pairs share only h
    edges = spark.createDataFrame(
        [("h", f"x{i}") for i in range(5)], "src string, tgt string"
    )
    full = common_neighbor_similarity(edges)
    assert full.count() == 10  # C(5,2) leaf pairs via the hub
    pruned = common_neighbor_similarity(edges, max_apex_degree=3)
    assert pruned.count() == 0  # hub dropped -> no wedges at all
