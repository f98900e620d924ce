"""Fixed-point PageRank: exact integer differential, properties, edges."""

import pytest

from lightrag_spark.operators.graphs import pagerank_fixedpoint

SCALE = 10**12


@pytest.fixture(scope="module")
def spark():
    from lightrag_spark.session import get_spark

    yield get_spark(app_name="test-pagerank", master="local[4]", shuffle_partitions=8)


def _pagerank_py(edges, iterations, scale=SCALE, num=85, den=100):
    """Driver-side exact replica of the integer recursion."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({u for u, _ in und})
    deg = {u: sum(1 for x, _ in und if x == u) for u in nodes}
    n = len(nodes)
    r = {u: scale // n for u in nodes}
    teleport = ((den - num) * (scale // n)) // den
    for _ in range(iterations):
        s = {u: 0 for u in nodes}
        for u, v in und:
            s[v] += r[u] // deg[u]
        r = {u: teleport + (num * s[u]) // den for u in nodes}
    return r


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_matches_exact_integer_replica(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
        ("a", "c"),                                       # chord
        ("e", "a"),                                       # pendant
    ]
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixedpoint(_edges_df(spark, pairs), iterations=5).collect()
    }
    assert got == _pagerank_py(pairs, iterations=5)


def test_pagerank_star_center_dominates(spark):
    pairs = [("hub", f"leaf{i}") for i in range(6)]
    rows = pagerank_fixedpoint(_edges_df(spark, pairs), iterations=8).collect()
    ranks = {r["node"]: r["rank_fp"] for r in rows}
    assert max(ranks, key=ranks.get) == "hub"
    leaf_ranks = {v for k, v in ranks.items() if k != "hub"}
    assert len(leaf_ranks) == 1  # symmetric leaves agree exactly
    # mass conserved up to the floor-division leak (< 2 units/node/round)
    total = sum(ranks.values())
    assert SCALE - 2 * len(ranks) * 8 <= total <= SCALE


def test_pagerank_duplicate_and_reversed_edges_collapse(spark):
    a = pagerank_fixedpoint(
        _edges_df(spark, [("a", "b"), ("b", "a"), ("a", "b")]), iterations=3
    ).collect()
    b = pagerank_fixedpoint(_edges_df(spark, [("a", "b")]), iterations=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_rejects_bad_iterations(spark):
    with pytest.raises(ValueError):
        pagerank_fixedpoint(_edges_df(spark, [("a", "b")]), iterations=0)
