"""triangle_counts: exact triangles + local clustering via degree-ordered
orientation (graphs.py).  DuckDB twin is queries[kg_triangles]."""

import itertools
import random

from lightrag_spark.operators.graphs import triangle_counts


def _rows(df):
    return {r["node"]: r for r in df.collect()}


def test_k4_complete_graph(spark):
    nodes = ["a", "b", "c", "d"]
    edges = spark.createDataFrame(
        [(u, v) for u, v in itertools.combinations(nodes, 2)],
        "src string, tgt string",
    )
    got = _rows(triangle_counts(edges))
    for n in nodes:
        assert got[n]["degree"] == 3
        assert got[n]["triangles"] == 3
        assert got[n]["clustering"] == 1.0


def test_path_graph_no_triangles(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, tgt string"
    )
    got = _rows(triangle_counts(edges))
    assert all(r["triangles"] == 0 for r in got.values())
    assert got["b"]["clustering"] == 0.0
    assert got["a"]["clustering"] == 0.0  # degree 1 -> defined as 0


def test_triangle_plus_pendant(spark):
    # triangle a-b-c plus pendant d on a: a has degree 3, one triangle,
    # clustering 2*1/(3*2) = 1/3
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")],
        "src string, tgt string",
    )
    got = _rows(triangle_counts(edges))
    assert got["a"]["triangles"] == 1
    assert got["a"]["clustering"] == round(1 / 3, 4)
    assert got["b"]["triangles"] == 1 and got["b"]["clustering"] == 1.0
    assert got["d"]["triangles"] == 0


def test_differential_vs_bruteforce(spark):
    rng = random.Random(7)
    n = 24
    pairs = [
        (f"n{u}", f"n{v}")
        for u, v in itertools.combinations(range(n), 2)
        if rng.random() < 0.25
    ]
    edges = spark.createDataFrame(pairs, "src string, tgt string")
    got = _rows(triangle_counts(edges))

    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for node, nbrs in adj.items():
        t = sum(
            1
            for x, y in itertools.combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        assert got[node]["triangles"] == t, node
        assert got[node]["degree"] == len(nbrs)
        d = len(nbrs)
        want = round(2 * t / (d * (d - 1)), 4) if d >= 2 else 0.0
        assert got[node]["clustering"] == want, node
