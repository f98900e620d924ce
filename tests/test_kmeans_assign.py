"""assign_nearest_centroid — exact-assignment contract on known vectors,
self-assignment of the centroid rows themselves, and argmin tie-break."""

from __future__ import annotations

import pytest

from lightrag_spark.operators.ivf import assign_nearest_centroid


def _assign(spark, rows, k):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {
        r.vec_id: (r.centroid_id, r.dist_sq)
        for r in assign_nearest_centroid(df, k=k).collect()
    }


def test_known_assignment(spark):
    rows = [
        (0, [0.0, 0.0]),   # centroid 0
        (1, [10.0, 0.0]),  # centroid 1
        (2, [1.0, 1.0]),   # nearer 0: d2=2 vs 82
        (3, [9.0, 1.0]),   # nearer 1: d2=2 vs 82
    ]
    got = _assign(spark, rows, k=2)
    assert got[2] == (0, 2.0) and got[3] == (1, 2.0)


def test_centroids_self_assign_with_zero_distance(spark):
    rows = [(i, [float(i), float(i * 2)]) for i in range(6)]
    got = _assign(spark, rows, k=3)
    for i in range(3):
        assert got[i] == (i, 0.0)
    assert len(got) == 6


def test_tie_breaks_to_lowest_centroid_id(spark):
    """A vector equidistant from two centroids must pick the lower id —
    the (dist, id) struct-min contract the DuckDB twin replays."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [1.0, 0.0]),  # d2 = 1.0 to both centroids
    ]
    got = _assign(spark, rows, k=2)
    assert got[2] == (0, 1.0)


def test_k_validation(spark):
    rows = [(0, [0.0])]
    with pytest.raises(ValueError):
        _assign(spark, rows, k=0)
