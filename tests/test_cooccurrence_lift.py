"""Co-occurrence lift: hand-computed contingency, determinism, bounds."""

import pytest

from lightrag_spark.operators.graphs import cooccurrence_lift


@pytest.fixture(scope="module")
def spark():
    from lightrag_spark.session import get_spark

    yield get_spark(app_name="test-lift", master="local[4]", shuffle_partitions=8)


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "chunk_id string, entity_name string")


def test_lift_hand_computed(spark):
    # 4 chunks; a+b always together (lift > 1), a+c once by chance.
    rows = [
        ("c1", "a"), ("c1", "b"),
        ("c2", "a"), ("c2", "b"),
        ("c3", "a"), ("c3", "c"),
        ("c4", "d"),
    ]
    out = {(r["src"], r["tgt"]): r for r in cooccurrence_lift(_mentions(spark, rows)).collect()}
    ab = out[("a", "b")]
    # c_ab=2, c_a=3, c_b=2, N=4 -> lift = 2*4 / (3*2) = 4/3
    assert ab["cooc_chunks"] == 2 and ab["src_chunks"] == 3 and ab["tgt_chunks"] == 2
    assert ab["n_chunks"] == 4
    assert ab["lift"] == pytest.approx(4 / 3)
    ac = out[("a", "c")]
    # c_ac=1, c_a=3, c_c=1, N=4 -> lift = 4/3 too; independent-ish pair
    assert ac["lift"] == pytest.approx(4 / 3)
    assert ("a", "d") not in out  # never co-occur
    assert all(k[0] < k[1] for k in out)  # undirected orientation


def test_lift_duplicate_mentions_collapse(spark):
    rows = [("c1", "a"), ("c1", "a"), ("c1", "b"), ("c2", "a")]
    out = cooccurrence_lift(_mentions(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # c_ab=1, c_a=2, c_b=1, N=2 -> lift = 2/2 = 1.0
    assert r["cooc_chunks"] == 1 and r["lift"] == pytest.approx(1.0)


def test_lift_min_cooc_filter(spark):
    rows = [("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"), ("c3", "x"), ("c3", "y")]
    out = cooccurrence_lift(_mentions(spark, rows), min_cooc=2).collect()
    assert [(r["src"], r["tgt"]) for r in out] == [("a", "b")]


def test_lift_partition_invariance(spark):
    rows = [(f"c{i % 5}", f"e{i % 7}") for i in range(60)]
    a = cooccurrence_lift(_mentions(spark, rows))
    b = cooccurrence_lift(_mentions(spark, rows).repartition(9))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
