"""Entity linking: alias candidates, closure, canonical pick, graph rewrite."""

import pytest
from pyspark.sql import functions as F

from lightrag_spark.operators.linking import (
    NAME_LINK_THRESHOLD,
    apply_entity_links,
    link_entities,
    name_link_pairs,
    name_shingles_col,
)


@pytest.fixture(scope="module")
def spark():
    from lightrag_spark.session import get_spark

    s = get_spark(app_name="test-linking", master="local[4]", shuffle_partitions=8)
    yield s


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "entity_name string, degree long, mention_count long")


def test_name_shingles_short_name_fallback(spark):
    df = spark.createDataFrame([("ab",), ("abcd",)], "nm string").select(
        "nm", name_shingles_col(F.col("nm")).alias("sh")
    )
    got = {r["nm"]: r["sh"] for r in df.collect()}
    assert got["ab"] == ["ab"]
    assert got["abcd"] == ["abc", "bcd"]


def test_link_pairs_jaccard_threshold(spark):
    # "acme corporation" vs "acme corporatio": 14 vs 13 distinct trigrams,
    # 13 shared -> J = 13/14; zebra shares no bucket with either.
    names = _nodes(
        spark,
        [("acme corporation", 5, 9), ("acme corporatio", 2, 3), ("zebra", 1, 1)],
    )
    pairs = name_link_pairs(names, threshold=0.5).collect()
    assert [(p["nm_a"], p["nm_b"]) for p in pairs] == [
        ("acme corporatio", "acme corporation")
    ]
    assert pairs[0]["jaccard"] == pytest.approx(13 / 14)
    assert name_link_pairs(names, threshold=0.999).collect() == []


def test_link_entities_canonical_by_degree(spark):
    nodes = _nodes(
        spark,
        [
            ("acme corporation", 5, 9),
            ("acme corporatio", 2, 30),   # higher mentions, lower degree: loses
            ("zebra", 7, 1),
        ],
    )
    links = link_entities(nodes, threshold=0.5)
    got = {r["entity_name"]: r for r in links.collect()}
    assert set(got) == {"acme corporation", "acme corporatio"}
    assert all(r["canonical_name"] == "acme corporation" for r in got.values())
    assert all(r["component_size"] == 2 for r in got.values())


def test_apply_entity_links_rewrites_and_merges(spark):
    nodes = _nodes(
        spark, [("alpha one", 2, 4), ("alpha one!", 1, 2), ("beta", 2, 5)]
    )
    edges = spark.createDataFrame(
        [
            ("alpha one", "beta", 1.0, 1),
            ("alpha one!", "beta", 2.0, 2),     # parallel after rewrite -> merged
            ("alpha one", "alpha one!", 9.0, 9),  # becomes self-loop -> dropped
        ],
        "src string, tgt string, weight double, relation_count long",
    )
    links = link_entities(nodes, threshold=0.5)
    n, e = apply_entity_links(nodes, edges, links)
    erows = e.collect()
    assert len(erows) == 1
    r = erows[0]
    assert (r["src"], r["tgt"]) == ("alpha one", "beta")
    assert r["weight"] == 3.0 and r["relation_count"] == 3
    nrows = {x["entity_name"]: x for x in n.collect()}
    assert set(nrows) == {"alpha one", "beta"}
    assert nrows["alpha one"]["mention_count"] == 6
    assert nrows["alpha one"]["linked_names"] == 2
    assert nrows["alpha one"]["degree"] == 1 and nrows["beta"]["degree"] == 1


def test_empty_links_is_identity_rewrite(spark):
    nodes = _nodes(spark, [("solo", 1, 1), ("other", 1, 1)])
    edges = spark.createDataFrame(
        [("other", "solo", 1.5, 2)], "src string, tgt string, weight double, relation_count long"
    )
    links = link_entities(nodes)  # no pair passes: empty map
    assert links.collect() == []
    n, e = apply_entity_links(nodes, edges, links)
    r = e.collect()[0]
    assert (r["src"], r["tgt"], r["weight"], r["relation_count"]) == (
        "other", "solo", 1.5, 2
    )
    assert {x["entity_name"] for x in n.collect()} == {"solo", "other"}


def test_default_threshold_constant_sane():
    assert 0 < NAME_LINK_THRESHOLD < 1


def test_link_entities_by_embedding(spark):
    from lightrag_spark.operators.linking import link_entities_by_embedding

    # "who" and "world health org" share no trigrams but identical-ish
    # embeddings; "unrelated" points the other way.
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e1b = [0.98] + [0.199] + [0.0] * (dim - 2)
    e2 = [0.0] * (dim - 1) + [1.0]
    nodes = spark.createDataFrame(
        [
            ("who", 2, 5, e1),
            ("world health org", 9, 3, e1b),
            ("unrelated", 4, 4, e2),
        ],
        "entity_name string, degree long, mention_count long, embedding array<float>",
    )
    links = link_entities_by_embedding(nodes, threshold=0.9, dim=dim)
    got = {r["entity_name"]: r for r in links.collect()}
    assert set(got) == {"who", "world health org"}
    assert all(r["canonical_name"] == "world health org" for r in got.values())


def test_name_band_rows_arrow_matches_expression(spark):
    from lightrag_spark.operators.linking import name_band_rows

    hostile = [
        ("plain name",), ("ab",), ("x",), ("  padded  ",),
        ("naïve café",), ("統一実体",), ("tab\tinside",),
        ("dup dup dup dup",), ("a b c d e f g",),
    ]
    names = spark.createDataFrame(hostile, "entity_name string")
    a = name_band_rows(names, use_arrow=True).collect()
    e = name_band_rows(names, use_arrow=False).collect()
    key = lambda r: (r["nm"], r["band_idx"])
    da = {key(r): (r["bucket"], list(r["sh"])) for r in a}
    de = {key(r): (r["bucket"], list(r["sh"])) for r in e}
    assert da == de
