"""Repeated-span scrub: coverage semantics, edges, partition invariance."""

import pytest

from lightrag_spark.operators.datapipe import scrub_boilerplate_spans


@pytest.fixture(scope="module")
def spark():
    from lightrag_spark.session import get_spark

    yield get_spark(app_name="test-scrub", master="local[4]", shuffle_partitions=8)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BOILER = "accept all cookies"


def test_scrub_removes_covered_spans(spark):
    # The 3-gram "accept all cookies" appears in 3 docs (min_df=3);
    # every token position under one of its occurrences is dropped.
    docs = _docs(
        spark,
        [
            f"alpha {BOILER} beta",
            f"{BOILER} gamma delta",
            f"pre words {BOILER}",
            "clean doc stays whole",
        ],
    )
    out = {r["doc_id"]: r for r in scrub_boilerplate_spans(docs, min_df=3).collect()}
    assert out[0]["clean_text"] == "alpha beta"
    assert out[1]["clean_text"] == "gamma delta"
    assert out[2]["clean_text"] == "pre words"
    assert out[3]["clean_text"] == "clean doc stays whole"
    assert out[0]["removed_tokens"] == 3 and out[0]["total_tokens"] == 5
    assert out[3]["removed_tokens"] == 0


def test_scrub_overlapping_occurrences_counted_once(spark):
    # "x x x x" in enough docs: the 3-grams "x x x" at pos 0 and 1 overlap;
    # covered positions {0,1,2,3} dedup to 4 removed tokens, not 6.
    docs = _docs(spark, ["x x x x"] * 3 + ["y z w v"])
    out = {r["doc_id"]: r for r in scrub_boilerplate_spans(docs, min_df=3).collect()}
    assert out[0]["clean_text"] == "" and out[0]["removed_tokens"] == 4
    assert out[3]["clean_text"] == "y z w v"


def test_scrub_short_docs_pass_through(spark):
    docs = _docs(spark, ["one two"] * 5)
    out = scrub_boilerplate_spans(docs, min_df=2).collect()
    assert all(r["clean_text"] == "one two" and r["removed_tokens"] == 0 for r in out)


def test_scrub_partition_invariance(spark):
    texts = [f"alpha {BOILER} tail{i}" for i in range(6)] + ["solo doc here now"]
    a = scrub_boilerplate_spans(_docs(spark, texts), min_df=4)
    b = scrub_boilerplate_spans(_docs(spark, texts).repartition(7), min_df=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
