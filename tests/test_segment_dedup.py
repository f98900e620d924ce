"""segment_dedup: first-occurrence-keeps exact dedup at token-segment
granularity (Lee et al. repeated-span removal; datapipe.segment_dedup).
The DuckDB twin is queries[text_segment_dedup]; these tests pin the
semantics on hand cases the gate corpus may not contain."""

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_cross_doc_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
        ],
        "doc_id long, text string",
    )
    got = _rows(dp.segment_dedup(docs, width=3))
    # doc 1 keeps both segments; doc 2 loses its first ("a b c" seen in doc 1)
    assert got[1]["clean_text"] == "a b c d e f"
    assert got[1]["removed_segments"] == 0
    assert got[2]["clean_text"] == "x y z"
    assert got[2]["removed_segments"] == 1
    assert got[2]["n_segments"] == 2


def test_within_doc_repeat_removed(spark):
    docs = spark.createDataFrame(
        [(7, "p q r p q r p q r")], "doc_id long, text string"
    )
    got = _rows(dp.segment_dedup(docs, width=3))[7]
    assert got["clean_text"] == "p q r"
    assert got["n_segments"] == 3
    assert got["removed_segments"] == 2


def test_short_tail_segment_is_its_own_unit(spark):
    # 7 tokens at width 3 -> segments "a b c", "d e f", "g"; the tail "g"
    # does NOT match a full-width segment elsewhere.
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "g h i")], "doc_id long, text string"
    )
    got = _rows(dp.segment_dedup(docs, width=3))
    assert got[1]["clean_text"] == "a b c d e f g"
    assert got[2]["clean_text"] == "g h i"


def test_fully_deduped_doc_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    got = _rows(dp.segment_dedup(docs, width=3))
    assert got[2]["clean_text"] == ""
    assert got[2]["removed_segments"] == 1


def test_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = dp.segment_dedup(docs.repartition(1), width=5)
    b = dp.segment_dedup(docs.repartition(13), width=5)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
