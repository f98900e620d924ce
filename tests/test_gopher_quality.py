"""Gopher-style quality filter: hand-computed expectations on crafted docs
(the driver gate covers the real corpus; these pin the line/bigram/tie
rules the single-line corpus can't exercise)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp

GOOD = (
    "the quick brown fox jumps over a lazy dog and then the fox runs in "
    "the field of green grass while a bird sits on the old oak tree and "
    "sings a song about the morning sun that rises over the hills in "
    "the east and warms the cold air of the early day for everyone here"
)


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, "short doc"),                                  # < min words
            (3, "- one\n- two\n- three\n- four"),              # all bullets
            (4, "line a\nline a\nline a\nline b"),             # dup lines
            (5, "x y x y x y x y x y x y"),                    # bigram flood
            (6, "zz zz zz zz"),                                # tie-break: "zz zz" only gram
        ],
        "doc_id long, text string",
    )
    return {r.doc_id: r.asDict() for r in dp.gopher_quality(docs).collect()}


def test_good_doc_keeps(rows):
    r = rows[1]
    assert r["keep"] is True
    assert r["n_words"] >= dp.GOPHER_MIN_WORDS
    assert r["stop_hits"] >= dp.GOPHER_MIN_STOP_HITS
    assert r["dup_line_frac"] == 0.0


def test_short_doc_drops(rows):
    assert rows[2]["keep"] is False and rows[2]["n_words"] == 2


def test_bullet_lines(rows):
    r = rows[3]
    assert r["bullet_line_frac"] == 1.0
    assert r["keep"] is False


def test_duplicate_lines(rows):
    # 4 lines, "line a" x3 -> excess 2 -> 2/4
    assert rows[4]["dup_line_frac"] == 0.5


def test_top_bigram_fraction(rows):
    # "x y" occurs 6 times, len 3, text len 23 -> 18/23
    r = rows[5]
    assert r["top_bigram_char_frac"] == round(6 * 3 / 23, 4)
    assert r["keep"] is False

    # doc 6: grams are only "zz zz" (x3); 3*5/11
    assert rows[6]["top_bigram_char_frac"] == round(3 * 5 / 11, 4)


def test_empty_and_null_text(spark):
    docs = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in dp.gopher_quality(docs).collect()}
    for r in got.values():
        assert r["n_words"] == 0 and r["keep"] is False
        assert r["dup_line_frac"] == 0.0 and r["top_bigram_char_frac"] == 0.0


def test_kernel_matches_expression(spark):
    """Arrow kernel == expression/groupBy twin on generator pages (incl.
    dirty docs) and the edge docs above."""
    from lightrag_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(
        spark, 60, seed=3, min_words=20, max_words=200, dirty_fraction=0.3
    ).select(F.col("page_order").alias("doc_id"), "text")
    edge = spark.createDataFrame(
        [(100, GOOD), (101, "- a\n- b"), (102, "x y x y x y"), (103, ""),
         (104, "one\ntwo\ntwo\nthree..."), (105, None)],
        "doc_id long, text string",
    )
    for frame in (pages, edge):
        a = {r.doc_id: tuple(r) for r in dp.gopher_quality(frame).collect()}
        b = {
            r.doc_id: tuple(r)
            for r in dp.gopher_quality(frame, use_arrow=False).collect()
        }
        assert a == b
