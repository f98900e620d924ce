"""HTML-to-text extraction — byte-identity against the generator's text
column (the north rule's "extracted text per url byte-identical" clause)
plus tag-handling unit cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightrag_spark.sources.pages import (
    html_to_text_col,
    pages_with_text,
    synthesize_pages,
)


def test_byte_identity_on_synth_corpus(spark):
    """extract(html) == text for every synthesized page, including dirty
    ones (controls, NBSP, literal entities) — byte for byte."""
    pages = synthesize_pages(spark, 150, seed=9, dirty_fraction=0.4)
    mism = (
        pages.withColumn("ex", html_to_text_col(F.col("html")))
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_tag_rules(spark):
    cases = [
        (b"<html><body><p>hello world</p></body></html>", "hello world"),
        (b"<p>a</p><p>b</p>", "a\nb"),
        (b"x<br>y<BR/>z", "x\ny\nz"),
        (b"<div>q</div><li>w</li>", "q\nw"),
        (b"<script>var x = '<p>no</p>';</script>keep", "keep"),
        (b"<style>p { color: red }</style>keep", "keep"),
        (b"<h1>Title</h1>body", "Title\nbody"),
        # entities are NOT decoded (sanitize's concern, not extraction's)
        (b"<p>a &amp; b</p>", "a &amp; b"),
        (b"  <p> padded </p>  ", "padded"),
        (b"plain, no tags", "plain, no tags"),
    ]
    df = spark.createDataFrame(
        [(h, want) for h, want in cases], "html binary, want string"
    )
    rows = df.withColumn("got", html_to_text_col(F.col("html"))).collect()
    for r in rows:
        assert r.got == r.want, (r.want, r.got)


def test_pages_with_text_derives_and_passes_through(spark):
    html_only = spark.createDataFrame(
        [(b"<p>from html</p>",)], "html binary"
    )
    assert pages_with_text(html_only).first().text == "from html"

    mixed = spark.createDataFrame(
        [("already here", b"<p>ignored</p>"), (None, b"<p>derived</p>")],
        "text string, html binary",
    )
    got = {r.text for r in pages_with_text(mixed).collect()}
    assert got == {"already here", "derived"}
