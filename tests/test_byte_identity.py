"""North-rule invariant: extracted text per url must be byte-identical to
the reference HTML-to-text stage (sanitize_text_for_encoding at enqueue,
pipeline.py:1010).

The synthetic corpus plants HTML entities, control chars, full-width chars
and CJK quotes (FIXTURES.md §1) so the sanitize path actually fires; the
Spark-enqueued text is compared byte-for-byte against the reference
function applied per url.
"""

from __future__ import annotations

import pytest

from refshim import load_reference

ref = load_reference()


@pytest.mark.skipif(ref is None, reason="reference unavailable")
def test_enqueued_text_byte_identical_per_url(spark):
    import lightrag.utils as ru

    from lightrag_spark.sources.pages import enqueue_documents, synthesize_pages

    pages = synthesize_pages(
        spark, 120, seed=9, min_words=20, max_words=120, dirty_fraction=0.5
    )
    raw = {r["url"]: r["text"] for r in pages.collect()}
    docs = {r["file_path"]: r["text"] for r in enqueue_documents(pages).collect()}

    checked = 0
    changed_by_sanitize = 0
    for url, text in docs.items():
        expected = ru.sanitize_text_for_encoding(raw[url])
        assert text.encode("utf-8") == expected.encode("utf-8"), url
        checked += 1
        if expected != raw[url]:
            changed_by_sanitize += 1
    assert checked > 50
    # the corpus must actually exercise the sanitize transformations
    assert changed_by_sanitize > 5
