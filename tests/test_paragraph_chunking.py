"""Paragraph-semantic chunker P (functions/paragraph_chunking.py):
text-mode fallback parity with R, and the block-mode AnchorSplit +
hierarchy-gated LevelMerge passes."""

from __future__ import annotations

from lightrag_spark.functions import paragraph_chunking as pc
from lightrag_spark.functions.recursive_chunking import chunk_text_recursive
from lightrag_spark.functions.tokenizer import get_tokenizer

TOK = get_tokenizer("whitespace")


def test_text_mode_equals_recursive_fallback():
    """The reference's P falls back to R for sidecar-less input
    (paragraph_semantic.py:2200-2224) — byte-equal here."""
    text = ("para one has words. " * 40 + "\n\n" + "para two more words. " * 40)
    got = pc.chunk_text_paragraph(TOK, text, chunk_token_size=50,
                                  chunk_overlap_token_size=8)
    want = chunk_text_recursive(TOK, text, chunk_token_size=50,
                                chunk_overlap_token_size=8)
    assert got == want


def test_bounded_overlap_clamp():
    assert pc.bounded_overlap(1, 100) == 0
    assert pc.bounded_overlap(10, 100) == 9
    assert pc.bounded_overlap(100, 10) == 10
    assert pc.bounded_overlap(100, -5) == 0


def _block(content, heading=None, level=0, parents=None):
    return {
        "content": content,
        "heading": heading,
        "level": level,
        "parent_headings": parents or [],
    }


def test_levelmerge_merges_siblings_only():
    blocks = [
        _block("intro words here", "1.1", 2, ["Ch1"]),
        _block("more intro words", "1.2", 2, ["Ch1"]),      # sibling -> merge
        _block("different chapter", "2.1", 2, ["Ch2"]),     # not sibling
    ]
    out = pc.chunk_blocks_paragraph(TOK, blocks, chunk_token_size=100)
    assert len(out) == 2
    assert "intro words here" in out[0]["content"]
    assert "more intro words" in out[0]["content"]
    assert out[1]["content"] == "different chapter"
    assert out[0]["heading"]["parent_headings"] == ["Ch1"]


def test_levelmerge_ancestor_absorbs_descendant():
    blocks = [
        _block("chapter opening", "Ch1", 1, []),
        _block("subsection body", "1.1", 2, ["Ch1"]),  # descendant of Ch1
        _block("other chapter", "Ch2", 1, []),          # sibling of Ch1 (merges? same parent [])
    ]
    out = pc.chunk_blocks_paragraph(TOK, blocks, chunk_token_size=100)
    # Ch1 absorbs 1.1 (descendant); Ch2 then merges as sibling of the
    # combined block (same empty parent chain) while under the ideal budget
    assert "subsection body" in out[0]["content"]


def test_levelmerge_respects_ideal_budget():
    big = "w " * 60  # 60 tokens
    blocks = [
        _block(big.strip(), "a", 2, ["P"]),
        _block(big.strip(), "b", 2, ["P"]),
    ]
    # target_ideal = 0.75 * 100 = 75 < 120 -> no merge
    out = pc.chunk_blocks_paragraph(TOK, blocks, chunk_token_size=100)
    assert len(out) == 2


def test_anchorsplit_part_suffixes_and_max():
    long_text = "token " * 300
    blocks = [_block(long_text.strip(), "Long Section", 1, [])]
    out = pc.chunk_blocks_paragraph(TOK, blocks, chunk_token_size=50)
    assert len(out) > 1
    assert all(c["tokens"] <= 50 for c in out)
    assert out[0]["heading"]["heading"] == "Long Section [part 1]"
    assert out[1]["heading"]["heading"].startswith("Long Section [part ")


def test_table_blocks_are_atomic():
    tbl = "<table format=\"json\">" + "cell " * 200 + "</table>"
    out = pc.chunk_blocks_paragraph(TOK, [_block(tbl, "T", 1, [])], chunk_token_size=50)
    assert len(out) == 1  # never split, never merged with anything


def test_drop_references_tail_window():
    blocks = [
        _block("body", "Intro", 1, []),
        _block("ref list", "References", 1, []),
    ]
    out = pc.chunk_blocks_paragraph(
        TOK, blocks, chunk_token_size=10, drop_references=True
    )
    assert all("ref list" not in c["content"] for c in out)
    # outside the tail window the heading survives
    blocks2 = [_block("ref list", "References", 1, [])] + [
        _block(f"b{i}", f"h{i}", 1, []) for i in range(6)
    ]
    out2 = pc.chunk_blocks_paragraph(
        TOK, blocks2, chunk_token_size=3, drop_references=True, references_tail_n=5
    )
    assert any("ref list" in c["content"] for c in out2)


def test_chunk_documents_paragraph_strategy(spark):
    from lightrag_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [{"doc_id": "d1", "text": "alpha beta gamma. " * 30, "file_path": "f",
          "doc_order": 0}]
    )
    out = chunk_documents(
        docs, tokenizer_kind="whitespace", chunk_token_size=20,
        chunk_overlap_token_size=4, strategy="P",
    ).collect()
    assert len(out) >= 2
    assert all(r.tokens <= 20 for r in out)
