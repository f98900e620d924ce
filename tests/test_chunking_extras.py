"""Embedding hard-split guard + recursive-character chunker tests."""

from __future__ import annotations

from lightrag_spark.functions.chunking_core import (
    chunk_text_by_tokens,
    enforce_embedding_token_limit,
)
from lightrag_spark.functions.recursive_chunking import chunk_text_recursive
from lightrag_spark.functions.tokenizer import RegexTokenizer, WhitespaceTokenizer


def test_embedding_guard_noop_when_within_limit():
    tok = WhitespaceTokenizer()
    chunks = chunk_text_by_tokens(tok, "a b c d e f", chunk_token_size=4,
                                  chunk_overlap_token_size=1)
    out = enforce_embedding_token_limit(chunks, tok, embedding_token_limit=4)
    assert [c["content"] for c in out] == [c["content"] for c in chunks]


def test_embedding_guard_resplits_and_renumbers():
    tok = WhitespaceTokenizer()
    chunks = [
        {"tokens": 8, "content": "w1 w2 w3 w4 w5 w6 w7 w8", "chunk_order_index": 0},
        {"tokens": 2, "content": "t1 t2", "chunk_order_index": 1},
    ]
    out = enforce_embedding_token_limit(chunks, tok, embedding_token_limit=3, overlap=1)
    assert all(c["tokens"] <= 3 for c in out)
    assert [c["chunk_order_index"] for c in out] == list(range(len(out)))
    # every original token survives somewhere
    all_text = " ".join(c["content"] for c in out)
    for w in ["w1", "w8", "t1", "t2"]:
        assert w in all_text


def test_recursive_chunker_respects_cap_and_order():
    tok = RegexTokenizer()
    text = ("Paragraph one sentence alpha. " * 8 + "\n\n") * 6 + "Tail text here."
    chunks = chunk_text_recursive(tok, text, chunk_token_size=64,
                                  chunk_overlap_token_size=8)
    assert chunks, "must produce chunks"
    assert [c["chunk_order_index"] for c in chunks] == list(range(len(chunks)))
    # pieces were separable -> every chunk within cap (+joiner slack)
    assert all(c["tokens"] <= 64 + 2 for c in chunks)
    # coverage: distinctive words survive
    assert any("Tail" in c["content"] for c in chunks)


def test_recursive_chunker_cjk_separators():
    tok = RegexTokenizer()
    text = "第一句话很长。第二句话也很长！第三句话结束了？" * 20
    chunks = chunk_text_recursive(tok, text, chunk_token_size=32,
                                  chunk_overlap_token_size=4)
    assert len(chunks) > 1
    assert all(c["tokens"] <= 34 for c in chunks)


def test_recursive_unsplittable_passes_through():
    tok = WhitespaceTokenizer()
    text = "single_enormous_token"
    chunks = chunk_text_recursive(tok, text, chunk_token_size=1,
                                  chunk_overlap_token_size=0, separators=["\n", " "])
    assert len(chunks) == 1
