"""Token-identical chunking parity vs the reference, gated on tiktoken.

The sandbox this repo is built in has no tiktoken (re-probed every round);
the default tokenizer is the lossless regex pre-tokenizer, proven
semantically faithful (windows/overlap/decode-roundtrip) but not
token-identical to o200k_base.  This module is the ready-to-run proof for
environments that DO have tiktoken: the moment the library is present,
these tests assert byte-identical chunk output — content, token counts,
order — between our ``chunk_text_by_tokens`` and the reference's
``chunking_by_token_size`` (reference chunker/token_size.py:130-256)
under the SAME tiktoken encoding, on multi-byte and boundary-hostile
inputs.  Until then they skip loudly rather than vanish.
"""

from __future__ import annotations

import pytest

tiktoken = pytest.importorskip("tiktoken")

from refshim import load_reference  # noqa: E402

from lightrag_spark.functions.chunking_core import chunk_text_by_tokens  # noqa: E402
from lightrag_spark.functions.tokenizer import TiktokenTokenizer  # noqa: E402

ref = load_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference unavailable")

# Boundary-hostile corpus: multi-byte scripts, combining marks, emoji with
# ZWJ sequences, CRLF mixes, and text engineered to split mid-codepoint if
# windows were byte- or char-based instead of token-based.
CASES = [
    "",
    "plain ascii words only",
    "café naïve résumé " * 50,
    "日本語のテキストです。" * 80,
    "\U0001f469‍\U0001f4bb\U0001f9d1‍\U0001f680 emoji zwj " * 60,
    "mixed क्षि 한국어 العربية text " * 40,
    "á" * 500,  # combining acute on every char
    "line one\r\nline two\rline three\n" * 100,
]


@needs_ref
@pytest.mark.parametrize("content", CASES, ids=range(len(CASES)))
@pytest.mark.parametrize("size,overlap", [(1200, 100), (64, 8), (16, 4)])
def test_fixed_window_token_identical(content, size, overlap):
    from lightrag.chunker.token_size import chunking_by_token_size

    tok = TiktokenTokenizer()
    theirs = chunking_by_token_size(
        tok, content, chunk_overlap_token_size=overlap, chunk_token_size=size
    )
    ours = chunk_text_by_tokens(
        tok, content, chunk_overlap_token_size=overlap, chunk_token_size=size
    )
    assert [(c["tokens"], c["content"], c["chunk_order_index"]) for c in ours] == [
        (c["tokens"], c["content"], c["chunk_order_index"]) for c in theirs
    ]


@needs_ref
@pytest.mark.parametrize("only", [False, True])
def test_split_by_character_token_identical(only):
    from lightrag.chunker.token_size import chunking_by_token_size

    tok = TiktokenTokenizer()
    content = "\n\n".join(
        ["short para", "日本語 " * 40, "tail ééé " * 30]
    )
    kwargs = dict(
        split_by_character="\n\n",
        split_by_character_only=only,
        chunk_overlap_token_size=4,
        chunk_token_size=32,
    )
    if only:
        with pytest.raises(Exception):
            chunking_by_token_size(tok, content, **kwargs)
        with pytest.raises(Exception):
            chunk_text_by_tokens(tok, content, **kwargs)
        return
    theirs = chunking_by_token_size(tok, content, **kwargs)
    ours = chunk_text_by_tokens(tok, content, **kwargs)
    assert [(c["tokens"], c["content"]) for c in ours] == [
        (c["tokens"], c["content"]) for c in theirs
    ]


def test_decode_roundtrip_on_multibyte():
    tok = TiktokenTokenizer()
    for content in CASES:
        ids = tok.encode(content)
        assert tok.decode(ids) == content
