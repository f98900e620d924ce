"""Tokenizer invariants.

The chunker's correctness rests on one property: ``decode(encode(s)) == s``
(lossless split), because token windows are decoded back to chunk content
and source spans are located in the original text.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_spark.functions.tokenizer import (
    CharTokenizer,
    RegexTokenizer,
    WhitespaceTokenizer,
)


@given(st.text(max_size=400))
@settings(max_examples=500, deadline=None)
def test_regex_tokenizer_lossless(text):
    tok = RegexTokenizer()
    assert tok.decode(tok.encode(text)) == text


def test_regex_tokenizer_underscore_and_mixed():
    tok = RegexTokenizer()
    for s in ["united_states", "a_b c__d", "x _ y", "snake_case_id123", "__init__"]:
        assert tok.decode(tok.encode(s)) == s


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_char_tokenizer_lossless(text):
    tok = CharTokenizer()
    assert tok.decode(tok.encode(text)) == text


def test_whitespace_tokenizer_roundtrip_on_normalized():
    tok = WhitespaceTokenizer()
    s = "alpha beta gamma"
    assert tok.decode(tok.encode(s)) == s
    assert tok.count("  a   b  ") == 2
